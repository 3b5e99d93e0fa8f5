package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ml._

/** Flink ML Pipeline API analog (flink-ml-parent: Pipeline/Estimator/
  * Transformer/Model/Params + MultivariateGaussian) wired onto the
  * engine's own distributed operators. */
class MlPipelineSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private lazy val embeddings = spark.read
    .parquet(s"$sfDir/embeddings.parquet")
    .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))

  test("scaler -> kmeans pipeline: fit chains stages, predictions match the " +
       "engine's own kmeans on the scaled features") {
    val pipe = new Pipeline()
      .appendStage(new StandardScaler("embedding", "scaled"))
      .appendStage(new KMeans("vec_id", "scaled", "cluster", k = 4, iters = 5))
    assert(pipe.needFit)
    val model = pipe.fit(embeddings)
    val out = model.transform(embeddings)
    val mine = out.select(col("vec_id"), col("cluster")).as[(Long, Int)]
      .collect().toMap

    // reference: scale by hand, run the engine's kmeans directly — the
    // model's expression-only scoring must agree exactly (same init, same
    // iteration count, same lowest-cid tie-break)
    val scaledRef = new StandardScaler("embedding", "scaled").fit(embeddings)
      .transform(embeddings)
    val ref = graft.operators.Iterate.kmeans(scaledRef, "vec_id", "scaled", 4, 5)
      .as[(Long, Int)].collect().toMap
    assert(mine.size == ref.size)
    assert(mine == ref, s"first diffs: ${
      mine.collect { case (k, v) if ref.get(k) != Some(v) => (k, v, ref.get(k)) }.take(5)}")
    // every cluster is populated at this k
    assert(mine.values.toSet == Set(0, 1, 2, 3))
  }

  test("scaler model standardizes each dimension to mean 0 / std 1") {
    val model = new StandardScaler("embedding", "scaled").fit(embeddings)
    val stats = model.transform(embeddings)
      .select(posexplode(col("scaled")).as(Seq("dim", "x")))
      .groupBy("dim").agg(avg("x").as("mu"), stddev_pop("x").as("sd"))
      .collect()
    assert(stats.forall(r => math.abs(r.getDouble(1)) < 1e-9 &&
      math.abs(r.getDouble(2) - 1.0) < 1e-9))
  }

  test("unfitted pipeline with estimators rejects transform by name") {
    val pipe = new Pipeline().appendStage(new KMeans("vec_id", "embedding", "c", 2, 2))
    val e = intercept[IllegalArgumentException](pipe.transform(embeddings))
    assert(e.getMessage.contains("unfitted"))
    // a transformer-only pipeline transforms without fit (reference contract)
    val tOnly = new Pipeline().appendStage(
      new MultivariateGaussian("embedding", "lp",
        Array.fill(embeddings.head().getSeq[Double](1).length)(0.0),
        Array.tabulate(embeddings.head().getSeq[Double](1).length,
          embeddings.head().getSeq[Double](1).length)((i, j) => if (i == j) 1.0 else 0.0)))
    assert(!tOnly.needFit)
    assert(tOnly.transform(embeddings).columns.contains("lp"))
  }

  test("MultivariateGaussian log-density matches the closed form (diagonal + full)") {
    val df = Seq((1L, Seq(1.0, 2.0)), (2L, Seq(0.0, 0.0))).toDF("id", "v")
    // diagonal: logpdf = -log(2π) - 0.5·log(σ1²σ2²) - 0.5·Σ (xi-μi)²/σi²
    val diag = new MultivariateGaussian("v", "lp",
      Array(1.0, 1.0), Array(Array(4.0, 0.0), Array(0.0, 0.25)))
    val got = diag.transform(df).select("id", "lp").as[(Long, Double)].collect().toMap
    def ref(x: Array[Double]): Double =
      -math.log(2 * math.Pi) - 0.5 * math.log(4.0 * 0.25) -
        0.5 * (math.pow(x(0) - 1, 2) / 4.0 + math.pow(x(1) - 1, 2) / 0.25)
    assert(math.abs(got(1L) - ref(Array(1.0, 2.0))) < 1e-9)
    assert(math.abs(got(2L) - ref(Array(0.0, 0.0))) < 1e-9)
    // full covariance: check against a hand-inverted 2×2
    val full = new MultivariateGaussian("v", "lp",
      Array(0.0, 0.0), Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    val g2 = full.transform(df).select("id", "lp").as[(Long, Double)].collect().toMap
    // Σ⁻¹ = 1/3·[[2,-1],[-1,2]], |Σ| = 3
    def ref2(x: Array[Double]): Double = {
      val quad = (2 * x(0) * x(0) - 2 * x(0) * x(1) + 2 * x(1) * x(1)) / 3.0
      -math.log(2 * math.Pi) - 0.5 * math.log(3.0) - 0.5 * quad
    }
    assert(math.abs(g2(1L) - ref2(Array(1.0, 2.0))) < 1e-9)
    assert(math.abs(g2(2L) - ref2(Array(0.0, 0.0))) < 1e-9)
  }

  test("kmeans scoring is expression-only: no join, no shuffle in the plan") {
    val model = new KMeans("vec_id", "embedding", "c", 3, 3).fit(embeddings)
    val plan = model.transform(embeddings).queryExecution.optimizedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Exchange"), plan)
  }

  test("pipeline persistence: fit -> toJson -> loadJson -> transform is " +
       "bit-identical to the original model (reference Pipeline.java toJson/loadJson)") {
    val pipe = new Pipeline()
      .appendStage(new StandardScaler("embedding", "scaled"))
      .appendStage(new KMeans("vec_id", "scaled", "cluster", k = 4, iters = 5))
    val model = pipe.fit(embeddings)
    val reloaded = PipelineModel.loadJson(model.toJson)
    // every double (scaled features AND predictions) bit-identical
    val orig = model.transform(embeddings)
      .select(col("vec_id"), col("scaled"), col("cluster"))
      .as[(Long, Seq[Double], Int)].collect().sortBy(_._1)
    val back = reloaded.transform(embeddings)
      .select(col("vec_id"), col("scaled"), col("cluster"))
      .as[(Long, Seq[Double], Int)].collect().sortBy(_._1)
    assert(orig.sameElements(back))
    // the reloaded model's centroids are the original's, bit-for-bit
    val km = model.stages.collect { case m: KMeansModel => m }.head
    val km2 = reloaded.stages.collect { case m: KMeansModel => m }.head
    assert(km.centroids.map(_.toSeq).toSeq == km2.centroids.map(_.toSeq).toSeq)
  }

  test("UNFITTED pipeline persistence round-trips estimators too " +
       "(the reference serializes any stage list, fitted or not)") {
    val pipe = new Pipeline()
      .appendStage(new StandardScaler("embedding", "scaled"))
      .appendStage(new KMeans("vec_id", "scaled", "cluster", k = 4, iters = 5))
    val back = Pipeline.loadJson(pipe.toJson)
    assert(back.needFit && back.stages.length == 2)
    // fitting the reloaded pipeline gives the same predictions
    val a = pipe.fit(embeddings).transform(embeddings)
      .select(col("vec_id"), col("cluster")).as[(Long, Int)].collect().toMap
    val b = back.fit(embeddings).transform(embeddings)
      .select(col("vec_id"), col("cluster")).as[(Long, Int)].collect().toMap
    assert(a == b)
  }

  test("Params: the reference member set — remove/isEmpty/merge/json roundtrip") {
    val p = Params.empty.set("k", 4).set("name", "x").set("lr", 0.5)
      .set("dims", Seq(1.0, 2.0))
    assert(p.size == 4 && !p.isEmpty && p.contains("lr"))
    assert(p.remove("lr").size == 3 && !p.remove("lr").contains("lr"))
    // merge: right side wins on conflicts (the reference contract)
    val merged = p.merge(Params.empty.set("k", 9).set("extra", true))
    assert(merged.get[Int]("k") == 9 && merged.get[Boolean]("extra"))
    // json roundtrip preserves values and types
    val back = Params.fromJson(p.toJson)
    assert(back == p, s"${back.toJson} != ${p.toJson}")
    assert(back.get[Int]("k") == 4 && back.get[Double]("lr") == 0.5 &&
      back.get[Seq[Double]]("dims") == Seq(1.0, 2.0))
    // non-serializable values are a named error
    val e = intercept[RuntimeException](
      Params.empty.set("bad", new Object).toJson)
    assert(e.getMessage.contains("JSON-serializable"))
    // integral width is STABLE through the round trip: a Long param (even
    // one that fits in Int) still satisfies get[Long] after fromJson, and a
    // stored Int satisfies get[Long] (JSON can't tell the widths apart, so
    // get coerces range-checked)
    val lp = Params.empty.set("n", 7L).set("big", 1L << 40)
    val lback = Params.fromJson(lp.toJson)
    assert(lback.get[Long]("n") == 7L && lback.get[Long]("big") == (1L << 40))
    assert(lback.get[Int]("n") == 7)
    val eo = intercept[RuntimeException](lback.get[Int]("big"))
    assert(eo.getMessage.contains("does not fit"), eo.getMessage)
    // integral-ELEMENT sequences are outside the documented contract
    // (double/string seqs) and would come back width-unstable — named
    // error at save, not a ClassCastException later at element access
    val es = intercept[RuntimeException](
      Params.empty.set("xs", Seq(1L, 2L)).toJson)
    assert(es.getMessage.contains("width-stably"), es.getMessage)
    // non-finite doubles are rejected AT SAVE with a named error (they
    // would render as invalid JSON and only fail later, at load)
    val en = intercept[RuntimeException](
      Params.empty.set("x", Double.NaN).toJson)
    assert(en.getMessage.contains("non-finite"), en.getMessage)
    val ei = intercept[RuntimeException](MlJson.stageJson(
      new StandardScalerModel("a", "b", Array(1.0, Double.PositiveInfinity), Array(1.0, 1.0))))
    assert(ei.getMessage.contains("non-finite"), ei.getMessage)
  }

  test("KMeansModel: null features score the documented -1 fallback") {
    val m = new KMeansModel("v", "pred", Array(Array(0.0, 0.0), Array(10.0, 10.0)))
    val df = spark.createDataFrame(
      java.util.List.of(
        org.apache.spark.sql.Row(1L, Seq(9.0, 9.0)),
        org.apache.spark.sql.Row(2L, null)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)))))
    val out = m.transform(df).select("id", "pred").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out == Map(1L -> 1, 2L -> -1), out.toString)
  }

  test("file persistence through the Hadoop FS API: save -> load -> " +
       "bit-identical transform") {
    import graft.ml.PipelineStage.StageFileOps
    val pipe = new Pipeline()
      .appendStage(new StandardScaler("embedding", "scaled"))
      .appendStage(new KMeans("vec_id", "scaled", "cluster", k = 3, iters = 3))
    val model = pipe.fit(embeddings)
    val path = java.nio.file.Files.createTempDirectory("ml_save").toString + "/model.json"
    model.saveJson(spark, path)
    val back = PipelineModel.loadJsonFile(spark, path)
    val a = model.transform(embeddings).select("vec_id", "cluster")
      .as[(Long, Int)].collect().toMap
    val b = back.transform(embeddings).select("vec_id", "cluster")
      .as[(Long, Int)].collect().toMap
    assert(a == b)
    // the unfitted pipeline saves/loads through the same path
    pipe.saveJson(spark, path) // overwrite
    assert(Pipeline.loadJsonFile(spark, path).needFit)
  }

  test("unknown stage class in JSON is a named error") {
    val e = intercept[RuntimeException](MlJson.loadStage(
      """{"stage":"com.example.NotAStage","params":{}}"""))
    assert(e.getMessage.contains("unknown pipeline stage"))
  }

  test("kmeans argmin is plan-bounded: k = 500 scores correctly (and the " +
       "plan stays O(1) in k — no per-centroid expression chain)") {
    val d = 4
    val rnd = new scala.util.Random(7)
    val cents = Array.fill(500)(Array.fill(d)(rnd.nextDouble() * 10))
    val pts = (1L to 200L).map(i => (i, Seq.fill(d)(rnd.nextDouble() * 10)))
    val df = pts.toDF("id", "v")
    val model = new KMeansModel("v", "c", cents)
    val got = model.transform(df).select(col("id"), col("c"))
      .as[(Long, Int)].collect().toMap
    // brute-force argmin with the same lowest-index tie-break
    def ref(x: Seq[Double]): Int = cents.zipWithIndex.minBy { case (c, i) =>
      (c.zip(x).map { case (a, b) => (a - b) * (a - b) }.sum, i) }._2
    pts.foreach { case (i, v) => assert(got(i) == ref(v), s"id $i") }
    // the EXPRESSION TREE is O(1) in k: one transform-lambda over the
    // centroid-matrix literal (the old per-centroid chain put k distance
    // expressions in the plan — 500 zip_with nodes, not 1)
    // analyzed plan (optimization constant-folds the local test relation):
    // the dists expression appears twice (array_position + array_min),
    // each with ONE zip_with — independent of k, where the old chain had k
    val plan = model.transform(df).queryExecution.analyzed.toString
    assert("(?i)zip_with".r.findAllIn(plan).length == 2, plan.take(500))
  }
}
