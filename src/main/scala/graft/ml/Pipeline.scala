package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** The Flink ML Pipeline API analog (reference flink-ml-parent/flink-ml-api:
  * `Pipeline.java`, `Estimator.java`, `Transformer.java`, `Model.java`,
  * `Params.java`/`WithParams.java`; flink-ml-lib ships the base classes,
  * linalg utilities, and `MultivariateGaussian.java` — Flink 1.10 contains
  * NO concrete estimators, the old DataSet flink-ml library having been
  * dropped before this release).
  *
  * Spark-first mapping: Flink's 1.10 API is explicitly modeled on the
  * scikit/Spark ML shape (fit/transform over tables), so the analog is a
  * thin trait set over `DataFrame` — and the concrete stages below go
  * BEYOND the reference's empty surface by wiring the engine's own
  * distributed operators into it ([[graft.operators.Iterate.kmeansCentroids]]),
  * proving a user's pipeline code has somewhere to run:
  *
  *  - [[StandardScaler]] → [[StandardScalerModel]]: one distributed
  *    aggregate for (mean, std) per dimension (posexplode + hash agg; the
  *    collected model is d doubles), scoring via `zip_with` over array
  *    literals — whole-stage codegen, zero shuffles, no UDF.
  *  - [[KMeans]] → [[KMeansModel]]: centroids from the engine's iterative
  *    k-means (broadcast centroids + map-side argmin per superstep);
  *    scoring is a PURE EXPRESSION — the centroid matrix as ONE 2-D array
  *    literal, per-centroid squared distances via a `transform` over it,
  *    argmin via `array_position(dists, array_min(dists))`. No join, no
  *    shuffle, and the plan is O(1) in k (no per-centroid expression
  *    chain to blow the 64 KB codegen limits at production k): exactly
  *    what a 100 TB scoring pass needs.
  *  - [[MultivariateGaussian]]: the one concrete math class in
  *    flink-ml-lib, as a scoring Transformer — Σ⁻¹ and log|Σ| computed
  *    once driver-side (Breeze, as the reference uses its own DenseMatrix
  *    pinv), the per-row quadratic form u·Σ⁻¹u again a pure nested
  *    `transform`/`aggregate` expression over array literals.
  *
  * [[Pipeline]] mirrors the reference's contract: it is an Estimator, a
  * Transformer, AND a Model (`Pipeline.java` implements all three);
  * `fit` folds stages left-to-right fitting estimators on the
  * progressively-transformed frame (the reference's `Pipeline#fit` loop),
  * and `transform` on an unfitted pipeline containing estimators is a
  * NAMED error exactly as the reference throws. */
/** The reference `Params.java` member set (flink-ml-api/.../misc/param/
  * Params.java: size/isEmpty/get/set/remove/contains/merge/toJson/fromJson;
  * clear and clone fall away under immutability — `Params.empty` and
  * structural sharing are their Scala spellings). Values are restricted to
  * JSON-able shapes (string/boolean/numeric, plus double/string sequences)
  * exactly where the reference restricts to jackson-serializable ones. */
final class Params private (private val m: Map[String, Any]) {
  def set[T](key: String, value: T): Params = new Params(m + (key -> value))
  /** JSON cannot distinguish Int from Long, so a persisted integral param
    * may come back in either width; `get` coerces between the two (range-
    * checked) so `get[Long]`/`get[Int]` are stable across a
    * toJson→fromJson round trip. No silent float↔integral coercion. */
  def get[T](key: String)(implicit ct: scala.reflect.ClassTag[T]): T =
    Params.coerce[T](key, m.getOrElse(key,
      sys.error(s"param '$key' is not set and has no default")))
  def getOrElse[T](key: String, default: => T)(implicit ct: scala.reflect.ClassTag[T]): T =
    m.get(key).map(Params.coerce[T](key, _)).getOrElse(default)
  def contains(key: String): Boolean = m.contains(key)
  def size: Int = m.size
  def isEmpty: Boolean = m.isEmpty
  def remove(key: String): Params = new Params(m - key)
  /** Right side wins on key conflicts — the reference's merge contract. */
  def merge(other: Params): Params = new Params(m ++ other.m)
  def toJson: String = {
    def j(v: Any): JValue = v match {
      case s: String => JString(s)
      case b: Boolean => JBool(b)
      case i: Int => JInt(i)
      case l: Long => JInt(l)
      case d: Double => MlJson.finite(d)
      case xs: Seq[_] =>
        // the documented sequence contract is double/string seqs — an
        // integral-element seq would come back width-unstable (JSON holds
        // no element width and the scalar Int↔Long coercion cannot see
        // through the erased element type), so it is a NAMED error here,
        // at save, not a ClassCastException later at the use site
        xs.find(x => x.isInstanceOf[Int] || x.isInstanceOf[Long]).foreach(x =>
          sys.error(s"integral-element sequences do not round-trip " +
            s"width-stably through JSON (found ${x.getClass.getSimpleName} " +
            "element) — use Seq[Double] or Seq[String] (the documented " +
            "sequence shapes)"))
        JArray(xs.map(j).toList)
      case other => sys.error(s"param value ${other.getClass.getName} is not " +
        "JSON-serializable (string/boolean/numeric/seq are)")
    }
    JsonMethods.compact(JsonMethods.render(
      JObject(m.toList.sortBy(_._1).map { case (k, v) => k -> j(v) })))
  }
  override def equals(o: Any): Boolean = o match {
    case p: Params => p.m == m
    case _ => false
  }
  override def hashCode: Int = m.hashCode
}
object Params {
  val empty: Params = new Params(Map.empty)
  /** Integral-width coercion for [[Params.get]]: a stored Int satisfies
    * `get[Long]` and a stored Long satisfies `get[Int]` iff it fits. */
  private[ml] def coerce[T](key: String, raw: Any)(
      implicit ct: scala.reflect.ClassTag[T]): T = {
    val want = ct.runtimeClass
    val out: Any = raw match {
      case i: Int if want == classOf[Long] || want == classOf[java.lang.Long] =>
        i.toLong
      case l: Long if want == classOf[Int] || want == classOf[java.lang.Integer] =>
        if (l.isValidInt) l.toInt
        else sys.error(s"param '$key' holds Long $l which does not fit in Int")
      case other => other
    }
    out.asInstanceOf[T]
  }
  def fromJson(json: String): Params = {
    def v(x: JValue): Any = x match {
      case JString(s) => s
      case JBool(b) => b
      case JInt(n) => if (n.isValidInt) n.toInt else n.toLong
      case JDouble(d) => d
      case JDecimal(d) => d.toDouble
      case JArray(xs) => xs.map(v)
      case other => sys.error(s"unsupported param JSON value $other")
    }
    JsonMethods.parse(json) match {
      case JObject(fields) =>
        new Params(fields.map { case (k, x) => k -> v(x) }.toMap)
      case other => sys.error(s"Params JSON must be an object, got $other")
    }
  }
}

sealed trait PipelineStage {
  /** The reference `PipelineStage#toJson` contract
    * (flink-ml-parent/flink-ml-api/.../core/Pipeline.java:212-263 — each
    * stage serializes its parameters; the pipeline serializes the stage
    * list): this stage as a self-describing JSON string, reloadable via
    * [[MlJson.loadStage]]. */
  def toJson: String = JsonMethods.compact(JsonMethods.render(MlJson.stageJson(this)))
}
trait Transformer extends PipelineStage {
  def transform(df: DataFrame): DataFrame
}
object PipelineStage {
  implicit final class StageFileOps(private val s: PipelineStage) extends AnyVal {
    /** Persist [[PipelineStage.toJson]] to a file through the Hadoop FS
      * API — HDFS/S3 paths work on a real cluster, not just local files
      * (convenience beyond the reference's string-only contract). */
    def saveJson(spark: org.apache.spark.sql.SparkSession, path: String): Unit =
      MlJson.writeFile(spark, path, s.toJson)
  }
}
trait Model extends Transformer
trait Estimator[+M <: Model] extends PipelineStage {
  def fit(df: DataFrame): M
}

final class Pipeline(val stages: Vector[PipelineStage] = Vector.empty)
    extends Estimator[PipelineModel] with Model {
  def appendStage(stage: PipelineStage): Pipeline = new Pipeline(stages :+ stage)
  def needFit: Boolean = stages.exists(_.isInstanceOf[Estimator[_]])

  override def fit(df: DataFrame): PipelineModel = {
    var cur = df
    val fitted = stages.map {
      case e: Estimator[_] =>
        val model = e.fit(cur)
        cur = model.transform(cur)
        model
      case t: Transformer =>
        cur = t.transform(cur)
        t
    }
    new PipelineModel(fitted)
  }

  override def transform(df: DataFrame): DataFrame = {
    require(!needFit, "this pipeline contains unfitted Estimator stages — " +
      "call fit(...) first (the reference Pipeline#transform throws the same way)")
    stages.foldLeft(df) { case (d, t: Transformer) => t.transform(d); case (d, _) => d }
  }
}

object Pipeline {
  /** The reference `Pipeline#loadJson` (Pipeline.java:212-263): rebuild a
    * pipeline from the serialized stage list. */
  def loadJson(json: String): Pipeline = MlJson.loadStage(json) match {
    case p: Pipeline => p
    case other => sys.error(s"not a Pipeline JSON: ${other.getClass.getName}")
  }
  def loadJsonFile(spark: org.apache.spark.sql.SparkSession, path: String): Pipeline =
    loadJson(MlJson.readFile(spark, path))
}

final class PipelineModel(val stages: Vector[Transformer]) extends Model {
  override def transform(df: DataFrame): DataFrame =
    stages.foldLeft(df)((d, t) => t.transform(d))
}

object PipelineModel {
  def loadJson(json: String): PipelineModel = MlJson.loadStage(json) match {
    case p: PipelineModel => p
    case other => sys.error(s"not a PipelineModel JSON: ${other.getClass.getName}")
  }
  def loadJsonFile(spark: org.apache.spark.sql.SparkSession, path: String): PipelineModel =
    loadJson(MlJson.readFile(spark, path))
}

/** Per-dimension standardization over an `array<double>` column. */
final class StandardScaler(val inputCol: String, val outputCol: String)
    extends Estimator[StandardScalerModel] {
  override def fit(df: DataFrame): StandardScalerModel = {
    val stats = df.select(posexplode(col(inputCol).cast("array<double>")).as(Seq("dim", "x")))
      .groupBy("dim").agg(avg("x").as("mu"), stddev_pop("x").as("sd"))
      .orderBy("dim").collect()
    new StandardScalerModel(inputCol, outputCol,
      stats.map(_.getDouble(1)), stats.map(r => math.max(r.getDouble(2), 1e-12)))
  }
}

final class StandardScalerModel(val inputCol: String, val outputCol: String,
                                val means: Array[Double], val stds: Array[Double])
    extends Model {
  override def transform(df: DataFrame): DataFrame = {
    val centered = zip_with(col(inputCol).cast("array<double>"),
      typedlit(means.toSeq), (x, m) => x - m)
    df.withColumn(outputCol,
      zip_with(centered, typedlit(stds.toSeq), (x, s) => x / s))
  }
}

/** K-means over an `array<double>` column, fit by the engine's iterative
  * centroids; scoring is expression-only (no join, no shuffle). */
final class KMeans(val idCol: String, val featuresCol: String,
                   val predictionCol: String, val k: Int, val iters: Int)
    extends Estimator[KMeansModel] {
  override def fit(df: DataFrame): KMeansModel = {
    val cents = graft.operators.Iterate
      .kmeansCentroids(df, idCol, featuresCol, k, iters - 1)
      .orderBy("cid").collect()
      .map(r => r.getSeq[Double](1).toArray)
    new KMeansModel(featuresCol, predictionCol, cents)
  }
}

final class KMeansModel(val featuresCol: String, val predictionCol: String,
                        val centroids: Array[Array[Double]]) extends Model {
  override def transform(df: DataFrame): DataFrame = {
    val feat = col(featuresCol).cast("array<double>")
    // the centroid MATRIX is one 2-D literal and the per-centroid distances
    // one `transform` over it — plan size is O(1) in k (a per-centroid
    // expression chain hits the 64 KB codegen/constant-pool limits at
    // production k in the hundreds), and `array_position` takes the FIRST
    // minimum, i.e. equal-distance ties go to the LOWEST cluster id — the
    // same (d2, cid) order the engine's kmeans assignment minimizes
    val cmat = typedlit(centroids.map(_.toSeq).toSeq)
    val dists = org.apache.spark.sql.functions.transform(cmat, c =>
      aggregate(zip_with(feat, c, (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, v) => acc + v))
    // coalesce keeps the documented -1 fallback on null features (the
    // array_position path alone would yield NULL, changing `pred >= 0` filters)
    df.withColumn(predictionCol,
      coalesce((array_position(dists, array_min(dists)) - 1).cast("int"), lit(-1)))
  }
}

/** `MultivariateGaussian.java`'s surface as a scoring Transformer: adds the
  * log-density of the array column under N(mean, cov). Σ⁻¹ / log|Σ| once on
  * the driver; the row quadratic form is a nested array expression. */
final class MultivariateGaussian(val inputCol: String, val outputCol: String,
                                 val mean: Array[Double], val cov: Array[Array[Double]])
    extends Transformer {
  private val d = mean.length
  private val (inv: Array[Array[Double]], logDet: Double) = {
    val m = breeze.linalg.DenseMatrix.tabulate(d, d)((i, j) => cov(i)(j))
    val invM = breeze.linalg.inv(m)
    val (_, ld) = breeze.linalg.logdet(m)
    (Array.tabulate(d, d)((i, j) => invM(i, j)), ld)
  }
  private val logNorm = -0.5 * (d * math.log(2 * math.Pi) + logDet)

  override def transform(df: DataFrame): DataFrame = {
    val u = zip_with(col(inputCol).cast("array<double>"),
      typedlit(mean.toSeq), (x, m) => x - m)
    val invLit = typedlit(inv.map(_.toSeq).toSeq)
    // quad = Σ_i u_i · (Σ_j inv[i][j] · u_j), as transform-with-index +
    // inner dot product — element_at is 1-based
    // fully qualified: Transformer#transform shadows functions.transform here
    val rowDots = org.apache.spark.sql.functions.transform(u, (ui, i) =>
      ui * aggregate(zip_with(element_at(invLit, i + 1), u, (a, b) => a * b),
        lit(0.0), (acc, v) => acc + v))
    val quad = aggregate(rowDots, lit(0.0), (acc, v) => acc + v)
    df.withColumn(outputCol, lit(logNorm) - lit(0.5) * quad)
  }
}

/** Stage (de)serialization — the reference persistence contract
  * (flink-ml-parent/flink-ml-api/.../core/Pipeline.java:212-263:
  * `toJson()` writes the stage list, each stage as its class name plus its
  * parameter JSON; `loadJson()` reinstantiates each stage and restores its
  * params). Same shape here: `{"stage": <FQCN>, "params": {…}}`, pipelines
  * nesting their stage arrays. Doubles round-trip bit-exactly (Jackson
  * emits the shortest uniquely-parsing decimal), so a reloaded model's
  * transform output is bit-identical to the original's. */
object MlJson {
  /** Reject non-finite doubles AT SAVE TIME with a named error — json4s
    * renders NaN/Infinity as bare tokens, which is invalid JSON that only
    * fails later, as a parse error inside loadStage. */
  private[ml] def finite(d: Double): JDouble =
    if (java.lang.Double.isFinite(d)) JDouble(d)
    else sys.error(s"non-finite double $d is not JSON-serializable — " +
      "refusing at save time (it would render as invalid JSON and fail at load)")
  private def darr(a: Array[Double]): JArray = JArray(a.map(finite).toList)
  private def dmat(m: Array[Array[Double]]): JArray = JArray(m.map(darr).toList)

  def stageJson(s: PipelineStage): JValue = {
    def wrap(params: List[(String, JValue)]): JValue =
      JObject("stage" -> JString(s.getClass.getName), "params" -> JObject(params))
    s match {
      case p: Pipeline => wrap(List("stages" -> JArray(p.stages.map(stageJson).toList)))
      case p: PipelineModel => wrap(List("stages" -> JArray(p.stages.map(stageJson).toList)))
      case t: StandardScaler => wrap(List(
        "inputCol" -> JString(t.inputCol), "outputCol" -> JString(t.outputCol)))
      case t: StandardScalerModel => wrap(List(
        "inputCol" -> JString(t.inputCol), "outputCol" -> JString(t.outputCol),
        "means" -> darr(t.means), "stds" -> darr(t.stds)))
      case t: KMeans => wrap(List(
        "idCol" -> JString(t.idCol), "featuresCol" -> JString(t.featuresCol),
        "predictionCol" -> JString(t.predictionCol),
        "k" -> JInt(t.k), "iters" -> JInt(t.iters)))
      case t: KMeansModel => wrap(List(
        "featuresCol" -> JString(t.featuresCol),
        "predictionCol" -> JString(t.predictionCol),
        "centroids" -> dmat(t.centroids)))
      case t: MultivariateGaussian => wrap(List(
        "inputCol" -> JString(t.inputCol), "outputCol" -> JString(t.outputCol),
        "mean" -> darr(t.mean), "cov" -> dmat(t.cov)))
      case other => sys.error(s"stage ${other.getClass.getName} has no JSON " +
        "serialization — only the built-in stages persist (the reference " +
        "contract likewise requires each stage to implement its own json)")
    }
  }

  def loadStage(json: String): PipelineStage = fromJson(JsonMethods.parse(json))

  private[ml] def writeFile(spark: org.apache.spark.sql.SparkSession,
                            path: String, content: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }

  private[ml] def readFile(spark: org.apache.spark.sql.SparkSession,
                           path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
    finally in.close()
  }

  private def fromJson(j: JValue): PipelineStage = {
    val fields = j match {
      case JObject(f) => f.toMap
      case other => sys.error(s"stage JSON must be an object, got $other")
    }
    def params: Map[String, JValue] = fields.get("params") match {
      case Some(JObject(p)) => p.toMap
      case _ => sys.error("stage JSON missing 'params' object")
    }
    def str(k: String): String = params(k) match {
      case JString(s) => s
      case other => sys.error(s"param '$k': expected string, got $other")
    }
    def int(k: String): Int = params(k) match {
      case JInt(n) => n.toInt
      case other => sys.error(s"param '$k': expected int, got $other")
    }
    def num(v: JValue): Double = v match {
      case JDouble(d) => d
      case JInt(n) => n.toDouble // a whole double serializes as an int lexeme
      case JDecimal(d) => d.toDouble
      case other => sys.error(s"expected number, got $other")
    }
    def arr(k: String): Array[Double] = params(k) match {
      case JArray(xs) => xs.map(num).toArray
      case other => sys.error(s"param '$k': expected array, got $other")
    }
    def mat(k: String): Array[Array[Double]] = params(k) match {
      case JArray(rows) => rows.map {
        case JArray(xs) => xs.map(num).toArray
        case other => sys.error(s"param '$k': expected 2-D array, got row $other")
      }.toArray
      case other => sys.error(s"param '$k': expected 2-D array, got $other")
    }
    def stages: Vector[PipelineStage] = params("stages") match {
      case JArray(xs) => xs.map(fromJson).toVector
      case other => sys.error(s"param 'stages': expected array, got $other")
    }
    fields.get("stage") match {
      case Some(JString(cls)) => cls match {
        case "graft.ml.Pipeline" => new Pipeline(stages)
        case "graft.ml.PipelineModel" => new PipelineModel(stages.map {
          case t: Transformer => t
          case other => sys.error(s"PipelineModel stage is not a Transformer: $other")
        })
        case "graft.ml.StandardScaler" =>
          new StandardScaler(str("inputCol"), str("outputCol"))
        case "graft.ml.StandardScalerModel" =>
          new StandardScalerModel(str("inputCol"), str("outputCol"),
            arr("means"), arr("stds"))
        case "graft.ml.KMeans" =>
          new KMeans(str("idCol"), str("featuresCol"), str("predictionCol"),
            int("k"), int("iters"))
        case "graft.ml.KMeansModel" =>
          new KMeansModel(str("featuresCol"), str("predictionCol"), mat("centroids"))
        case "graft.ml.MultivariateGaussian" =>
          new MultivariateGaussian(str("inputCol"), str("outputCol"),
            arr("mean"), mat("cov"))
        case other => sys.error(s"unknown pipeline stage class '$other'")
      }
      case _ => sys.error("stage JSON missing 'stage' class name")
    }
  }
}
