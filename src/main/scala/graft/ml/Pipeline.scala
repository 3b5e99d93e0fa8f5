package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
  *    scoring is a PURE EXPRESSION — per-centroid squared distances via
  *    `aggregate(zip_with(...))` folded into a lowest-index argmin `CASE`
  *    chain. No join, no shuffle: exactly what a 100 TB scoring pass needs.
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
final class Params private (private val m: Map[String, Any]) {
  def set[T](key: String, value: T): Params = new Params(m + (key -> value))
  def get[T](key: String): T = m.getOrElse(key,
    sys.error(s"param '$key' is not set and has no default")).asInstanceOf[T]
  def getOrElse[T](key: String, default: => T): T =
    m.getOrElse(key, default).asInstanceOf[T]
  def contains(key: String): Boolean = m.contains(key)
  def size: Int = m.size
}
object Params { val empty: Params = new Params(Map.empty) }

sealed trait PipelineStage
trait Transformer extends PipelineStage {
  def transform(df: DataFrame): DataFrame
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

final class PipelineModel(val stages: Vector[Transformer]) extends Model {
  override def transform(df: DataFrame): DataFrame =
    stages.foldLeft(df)((d, t) => t.transform(d))
}

/** Per-dimension standardization over an `array<double>` column. */
final class StandardScaler(inputCol: String, outputCol: String)
    extends Estimator[StandardScalerModel] {
  override def fit(df: DataFrame): StandardScalerModel = {
    val stats = df.select(posexplode(col(inputCol).cast("array<double>")).as(Seq("dim", "x")))
      .groupBy("dim").agg(avg("x").as("mu"), stddev_pop("x").as("sd"))
      .orderBy("dim").collect()
    new StandardScalerModel(inputCol, outputCol,
      stats.map(_.getDouble(1)), stats.map(r => math.max(r.getDouble(2), 1e-12)))
  }
}

final class StandardScalerModel(inputCol: String, outputCol: String,
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
final class KMeans(idCol: String, featuresCol: String, predictionCol: String,
                   k: Int, iters: Int) extends Estimator[KMeansModel] {
  override def fit(df: DataFrame): KMeansModel = {
    val cents = graft.operators.Iterate
      .kmeansCentroids(df, idCol, featuresCol, k, iters - 1)
      .orderBy("cid").collect()
      .map(r => r.getSeq[Double](1).toArray)
    new KMeansModel(featuresCol, predictionCol, cents)
  }
}

final class KMeansModel(featuresCol: String, predictionCol: String,
                        val centroids: Array[Array[Double]]) extends Model {
  override def transform(df: DataFrame): DataFrame = {
    val feat = col(featuresCol).cast("array<double>")
    val dists: Seq[Column] = centroids.toSeq.map { c =>
      aggregate(zip_with(feat, typedlit(c.toSeq), (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, v) => acc + v)
    }
    val minD = least(dists: _*)
    // forward when-chain: equal-distance ties take the LOWEST cluster id,
    // the same (d2, cid) order the engine's kmeans assignment minimizes
    val pred = dists.zipWithIndex
      .foldLeft(when(lit(false), lit(-1))) { case (acc, (d, i)) =>
        acc.when(d === minD, lit(i)) }
      .otherwise(lit(-1))
    df.withColumn(predictionCol, pred)
  }
}

/** `MultivariateGaussian.java`'s surface as a scoring Transformer: adds the
  * log-density of the array column under N(mean, cov). Σ⁻¹ / log|Σ| once on
  * the driver; the row quadratic form is a nested array expression. */
final class MultivariateGaussian(inputCol: String, outputCol: String,
                                 mean: Array[Double], cov: Array[Array[Double]])
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
