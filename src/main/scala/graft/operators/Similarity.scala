package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.Relational.topNPerGroup

/** Embedding similarity search: brute-force cosine baseline plus two scale
  * paths (sign-random-projection LSH buckets, IVF cell probing).
  *
  * Dot products use `zip_with` + `aggregate` over `array<double>` — codegen'd
  * builtins with a deterministic left-to-right fold, so DuckDB's `list_sum`
  * reproduces them bit-for-bit. Cosines are rounded to 6 dp before any
  * ranking/threshold so cross-engine ulp noise cannot flip results.
  */
object Similarity {

  def asDouble(embedding: Column): Column = embedding.cast("array<double>")

  /** Codegen'd primitive-loop dot product (graft.functions.ArrayDotProduct);
    * left-to-right sum, bit-identical to `aggregate(zip_with(...))` and to a
    * sequential SQL `list_sum`. */
  def dot(a: Column, b: Column): Column = graft.functions.ArrayDotProduct(a, b)

  def norm(v: Column): Column = sqrt(dot(v, v))

  /** Deterministic ±1 random-projection planes (LCG bit 16), shared with the
    * SQL oracle via [[planeLiterals]]. */
  def planes(nPlanes: Int, dim: Int, seed: Long = 12345L): IndexedSeq[IndexedSeq[Double]] = {
    var x = seed
    IndexedSeq.fill(nPlanes, dim) {
      x = (x * 1103515245L + 12345L) & 0x7fffffffL
      if (((x >> 16) & 1L) == 1L) 1.0 else -1.0
    }
  }

  def planeLiterals(ps: IndexedSeq[IndexedSeq[Double]]): Seq[String] =
    ps.map(_.map(w => if (w > 0) "1.0" else "-1.0").mkString("[", ",", "]"))

  /** Sign-random-projection bucket id (one bit per plane). */
  def srpBucket(v: Column, ps: IndexedSeq[IndexedSeq[Double]]): Column =
    ps.zipWithIndex.map { case (p, i) =>
      val planeCol = array(p.map(lit): _*)
      when(dot(v, planeCol) >= 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)

  /** (id, v, nrm) normalized working set. */
  def prep(emb: DataFrame, idCol: String, embCol: String): DataFrame =
    emb.select(col(idCol).as("id"), asDouble(col(embCol)).as("v"))
      .withColumn("nrm", norm(col("v")))

  /** Brute-force top-k cosine neighbors for each query row.
    * `queryPred` is a predicate over the `id` column selecting query rows. */
  def annTopK(emb: DataFrame, idCol: String, embCol: String,
              queryPred: Column, k: Int): DataFrame = {
    val e = prep(emb, idCol, embCol)
    val q = e.filter(queryPred).select(col("id").as("query_id"),
      col("v").as("qv"), col("nrm").as("qn"))
    val pairs = q.join(e, col("id") =!= col("query_id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        round(dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 6).as("cosine"))
    topNPerGroup(pairs, Seq(col("query_id")),
      Seq(col("cosine").desc, col("neighbor_id")), k)
  }
}
