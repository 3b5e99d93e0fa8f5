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

  /** INT8 scalar quantization of an embedding column: symmetric per-vector
    * scale (max |component|), `q_i = floor(v_i * 127 / scale + 0.5)` —
    * floor(x + 0.5) instead of round() because HALF_UP tie handling differs
    * across engines while floor does not. The quantized components are
    * integer-valued and every quantized dot product / norm stays exactly
    * representable in doubles, so quantized scores are bit-identical
    * cross-engine (the property the s04 oracle relies on). */
  def quantize(emb: DataFrame, idCol: String, embCol: String): DataFrame =
    emb.select(col(idCol).as("id"), asDouble(col(embCol)).as("v"))
      .withColumn("scale", greatest(aggregate(
        transform(col("v"), x => abs(x)), lit(0.0),
        (a, b) => greatest(a, b)), lit(1e-12)))
      // floor() returns BIGINT: cast each component back to double so the
      // codegen'd ArrayDotProduct reads real doubles (integer-valued, exact)
      .withColumn("q", transform(col("v"),
        x => floor(x * lit(127.0) / col("scale") + lit(0.5)).cast("double")))
      .withColumn("qn", norm(col("q")))
      .select(col("id"), col("q"), col("qn"))

  /** Quantized brute-force top-k — the memory-bandwidth path of a 100 TB
    * vector scan (int8 storage is 4× smaller than float32; the ranking
    * metric is the quantized cosine). Same candidate discipline as
    * [[annTopK]]; compose with the LSH/IVF candidate generators for the
    * full ANN stack. */
  def annTopKQuantized(emb: DataFrame, idCol: String, embCol: String,
                       queryPred: Column, k: Int): DataFrame = {
    val e = quantize(emb, idCol, embCol)
    val q = e.filter(queryPred).select(col("id").as("query_id"),
      col("q").as("qq"), col("qn").as("qqn"))
    val pairs = q.join(e, col("id") =!= col("query_id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        round(dot(col("qq"), col("q")) / (col("qqn") * col("qn")), 6).as("qcos"))
    topNPerGroup(pairs, Seq(col("query_id")),
      Seq(col("qcos").desc, col("neighbor_id")), k)
  }
}
