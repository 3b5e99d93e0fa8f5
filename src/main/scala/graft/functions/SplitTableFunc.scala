package graft.functions

// package-level: Janino-generated encoder code cannot construct
// nested-in-object case classes
case class SplitTok(word: String, pos: Int, len: Int)

/** TABLE function (UDTF) — the reference's TableFunction / LATERAL TABLE
  * surface (flink-table/flink-table-common/src/main/java/org/apache/flink/
  * table/functions/TableFunction.java: user code emits MULTIPLE rows per
  * INPUT ROW through `collect(...)`, joined with `LATERAL TABLE(split(s))`
  * in SQL — the fourth and last user-defined function kind after scalar
  * UDF, AggregateFunction (f08) and TableAggregateFunction (f10)).
  *
  * Spark's analog: a function returning the row set as an array-of-structs,
  * exploded with a generator — `LATERAL VIEW inline(graft_split(text))` from
  * SQL text is the `LATERAL TABLE(split(text))` analog. The generator is a
  * row-local projection (no shuffle, no join): exactly the reference's
  * per-row correlated expansion. The canonical tokenizer example: one
  * (word, 0-based position, length) row per token, `split(s, " ", -1)`
  * semantics (consecutive delimiters yield empty tokens, trailing ones
  * kept) so cross-engine oracles agree on boundary cases.
  */
object SplitTableFunc {
  val eval: String => Array[SplitTok] = s =>
    if (s == null) Array.empty
    else s.split(" ", -1).zipWithIndex.map { case (w, i) =>
      SplitTok(w, i, w.length)
    }
}
