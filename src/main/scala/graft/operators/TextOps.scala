package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines: language ID, quality scoring,
  * token statistics, document fingerprinting. All codegen'd builtins.
  *
  * The reference exposes the equivalent string/tokenization surface through
  * its scalar function table (flink-table/flink-table-planner-blink/src/main/
  * java/org/apache/flink/table/planner/functions/sql/FlinkSqlOperatorTable
  * .java) and user-defined ScalarFunction
  * (flink-table/flink-table-common/src/main/java/org/apache/flink/table/
  * functions/ScalarFunction.java); here they compose from Spark builtins so
  * whole-stage codegen applies.
  */
object TextOps {

  /** Fixed stopword profiles for the heuristic language guesser. Arbitrary
    * but frozen: the oracle embeds the same lists. */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "fast", "slow"),
    "fr" -> Seq("table", "line", "value", "query"),
    "de" -> Seq("hash", "join", "stream", "data"))

  def tokens(textCol: Column): Column = split(textCol, " ")

  def profileScore(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words: _*)))

  /** Argmax language with tie-break by profile order (en > fr > de). */
  def langGuess(toks: Column): Column = {
    val scores = langProfiles.map { case (l, ws) => l -> profileScore(toks, ws) }
    scores.init.zipWithIndex.foldRight(lit(scores.last._1): Column) {
      case (((l, s), i), elseCol) =>
        val laterScores = scores.drop(i + 1).map(_._2)
        when(laterScores.foldLeft(lit(true): Column)((acc, o) => acc && s >= o), lit(l))
          .otherwise(elseCol)
    }
  }
}
