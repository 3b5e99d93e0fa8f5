package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BIPARTITE graph projections — the flink-gelly bipartite package
  * (reference flink-libraries/flink-gelly/src/main/java/org/apache/flink/
  * graph/bipartite/{BipartiteGraph,BipartiteEdge,Projection}.java): a
  * bipartite graph is the edge relation (top, bottom, value); projections
  * connect two top (resp. bottom) vertices once PER SHARED opposite-side
  * vertex, exactly the reference's edges-self-join semantics.
  *
  *  - SIMPLE projection: the self-join keyed on the shared side, distinct
  *    endpoints, output edge carrying both original edge values — the
  *    reference's `projectionTopSimple`/`projectionBottomSimple`
  *    FlatJoin shape, as one keyed equi-join (ordered pairs, both
  *    directions, one row per connecting vertex — duplicates across
  *    different connectors are PRESERVED as there).
  *  - FULL projection: the same join over edges pre-joined with both
  *    vertex tables; output mirrors the reference's `Projection` value —
  *    connecting (intermediate) vertex id + value, source/target vertex
  *    values, source/target edge values.
  *
  * Scale shape: ONE shuffle on the shared-side key; output is
  * Σ deg·(deg−1) over the shared side — the reference's own blow-up. A
  * hub vertex on the shared side dominates exactly as it does there, so
  * every projection takes `maxDegree`: shared-side vertices of degree
  * above the cap are DROPPED before the self-join (the d02 hot-bucket cap
  * policy — a hub connecting "everything to everything" carries no
  * discriminating signal, and its Σdeg² output would swamp the job). The
  * cap is a windowed count over EXACTLY the join key, so the one shuffle
  * that sizes the degrees also co-partitions the join. Default = no cap,
  * the reference's exact semantics. */
object Bipartite {

  private val NoCap = Long.MaxValue

  /** Drop rows whose `keyCol` value occurs more than `maxDegree` times —
    * the windowed count rides the join-key shuffle (no extra exchange). */
  private def capped(edges: DataFrame, keyCol: String, maxDegree: Long): DataFrame =
    if (maxDegree == NoCap) edges
    else {
      val w = org.apache.spark.sql.expressions.Window.partitionBy(keyCol)
      edges.withColumn("__deg", count(lit(1)).over(w))
        .filter(col("__deg") <= maxDegree).drop("__deg")
    }

  /** (src, dst, src_edge_value, dst_edge_value): top vertices linked once
    * per shared bottom vertex. */
  def projectionTopSimple(edges: DataFrame, topCol: String, bottomCol: String,
                          evCol: String, maxDegree: Long = NoCap): DataFrame =
    simple(edges, joinOn = bottomCol, project = topCol, evCol, maxDegree)

  /** Bottom twin of [[projectionTopSimple]]. */
  def projectionBottomSimple(edges: DataFrame, topCol: String, bottomCol: String,
                             evCol: String, maxDegree: Long = NoCap): DataFrame =
    simple(edges, joinOn = topCol, project = bottomCol, evCol, maxDegree)

  private def simple(edges: DataFrame, joinOn: String, project: String,
                     evCol: String, maxDegree: Long): DataFrame = {
    val e = capped(edges, joinOn, maxDegree)
    val a = e.select(col(joinOn).as("k"), col(project).as("src"),
      col(evCol).as("src_edge_value"))
    val b = e.select(col(joinOn).as("k2"), col(project).as("dst"),
      col(evCol).as("dst_edge_value"))
    a.join(b, col("k") === col("k2") && col("src") =!= col("dst"))
      .select(col("src"), col("dst"), col("src_edge_value"), col("dst_edge_value"))
  }

  /** (src, dst, intermediate, intermediate_value, src_value, dst_value,
    * src_edge_value, dst_edge_value): the reference's full `Projection`
    * edge value, flattened. `topVerts`/`bottomVerts` are (id, value). */
  def projectionTopFull(edges: DataFrame, topCol: String, bottomCol: String,
                        evCol: String, topVerts: DataFrame,
                        bottomVerts: DataFrame, maxDegree: Long = NoCap): DataFrame =
    full(edges, topCol, bottomCol, evCol, topVerts, bottomVerts,
      joinOnBottom = true, maxDegree)

  /** Bottom twin of [[projectionTopFull]] (intermediates are TOP vertices). */
  def projectionBottomFull(edges: DataFrame, topCol: String, bottomCol: String,
                           evCol: String, topVerts: DataFrame,
                           bottomVerts: DataFrame, maxDegree: Long = NoCap): DataFrame =
    full(edges, topCol, bottomCol, evCol, topVerts, bottomVerts,
      joinOnBottom = false, maxDegree)

  private def full(edges: DataFrame, topCol: String, bottomCol: String,
                   evCol: String, topVerts: DataFrame, bottomVerts: DataFrame,
                   joinOnBottom: Boolean, maxDegree: Long): DataFrame = {
    def verts(df: DataFrame, id: String, v: String) =
      df.select(col(df.columns(0)).as(id), col(df.columns(1)).as(v))
    // the reference's joinEdgeWithVertices: each edge annotated with BOTH
    // endpoint values before the projection self-join (the degree cap runs
    // FIRST — no point annotating edges the cap drops)
    val e = capped(edges, if (joinOnBottom) bottomCol else topCol, maxDegree)
    val ewv = e.select(col(topCol).as("t"), col(bottomCol).as("b"), col(evCol).as("ev"))
      .join(verts(topVerts, "t", "tv"), Seq("t"))
      .join(verts(bottomVerts, "b", "bv"), Seq("b"))
    val (k, proj, projV, interV) =
      if (joinOnBottom) ("b", "t", "tv", "bv") else ("t", "b", "bv", "tv")
    val a = ewv.select(col(k).as("k"), col(proj).as("src"), col(projV).as("src_value"),
      col(interV).as("intermediate_value"), col("ev").as("src_edge_value"))
    val b = ewv.select(col(k).as("k2"), col(proj).as("dst"), col(projV).as("dst_value"),
      col("ev").as("dst_edge_value"))
    a.join(b, col("k") === col("k2") && col("src") =!= col("dst"))
      .select(col("src"), col("dst"), col("k").as("intermediate"),
        col("intermediate_value"), col("src_value"), col("dst_value"),
        col("src_edge_value"), col("dst_edge_value"))
  }
}
