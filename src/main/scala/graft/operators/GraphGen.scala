package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph GENERATORS — the flink-gelly generator package (reference
  * flink-libraries/flink-gelly/src/main/java/org/apache/flink/graph/
  * generator/{CompleteGraph,CycleGraph,PathGraph,StarGraph,CirculantGraph,
  * EchoGraph,GridGraph,HypercubeGraph,SingletonEdgeGraph,EmptyGraph,
  * RMatGraph}.java): deterministic, fully DISTRIBUTED edge-list synthesis
  * from `spark.range` + closed-form expressions — no driver loops, no
  * collected state, codegen end to end. Every generator emits the directed
  * edge list the reference emits (symmetric pairs for the undirected
  * shapes), as (src, dst) LongType columns.
  *
  * The RMat generator follows the reference's recursive-matrix recursion
  * (Chakrabarti et al.), with one deliberate refinement: the reference
  * draws from a seeded JDK/MersenneTwister stream, which is partition-
  * order-dependent; here each (edge, level) quadrant choice is a pure
  * function `xxhash64(edgeId, level, seed)` — the SAME graph regardless of
  * partitioning or cluster size, which is the property a 100 TB scale
  * harness actually needs from a generator. Noise smoothing is not
  * replicated (pinned a/b/c probabilities; the reference's noise is a
  * randomized perturbation of the same parameters). */
object GraphGen {

  /** 0..n-1 as an (id) relation — GraphGeneratorUtils.vertexSequence. */
  def vertices(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(col("id"))

  /** EmptyGraph: n vertices, no edges (the empty (src, dst) relation). */
  def empty(spark: SparkSession): DataFrame =
    spark.range(0).select(col("id").as("src"), col("id").as("dst"))

  /** CompleteGraph: every ordered pair (i, j), i ≠ j — O(n²) rows by
    * definition; both range sides partition, so generation is distributed
    * even though the output is quadratic. */
  def complete(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(col("id").as("src"))
      .crossJoin(spark.range(n).select(col("id").as("dst")))
      .filter(col("src") =!= col("dst"))

  /** CirculantGraph: v → (v + o) mod n for every offset o (the reference's
    * flattened offset ranges; offsets must lie in [1, n-1]). */
  def circulant(spark: SparkSession, n: Long, offsets: Seq[Long]): DataFrame = {
    require(offsets.nonEmpty && offsets.forall(o => o >= 1 && o < n),
      s"circulant offsets must be in [1, ${n - 1}]")
    val offCol = explode(typedlit(offsets)).as("off")
    spark.range(n).select(col("id").as("src"), offCol)
      .select(col("src"), ((col("src") + col("off")) % n).as("dst"))
  }

  /** CycleGraph: the ±1 circulant (each vertex links both neighbors). */
  def cycle(spark: SparkSession, n: Long): DataFrame =
    circulant(spark, n, Seq(1L, n - 1))

  /** EchoGraph: the reference's centered circulant — offsets
    * (n − d + 1)/2 … +d, every vertex linked to its d 'opposite' vertices. */
  def echo(spark: SparkSession, n: Long, vertexDegree: Long): DataFrame = {
    val start = (n - vertexDegree + 1) / 2
    circulant(spark, n, (start until start + vertexDegree).toSeq)
  }

  /** PathGraph: v ↔ v+1 chain. */
  def path(spark: SparkSession, n: Long): DataFrame =
    spark.range(n - 1).select(col("id").as("src"), (col("id") + 1).as("dst"))
      .union(spark.range(n - 1).select((col("id") + 1).as("src"), col("id").as("dst")))

  /** StarGraph: hub 0 ↔ every other vertex. */
  def star(spark: SparkSession, n: Long): DataFrame =
    spark.range(1, n).select(lit(0L).as("src"), col("id").as("dst"))
      .union(spark.range(1, n).select(col("id").as("src"), lit(0L).as("dst")))

  /** SingletonEdgeGraph: n disjoint symmetric pairs (2i ↔ 2i+1). */
  def singletonEdge(spark: SparkSession, pairs: Long): DataFrame =
    spark.range(pairs).select((col("id") * 2).as("src"), (col("id") * 2 + 1).as("dst"))
      .union(spark.range(pairs).select((col("id") * 2 + 1).as("src"), (col("id") * 2).as("dst")))

  /** GridGraph: dims = (size, wrap) per dimension; vertex ids are the
    * mixed-radix encoding, each vertex linked to its ±1 neighbor in every
    * dimension (wrap closes the ends; the reference rejects wrap on
    * size ≤ 2, where the wrap edge duplicates the chain edge). */
  def grid(spark: SparkSession, dims: Seq[(Long, Boolean)]): DataFrame = {
    require(dims.nonEmpty, "grid needs at least one dimension")
    dims.foreach { case (sz, wrap) =>
      require(sz >= 2, "grid dimensions need size >= 2")
      require(!wrap || sz > 2, "wrap on size <= 2 duplicates the chain edge")
    }
    val n = dims.map(_._1).product
    val base = spark.range(n)
    // stride of dim k = product of earlier dim sizes
    val strides = dims.scanLeft(1L) { case (acc, (sz, _)) => acc * sz }
    val parts = dims.zipWithIndex.flatMap { case ((sz, wrap), k) =>
      val stride = strides(k)
      val coord = (col("id") / stride % sz).cast("long")
      val fwd = base.filter(coord < sz - 1)
        .select(col("id").as("src"), (col("id") + stride).as("dst"))
      val bwd = base.filter(coord > 0)
        .select(col("id").as("src"), (col("id") - stride).as("dst"))
      val wrapEdges = if (!wrap) Nil else Seq(
        base.filter(coord === sz - 1)
          .select(col("id").as("src"), (col("id") - (sz - 1) * stride).as("dst")),
        base.filter(coord === 0)
          .select(col("id").as("src"), (col("id") + (sz - 1) * stride).as("dst")))
      Seq(fwd, bwd) ++ wrapEdges
    }
    parts.reduce(_ union _)
  }

  /** HypercubeGraph: 2^d vertices, v ↔ v XOR 2^b for every bit b. */
  def hypercube(spark: SparkSession, d: Int): DataFrame = {
    require(d >= 1, "hypercube needs dimension >= 1")
    val bits = explode(typedlit((0 until d).map(b => 1L << b))).as("bit")
    spark.range(1L << d).select(col("id").as("src"), bits)
      .select(col("src"), expr("src ^ bit").as("dst"))
  }

  /** RMatGraph (Chakrabarti et al., the reference's scale-test generator;
    * defaults a/b/c = the reference's 0.57/0.19/0.19): `edgeCount` edges
    * over 2^scale vertices, each edge's bits chosen by recursive quadrant
    * descent. Quadrant randomness is `xxhash64(edgeId, level, seed)` —
    * deterministic and partition-independent (see object doc). Emits raw
    * edges with duplicates and self-loops exactly as the reference does;
    * pair with `Simplify`-style canonicalization (distinct + self-loop
    * filter, the asm/simple analog every consumer here applies) as needed. */
  def rmat(spark: SparkSession, scale: Int, edgeCount: Long,
           a: Double = 0.57, b: Double = 0.19, c: Double = 0.19,
           seed: Long = 42L): DataFrame = {
    require(scale >= 1 && scale <= 62 && a + b + c < 1.0)
    var src = lit(0L)
    var dst = lit(0L)
    for (lvl <- 0 until scale) {
      // uniform [0, 1) from the top 53 bits of the per-(edge, level) hash
      val u = shiftrightunsigned(xxhash64(col("id"), lit(lvl), lit(seed)), 11) /
        lit(9007199254740992.0)
      // quadrants: a = (0,0), b = (0,1), c = (1,0), d = (1,1)
      src = src * 2 + when(u < a + b, 0L).otherwise(1L)
      dst = dst * 2 + when(u < a || (u >= a + b && u < a + b + c), 0L).otherwise(1L)
    }
    spark.range(edgeCount).select(src.as("src"), dst.as("dst"))
  }
}
