package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Iterate

/** Brute-force property reference for the DIRECTED clustering stats + 16-type
  * triadic census (`Iterate.directedClusteringStats`): on random digraphs the
  * engine's pair-flag + flagged-edge-iterator + subtraction-chain pipeline
  * must equal a from-first-principles triple enumeration — every C(V,3)
  * triple classified directly from its three pair states. This pins the
  * whole classification surface (021d/u/c splits, 111 in/out orientation,
  * 030 cyclicity, 120 source/sink/mixed, the closed-form chain for the
  * null-heavy types) far beyond what a hand-computed example can. */
class TriadCensusPropertySpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  /** All 16 MAN-type counts + cc stats, enumerated triple by triple. */
  private def brute(edges: Seq[(Long, Long)]): (Map[String, Long], Double, Double, Long, Long) = {
    val de = edges.filter(e => e._1 != e._2).distinct.toSet
    val vs = de.toSeq.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    def fw(a: Long, b: Long): Boolean = de.contains((a, b))
    def state(a: Long, b: Long): Int = (fw(a, b), fw(b, a)) match {
      case (true, true) => 2; case (false, false) => 0; case _ => 1
    }
    val counts = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    val n = vs.length
    for (i <- 0 until n; j <- i + 1 until n; k <- j + 1 until n) {
      val t = Seq(vs(i), vs(j), vs(k))
      val pairs = Seq((t(0), t(1)), (t(0), t(2)), (t(1), t(2)))
      val sts = pairs.map(p => state(p._1, p._2))
      val m = sts.count(_ == 2); val u = sts.count(_ == 1)
      val label = (m, u) match {
        case (0, 0) => "t003"
        case (0, 1) => "t012"
        case (1, 0) => "t102"
        case (3, 0) => "t300"
        case (2, 0) => "t201"
        case (2, 1) => "t210"
        case (0, 2) =>
          // two uni edges share exactly one vertex: both out → d (common
          // source), both in → u (common sink), chain → c
          val des = pairs.zip(sts).filter(_._2 == 1).map(_._1)
            .map(p => if (fw(p._1, p._2)) p else p.swap)
          if (des(0)._1 == des(1)._1) "t021d"
          else if (des(0)._2 == des(1)._2) "t021u"
          else "t021c"
        case (1, 1) =>
          // uni edge pointing INTO the bi pair → d, out of it → u
          val bip = pairs.zip(sts).find(_._2 == 2).get._1
          val up = pairs.zip(sts).find(_._2 == 1).get._1
          val dEdge = if (fw(up._1, up._2)) up else up.swap
          if (dEdge._2 == bip._1 || dEdge._2 == bip._2) "t111d" else "t111u"
        case (0, 3) =>
          val cyc = t.forall(v => t.filter(_ != v).count(o => fw(v, o)) == 1)
          if (cyc) "t030c" else "t030t"
        case (1, 2) =>
          val bip = pairs.zip(sts).find(_._2 == 2).get._1
          val w = t.find(v => v != bip._1 && v != bip._2).get
          val s = (if (fw(w, bip._1)) 1 else 0) + (if (fw(w, bip._2)) 1 else 0)
          if (s == 2) "t120d" else if (s == 0) "t120u" else "t120c"
        case other => sys.error(s"impossible pair-state mix $other")
      }
      counts(label) += 1
    }
    // cc stats over the undirected projection, the engine's definitions
    val und = de.map(e => (math.min(e._1, e._2), math.max(e._1, e._2)))
    def nbrs(v: Long) = und.collect {
      case (a, b) if a == v => b
      case (a, b) if b == v => a
    }
    var lcc6Sum = 0L; var closedTriplets = 0L; var triplets = 0L
    var uni = 0L; var bi = 0L
    und.foreach { p => if (state(p._1, p._2) == 2) bi += 1 else uni += 1 }
    vs.foreach { v =>
      val nb = nbrs(v).toSeq.sorted
      val d = nb.length.toLong
      var numer = 0L
      for (x <- nb.indices; y <- x + 1 until nb.length) {
        if (fw(nb(x), nb(y))) numer += 1
        if (fw(nb(y), nb(x))) numer += 1
      }
      closedTriplets += numer
      triplets += d * (d - 1)
      if (d >= 2) {
        val lcc = BigDecimal(numer.toDouble / (d * (d - 1)).toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        lcc6Sum += math.round(lcc * 1000000)
      }
    }
    val globalCc = if (triplets > 0) closedTriplets.toDouble / triplets.toDouble else 0.0
    val avgCc = lcc6Sum.toDouble / (1000000.0 * vs.length)
    (counts.toMap.withDefaultValue(0L), globalCc, avgCc, uni, bi)
  }

  private val typeCols = Seq("t003", "t012", "t102", "t021d", "t021u", "t021c",
    "t111d", "t111u", "t030t", "t030c", "t201", "t120d", "t120u", "t120c",
    "t210", "t300")

  private def engineRow(edges: Seq[(Long, Long)]) = {
    val df = edges.toDF("src", "dst")
    Iterate.directedClusteringStats(df, "src", "dst").head()
  }

  test("16-type census + cc stats == brute-force triple enumeration on random digraphs") {
    for (seed <- Seq(1, 7, 42); p <- Seq(0.10, 0.30)) {
      val rnd = new scala.util.Random(seed)
      val n = 14
      val edges = (for {
        a <- 0 until n; b <- 0 until n
        if rnd.nextDouble() < p
      } yield (a.toLong, b.toLong)) ++
        Seq((3L, 3L), (1L, 2L), (1L, 2L)) // self-loop + duplicate: must clean
      val (bc, bg, ba, buni, bbi) = brute(edges)
      val row = engineRow(edges)
      typeCols.foreach { c =>
        assert(row.getAs[Long](c) === bc(c),
          s"seed=$seed p=$p type=$c engine=${row.getAs[Long](c)} brute=${bc(c)}")
      }
      assert(row.getAs[Long]("n_uni_edges") === buni, s"seed=$seed p=$p uni")
      assert(row.getAs[Long]("n_bi_edges") === bbi, s"seed=$seed p=$p bi")
      assert(math.abs(row.getAs[Double]("global_cc") - bg) < 1e-9, s"seed=$seed p=$p gcc")
      assert(math.abs(row.getAs[Double]("avg_cc") - ba) < 1e-9, s"seed=$seed p=$p acc")
    }
  }

  test("census is id-sign-agnostic: negative vertex ids classify identically") {
    // the packed adjacency walk must use SIGNED key extraction — negative
    // ids would otherwise silently drop triangles from the listing
    val rnd = new scala.util.Random(5)
    val edges = for {
      a <- 0 until 12; b <- 0 until 12
      if rnd.nextDouble() < 0.3
    } yield (a.toLong - 6L, b.toLong - 6L) // ids straddle zero
    val (bc, bg, ba, buni, bbi) = brute(edges)
    val row = engineRow(edges)
    typeCols.foreach { c =>
      assert(row.getAs[Long](c) === bc(c), s"neg-id type=$c")
    }
    assert(row.getAs[Long]("n_uni_edges") === buni)
    assert(row.getAs[Long]("n_bi_edges") === bbi)
    assert(math.abs(row.getAs[Double]("global_cc") - bg) < 1e-9)
    assert(math.abs(row.getAs[Double]("avg_cc") - ba) < 1e-9)
  }

  test("census closed shapes: pure 3-cycle, all-bidirectional triangle, out-star") {
    // 3-cycle → exactly one 030c
    val cyc = engineRow(Seq((1L, 2L), (2L, 3L), (3L, 1L)))
    assert(cyc.getAs[Long]("t030c") === 1L && cyc.getAs[Long]("t030t") === 0L)
    // all-bi triangle → one 300
    val bi3 = engineRow(Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (1L, 3L), (3L, 1L)))
    assert(bi3.getAs[Long]("t300") === 1L)
    // out-star 0→{1,2,3} → C(3,2)=3 triads of type 021d
    val star = engineRow(Seq((0L, 1L), (0L, 2L), (0L, 3L)))
    assert(star.getAs[Long]("t021d") === 3L && star.getAs[Long]("t021u") === 0L)
  }
}
