package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Prop.{propBoolean, BooleanOperators => _}
import org.scalacheck.Test.{check, Parameters}
import graft.operators.{Relational, TextDedup}

/** Property-based invariants (ScalaCheck) for the operators whose
  * correctness argument is combinatorial: banded fingerprint pairing must
  * equal brute force under the pigeonhole bound, and histogram ranking must
  * equal the native window functions on arbitrary data. Few cases, small
  * data — each case runs Spark jobs. */
class PropertySpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private val params = Parameters.default.withMinSuccessfulTests(8)
  private def assertHolds(p: Prop): Unit = {
    val r = check(params, p)
    assert(r.passed, r.status.toString)
  }

  test("bandedFingerprintPairs == brute force for Hamming <= bands-1, each pair once") {
    val gen = Gen.listOfN(12, Gen.chooseNum(Long.MinValue, Long.MaxValue))
      .map(_.distinct)
    assertHolds(Prop.forAll(gen) { sigs =>
      val df = sigs.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "sig")
      val got = TextDedup.bandedFingerprintPairs(df, "doc_id", "sig", 4, 16)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSeq
      // pigeonhole: hamming <= 3 ALWAYS shares a full 16-bit band
      val mustFind = for {
        i <- sigs.indices; j <- sigs.indices if i < j
        if java.lang.Long.bitCount(sigs(i) ^ sigs(j)) <= 3
      } yield (i.toLong, j.toLong)
      // candidates are exactly the pairs sharing >= 1 band value
      val bruteCand = for {
        i <- sigs.indices; j <- sigs.indices if i < j
        if (0 until 4).exists(b => ((sigs(i) >> (16 * b)) & 0xffffL) == ((sigs(j) >> (16 * b)) & 0xffffL))
      } yield (i.toLong, j.toLong)
      (got.toSet == bruteCand.toSet) :| s"candidate set mismatch: got=$got brute=$bruteCand" &&
        (mustFind.toSet.subsetOf(got.toSet)) :| "pigeonhole recall violated" &&
        (got.size == got.distinct.size) :| "first-match dedup emitted a pair twice"
    })
  }

  test("histogramRank == native dense_rank/percent_rank/cume_dist on arbitrary data") {
    val gen = Gen.listOfN(30, Gen.zip(Gen.oneOf("a", "b", "c"), Gen.chooseNum(-5, 5)))
    assertHolds(Prop.forAll(gen) { rows =>
      rows.nonEmpty ==> {
        val df = rows.toDF("p", "v")
        val viaHist = Relational.histogramRank(df, col("p"), col("v"))
          .select("p", "v", "drk", "prk", "cd")
          .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
            r.getDouble(3), r.getDouble(4))).sorted.toSeq
        val w = org.apache.spark.sql.expressions.Window.partitionBy("p").orderBy("v")
        val viaWindow = df.select(col("p"), col("v"),
            dense_rank().over(w).cast("long").as("drk"),
            round(percent_rank().over(w), 6).as("prk"),
            round(cume_dist().over(w), 6).as("cd"))
          .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
            r.getDouble(3), r.getDouble(4))).sorted.toSeq
        (viaHist == viaWindow) :| s"hist=$viaHist window=$viaWindow"
      }
    })
  }

  test("minhash LSH candidates are symmetric-closed: every exact duplicate pair is found") {
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    val doc = Gen.listOfN(8, word).map(_.mkString(" "))
    val gen = Gen.listOfN(10, doc)
    assertHolds(Prop.forAll(gen) { docs =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val pairs = TextDedup.minhashCandidates(df, "doc_id", "text")
        .as[(Long, Long)].collect().toSet
      // identical text => identical signature => identical buckets => candidate
      val dupPairs = for {
        i <- docs.indices; j <- docs.indices if i < j && docs(i) == docs(j)
      } yield (i.toLong, j.toLong)
      dupPairs.toSet.subsetOf(pairs) :| s"missing exact-dup pairs: ${dupPairs.toSet -- pairs}"
    })
  }

  test("CEP A B{1,2} C == reference greedy interpreter on random event logs") {
    import graft.cep.Pattern
    val T0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(min: Long) = new java.sql.Timestamp(T0.getTime + min * 60000)
    val WindowMs = 30L * 60000
    // distinct per-row minutes (the row index) keep timestamps unique per
    // key, so greedy binding is unambiguous in the reference interpreter
    val gen = Gen.listOfN(18, Gen.zip(Gen.chooseNum(1L, 3L), Gen.oneOf("a", "b", "c")))
    assertHolds(Prop.forAll(gen) { rows =>
      val evs = rows.zipWithIndex.map { case ((u, t), i) => (u, at(i.toLong), t) }
      val df = evs.toDF("user_id", "ts", "event_type")
      val got = Pattern.begin("a", col("event_type") === "a")
        .followedBy("b", col("event_type") === "b").timesRange(1, 2)
        .followedBy("c", col("event_type") === "c")
        .within(WindowMs)
        .detect(df, col("user_id"), col("ts"))
        .collect().map(r => (r.getAs[Long]("key"), r.getAs[java.sql.Timestamp]("a_ts").getTime,
          r.getAs[java.sql.Timestamp]("b_1_ts").getTime,
          Option(r.getAs[java.sql.Timestamp]("b_2_ts")).map(_.getTime),
          r.getAs[java.sql.Timestamp]("c_ts").getTime)).toSet
      // reference: per key, for every 'a' bind greedily (earliest b, then
      // optionally the next b, then earliest c after the last bound b)
      val want = (for {
        u <- evs.map(_._1).distinct
        sorted = evs.filter(_._1 == u).map(e => (e._2.getTime, e._3)).sortBy(_._1)
        (t0, "a") <- sorted
        end = t0 + WindowMs
        b1 <- sorted.collectFirst { case (t, "b") if t > t0 && t <= end => t }.toSeq
        b2 = sorted.collectFirst { case (t, "b") if t > b1 && t <= end => t }
        next = b2.getOrElse(b1)
        c <- sorted.collectFirst { case (t, "c") if t > next && t <= end => t }.toSeq
      } yield (u, t0, b1, b2, c)).toSet
      (got == want) :| s"got=$got want=$want"
    })
  }

  test("MatchRecognize SQL text == hand-built combinator chain for random patterns") {
    import graft.cep.{MatchRecognize, Pattern}
    val T0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val quant = Gen.oneOf("", "?", "{2}", "{1,2}", "+", "*")
    val log = Gen.listOfN(15, Gen.zip(Gen.chooseNum(1L, 2L), Gen.oneOf("a", "b", "c")))
    assertHolds(Prop.forAll(Gen.zip(quant, quant, log)) { case (q1, q2, rows) =>
      val df = rows.zipWithIndex.map { case ((u, t), i) =>
        (u, new java.sql.Timestamp(T0.getTime + i * 60000L), t)
      }.toDF("user_id", "ts", "event_type")
      val viaSql = MatchRecognize.detect(df,
        s"""MATCH_RECOGNIZE (
           |  PARTITION BY user_id ORDER BY ts
           |  PATTERN (S X$q1 Y$q2)
           |  WITHIN INTERVAL '30' MINUTE
           |  DEFINE S AS event_type = 'a', X AS event_type = 'b',
           |         Y AS event_type = 'c'
           |)""".stripMargin)
      var pat = Pattern.begin("S", col("event_type") === "a")
      def addQ(q: String): Unit = q match {
        case "" =>
        case "?" => pat = pat.optional()
        case "{2}" => pat = pat.times(2)
        case "{1,2}" => pat = pat.timesRange(1, 2)
        case "+" => pat = pat.oneOrMore()
        case "*" => pat = pat.zeroOrMore()
      }
      pat = pat.followedBy("X", col("event_type") === "b"); addQ(q1)
      pat = pat.followedBy("Y", col("event_type") === "c"); addQ(q2)
      val viaApi = pat.within(30L * 60000).detect(df, col("user_id"), col("ts"))
      val a = viaSql.collect().map(_.toString).sorted.toSeq
      val b = viaApi.collect().map(_.toString).sorted.toSeq
      (a == b) :| s"pattern (S X$q1 Y$q2): sql=$a api=$b"
    })
  }

  test("bindRun value aggregates == brute-force greedy-run reference on random logs") {
    import graft.cep.Pattern
    val T0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val WindowMs = 30L * 60000
    // values are multiples of 0.5: double sums are exact, so the reference
    // compares without rounding slack
    val gen = Gen.listOfN(18, Gen.zip(Gen.chooseNum(1L, 3L), Gen.oneOf("a", "b", "c")))
    assertHolds(Prop.forAll(gen) { rows =>
      val evs = rows.zipWithIndex.map { case ((u, t), i) =>
        (u, T0.getTime + i * 60000L, t, (i % 7) * 1.5 - 3.0)
      }
      val df = evs.map { case (u, tm, t, v) =>
        (u, new java.sql.Timestamp(tm), t, v)
      }.toDF("user_id", "ts", "event_type", "value")
      val got = Pattern.begin("a", col("event_type") === "a")
        .followedBy("b", col("event_type") === "b").oneOrMore().bindRun("value")
        .followedBy("c", col("event_type") === "c")
        .within(WindowMs).detect(df, col("user_id"), col("ts"))
        .collect().map(r => (r.getAs[Long]("key"),
          r.getAs[java.sql.Timestamp]("a_ts").getTime,
          r.getAs[java.sql.Timestamp]("b_first_ts").getTime,
          r.getAs[java.sql.Timestamp]("b_last_ts").getTime,
          r.getAs[Long]("b_n"),
          r.getAs[Double]("b_sum_value"), r.getAs[Double]("b_min_value"),
          r.getAs[Double]("b_max_value"), r.getAs[Double]("b_first_value"),
          r.getAs[Double]("b_last_value"),
          r.getAs[java.sql.Timestamp]("c_ts").getTime)).toSet
      // reference: earliest b after a, earliest c after that b; the run is
      // every b in [first_b, c), aggregated directly
      val want = (for {
        u <- evs.map(_._1).distinct
        sorted = evs.filter(_._1 == u).map(e => (e._2, e._3, e._4)).sortBy(_._1)
        (t0, "a", _) <- sorted
        end = t0 + WindowMs
        b1 <- sorted.collectFirst { case (t, "b", _) if t > t0 && t <= end => t }.toSeq
        c <- sorted.collectFirst { case (t, "c", _) if t > b1 && t <= end => t }.toSeq
        members = sorted.filter { case (t, ty, _) => ty == "b" && t >= b1 && t < c }
        vals = members.map(_._3)
      } yield (u, t0, b1, members.last._1, members.size.toLong,
        vals.sum, vals.min, vals.max, vals.head, vals.last, c)).toSet
      (got == want) :| s"got=$got want=$want"
    })
  }

  test("timesOrMore(n) == the oneOrMore reference with a member-count floor " +
       "on random logs") {
    import graft.cep.Pattern
    val T0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val WindowMs = 30L * 60000
    val gen = Gen.listOfN(18, Gen.zip(Gen.chooseNum(1L, 3L), Gen.oneOf("a", "b", "c")))
    assertHolds(Prop.forAll(gen, Gen.chooseNum(1, 4)) { (rows, n) =>
      val evs = rows.zipWithIndex.map { case ((u, t), i) =>
        (u, T0.getTime + i * 60000L, t)
      }
      val df = evs.map { case (u, tm, t) => (u, new java.sql.Timestamp(tm), t) }
        .toDF("user_id", "ts", "event_type")
      val got = Pattern.begin("a", col("event_type") === "a")
        .followedBy("b", col("event_type") === "b").timesOrMore(n)
        .followedBy("c", col("event_type") === "c")
        .within(WindowMs).detect(df, col("user_id"), col("ts"))
        .collect().map(r => (r.getAs[Long]("key"),
          r.getAs[java.sql.Timestamp]("a_ts").getTime,
          r.getAs[java.sql.Timestamp]("b_first_ts").getTime,
          r.getAs[java.sql.Timestamp]("b_last_ts").getTime,
          r.getAs[Long]("b_n"),
          r.getAs[java.sql.Timestamp]("c_ts").getTime)).toSet
      // reference: the greedy oneOrMore run (earliest b after a, earliest c
      // after that b, members = every b in [first_b, c)), kept only when
      // the maximal run holds >= n members — the timesOrMore contract
      val want = (for {
        u <- evs.map(_._1).distinct
        sorted = evs.filter(_._1 == u).map(e => (e._2, e._3)).sortBy(_._1)
        (t0, "a") <- sorted
        end = t0 + WindowMs
        b1 <- sorted.collectFirst { case (t, "b") if t > t0 && t <= end => t }.toSeq
        c <- sorted.collectFirst { case (t, "c") if t > b1 && t <= end => t }.toSeq
        members = sorted.filter { case (t, ty) => ty == "b" && t >= b1 && t < c }
        if members.size >= n
      } yield (u, t0, b1, members.last._1, members.size.toLong, c)).toSet
      (got == want) :| s"n=$n got=$got want=$want"
    })
  }

  test("followedByRun (V-shape) == brute-force descending-chain reference") {
    import graft.cep.Pattern
    val T0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val WindowMs = 30L * 60000
    // duplicate values across events force segment breaks (strict <)
    val gen = Gen.listOfN(16, Gen.zip(Gen.chooseNum(1L, 2L),
      Gen.oneOf("s", "d", "u"), Gen.chooseNum(0, 9)))
    assertHolds(Prop.forAll(gen) { rows =>
      val evs = rows.zipWithIndex.map { case ((u, ty, v), i) =>
        (u, T0.getTime + i * 60000L, ty, v.toDouble)
      }
      val df = evs.map { case (u, tm, ty, v) =>
        (u, new java.sql.Timestamp(tm), ty, v)
      }.toDF("user_id", "ts", "event_type", "value")
      val got = Pattern.begin("s", col("event_type") === "s")
        .followedByRun("d", col("event_type") === "d", "value", _ < _)
        .bindRun("value")
        .followedBy("u", col("event_type") === "u")
        .within(WindowMs).detect(df, col("user_id"), col("ts"))
        .collect().map(r => (r.getAs[Long]("key"),
          r.getAs[java.sql.Timestamp]("s_ts").getTime,
          r.getAs[java.sql.Timestamp]("d_first_ts").getTime,
          r.getAs[java.sql.Timestamp]("d_last_ts").getTime,
          r.getAs[Long]("d_n"),
          r.getAs[Double]("d_first_value"), r.getAs[Double]("d_last_value"),
          r.getAs[java.sql.Timestamp]("u_ts").getTime)).toSet
      // reference: segment ALL d-candidates of the key into maximal strict-
      // descending chains (ts order; ts are unique by construction), bind the
      // earliest in-window candidate, collect its chain from there, then the
      // earliest u after the chain's last member
      val want = (for {
        u <- evs.map(_._1).distinct
        sorted = evs.filter(_._1 == u).map(e => (e._2, e._3, e._4)).sortBy(_._1)
        cands = sorted.collect { case (t, "d", v) => (t, v) }
        segs = cands.zipWithIndex.map { case ((_, v), i) =>
          // segment id = number of chain breaks up to and including i
          (0 to i).count(j => j == 0 || !(cands(j)._2 < cands(j - 1)._2))
        }
        (t0, "s", _) <- sorted
        end = t0 + WindowMs
        firstIdx <- cands.indices.find(i => cands(i)._1 > t0 && cands(i)._1 <= end).toSeq
        members = cands.indices.filter(i => segs(i) == segs(firstIdx) &&
          cands(i)._1 >= cands(firstIdx)._1 && cands(i)._1 <= end).map(cands)
        uts <- sorted.collectFirst { case (t, "u", _) if t > members.last._1 && t <= end => t }.toSeq
      } yield (u, t0, members.head._1, members.last._1, members.size.toLong,
        members.head._2, members.last._2, uts)).toSet
      (got == want) :| s"got=$got want=$want"
    })
  }

  test("followedByGroup (B C)+ == brute-force greedy-chain reference on random logs") {
    import graft.cep.Pattern
    val T0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val WindowMs = 30L * 60000
    val gen = Gen.listOfN(18, Gen.zip(Gen.chooseNum(1L, 2L), Gen.oneOf("s", "b", "c", "u")))
    assertHolds(Prop.forAll(gen) { rows =>
      val evs = rows.zipWithIndex.map { case ((u, t), i) => (u, T0.getTime + i * 60000L, t) }
      val df = evs.map { case (u, tm, t) => (u, new java.sql.Timestamp(tm), t) }
        .toDF("user_id", "ts", "event_type")
      val got = Pattern.begin("s", col("event_type") === "s")
        .followedByGroup("g",
          "b" -> (col("event_type") === "b"), "c" -> (col("event_type") === "c"))
        .oneOrMore()
        .followedBy("u", col("event_type") === "u")
        .within(WindowMs).detect(df, col("user_id"), col("ts"))
        .collect().map(r => (r.getAs[Long]("key"),
          r.getAs[java.sql.Timestamp]("s_ts").getTime,
          r.getAs[java.sql.Timestamp]("g_first_ts").getTime,
          r.getAs[java.sql.Timestamp]("g_last_ts").getTime,
          r.getAs[Long]("g_n"),
          r.getAs[java.sql.Timestamp]("u_ts").getTime)).toSet
      // reference: greedy no-backtracking NFA walk per anchor — each
      // repetition binds the earliest b after the previous repetition's end,
      // then the earliest c after that b, both within the window; u binds
      // after the last repetition's end
      val want = (for {
        u <- evs.map(_._1).distinct
        sorted = evs.filter(_._1 == u).map(e => (e._2, e._3)).sortBy(_._1)
        (t0, "s") <- sorted
        end = t0 + WindowMs
        chain = {
          val reps = scala.collection.mutable.ListBuffer[(Long, Long)]()
          var anchor = t0
          var go = true
          while (go) {
            val rep = for {
              b <- sorted.collectFirst { case (t, "b") if t > anchor && t <= end => t }
              c <- sorted.collectFirst { case (t, "c") if t > b && t <= end => t }
            } yield (b, c)
            rep match {
              case Some((b, c)) => reps += ((b, c)); anchor = c
              case None => go = false
            }
          }
          reps.toList
        }
        if chain.nonEmpty
        uts <- sorted.collectFirst { case (t, "u") if t > chain.last._2 && t <= end => t }.toSeq
      } yield (u, t0, chain.head._1, chain.last._2, chain.size.toLong, uts)).toSet
      (got == want) :| s"got=$got want=$want"
    })
  }

  test("followedByNestedGroup ((B C)+ V)+ == brute-force punctuated-walk reference") {
    import graft.cep.Pattern
    val T0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val WindowMs = 30L * 60000
    val gen = Gen.listOfN(18, Gen.zip(Gen.chooseNum(1L, 2L), Gen.oneOf("s", "b", "c", "v")))
    assertHolds(Prop.forAll(gen) { rows =>
      val evs = rows.zipWithIndex.map { case ((u, t), i) => (u, T0.getTime + i * 60000L, t) }
      val df = evs.map { case (u, tm, t) => (u, new java.sql.Timestamp(tm), t) }
        .toDF("user_id", "ts", "event_type")
      val got = Pattern.begin("s", col("event_type") === "s")
        .followedByNestedGroup("g",
          Seq("b" -> (col("event_type") === "b"), "c" -> (col("event_type") === "c")),
          Seq("v" -> (col("event_type") === "v")))
        .oneOrMore()
        .within(WindowMs).detect(df, col("user_id"), col("ts"))
        .collect().map(r => (r.getAs[Long]("key"),
          r.getAs[java.sql.Timestamp]("s_ts").getTime,
          r.getAs[java.sql.Timestamp]("g_first_ts").getTime,
          r.getAs[java.sql.Timestamp]("g_last_ts").getTime,
          r.getAs[Long]("g_n"),
          r.getAs[Long]("g_inner_n"))).toSet
      // reference: the tail-punctuated two-level walk per anchor — each
      // outer repetition starts at the earliest inner-sub start after the
      // previous tail binding, absorbs further subs only while they
      // complete strictly before the earliest in-window v after the chain
      // end, then binds that v; chain ends at the first failing repetition
      val want = (for {
        u <- evs.map(_._1).distinct
        sorted = evs.filter(_._1 == u).map(e => (e._2, e._3)).sortBy(_._1)
        (t0, "s") <- sorted
        end = t0 + WindowMs
        // inner sub-match table: every b with its earliest span-bounded c
        subs = sorted.collect { case (b, "b") => b }.flatMap(b =>
          sorted.collectFirst { case (t, "c") if t > b && t <= b + WindowMs => (b, t) })
        result = {
          var lastEnd = t0
          var first = -1L; var n = 0L; var inner = 0L; var done = false
          while (!done) {
            subs.find(_._1 > lastEnd) match {
              case None => done = true
              case Some((b0, e0)) if e0 > end => done = true
              case Some((b0, e0)) =>
                var e = e0; var k = 1L; var more = true
                while (more) {
                  val nx = subs.find(_._1 > e)
                  val tCand = sorted.collectFirst {
                    case (t, "v") if t > e && t <= end => t }
                  nx match {
                    case Some((_, ne)) if ne <= end &&
                        (tCand.isEmpty || ne < tCand.get) => e = ne; k += 1
                    case _ => more = false
                  }
                }
                sorted.collectFirst { case (t, "v") if t > e && t <= end => t } match {
                  case None => done = true
                  case Some(v) =>
                    if (n == 0) first = b0
                    lastEnd = v; n += 1; inner += k
                }
            }
          }
          (first, lastEnd, n, inner)
        }
        if result._3 >= 1
      } yield (u, t0, result._1, result._2, result._3, result._4)).toSet
      (got == want) :| s"got=$got want=$want"
    })
  }

  test("bindGroup value aggregates == brute-force greedy-chain reference on random logs") {
    import graft.cep.Pattern
    val T0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val WindowMs = 30L * 60000
    val gen = Gen.listOfN(18, Gen.zip(Gen.chooseNum(1L, 2L), Gen.oneOf("s", "b", "c", "u")))
    assertHolds(Prop.forAll(gen) { rows =>
      // value = index-derived, distinct per event (timestamps are distinct
      // by construction, so no equal-ts tie-break enters this reference)
      val evs = rows.zipWithIndex.map { case ((u, t), i) =>
        (u, T0.getTime + i * 60000L, t, i * 3.0 + u) }
      val df = evs.map { case (u, tm, t, v) => (u, new java.sql.Timestamp(tm), t, v) }
        .toDF("user_id", "ts", "event_type", "value")
      val got = Pattern.begin("s", col("event_type") === "s")
        .followedByGroup("g",
          "b" -> (col("event_type") === "b"), "c" -> (col("event_type") === "c"))
        .bindGroup("c", "value")
        .oneOrMore()
        .followedBy("u", col("event_type") === "u")
        .within(WindowMs).detect(df, col("user_id"), col("ts"))
        .collect().map(r => (r.getAs[Long]("key"),
          r.getAs[java.sql.Timestamp]("s_ts").getTime,
          r.getAs[Long]("g_n"),
          r.getAs[Double]("g_sum_c_value"),
          r.getAs[Double]("g_min_c_value"),
          r.getAs[Double]("g_max_c_value"),
          r.getAs[Double]("g_first_c_value"),
          r.getAs[Double]("g_last_c_value"),
          r.getAs[Long]("g_cnt_c_value"))).toSet
      // reference: the same greedy no-backtracking chain walk, aggregating
      // the chosen c members' values
      val want = (for {
        u <- evs.map(_._1).distinct
        sorted = evs.filter(_._1 == u).map(e => (e._2, e._3, e._4)).sortBy(_._1)
        (t0, "s", _) <- sorted
        end = t0 + WindowMs
        chain = {
          val reps = scala.collection.mutable.ListBuffer[(Long, Long, Double)]()
          var anchor = t0
          var go = true
          while (go) {
            val rep = for {
              b <- sorted.collectFirst { case (t, "b", _) if t > anchor && t <= end => t }
              cv <- sorted.collectFirst { case (t, "c", v) if t > b && t <= end => (t, v) }
            } yield (b, cv._1, cv._2)
            rep match {
              case Some((b, c, v)) => reps += ((b, c, v)); anchor = c
              case None => go = false
            }
          }
          reps.toList
        }
        if chain.nonEmpty
        uts <- sorted.collectFirst { case (t, "u", _) if t > chain.last._2 && t <= end => t }.toSeq
      } yield {
        val vs = chain.map(_._3)
        (u, t0, chain.size.toLong, vs.sum, vs.min, vs.max, vs.head, vs.last,
          vs.size.toLong)
      }).toSet
      (got == want) :| s"got=$got want=$want"
    })
  }

  test("afterMatchSkipPastLastEvent == brute-force greedy reference on random logs") {
    import graft.cep.Pattern
    // m03's lowering has no cross-engine SQL oracle (greedy per-key selection
    // is sequential), so pin it against an INDEPENDENT JVM reference: take
    // the NO_SKIP match set, sort per key by (start, end), keep a match iff
    // it starts strictly after the last kept match's last bound event —
    // the documented SKIP PAST LAST ROW rule, applied brute-force
    val T0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val WindowMs = 30L * 60000
    val gen = Gen.listOfN(18, Gen.zip(Gen.chooseNum(1L, 3L), Gen.oneOf("s", "c")))
    assertHolds(Prop.forAll(gen) { rows =>
      rows.nonEmpty ==> {
        // index-based minutes keep timestamps distinct per user
        val df = rows.zipWithIndex.map { case ((u, t), i) =>
          (u, new java.sql.Timestamp(T0.getTime + i * 60000L), t)
        }.toDF("user_id", "ts", "event_type")
        def pat = Pattern.begin("s", col("event_type") === "s")
          .followedBy("c", col("event_type") === "c")
          .within(WindowMs)
        def rowsOf(d: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long)] =
          d.collect().map(r => (r.getAs[Long]("key"),
            r.getAs[java.sql.Timestamp]("s_ts").getTime,
            r.getAs[java.sql.Timestamp]("c_ts").getTime)).toSeq
        val all = rowsOf(pat.detect(df, col("user_id"), col("ts")))
        val kept = rowsOf(pat.afterMatchSkipPastLastEvent()
          .detect(df, col("user_id"), col("ts"))).toSet
        val want = all.groupBy(_._1).flatMap { case (_, ms) =>
          var lastEnd = Long.MinValue
          ms.sortBy(m => (m._2, m._3)).filter { m =>
            if (m._2 > lastEnd) { lastEnd = m._3; true } else false
          }
        }.toSet
        (kept == want) :| s"kept=$kept want=$want all=$all"
      }
    })
  }

  test("afterMatchSkipToFirst/Last == brute-force threshold reference on random logs") {
    import graft.cep.Pattern
    // same insurance as SKIP PAST LAST: no cross-engine SQL oracle (greedy
    // selection is sequential), pin against an independent JVM reference —
    // sort the NO_SKIP matches per key by (start, end), keep a match iff it
    // starts AT or AFTER the threshold, advance the threshold to the kept
    // match's skip-variable binding
    val T0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val WindowMs = 30L * 60000
    val gen = Gen.listOfN(18, Gen.zip(Gen.chooseNum(1L, 3L), Gen.oneOf("s", "b", "c")))
    assertHolds(Prop.forAll(gen) { rows =>
      rows.nonEmpty ==> {
        val df = rows.zipWithIndex.map { case ((u, t), i) =>
          (u, new java.sql.Timestamp(T0.getTime + i * 60000L), t)
        }.toDF("user_id", "ts", "event_type")
        def pat = Pattern.begin("s", col("event_type") === "s")
          .followedBy("b", col("event_type") === "b")
          .followedBy("c", col("event_type") === "c")
          .within(WindowMs)
        def rowsOf(d: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long, Long)] =
          d.collect().map(r => (r.getAs[Long]("key"),
            r.getAs[java.sql.Timestamp]("s_ts").getTime,
            r.getAs[java.sql.Timestamp]("b_ts").getTime,
            r.getAs[java.sql.Timestamp]("c_ts").getTime)).toSeq
        val all = rowsOf(pat.detect(df, col("user_id"), col("ts")))
        def want(restartOf: ((Long, Long, Long, Long)) => Long) =
          all.groupBy(_._1).flatMap { case (_, ms) =>
            var threshold = Long.MinValue
            ms.sortBy(m => (m._2, m._4)).filter { m =>
              if (m._2 >= threshold) {
                threshold = math.max(threshold, restartOf(m)); true
              } else false
            }
          }.toSet
        val gotF = rowsOf(pat.afterMatchSkipToFirst("b")
          .detect(df, col("user_id"), col("ts"))).toSet
        val gotL = rowsOf(pat.afterMatchSkipToLast("b")
          .detect(df, col("user_id"), col("ts"))).toSet
        // plain step: FIRST and LAST both restart at the b binding
        (gotF == want(_._3)) :| s"toFirst: got=$gotF want=${want(_._3)}" &&
          (gotL == want(_._3)) :| s"toLast: got=$gotL want=${want(_._3)}"
      }
    })
  }

  test("evictor invariants: time-evicted <= full window; count-evicted == min(n, keep)") {
    import graft.operators.EventWindows
    val gen = Gen.listOfN(20, Gen.zip(Gen.oneOf("a", "b"), Gen.chooseNum(0, 110)))
    assertHolds(Prop.forAll(gen) { rows =>
      rows.nonEmpty ==> {
        val T0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
        val df = rows.zipWithIndex.map { case ((t, m), i) =>
          (new java.sql.Timestamp(T0.getTime + m * 60000L), t, i.toLong, 1.0)
        }.toDF("ts", "event_type", "event_id", "value")
        def counts(d: org.apache.spark.sql.DataFrame): Map[(Long, String), Long] =
          d.collect().map(r => (r.getAs[java.sql.Timestamp]("window_start").getTime,
            r.getAs[String]("event_type")) -> r.getAs[Long]("n")).toMap
        val full = counts(EventWindows.tumbleAgg(df, col("ts"), "1 hour",
          Seq(col("event_type")), Seq(count(lit(1)).as("n"))))
        val timeEv = counts(EventWindows.timeEvictedTumbleAgg(df, col("ts"), "1 hour",
          "15 minutes", Seq(col("event_type")), Seq(count(lit(1)).as("n"))))
        val cntEv = counts(EventWindows.countEvictedTumbleAgg(df, col("ts"), "1 hour",
          3, col("event_id"), Seq(col("event_type")), Seq(count(lit(1)).as("n"))))
        val timeOk = timeEv.forall { case (k, n) => n >= 1 && n <= full(k) }
        val cntOk = full.forall { case (k, n) => cntEv(k) == math.min(n, 3L) }
        timeOk :| s"time evictor exceeded window: $timeEv vs $full" &&
          cntOk :| s"count evictor != min(n, keep): $cntEv vs $full"
      }
    })
  }

  test("all-matches CEP == brute force on random event streams " +
       "(followedByAny chains and allowCombinations subsets)") {
    import java.sql.Timestamp
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    // random per-key event lists: (key, minute-offset, type in {a,b,c})
    val gen = Gen.listOfN(24, for {
      k <- Gen.chooseNum(1L, 3L)
      m <- Gen.chooseNum(0L, 50L)
      t <- Gen.oneOf("a", "b", "c")
    } yield (k, m, t)).map(_.distinct)
    val W = 20L * 60000 // 20-minute window
    assertHolds(Prop.forAll(gen) { evs =>
      val df = evs.map { case (k, m, t) => (k, new Timestamp(t0 + m * 60000), t) }
        .toDF("k", "ts", "tp")
      // chains: a -> any b -> any c
      val gotChains = graft.cep.Pattern.begin("a", col("tp") === "a")
        .followedByAny("b", col("tp") === "b")
        .followedByAny("c", col("tp") === "c")
        .within(W)
        .detect(df, col("k"), col("ts"))
        .select("key", "a_ts", "b_ts", "c_ts").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime,
          r.getTimestamp(2).getTime, r.getTimestamp(3).getTime)).toSet
      val ms = evs.map { case (k, m, t) => (k, t0 + m * 60000, t) }
      val wantChains = (for {
        (k1, m1, "a") <- ms
        (k2, m2, "b") <- ms if k2 == k1 && m2 > m1 && m2 <= m1 + W
        (k3, m3, "c") <- ms if k3 == k1 && m3 > m2 && m3 <= m1 + W
      } yield (k1, m1, m2, m3)).toSet
      // combinations: a -> b+ allowCombinations
      val gotCombs = graft.cep.Pattern.begin("a", col("tp") === "a")
        .followedBy("b", col("tp") === "b").oneOrMore()
        .allowCombinations(maxCombinationMembers = 24)
        .within(W)
        .detect(df, col("k"), col("ts"))
        .select("key", "a_ts", "b_n", "b_first_ts", "b_last_ts").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2),
          r.getTimestamp(3).getTime, r.getTimestamp(4).getTime))
        .groupBy(identity).map { case (kv, xs) => (kv, xs.length) }
      val wantCombs = (for {
        (k1, m1, "a") <- ms
        members = ms.collect { case (k2, m2, "b") if k2 == k1 && m2 > m1 && m2 <= m1 + W => m2 }.sorted
        n <- 1 to members.size
        sub <- members.combinations(n)
      } yield (k1, m1, n.toLong, sub.head, sub.last))
        .groupBy(identity).map { case (kv, xs) => (kv, xs.length) }
      (gotChains == wantChains) :| s"chains mismatch: got=$gotChains want=$wantChains" &&
        (gotCombs == wantCombs) :| s"combinations (with multiplicity) mismatch"
    })
  }
}
