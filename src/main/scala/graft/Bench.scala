package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // machine-load context per rep boundary: four consecutive rounds of
    // environment-vs-code adjudication ran on rep-shape inference alone;
    // r17 recorded /proc/loadavg per rep, and this round ACTS on it (the
    // r17 verdict's "load-controlled bench"): reps that started under
    // ambient contention are excluded from the published min whenever a
    // clean rep exists, so a busy box can no longer mint fake regressions
    def loadAvg1m(): Double =
      try new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg"))).split("\\s+")(0).toDouble
      catch { case _: Throwable => -1.0 }
    // the bench itself saturates the box back-to-back, so raw loadavg mixes
    // SELF-load (expected, identical across rounds) with AMBIENT load (the
    // contamination to exclude). Separate them by tracking this JVM's own
    // CPU-core usage as an exponential average with the same 1-minute decay
    // the kernel applies to loadavg: ambient ≈ loadavg − ownEwma.
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    def ownCpuNs(): Long = osBean match {
      case b: com.sun.management.OperatingSystemMXBean => b.getProcessCpuTime
      case _ => -1L
    }
    var ownEwma = 0.0
    var lastCpuNs = ownCpuNs()
    var lastWallNs = System.nanoTime()
    def updateOwn(): Unit = {
      val cpu = ownCpuNs(); val wall = System.nanoTime()
      if (cpu >= 0 && wall > lastWallNs) {
        val cores = (cpu - lastCpuNs).toDouble / (wall - lastWallNs)
        val dtSec = (wall - lastWallNs) / 1e9
        val a = math.exp(-dtSec / 60.0)
        ownEwma = ownEwma * a + cores * (1 - a)
      }
      lastCpuNs = cpu; lastWallNs = wall
    }
    def ambientNow(): Double = math.max(0.0, loadAvg1m() - ownEwma)
    // clean threshold: a quarter of the worker threads (= the verdict's
    // "2× cores/8" example at local[32] → 8.0) — ambient above it visibly
    // skews wall-clock on a box this size
    val loadThr = sys.env.get("SPARK_GRAFT_BENCH_LOAD_THR").map(_.toDouble)
      .getOrElse(math.max(2.0, cpus.toDouble / 4.0))
    // run-start gate: starting the whole suite under a load spike (the r17
    // driver refresh ran at load 19.2) taints every query — wait, bounded,
    // for the ambient to decay before the first measurement
    val runStartLoad = loadAvg1m()
    val runStartEpoch = System.currentTimeMillis() / 1000
    var startWaitSec = 0
    val maxStartWait = sys.env.getOrElse("SPARK_GRAFT_BENCH_MAX_WAIT", "300").toInt
    while (loadAvg1m() > loadThr && startWaitSec < maxStartWait) {
      Thread.sleep(15000); startWaitSec += 15
    }
    // session warmup (codegen, file index, shuffle machinery) so the first
    // measured query is not charged one-time JVM costs
    spark.range(1000000).selectExpr("sum(id)").collect()
    SparkEntry.entry(spark).write.mode("overwrite").format("noop").save()
    updateOwn()
    // per-query MIN of `reps` runs: scheduling noise and JVM codegen/GC
    // accumulation inflate single-shot times non-uniformly (observed across
    // rounds), and the minimum is the comparable per-query number; 3 reps
    // (up from 2) so one noisy rep cannot mint a fake regression
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    // optional substring filter for local single-query iteration (the
    // driver never sets it — full suite by default)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").toSeq).getOrElse(Nil)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only.exists(n.contains) }
      .map { case (name, fn) =>
      var failed = false
      // (loadavg at rep end, epoch at rep end, ambient estimate at rep
      // START) captured OUTSIDE the measured span alongside the isolation
      // sweep — crashed queries keep their context rows even though their
      // times are suppressed
      val repCtx = scala.collection.mutable.ArrayBuffer.empty[(Double, Long, Double)]
      def oneRep(): Double = {
        val amb0 = ambientNow()
        val t0 = System.nanoTime()
        // noop sink: materializes every output column (count() would let
        // Catalyst prune the computed expressions and undercount the work)
        try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        catch { case e: Throwable =>
          failed = true; System.err.println(s"[bench] $name: $e")
        }
        val t = (System.nanoTime() - t0) / 1e9
        updateOwn()
        repCtx += ((loadAvg1m(), System.currentTimeMillis() / 1000, amb0))
        // rep ISOLATION (outside the measured span): each rep builds fresh
        // frames, so rep N's persist()/localCheckpoint() blocks are dead
        // weight during rep N+1 — clearCache() frees the cached frames, and
        // unpersisting every registered RDD frees the localCheckpoint
        // blocks, which clearCache does NOT touch and which otherwise wait
        // for a GC cycle + ContextCleaner sweep (observed as rep-over-rep
        // GROWTH on checkpoint-heavy queries: memory pressure, not code).
        // BLOCKING: an async free can lag into the next measured rep,
        // undercutting the isolation this sweep exists for
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        t
      }
      var times = (1 to reps).map(_ => oneRep())
      // a rep is CLEAN when the ambient estimate at its start was within
      // the threshold; if every rep was contaminated and the box has since
      // quieted, ONE bounded retry buys a publishable clean rep instead of
      // a round of manual adjudication
      def cleanIdx = repCtx.zipWithIndex.collect {
        case ((_, _, amb), i) if amb <= loadThr => i }
      if (!failed && cleanIdx.isEmpty && ambientNow() <= loadThr)
        times = times :+ oneRep()
      // a crashed query must never publish a time: time-to-exception reads
      // as a speedup in round-over-round comparisons (r9 post-mortem)
      val cleanTimes =
        if (failed) Seq.empty[Double]
        else if (cleanIdx.nonEmpty) cleanIdx.map(times).toSeq
        else times
      val loadClean = !failed && cleanIdx.nonEmpty
      (name, cleanTimes, if (failed) Seq.empty[Double] else times,
        repCtx.toSeq, loadClean)
    }
    // 3-dp per-query times keep the JSON line compact enough to survive
    // tail-truncated captures; the full line is also written to a file so
    // every query's number stays readable even if stdout is clipped
    def r3(v: Double): String = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    // null (not a string marker) for crashed queries: the key stays
    // present while the map's value type remains numeric for consumers
    val qs = results.map { case (k, ts, _, _, _) =>
      "\"" + k + "\":" + (if (ts.isEmpty) "null" else r3(ts.min))
    }.mkString("{", ",", "}")
    val total = results.collect { case (_, ts, _, _, _) if ts.nonEmpty => ts.min }.sum
    val nErr = results.count(_._2.isEmpty)
    val nDirty = results.count { case (_, ts, _, _, clean) => ts.nonEmpty && !clean }
    val line = s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs,"sf":"$sfDir","reps":$reps,"errors":$nErr,"load_thr":${r3(loadThr)},"load_dirty":$nDirty,"start_wait_sec":$startWaitSec}"""
    try {
      val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_latest.json")
      // the file artifact carries EVERY rep's time (the stdout contract line
      // publishes the min over CLEAN reps): when one rep is inflated by
      // environment contention, the per-rep array shows it as noise instead
      // of letting a single bad rep masquerade as a regression
      val repsDetail = results.map { case (k, _, all, _, _) =>
        "\"" + k + "\":" + all.map(r3).mkString("[", ",", "]")
      }.mkString("{", ",", "}")
      // per-rep machine context: 1-min loadavg + epoch seconds at each
      // rep's END and the self-load-corrected AMBIENT estimate at each
      // rep's START — the adjudication evidence VERDICT r16 item 2 asked
      // for, now also driving the clean-rep selection above
      val repLoad = results.map { case (k, _, _, ctx, _) =>
        "\"" + k + "\":" + ctx.map(c => r3(c._1)).mkString("[", ",", "]")
      }.mkString("{", ",", "}")
      val repEpoch = results.map { case (k, _, _, ctx, _) =>
        "\"" + k + "\":" + ctx.map(_._2.toString).mkString("[", ",", "]")
      }.mkString("{", ",", "}")
      val repAmb = results.map { case (k, _, _, ctx, _) =>
        "\"" + k + "\":" + ctx.map(c => r3(c._3)).mkString("[", ",", "]")
      }.mkString("{", ",", "}")
      val cleanFlags = results.map { case (k, _, _, _, clean) =>
        "\"" + k + "\":" + clean
      }.mkString("{", ",", "}")
      val fileLine = line.dropRight(1) +
        s""","rep_times":$repsDetail,"rep_load":$repLoad,"rep_end_epoch":$repEpoch""" +
        s""","rep_ambient":$repAmb,"load_clean":$cleanFlags""" +
        s""","run_start_epoch":$runStartEpoch,"run_start_load":${r3(runStartLoad)}}"""
      java.nio.file.Files.write(java.nio.file.Paths.get(out),
        fileLine.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case e: Throwable => System.err.println(s"[bench] file write: $e") }
    println(line)
    spark.stop()
  }
}
