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
    // session warmup (codegen, file index, shuffle machinery) so the first
    // measured query is not charged one-time JVM costs
    spark.range(1000000).selectExpr("sum(id)").collect()
    SparkEntry.entry(spark).write.mode("overwrite").format("noop").save()
    // per-query MIN of `reps` runs: scheduling noise and JVM codegen/GC
    // accumulation inflate single-shot times non-uniformly (observed across
    // rounds), and the minimum is the comparable per-query number; 3 reps
    // (up from 2) so one noisy rep cannot mint a fake regression
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    // optional substring filter for local single-query iteration (the
    // driver never sets it — full suite by default)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").toSeq).getOrElse(Nil)
    // machine-load context per rep boundary: four consecutive rounds of
    // environment-vs-code adjudication ran on rep-shape inference alone;
    // recording /proc/loadavg (1-min field) + wall-clock at each rep's end
    // lets the next ambient-drift triage quote measured load instead
    def loadAvg1m(): Double =
      try new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg"))).split("\\s+")(0).toDouble
      catch { case _: Throwable => -1.0 }
    val runStartEpoch = System.currentTimeMillis() / 1000
    val runStartLoad = loadAvg1m()
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only.exists(n.contains) }
      .map { case (name, fn) =>
      var failed = false
      // (loadavg at rep end, epoch seconds at rep end) captured OUTSIDE the
      // measured span alongside the isolation sweep — crashed queries keep
      // their context rows even though their times are suppressed
      val repCtx = scala.collection.mutable.ArrayBuffer.empty[(Double, Long)]
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        // noop sink: materializes every output column (count() would let
        // Catalyst prune the computed expressions and undercount the work)
        try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        catch { case e: Throwable =>
          failed = true; System.err.println(s"[bench] $name: $e")
        }
        val t = (System.nanoTime() - t0) / 1e9
        repCtx += ((loadAvg1m(), System.currentTimeMillis() / 1000))
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
      // a crashed query must never publish a time: time-to-exception reads
      // as a speedup in round-over-round comparisons (r9 post-mortem)
      val cleanTimes = if (failed) Seq.empty[Double] else times
      (name, cleanTimes, repCtx.toSeq)
    }
    // 3-dp per-query times keep the JSON line compact enough to survive
    // tail-truncated captures; the full line is also written to a file so
    // every query's number stays readable even if stdout is clipped
    def r3(v: Double): String = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    // null (not a string marker) for crashed queries: the key stays
    // present while the map's value type remains numeric for consumers
    val qs = results.map { case (k, ts, _) =>
      "\"" + k + "\":" + (if (ts.isEmpty) "null" else r3(ts.min))
    }.mkString("{", ",", "}")
    val total = results.collect { case (_, ts, _) if ts.nonEmpty => ts.min }.sum
    val nErr = results.count(_._2.isEmpty)
    val line = s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs,"sf":"$sfDir","reps":$reps,"errors":$nErr}"""
    try {
      val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_latest.json")
      // the file artifact carries EVERY rep's time (the stdout contract line
      // stays min-only for compactness): when one rep is inflated by
      // environment contention, the per-rep array shows it as noise instead
      // of letting a single bad rep masquerade as a regression
      val repsDetail = results.map { case (k, ts, _) =>
        "\"" + k + "\":" + ts.map(r3).mkString("[", ",", "]")
      }.mkString("{", ",", "}")
      // per-rep machine context: 1-min loadavg and epoch seconds at each
      // rep's END — the adjudication evidence VERDICT r16 item 2 asked for
      val repLoad = results.map { case (k, _, ctx) =>
        "\"" + k + "\":" + ctx.map(c => r3(c._1)).mkString("[", ",", "]")
      }.mkString("{", ",", "}")
      val repEpoch = results.map { case (k, _, ctx) =>
        "\"" + k + "\":" + ctx.map(_._2.toString).mkString("[", ",", "]")
      }.mkString("{", ",", "}")
      val fileLine = line.dropRight(1) +
        s""","rep_times":$repsDetail,"rep_load":$repLoad,"rep_end_epoch":$repEpoch""" +
        s""","run_start_epoch":$runStartEpoch,"run_start_load":${r3(runStartLoad)}}"""
      java.nio.file.Files.write(java.nio.file.Paths.get(out),
        fileLine.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case e: Throwable => System.err.println(s"[bench] file write: $e") }
    println(line)
    spark.stop()
  }
}
