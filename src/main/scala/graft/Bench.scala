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
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // One-time session warmup (parquet reader, codegen infra, shuffle env)
    // so per-query numbers measure the query, not first-run JVM costs.
    try spark.read.parquet(s"$sfDir/lineitem.parquet").limit(10).count()
    catch { case _: Throwable => }
    // Best-of-N per query: a single sample on a shared box measures the
    // box, not the query (round 2's driver artifact read 2.2x baseline
    // purely from contention while four quiet runs sat at 1.05x). The
    // minimum of N runs is the standard contention-robust estimator for
    // deterministic workloads.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt.max(1)
    // Run-condition stamps for the bench_full.json sidecar (round-6
    // VERDICT task: three consecutive rounds committed records where
    // "contention vs regression" could only be inferred, not read).
    // loadavg is sampled BEFORE the workload (what else the box was
    // doing) and after (sanity); ts anchors the run against the
    // test-suite/driver schedule.
    def loadavg(): Double =
      try java.lang.management.ManagementFactory
        .getOperatingSystemMXBean.getSystemLoadAverage
      catch { case _: Throwable => -1.0 }
    // Quiet-box gate (round-13 VERDICT task 1, after three consecutive
    // rounds closed on a hot box): spin-wait until the 1-minute loadavg
    // drops below SPARK_GRAFT_BENCH_MAXLOAD (default 2.0) before the
    // workload starts, bounded by SPARK_GRAFT_BENCH_MAXWAIT_S (default
    // 1200 s). The best-of-N estimator cannot save a record taken at
    // loadavg 8; refusing to start is the only fix that lives in code.
    // Set SPARK_GRAFT_BENCH_MAXLOAD high (e.g. 99) to skip the gate for
    // quick iteration runs. Every wait is printed so a gated record
    // shows what it waited on.
    val maxLoad =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_MAXLOAD", "2.0").toDouble
    val maxWaitS =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_MAXWAIT_S", "1200").toLong
    val waitDeadline = System.nanoTime() + maxWaitS * 1000000000L
    var waitedS = 0L
    while (loadavg() >= maxLoad && System.nanoTime() < waitDeadline) {
      System.err.println(f"[bench-gate] loadavg ${loadavg()}%.2f >= " +
        f"$maxLoad%.2f; waited ${waitedS}s, sleeping 30s")
      Thread.sleep(30000); waitedS += 30
    }
    if (loadavg() >= maxLoad)
      System.err.println(f"[bench-gate] GAVE UP after ${waitedS}s; " +
        f"recording at loadavg ${loadavg()}%.2f")
    val loadStart = loadavg()
    val tsStart = java.time.Instant.now().toString
    // Streaming queries run FIRST (round-14 VERDICT task 3): the gate
    // samples loadavg once, before the run — load arriving mid-run lands
    // on whatever executes last, and the micro-batch/checkpoint timers of
    // the streaming class are the most wall-clock-sensitive rows on the
    // board (the 13:20Z record read its 8 stream rows at 2-3x their quiet
    // twins purely from a loadavg 1.3 -> 6.5 ramp). Putting them in the
    // quietest minutes right after the gate, with one extra rep
    // (best-of-3 vs best-of-2), makes the driver-visible stream numbers
    // robust to mid-run contention the gate cannot see.
    // an EXPLICIT stream-reps setting always wins (quick runs may want
    // 1); only the default is floored at max(3, reps)
    val streamReps = sys.env.get("SPARK_GRAFT_BENCH_STREAM_REPS")
      .map(_.toInt.max(1)).getOrElse(reps.max(3))
    val (streamQs, batchQs) =
      SparkEntry.queries.toSeq.sortBy(_._1).partition(_._1.contains("stream"))
    // INTERLEAVED passes (pass 1 runs every query, then pass 2, ...):
    // back-to-back reps of one query share any contention window, so a
    // 5-minute load spike used to poison BOTH samples of the queries
    // under it (round-17's closing record read q119/q120/q121/q99 at
    // 5-11x their quiet twins — adjacent in sorted order, one window).
    // Interleaving makes a window hit DIFFERENT queries in each pass, so
    // the per-query minimum recovers unless contention outlasts a whole
    // pass. Only SUCCESSFUL reps compete for the minimum: a fast-failing
    // rep must not report its failure duration as the query's time. All
    // reps failed -> -1 sentinel, visibly wrong rather than silently fast.
    def runClass(qs: Seq[(String, (SparkSession, String) =>
        org.apache.spark.sql.DataFrame)], nReps: Int) = {
      val times = scala.collection.mutable.Map.empty[String, List[Double]]
        .withDefaultValue(Nil)
      (1 to nReps).foreach { _ =>
        qs.foreach { case (name, fn) =>
          val t0 = System.nanoTime()
          val ok = try { fn(spark, sfDir).count(); true }
                   catch { case _: Throwable => false }
          if (ok) times(name) = ((System.nanoTime() - t0) / 1e9) :: times(name)
        }
      }
      qs.map { case (name, _) =>
        name -> (if (times(name).nonEmpty) times(name).min else -1.0) }
    }
    val streamResults = runClass(streamQs, streamReps)
    val streamTotal = streamResults.map(_._2.max(0.0)).sum
    val results = (streamResults ++ runClass(batchQs, reps)).toMap
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // the stream class runs at its own (>=3) rep count, so the headline
    // total mixes rep regimes — stamp the per-class split on the PRINTED
    // line too (not only the sidecar), so cross-round ratio comparisons
    // can be made apples-to-apples per class
    val batchTotal = total - streamTotal
    def classSplit: String =
      s""""stream_total_s":${fmt(3, streamTotal)},"batch_total_s":${fmt(3, batchTotal)},"""
    // The harness that reads this line captures only the LAST ~2000 bytes
    // of output, and sbt appends a "[success] Total time" line after us —
    // a full-precision 62-query map (~2.6 KB) gets its head truncated and
    // the line becomes unparseable (that is exactly what nulled the r3
    // bench artifact). Render at 3 decimals (sub-millisecond digits are
    // noise at these magnitudes anyway) and drop to 2 if the query set
    // ever grows the line past the safe budget.
    def fmt(dp: Int, v: Double): String = // Locale.ROOT: "0.297", never "0,297"
      String.format(java.util.Locale.ROOT, s"%.${dp}f", Double.box(v))
    def render(dp: Int): String = {
      val qs = results.toSeq.sortBy(_._1)
        .map { case (k, v) => "\"" + k + "\":" + fmt(dp, v) }
        .mkString("{", ",", "}")
      s"""{"metric":"total","value":${fmt(3, total)},"unit":"sec",$classSplit"queries":$qs,"sf":"$sfDir"}"""
    }
    // Tiered degradation: 3dp → 2dp → 1dp → slowest-only. The harness
    // tail window is 2000 bytes and must also hold sbt's "[info] "
    // prefix plus the trailing "[success] Total time: …" line (~80
    // bytes together), so 1900 is the HARD ceiling for any printed line
    // — an oversized line head-truncates in the capture into an
    // unparseable artifact (the round-3 failure this tiering prevents).
    // The last tier keeps only the SLOWEST entries that fit plus a
    // "dropped" count; the full-precision map is always written to
    // bench_full.json alongside, so no resolution is ever lost locally.
    def renderSlowest(dp: Int, budget: Int): String = {
      val byTime = results.toSeq.sortBy(-_._2)
      val kept = scala.collection.mutable.ListBuffer.empty[(String, Double)]
      var len = 180 // fixed JSON scaffolding + total/class-split/sf/dropped fields
      // size each entry by its ACTUAL rendered length ("key":value plus a
      // comma) — a fixed per-entry estimate undercounts values >= 1000 s
      for ((k, v) <- byTime) {
        val entryLen = k.length + 3 + fmt(dp, v).length + 1
        if (len + entryLen <= budget) { kept += (k -> v); len += entryLen }
      }
      val qs = kept.sortBy(_._1)
        .map { case (k, v) => "\"" + k + "\":" + fmt(dp, v) }
        .mkString("{", ",", "}")
      s"""{"metric":"total","value":${fmt(3, total)},"unit":"sec",$classSplit"queries":$qs,"dropped":${results.size - kept.size},"sf":"$sfDir"}"""
    }
    val full = render(3)
    // Sidecar gets the full map PLUS the run-condition stamps; the
    // printed line keeps the driver's schema (and its byte budget).
    val sidecar = full.dropRight(1) +
      s""","reps":$reps,"stream_reps":$streamReps""" +
      s""","loadavg_start":${fmt(2, loadStart)}""" +
      s""","loadavg_end":${fmt(2, loadavg())},"ts":"$tsStart"}"""
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_full.json"), sidecar + "\n")
    catch { case _: Throwable => } // best-effort sidecar, never fail the run
    // Run-stamped copy: bench_full.json is the mutable "latest" record
    // the driver and builder both overwrite (round-7 VERDICT: a
    // contended driver run clobbered the committed quiet record in the
    // working tree); the per-run file makes every sample durable so the
    // record file can churn without losing history.
    try {
      val runsDir = java.nio.file.Paths.get("bench_runs")
      java.nio.file.Files.createDirectories(runsDir)
      java.nio.file.Files.writeString(
        runsDir.resolve(s"bench_${tsStart.replace(":", "").replace("-", "")}.json"),
        sidecar + "\n")
    } catch { case _: Throwable => }
    // thunks, not values: coarser tiers render only when the finer one
    // overflows the budget (a varargs Iterator evaluates eagerly)
    println(
      Iterator(() => full, () => render(2), () => render(1)).map(_())
        .find(_.length <= 1900)
        .getOrElse(renderSlowest(1, 1800)))
    spark.stop()
  }
}
