package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicLong

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Tables.mkSession(s"local[$cpus]", cpus)
    spark.sparkContext.setLogLevel("WARN")
    // Untimed pre-phase: ONE full pass over the registry. This (a) JITs
    // the parquet reader, codegen, and shuffle paths (the DuckDB baseline
    // is likewise measured warm — BASELINE.md), and (b) force-builds every
    // persisted Tables.memoizedOnDisk index artifact (PQ codebooks, LSH
    // tables, minhash signatures, BPE merges, hash indexes) so the timed
    // passes measure STEADY-STATE query cost. The one-time build cost is
    // reported separately as artifact_build_s (measured inside
    // memoizedOnDisk, so it excludes ordinary query work), with the whole
    // pre-phase as prewarm_s — a production pipeline builds these once
    // and amortizes them across runs, so conflating them with per-query
    // time misprices both (VERDICT r9 item 1).
    // GRAFT_BENCH_ONLY=q_a,q_b: dev loop for timing a changed query
    // without the full-registry pass (NOT the driver protocol — the
    // driver runs unfiltered; totals from a filtered run are partial)
    val only = sys.env.get("GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    // A typo'd filter name silently yields an empty (or partial) run —
    // warn loudly rather than let a dev loop time the wrong thing
    // (ADVICE r15).
    only.foreach { names =>
      val unknown = names.diff(SparkEntry.queries.keySet)
      if (unknown.nonEmpty) System.err.println(
        s"[bench] WARNING: GRAFT_BENCH_ONLY names not in the registry: " +
          unknown.toSeq.sorted.mkString(", "))
    }
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val preT0 = System.nanoTime()
    selected.foreach { case (_, fn) =>
      try fn(spark, sfDir).count()
      catch { case _: Throwable => () }
    }
    val prewarmS = (System.nanoTime() - preT0) / 1e9
    val artifactS = Tables.artifactBuildNanos.get / 1e9
    // Per-query min over three INTERLEAVED full passes: the box's jitter
    // comes in multi-second windows (measured; not GC, not CPU quota), so
    // back-to-back reps of one query can all land inside a slow window —
    // round-robin passes ensure each query sees at most one inflated rep.
    // Warm caches across passes mirror the warm-cache single-run DuckDB
    // baseline (BASELINE.md).
    val ordered = selected
    val times = scala.collection.mutable.Map.empty[String, Double]
    // Errors are FIRST-CLASS bench output (VERDICT r4 item 4): a failing
    // query must not silently "benchmark" as time-to-throw while the total
    // quietly shrinks. Failed reps record no time; a query that fails every
    // rep appears ONLY under "errors" and inflates the errors count in the
    // parsed final line.
    val errors = scala.collection.mutable.Map.empty[String, String]
    // Shuffle/spill telemetry (min over the last TWO passes): per-query
    // shuffle-write bytes are the scale signal wall time can't give — a
    // plan regression that doubles a shuffle shows up here rounds before
    // it would dominate local wall time. Collected via task metrics; the
    // drain sleeps run OUTSIDE the timed section. Min-of-2 because a
    // SHARED persisted artifact evicted mid-pass re-materializes under
    // whichever query touches it next — r12/r13 showed the same ~10 MB
    // rebuild billed to q_sim_ann_ivfc_pq_delta one run and
    // q_sim_ann_ivfpq_delta the next; the min is the query's OWN
    // steady-state shuffle, the rebuild shows up (correctly) nowhere
    // because artifact_build_s already prices artifact construction.
    val shuffleAcc = new AtomicLong; val spillAcc = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          shuffleAcc.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          spillAcc.addAndGet(m.memoryBytesSpilled)
        }
      }
    })
    val shuffleMb = scala.collection.mutable.Map.empty[String, Double]
    // max over the same passes (ADVICE r14): the min filters shared-
    // artifact rebuild misattribution, but alone it also hides a
    // genuinely nondeterministic regression (e.g. AQE flipping a join to
    // sort-merge on one of two passes). BENCH_DETAIL records both, so a
    // large min-to-max spread is visible instead of silently discarded;
    // scaling audits keep reading the steady-state min.
    val shuffleMbMax = scala.collection.mutable.Map.empty[String, Double]
    val spillMb = scala.collection.mutable.Map.empty[String, Double]
    for (pass <- 1 to 3; (name, fn) <- ordered) {
      val instrumented = pass >= 2
      if (instrumented) { Thread.sleep(80); shuffleAcc.set(0); spillAcc.set(0) }
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        times(name) = math.min(times.getOrElse(name, Double.MaxValue), dt)
        if (instrumented) {
          Thread.sleep(80) // let listener events drain before reading
          shuffleMb(name) = math.min(
            shuffleMb.getOrElse(name, Double.MaxValue), shuffleAcc.get / 1e6)
          shuffleMbMax(name) = math.max(
            shuffleMbMax.getOrElse(name, 0.0), shuffleAcc.get / 1e6)
          spillMb(name) = math.min(
            spillMb.getOrElse(name, Double.MaxValue), spillAcc.get / 1e6)
        }
      } catch { case e: Throwable =>
        errors(name) = s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(120)}"
      }
    }
    // Forced-spill probe (VERDICT r10 item 2), UNTIMED: every earlier
    // round reported 0.0 MB spill, so the out-of-core paths the 100×
    // scale claim rests on were never observed. Session-scoped SQL confs
    // force the window/SMJ buffers and hash-agg fallback through their
    // external-sort code paths; the probe records (a) spilled bytes
    // actually observed in task metrics and (b) whether row counts match
    // the unconstrained pass (full row-identity at fixture scale is
    // SpillSpec's job — here the corpus-scale evidence is "spill engaged,
    // cardinality unchanged").
    val spillProbe: String = try {
      val heavyFam = Seq("q_stream_watermark", "q_window_lag", "q_agg_hash",
        "q_assoc_rules", "q_profile_histogram", "q_window_cumsum")
      // 512-row buffers: small enough that q_stream_watermark's 1000-row
      // window buckets and the per-user event windows MUST spill, large
      // enough that the spill-file count stays sane at sf0.1. The
      // TungstenAggregate.testFallbackStartsAt conf SpillSpec uses at
      // fixture scale is deliberately absent here: forcing sort-fallback
      // on every aggregation across 32 concurrent sf0.1 tasks OOMs the
      // unified memory region (observed exit 52 in the r11 window runs)
      // — that conf is a test harness, not a production memory-pressure
      // model.
      val spillConfs = Seq(
        "spark.sql.windowExec.buffer.in.memory.threshold" -> "512",
        "spark.sql.windowExec.buffer.spill.threshold" -> "512",
        "spark.sql.sortMergeJoinExec.buffer.in.memory.threshold" -> "512",
        "spark.sql.sortMergeJoinExec.buffer.spill.threshold" -> "512",
        "spark.sql.objectHashAggregate.sortBased.fallbackThreshold" -> "1024")
      val base = heavyFam.map(n =>
        n -> SparkEntry.queries(n)(spark, sfDir).count()).toMap
      Thread.sleep(120); spillAcc.set(0)
      spillConfs.foreach { case (k, v) => spark.conf.set(k, v) }
      val forced = heavyFam.map(n =>
        n -> SparkEntry.queries(n)(spark, sfDir).count()).toMap
      spillConfs.foreach { case (k, _) => spark.conf.unset(k) }
      Thread.sleep(120)
      val mb = spillAcc.get / 1e6
      val ok = heavyFam.forall(n => base(n) == forced(n))
      f""","forced_spill_mb":$mb%.2f,"forced_spill_counts_match":$ok"""
    } catch { case e: Throwable =>
      // quotes/controls stripped rather than escaped: jstr is defined
      // below this point and a probe failure must stay valid JSON
      val msg = s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(120)}"
        .filter(c => c >= ' ' && c != '"' && c != '\\')
      s""","forced_spill_error":"$msg""""
    }
    val results = times.toMap
    def jstr(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    def fmt(v: Double): String = f"$v%.3f"
    def line(entries: Seq[(String, Double)], extra: String): String = {
      val qs = entries.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
      val total = results.values.sum
      val errFields = if (errors.isEmpty) s""","errors":0"""
        else {
          val em = errors.toSeq.sortBy(_._1)
            .map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
          s""","errors":${errors.size},"error_queries":$em"""
        }
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec",""" +
        s""""artifact_build_s":${fmt(artifactS)},"prewarm_s":${fmt(prewarmS)}""" +
        s"""$errFields$extra,"queries":$qs,"sf":"$sfDir"}"""
    }
    // Full per-query record: printed for the log AND written to
    // BENCH_DETAIL.json, because the driver only keeps the last ~2000
    // chars of output — the full 80-query map alone is ~3 KB, which is
    // why rounds 1–2 recorded parsed:null. The FINAL printed line below
    // is truncated to the slowest queries so it always fits the tail
    // window intact and parses.
    val full = {
      val base = line(results.toSeq.sortBy(_._1), "")
      val sh = shuffleMb.toSeq.sortBy(_._1)
        .map { case (k, v) => "\"" + k + "\":" + f"$v%.2f" }.mkString("{", ",", "}")
      // only queries whose max meaningfully exceeds the min (>1.2x and
      // >1 MB apart) — the interesting nondeterminism, not float noise
      val shMax = shuffleMbMax.toSeq.sortBy(_._1)
        .filter { case (k, v) => v > shuffleMb.getOrElse(k, 0.0) * 1.2 &&
          v - shuffleMb.getOrElse(k, 0.0) > 1.0 }
        .map { case (k, v) => "\"" + k + "\":" + f"$v%.2f" }.mkString("{", ",", "}")
      val totalSpill = spillMb.values.sum
      base.dropRight(1) +
        s""","shuffle_mb":$sh,"shuffle_mb_max_outliers":$shMax""" +
        s""","spill_mb_total":${f"$totalSpill%.2f"}$spillProbe}"""
    }
    // A GRAFT_BENCH_ONLY dev run writes a SIDE file: the canonical
    // BENCH_DETAIL.json is the tracked artifact the driver protocol and
    // tools/shuffle_scaling.py read — a forgotten env var must not
    // clobber it with partial totals (ADVICE r15).
    val detailPath =
      if (only.isDefined) "BENCH_DETAIL.partial.json" else "BENCH_DETAIL.json"
    Files.write(Paths.get(detailPath), (full + "\n").getBytes(StandardCharsets.UTF_8))
    println(full)
    val budget = 1500 // chars for the final line; tail window is 2000 minus sbt's epilogue
    val byCost = results.toSeq.sortBy { case (k, v) => (-v, k) }
    var keep = byCost.length
    while (keep > 1 && line(byCost.take(keep), "").length > budget) keep -= 1
    val kept = byCost.take(keep).sortBy(_._1)
    val extra = s""","n_queries":${results.size},"omitted_fastest":${results.size - keep}"""
    // Stop Spark BEFORE the final line so no shutdown-hook logging can land
    // after it — the driver parses the last ~2000 chars of output.
    spark.stop()
    println(line(kept, extra))
  }
}
