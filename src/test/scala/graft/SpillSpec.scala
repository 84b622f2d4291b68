package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.scalatest.funsuite.AnyFunSuite
import java.util.concurrent.atomic.AtomicLong

/** Forced-spill drive of the heavy family (VERDICT r10 item 2).
  *
  * BENCH_DETAIL has reported 0.0 MB spill at every sf — good hygiene, but
  * it means the external-sort/agg-fallback code paths the 100 TB story
  * rests on were never OBSERVED in this repo. Real memory pressure is not
  * reproducible in a shared test JVM, but the spill code paths are: Spark
  * exposes the operator buffer thresholds as session-scoped SQL confs
  * (window/SMJ buffers hand rows to UnsafeExternalSorter past
  * `*.buffer.in.memory.threshold` and force a disk spill past
  * `*.buffer.spill.threshold`; hash aggregation falls back to sort-based
  * past `TungstenAggregate.testFallbackStartsAt`). Driving the registry
  * queries through those paths asserts the property that matters at
  * scale: OUT-OF-CORE EXECUTION IS RESULT-IDENTICAL, and the spill
  * machinery actually engages (nonzero spilled bytes in task metrics).
  *
  * q_stream_watermark anchors the spill guarantee deterministically: its
  * phase-1 window buffers B = 1000 rows per arrival bucket, far past the
  * 32-row threshold, so at least one real spill happens regardless of
  * fixture row distribution.
  */
class SpillSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.SF

  private val HEAVY = Seq(
    "q_stream_watermark", // 1000-row window buckets — guaranteed spill
    "q_window_lag", "q_window_cumsum", "q_window_rank",
    "q_agg_hash", "q_agg_collect", "q_assoc_rules",
    "q_profile_histogram", "q_join_shuffle", "q_sort_multi")

  private val SPILL_CONFS = Seq(
    "spark.sql.windowExec.buffer.in.memory.threshold" -> "32",
    "spark.sql.windowExec.buffer.spill.threshold" -> "32",
    "spark.sql.sortMergeJoinExec.buffer.in.memory.threshold" -> "32",
    "spark.sql.sortMergeJoinExec.buffer.spill.threshold" -> "32",
    "spark.sql.objectHashAggregate.sortBased.fallbackThreshold" -> "16",
    "spark.sql.TungstenAggregate.testFallbackStartsAt" -> "64,128")

  test("heavy family under forced spill thresholds: identical results, real spill observed") {
    // every registry query ends in a total-order ORDER BY (oracle
    // contract), so row-string sequences are directly comparable
    def run(name: String): Seq[String] =
      SparkEntry.queries(name)(spark, sf).collect().toSeq.map(_.toString)
    val normal = HEAVY.map(n => n -> run(n)).toMap

    val spilled = new AtomicLong
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) spilled.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val saved = SPILL_CONFS.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      SPILL_CONFS.foreach { case (k, v) => spark.conf.set(k, v) }
      val constrained = HEAVY.map(n => n -> run(n)).toMap
      HEAVY.foreach { n =>
        assert(constrained(n) == normal(n),
          s"$n diverged under forced spill (${constrained(n).size} vs ${normal(n).size} rows)")
      }
      // listener events drain asynchronously — poll, don't sleep blind
      var waited = 0
      while (spilled.get() == 0 && waited < 10000) { Thread.sleep(100); waited += 100 }
      assert(spilled.get() > 0,
        "no spilled bytes observed — the forced thresholds did not engage any operator")
      info(f"spilled ${spilled.get() / 1e6}%.2f MB across ${HEAVY.size} queries")
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }
  }
}
