package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Salted join: identical results to the plain join, salt spreads the hot
  * key across buckets. */
class SkewSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("saltedJoin == plain join on a skewed key distribution") {
    import spark.implicits._
    // 10k rows of hot key 1 + a uniform tail — the skew shape AQE/salting target
    val facts = spark.range(10000).select(lit(1L).as("k"), col("id").as("v"))
      .union(spark.range(500).select((col("id") % 50 + 2).as("k"), col("id").as("v")))
    val dims = spark.range(60).select(col("id").as("k"),
      concat(lit("d"), col("id")).as("name"))
    val plain = facts.join(dims, "k")
      .select("k", "v", "name").orderBy("k", "v").collect()
    val salted = Skew.saltedJoin(facts, dims, "k", col("v"), 8)
      .select("k", "v", "name").orderBy("k", "v").collect()
    assert(salted.length == plain.length)
    assert(salted.map(_.toString).sameElements(plain.map(_.toString)))
  }

  test("binnedRangeJoin == plain interval join for aligned and misaligned widths") {
    import spark.implicits._
    // intervals of varying width, incl. one ending exactly on a bin edge
    // and one spanning many bins; facts cover edges and out-of-range values
    val intervals = Seq((0, 0.0, 10.0), (1, 5.0, 7.5), (2, 7.5, 40.0),
      (3, 40.0, 40.0), (4, 55.5, 60.1)).toDF("band_id", "lo", "hi")
    val facts = spark.range(0, 700).select((col("id") / 10.0).as("v"))
    val plain = facts.join(intervals, col("lo") <= col("v") && col("v") < col("hi"))
      .select("band_id", "v").orderBy("band_id", "v").collect()
    for (w <- Seq(10.0, 7.0, 3.3, 100.0)) {
      val binned = Skew.binnedRangeJoin(facts, col("v"), intervals,
          col("lo"), col("hi"), w)
        .select("band_id", "v").orderBy("band_id", "v").collect()
      assert(binned.length == plain.length, s"width $w: row count")
      assert(binned.map(_.toString).sameElements(plain.map(_.toString)), s"width $w")
    }
  }

  test("AQE splits the skewed partition of a sort-merge join at runtime") {
    import spark.implicits._
    // The automatic counterpart to saltedJoin: AQE detects the oversized
    // post-shuffle partition (hot key 1) and splits it across tasks,
    // marking the join skew=true. Thresholds are tuned down so the ~100k
    // hot rows qualify at test scale; broadcast is disabled to force the
    // sort-merge path the optimization applies to.
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.forceOptimizeSkewedJoin")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      // the downstream aggregate re-shuffles anyway; without force, AQE
      // declines splits that would add an exchange
      spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      // md5 payload keeps the hot partition incompressible and survives
      // pruning (it feeds the aggregate), so its shuffle size crosses the
      // skew threshold
      val facts = spark.range(100000).select(lit(1L).as("k"),
          md5(col("id").cast("string")).as("payload"))
        .union(spark.range(2000).select((col("id") % 50 + 2).as("k"),
          md5(col("id").cast("string")).as("payload")))
      val dims = spark.range(60).select(col("id").as("k"),
        concat(lit("d"), col("id")).as("name"))
      val j = facts.join(dims, "k").groupBy("name")
        .agg(count(lit(1)).as("n"), sum(length(col("payload"))).as("bytes"))
      val rows = j.collect()
      assert(rows.map(_.getLong(1)).sum == 102000L)
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"), s"AQE did not mark the skew split:\n$p")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("sf1-scale skew: AQE split == explicit salting row-for-row; per-task read volume bounded") {
    import spark.implicits._
    // VERDICT r9 item 8 — the two skew tools must agree on RESULTS and
    // the AQE split must actually bound what any single task reads.
    // ~1.2M-row skewed fixture (hot key 1 carries 1M incompressible md5
    // payloads ≈ 40 MB post-shuffle): the same shape a 100 TB corpus
    // presents when one document/user id dominates a join key.
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.forceOptimizeSkewedJoin")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1MB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4MB")
      spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      val facts = spark.range(1000000).select(lit(1L).as("k"),
          md5(col("id").cast("string")).as("payload"))
        .union(spark.range(200000).select((col("id") % 50 + 2).as("k"),
          md5(col("id").cast("string")).as("payload")))
      val dims = spark.range(60).select(col("id").as("k"),
        concat(lit("d"), col("id")).as("name"))
      // per-task shuffle-read telemetry for the AQE run
      val reads = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = t.taskMetrics
          if (m != null && m.shuffleReadMetrics.totalBytesRead > 0)
            reads.add(m.shuffleReadMetrics.totalBytesRead)
        }
      }
      spark.sparkContext.addSparkListener(listener)
      val aqe = try {
        // aggregate AFTER the join so correctness is summarized compactly
        // (1.2M joined rows reduced to 60) while the join itself still
        // shuffles the full payload volume the skew split must spread
        val df = facts.join(dims, "k").groupBy("name")
          .agg(count(lit(1)).as("n"), sum(length(col("payload"))).as("bytes"))
        val out = df.collect()
        // bounded poll for listener drain (a fixed sleep is flaky on a
        // loaded box): wait until the captured read count is stable
        var last = -1; var stable = 0; var waited = 0
        while (stable < 3 && waited < 15000) {
          Thread.sleep(250); waited += 250
          val n = reads.size
          if (n == last && n > 0) stable += 1 else { stable = 0; last = n }
        }
        val p = df.queryExecution.executedPlan.toString
        assert(p.contains("skew=true"), s"AQE did not mark the skew split:\n$p")
        out
      } finally spark.sparkContext.removeSparkListener(listener)
      // row-identity: explicit salting produces the same 60-group summary
      val salted = Skew.saltedJoin(facts, dims, "k", col("payload"), 16)
        .groupBy("name")
        .agg(count(lit(1)).as("n"), sum(length(col("payload"))).as("bytes"))
        .collect()
      def keyed(rows: Array[org.apache.spark.sql.Row]) =
        rows.map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(keyed(salted) == keyed(aqe), "salted join diverged from AQE skew join")
      assert(aqe.map(_.getLong(1)).sum == 1200000L)
      // bounded read volume: without the split ONE task would read the
      // whole ~40 MB hot partition (>80% of total shuffle volume); with
      // it, no task may read more than a quarter of the total — the hot
      // key demonstrably spreads across >= 4 reading tasks. Relative
      // bounds only: absolute byte ceilings vary with compression and
      // partition-count config (review r10)
      val r = reads.toArray(Array.empty[java.lang.Long]).map(_.toLong)
      assert(r.nonEmpty, "no shuffle-read telemetry captured")
      val total = r.sum; val biggest = r.max
      assert(biggest.toDouble / total <= 0.25,
        s"one task read ${biggest}B of ${total}B — hot partition not split")
      assert(r.count(_ > 0) >= 4,
        s"only ${r.count(_ > 0)} tasks performed shuffle reads")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("salt values are deterministic and span the bucket range") {
    import spark.implicits._
    val df = spark.range(1000).select(col("id"))
      .withColumn("salt", pmod(hash(col("id")), lit(8)))
    val salts = df.select("salt").distinct().collect().map(_.getInt(0)).sorted
    assert(salts.sameElements(0 until 8))
    val again = spark.range(1000).select(col("id"))
      .withColumn("salt", pmod(hash(col("id")), lit(8)))
    assert(df.collect().map(_.toString).sameElements(again.collect().map(_.toString)))
  }
}
