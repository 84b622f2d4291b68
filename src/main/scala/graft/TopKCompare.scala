package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Paired benchmark: the custom TopKPerKey plan vs Spark 4's native
  * WindowGroupLimit path (`InferWindowGroupLimit` → `WindowGroupLimitExec`)
  * on the SAME row_number-filter query — the custom operator earns its keep
  * only if it measurably wins. One JVM, shared warmup, interleaved reps,
  * per-mode min; the mode toggle is `spark.graft.topk.rewrite.enabled`.
  * Usage: `sbt "runMain graft.TopKCompare [sfDir]"`; results recorded in
  * DESIGN.md.
  */
object TopKCompare {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.mkSession(s"local[$cpus]", cpus)
    spark.sparkContext.setLogLevel("ERROR")

    // low-cardinality keys (customers) and high-cardinality keys (orders):
    // the partial-heap saving and the guard behave differently at the two
    // extremes, so both must be measured
    def orders(k: Int): DataFrame = {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.t(spark, sfDir, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= k)
    }
    def lineitem(k: Int): DataFrame = {
      val w = Window.partitionBy("l_orderkey")
        .orderBy(col("l_extendedprice").desc, col("l_linenumber").asc)
      Tables.t(spark, sfDir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= k)
    }
    val cases: Seq[(String, () => DataFrame)] = Seq(
      "orders_top3_by_custkey" -> (() => orders(3)),
      "lineitem_top2_by_orderkey" -> (() => lineitem(2)))

    Seq("true", "false").foreach { m => // warm both paths
      spark.conf.set("spark.graft.topk.rewrite.enabled", m)
      cases.foreach(_._2().count())
    }
    val best = scala.collection.mutable.Map.empty[(String, String), Double]
    for (_ <- 1 to 5; (cn, fn) <- cases; m <- Seq("true", "false")) {
      spark.conf.set("spark.graft.topk.rewrite.enabled", m)
      val t0 = System.nanoTime()
      fn().count()
      val dt = (System.nanoTime() - t0) / 1e9
      best((cn, m)) = math.min(best.getOrElse((cn, m), Double.MaxValue), dt)
    }
    cases.foreach { case (cn, _) =>
      val custom = best((cn, "true")); val native = best((cn, "false"))
      println(f"""{"case":"$cn","topk_per_key_s":$custom%.3f,"""
        + f""""native_window_group_limit_s":$native%.3f,"ratio":${custom / native}%.3f}""")
    }
    spark.stop()
  }
}
