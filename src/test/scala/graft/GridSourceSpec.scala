package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DataSource V2 grid connector: schema, determinism, stripe pruning,
  * filter pushdown, column pruning. */
class GridSourceSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def formatted(df: DataFrame): String =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .queryExecution.explainString(FormattedMode)

  test("full scan: row count and deterministic cell values") {
    val g = spark.read.format("graft-grid")
      .option("width", 16).option("height", 8).load()
    assert(g.count() == 16 * 8)
    val bad = g.where(col("v") =!= (col("x") * 31 + col("y") * 17) % 97).count()
    assert(bad == 0, s"$bad cells disagree with the formula")
  }

  test("y bounds prune stripes at planning time") {
    val g = spark.read.format("graft-grid")
      .option("width", 8).option("height", 64).option("stripes", 8).load()
      .where(col("y") >= 16 && col("y") < 32)
    // 2 of the 8 8-row stripes intersect [16, 32) — the others are never
    // planned, the DSv2 analog of partition pruning
    assert(g.rdd.getNumPartitions == 2, s"got ${g.rdd.getNumPartitions} partitions")
    assert(g.count() == 8 * 16)
  }

  test("pushed filters and pruned read schema are plan-visible") {
    val g = spark.read.format("graft-grid")
      .option("width", 64).option("height", 64).load()
      .where(col("y") >= 16 && col("x") < 10)
      .select("x", "v")
    val p = formatted(g)
    assert(p.contains("PushedFilters: [GreaterThanOrEqual(y,16), LessThan(x,10)]"), p)
    // y is consumed entirely by the pushdown, so the reader schema drops it
    assert(p.contains("ReadSchema: struct<x:int,v:int>"), p)
    assert(g.count() == 10 * 48)
  }

  test("limit pushdown stops generation at the reader and is plan-visible") {
    val g = spark.read.format("graft-grid")
      .option("width", 1000).option("height", 1000).load()
      .limit(5)
    assert(g.count() == 5)
    val p = formatted(g)
    assert(p.contains("PushedLimit: 5"), p)
  }

  test("pushed COUNT(*) scan reports 1-row statistics, not the metadata count") {
    import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
    val g = spark.read.format("graft-grid")
      .option("width", 64).option("height", 64).option("stripes", 8).load()
    val counted = g.agg(count(lit(1)).as("n"))
    val qe = counted
      .asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .queryExecution
    val scans = qe.optimizedPlan.collect { case r: DataSourceV2ScanRelation => r }
    assert(scans.nonEmpty, qe.optimizedPlan.toString)
    // the scan emits ONE pre-aggregated row once the count is pushed; a
    // 4096-row estimate here would mislead join-side planning downstream
    assert(scans.head.stats.rowCount.contains(BigInt(1)),
      s"stats = ${scans.head.stats}")
    assert(counted.collect().head.getLong(0) == 64 * 64)
  }

  test("COUNT(*) is answered from metadata: complete aggregate pushdown") {
    val g = spark.read.format("graft-grid")
      .option("width", 64).option("height", 64).option("stripes", 8).load()
    // ungrouped count with fully-pushed rectangular filters
    val counted = g.where(col("y") >= 16 && col("y") < 48 && col("x") >= 10).agg(count(lit(1)))
    assert(counted.head().getLong(0) == (64 - 10).toLong * 32)
    val plan = formatted(counted)
    assert(plan.contains("PushedAggregate: COUNT(*)"), plan)
    // complete pushdown: no partial/final agg pair re-counting scan rows —
    // Spark plans the scan's single pre-aggregated row straight through
    assert(!plan.contains("Generate"), plan)
    // a residual (v) filter must DISABLE the pushdown: count must see rows
    val residual = g.where(col("v") > 50).agg(count(lit(1)))
    val rplan = formatted(residual)
    assert(!rplan.contains("PushedAggregate"), rplan)
    assert(residual.head().getLong(0) ==
      g.collect().count(r => r.getInt(2) > 50).toLong)
    // grouped aggregation is not eligible either
    val grouped = g.groupBy("y").agg(count(lit(1)))
    assert(!formatted(grouped).contains("PushedAggregate"), formatted(grouped))
    assert(grouped.count() == 64)
  }

  test("reported statistics: pushdown-aware row count drives broadcast selection") {
    val g = spark.read.format("graft-grid")
      .option("width", 64).option("height", 64).load()
      .where(col("y") === 1) // 64 rows after stripe/row pruning
    val stats = g.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .queryExecution.optimizedPlan.stats
    assert(stats.sizeInBytes < 5000, s"expected pruned-size stats, got ${stats.sizeInBytes}")
    // join a larger frame with NO broadcast hint: the scan's reported
    // post-pushdown size must make the grid the broadcast side on its own
    val big = spark.range(100000).select((col("id") % 64).cast("int").as("x2"))
    val j = big.join(g, col("x2") === col("x"))
    j.collect()
    val p = j.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("row-level pushdown matches post-scan filtering") {
    val full = spark.read.format("graft-grid")
      .option("width", 32).option("height", 32).load().collect()
      .filter(r => r.getInt(1) >= 5 && r.getInt(0) === 7).map(_.toString).sorted.toSeq
    val pushed = spark.read.format("graft-grid")
      .option("width", 32).option("height", 32).load()
      .where(col("y") >= 5 && col("x") === 7).collect().map(_.toString).sorted.toSeq
    assert(pushed == full)
    assert(pushed.nonEmpty)
  }
}
