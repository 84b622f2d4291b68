package graft

import graft.api.Collect
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The reference's collect() query API: end / sum / difference / daily
  * methods over a long/EAV results frame, pivoted bands × basins. The
  * fixture is a hand-built EAV frame with known values so every method's
  * semantics are asserted exactly. */
class CollectSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // two basins × two bands × three days of "swe_vol"; basin b2 missing the
  // last day in band hi (tests per-cell end/difference independence)
  private lazy val eav = Seq(
    ("b1", "2024-01-01", "swe_vol", "lo", 10.0),
    ("b1", "2024-01-02", "swe_vol", "lo", 12.0),
    ("b1", "2024-01-03", "swe_vol", "lo", 15.0),
    ("b1", "2024-01-01", "swe_vol", "hi", 1.0),
    ("b1", "2024-01-02", "swe_vol", "hi", 2.0),
    ("b1", "2024-01-03", "swe_vol", "hi", 4.0),
    ("b2", "2024-01-01", "swe_vol", "lo", 20.0),
    ("b2", "2024-01-02", "swe_vol", "lo", 19.0),
    ("b2", "2024-01-03", "swe_vol", "lo", 17.0),
    ("b2", "2024-01-01", "swe_vol", "hi", 5.0),
    ("b2", "2024-01-02", "swe_vol", "hi", 6.0),
    // other variable + out-of-range date must be filtered out
    ("b1", "2024-01-02", "depth", "lo", 99.0),
    ("b1", "2024-02-01", "swe_vol", "lo", 99.0),
  ).toDF("basin", "date", "variable", "elevation", "value")
    .withColumn("date", col("date").cast("timestamp"))

  private def run(method: String) =
    Collect.collect(eav, Seq("b1", "b2"), "2024-01-01", "2024-01-31", "swe_vol", method)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), Option(r.get(2)))).toMap

  test("method=end picks the value at the last date per cell") {
    val m = run("end")
    assert(m("lo") == ((15.0, Some(17.0))))
    assert(m("hi") == ((4.0, Some(6.0)))) // b2/hi ends a day earlier — its own end
  }

  test("method=sum accumulates the range") {
    val m = run("sum")
    assert(m("lo") == ((37.0, Some(56.0))))
    assert(m("hi") == ((7.0, Some(11.0))))
  }

  test("method=difference is end minus start per cell") {
    val m = run("difference")
    assert(m("lo") == ((5.0, Some(-3.0))))
    assert(m("hi") == ((3.0, Some(1.0))))
  }

  test("method=daily keeps the date axis") {
    val rows = Collect.collect(eav, Seq("b1", "b2"),
        "2024-01-01", "2024-01-31", "swe_vol", "daily")
      .collect()
    assert(rows.length == 6) // 3 dates × 2 bands
    val d3hi = rows.find(r => r.getTimestamp(0).toString.startsWith("2024-01-03")
      && r.getString(1) == "hi").get
    assert(d3hi.getDouble(2) == 4.0 && d3hi.isNullAt(3)) // b2 absent that day
  }

  test("the end method's rank filter is rewritten to TopKPerKey") {
    val df = Collect.collect(eav, Seq("b1", "b2"),
      "2024-01-01", "2024-01-31", "swe_vol", "end")
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("TopKPerKeyFinal"))
  }

  test("unknown method and empty basin list are rejected") {
    intercept[IllegalArgumentException](
      Collect.collect(eav, Seq("b1"), "2024-01-01", "2024-01-31", "swe_vol", "median"))
    intercept[IllegalArgumentException](
      Collect.collect(eav, Nil, "2024-01-01", "2024-01-31", "swe_vol", "end"))
  }
}
