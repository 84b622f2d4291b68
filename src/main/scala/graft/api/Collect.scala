package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.{dsum, r4}

/** The reference system's de-facto query API, re-expressed Spark-first.
  *
  * SNOWAV's `database.collect()` ([U] `snowav/database/database.py::collect`,
  * SURVEY.md §3A — /root/reference was empty at survey time, §0) is how every
  * figure, report table, and downstream notebook reads the store: filter the
  * long/EAV Results table by (basins, date range, variable), then pivot to a
  * wide elevation-band × basin frame using one of four reduction methods:
  *
  *  - `end`        value on the last date in range (per basin × band)
  *  - `sum`        accumulate over the range (used for SWI volumes)
  *  - `difference` end − start (per basin × band)
  *  - `daily`      no pivot collapse over time: (date × band) × basin series
  *
  * Input contract (the EAV long form, SURVEY.md §2 "Results store"):
  * `basin: string, date: timestamp, variable: string, elevation: string,
  * value: double`. Output: one row per elevation band (plus `"total"` if
  * present in the data), one column per requested basin, deterministic
  * band-then-date ordering.
  *
  * Scale shape: one filtered scan (predicate pushdown on variable/date),
  * one hash aggregate pivoted over an EXPLICIT basin list (never a
  * driver-side distinct scan), window `last` only for end/difference —
  * partitioned by (basin, elevation), never global. At 100 TB Results is
  * date-partitioned parquet and this prunes to the range before reading.
  */
object Collect {

  val Methods: Set[String] = Set("end", "sum", "difference", "daily")

  def collect(
      results: DataFrame,
      basins: Seq[String],
      startDate: String,
      endDate: String,
      variable: String,
      method: String): DataFrame = {
    require(Methods.contains(method), s"method must be one of $Methods, got $method")
    require(basins.nonEmpty, "need at least one basin")

    val inRange = results
      .where(col("variable") === variable &&
        col("date") >= lit(startDate).cast("timestamp") &&
        col("date") <= lit(endDate).cast("timestamp") &&
        col("basin").isin(basins: _*))

    def pivoted(agg: Column): DataFrame =
      inRange
        .groupBy(col("elevation"))
        .pivot("basin", basins)
        .agg(agg)
        .orderBy("elevation")

    method match {
      case "sum" =>
        pivoted(r4(dsum(col("value"))))
      case "end" =>
        // value at the max date per (basin, elevation); window keyed by the
        // pivot cell, unique tiebreak on date
        val w = Window.partitionBy("basin", "elevation").orderBy(col("date").desc)
        inRange.withColumn("rn", row_number().over(w))
          .where(col("rn") === 1) // rewritten to TopKPerKey by the injected rule
          .groupBy(col("elevation"))
          .pivot("basin", basins)
          .agg(r4(first(col("value"))))
          .orderBy("elevation")
      case "difference" =>
        val w = Window.partitionBy("basin", "elevation")
        val firstLast = inRange
          .withColumn("d_min", min(col("date")).over(w))
          .withColumn("d_max", max(col("date")).over(w))
        firstLast
          .groupBy(col("elevation"))
          .pivot("basin", basins)
          .agg(r4(
            first(when(col("date") === col("d_max"), col("value")), ignoreNulls = true) -
            first(when(col("date") === col("d_min"), col("value")), ignoreNulls = true)))
          .orderBy("elevation")
      case "daily" =>
        inRange
          .groupBy(col("date"), col("elevation"))
          .pivot("basin", basins)
          .agg(r4(dsum(col("value"))))
          .orderBy("date", "elevation")
    }
  }
}
