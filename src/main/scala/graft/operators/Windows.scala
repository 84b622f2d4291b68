package graft.operators

import graft.{QueryPack, Tables}
import graft.Tables._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.LongType

/** Window functions — SURVEY.md §3B #27–31. Upstream analogs: plotorder
  * ranking, image_change / collect-`difference` day deltas, cumulative SWI,
  * smoothed series, peak-SWE date ([U] SURVEY.md §3A; /root/reference empty
  * at survey time, §0).
  *
  * Scale notes (100 TB): each window shuffles once on its partition key and
  * sorts within partitions — no global sort. Partition keys (customer, user)
  * are high-cardinality, so partitions stay small; a single-partition window
  * (no partitionBy) is deliberately absent — that is the anti-pattern at
  * scale. Window ORDER BY always carries a unique tiebreak column so frame
  * contents are deterministic under parallel re-ordering.
  */
object Windows extends QueryPack {

  def queries: Seq[(String, Fn)] = Seq(
    // #27 ranking trio, top-3 orders per customer. Analog: plotorder.
    "q_window_rank" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, d, "orders")
        .withColumn("rn", row_number().over(w))
        .withColumn("rnk", rank().over(w))
        .withColumn("drnk", dense_rank().over(w))
        .where(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn", "rnk", "drnk")
        .orderBy("o_custkey", "rn")
    }),

    // #28 lag delta per user time series. Analog: day-over-day image change.
    "q_window_lag" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      t(s, d, "events")
        .withColumn("prev_value", lag(col("value"), 1).over(w))
        .withColumn("delta", r4(col("value") - col("prev_value")))
        .select(col("event_id"), col("user_id"), r4(col("value")).as("value"),
          r4(col("prev_value")).as("prev_value"), col("delta"))
        .orderBy("event_id")
    }),

    // #29 running total (row frame). Analog: cumulative SWI.
    "q_window_cumsum" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "orders")
        .withColumn("cum_spend", r4(dsumOver(col("o_totalprice"), w)))
        .select("o_custkey", "o_orderkey", "cum_spend")
        .orderBy("o_custkey", "o_orderkey")
    }),

    // #30 time-range moving agg: trailing 7 days per customer. Analog:
    // smoothed basin series. Range frame on epoch-seconds; ties (same day)
    // share a frame, so the result is order-independent.
    "q_window_range_frame" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy(tsec(col("o_orderdate")))
        .rangeBetween(-7L * 24 * 3600, 0)
      t(s, d, "orders")
        .withColumn("movsum_7d", r4(dsumOver(col("o_totalprice"), w)))
        .withColumn("n_7d", count(lit(1)).over(w))
        .select("o_custkey", "o_orderkey", "movsum_7d", "n_7d")
        .orderBy("o_custkey", "o_orderkey")
    }),

    // Distribution ranks: ntile quartiles + percent_rank + cume_dist per
    // customer segment. Analog: percentile placement of basins in reports.
    "q_window_ntile" -> ((s, d) => {
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("c_acctbal").asc, col("c_custkey").asc)
      t(s, d, "customer")
        .select(col("c_custkey"), col("c_mktsegment"),
          ntile(4).over(w).as("quartile"),
          r4(percent_rank().over(w)).as("pct_rank"),
          r4(cume_dist().over(w)).as("cume"))
        .orderBy("c_custkey")
    }),

    // Positional analytics: first_value / last_value / nth_value over the
    // full partition frame (last_value under the default frame would see
    // only the current row's prefix — the classic trap). Analog: collect()
    // `end` method (value at end date) per basin.
    "q_window_firstlast" -> ((s, d) => {
      val ord = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val full = ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          first(col("o_orderkey")).over(full).as("first_order"),
          last(col("o_orderkey")).over(full).as("last_order"),
          nth_value(col("o_orderkey"), 2).over(full).as("second_order"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // SCD Type-2 dimension build via gaps-and-islands: collapse each
    // customer's consecutive same-status order runs into validity
    // intervals [valid_from, valid_to) with a current-interval flag — the
    // slowly-changing-dimension construction a warehouse load derives from
    // an event/order history. ONE shuffle on o_custkey serves all three
    // window passes (change flag → island id → interval close; same
    // partition key, Catalyst reuses the exchange), and the interval close
    // runs over the already-collapsed runs (≤ #status changes per
    // customer), not the raw history.
    "q_scd2" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val runs = t(s, d, "orders")
        .withColumn("chg",
          when(lag(col("o_orderstatus"), 1).over(w) === col("o_orderstatus"), 0)
            .otherwise(1))
        .withColumn("island", sum(col("chg")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast(LongType))
        .groupBy("o_custkey", "island", "o_orderstatus")
        .agg(min(col("o_orderdate")).as("valid_from"),
          count(lit(1)).as("n_orders"))
      val iv = Window.partitionBy("o_custkey").orderBy("island")
      runs
        .withColumn("valid_to", lead(col("valid_from"), 1).over(iv))
        .withColumn("is_current", col("valid_to").isNull)
        .select("o_custkey", "island", "o_orderstatus", "valid_from",
          "valid_to", "n_orders", "is_current")
        .orderBy("o_custkey", "island")
    }),

    // #31 arg-max per group with a unique struct tiebreak (max_by over a
    // non-unique key alone is nondeterministic). Analog: peak-SWE date.
    "q_argmax" -> ((s, d) =>
      t(s, d, "orders")
        .groupBy("o_custkey")
        .agg(
          max_by(col("o_orderkey"),
            struct(col("o_totalprice"), col("o_orderkey"))).as("top_order"),
          r4(max(col("o_totalprice"))).as("top_price"))
        .orderBy("o_custkey")),
  )

  def oracle: Seq[(String, String)] = Seq(
    "q_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn, rnk, drnk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |   CAST(row_number() OVER w AS INT) AS rn, CAST(rank() OVER w AS INT) AS rnk,
        |   CAST(dense_rank() OVER w AS INT) AS drnk
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC))
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "q_window_lag" ->
      """SELECT event_id, user_id,
        | CAST(round(CAST(value AS DECIMAL(38,6)), 4) AS DOUBLE) AS value,
        | CAST(round(CAST(prev_value AS DECIMAL(38,6)), 4) AS DOUBLE) AS prev_value,
        | CAST(round(CAST(value - prev_value AS DECIMAL(38,6)), 4) AS DOUBLE) AS delta
        |FROM (
        |  SELECT event_id, user_id, value,
        |   lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value
        |  FROM events)
        |ORDER BY event_id""".stripMargin,
    "q_window_cumsum" ->
      """SELECT o_custkey, o_orderkey,
        | CAST(round(sum(CAST(o_totalprice AS DECIMAL(38,6))) OVER (
        |   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS DOUBLE) AS cum_spend
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_window_range_frame" ->
      """SELECT o_custkey, o_orderkey,
        | CAST(round(sum(CAST(o_totalprice AS DECIMAL(38,6))) OVER w, 4) AS DOUBLE) AS movsum_7d,
        | count(*) OVER w AS n_7d
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY CAST(floor(epoch(o_orderdate)) AS BIGINT)
        |  RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_window_ntile" ->
      """SELECT c_custkey, c_mktsegment,
        | CAST(ntile(4) OVER w AS INT) AS quartile,
        | CAST(round(CAST(percent_rank() OVER w AS DECIMAL(38,6)), 4) AS DOUBLE) AS pct_rank,
        | CAST(round(CAST(cume_dist() OVER w AS DECIMAL(38,6)), 4) AS DOUBLE) AS cume
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal ASC, c_custkey ASC)
        |ORDER BY c_custkey""".stripMargin,
    "q_window_firstlast" ->
      """SELECT o_custkey, o_orderkey,
        | first_value(o_orderkey) OVER w AS first_order,
        | last_value(o_orderkey) OVER w AS last_order,
        | nth_value(o_orderkey, 2) OVER w AS second_order
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_scd2" ->
      """WITH isl AS (
        |  SELECT o_custkey, o_orderdate, o_orderstatus,
        |   CAST(sum(chg) OVER (PARTITION BY o_custkey
        |     ORDER BY o_orderdate, o_orderkey
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS island
        |  FROM (
        |    SELECT o_custkey, o_orderkey, o_orderdate, o_orderstatus,
        |     CASE WHEN lag(o_orderstatus) OVER (PARTITION BY o_custkey
        |       ORDER BY o_orderdate, o_orderkey) = o_orderstatus
        |      THEN 0 ELSE 1 END AS chg
        |    FROM orders)),
        |runs AS (
        |  SELECT o_custkey, island, o_orderstatus,
        |   min(o_orderdate) AS valid_from, count(*) AS n_orders
        |  FROM isl GROUP BY 1, 2, 3)
        |SELECT o_custkey, island, o_orderstatus, valid_from,
        | lead(valid_from) OVER w AS valid_to, n_orders,
        | (lead(valid_from) OVER w IS NULL) AS is_current
        |FROM runs
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY island)
        |ORDER BY o_custkey, island""".stripMargin,
    "q_argmax" ->
      """SELECT o_custkey, o_orderkey AS top_order,
        | CAST(round(CAST(top_price AS DECIMAL(38,6)), 4) AS DOUBLE) AS top_price
        |FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |   row_number() OVER (PARTITION BY o_custkey
        |     ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn,
        |   max(o_totalprice) OVER (PARTITION BY o_custkey) AS top_price
        |  FROM orders)
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin,
  )
}
