package graft.operators

import graft.{QueryPack, Tables}
import graft.Tables._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar function families — SURVEY.md §3B #37–41, #51. Upstream analogs:
  * run-dir date parsing and label building (strings), water-year logic
  * (dates: WY starts Oct 1 — [U] grep `water_year|wyhr`), unit conversions
  * (math); arrays/JSON are north-star additions (SURVEY.md §2). Citations
  * use the §0 [U] scheme — /root/reference was empty at survey time.
  *
  * Scale notes (100 TB): every function here is a codegen'd Column
  * expression evaluated inside WholeStageCodegen — no shuffle added beyond
  * the final presentation sort. #51 keeps exactly ONE Scala UDF to prove the
  * UDF surface and places the preferred zero-UDF expression next to it;
  * UDFs are codegen-opaque, so the expression form is the hot-path choice.
  */
object Scalars extends QueryPack {

  /** Water year (Oct 1 start) as a pure Column expression — codegen-friendly
    * form used everywhere except the single UDF-surface demo in #51. */
  def waterYearExpr(ts: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (year(ts) + when(month(ts) >= 10, 1).otherwise(0)).cast(IntegerType)

  def queries: Seq[(String, Fn)] = Seq(
    // #37 string functions. Analog: run-dir parsing, label building.
    // POSIX-simple regex for dialect parity (SURVEY.md §7 hard-part 3).
    "q_string_funcs" -> ((s, d) =>
      t(s, d, "customer")
        .select(
          col("c_custkey"),
          regexp_extract(col("c_name"), "([0-9]+)", 1).cast(LongType).as("name_num"),
          lower(col("c_mktsegment")).as("seg_lower"),
          substring(col("c_mktsegment"), 1, 3).as("seg3"),
          length(col("c_name")).as("name_len"),
          concat_ws("|", col("c_mktsegment"), col("c_custkey").cast(StringType)).as("label"),
          trim(lit("  pad  ")).as("trimmed"),
          replace(col("c_name"), lit("Customer"), lit("C")).as("short_name"))
        .orderBy("c_custkey")),

    // #38 date functions incl. water-year. Analog: WY logic, daily cadence.
    "q_date_funcs" -> ((s, d) =>
      t(s, d, "orders")
        .select(
          col("o_orderkey"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"),
          dayofmonth(col("o_orderdate")).as("dom"),
          datediff(col("o_orderdate"), lit("1995-01-01").cast(DateType)).as("days_since"),
          // emitted as timestamp: pandas/parquet render DATE differently
          // across the two engines, breaking the hash compare
          date_add(col("o_orderdate").cast(DateType), 30)
            .cast(TimestampType).as("due_date"),
          waterYearExpr(col("o_orderdate")).as("water_year"))
        .orderBy("o_orderkey")),

    // #39 math functions. Analog: unit conversions (TAF/SI).
    "q_math_funcs" -> ((s, d) =>
      t(s, d, "lineitem")
        .select(
          col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          r4(abs(col("l_quantity") - 25)).as("abs_dev"),
          r4(ln(col("l_extendedprice"))).as("ln_price"),
          r4(pow(col("l_discount"), 2)).as("disc_sq"),
          r4(sqrt(col("l_quantity"))).as("sqrt_qty"),
          ceil(col("l_quantity") / 10).cast(LongType).as("ceil_b"),
          floor(col("l_quantity") / 10).cast(LongType).as("floor_b"),
          pmod(col("l_orderkey"), lit(7)).as("key_mod"))
        .orderBy("l_orderkey", "l_linenumber", "l_quantity")),

    // #40 array higher-order functions over 64-d embeddings (north star).
    "q_array_funcs" -> ((s, d) =>
      t(s, d, "embeddings")
        .select(
          col("vec_id"),
          size(col("embedding")).as("dim"),
          r4(element_at(col("embedding"), 1)).as("first"),
          r4(aggregate(col("embedding"), lit(0.0),
            (acc, x) => acc + x)).as("vec_sum"),
          r4(sqrt(aggregate(col("embedding"), lit(0.0),
            (acc, x) => acc + x * x))).as("l2_norm"),
          r4(aggregate(slice(col("embedding"), 1, 8), lit(0.0),
            (acc, x) => acc + x)).as("head8_sum"))
        .orderBy("vec_id")),

    // #41 JSON extraction (north star; events.props e.g. {"k": 87}).
    "q_json_map_funcs" -> ((s, d) =>
      t(s, d, "events")
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast(IntegerType).as("k_path"),
          from_json(col("props"), MapType(StringType, IntegerType))
            .getItem("k").as("k_map"),
          size(map_keys(from_json(col("props"),
            MapType(StringType, IntegerType)))).as("n_keys"))
        .orderBy("event_id")),

    // Calendar-dimension generation: sequence + explode builds a date spine
    // (the time-dim every warehouse needs; SNOWAV's daily water-year axis).
    // Generated from literals — no scan at all; at 100 TB the spine joins
    // broadcast against facts.
    "q_date_dim" -> ((s, d) =>
      s.range(1)
        .select(explode(sequence(
          lit("1995-01-01").cast(DateType),
          lit("1995-12-31").cast(DateType),
          expr("INTERVAL 1 DAY"))).as("dt"))
        .select(
          col("dt").cast(TimestampType).as("day_ts"),
          year(col("dt")).as("yr"),
          month(col("dt")).as("mo"),
          dayofmonth(col("dt")).as("dom"),
          quarter(col("dt")).as("qtr"),
          dayofweek(col("dt")).as("dow"),
          waterYearExpr(col("dt").cast(TimestampType)).as("water_year"))
        .orderBy("day_ts")),

    // Conditional scalar family: CASE banding, coalesce/nullif null
    // plumbing, greatest/least clamping. Analog: cclimit-style conditional
    // classification (avail/unavail split as a scalar, not an agg).
    "q_cond_funcs" -> ((s, d) =>
      t(s, d, "customer")
        .select(
          col("c_custkey"),
          nullif(col("c_mktsegment"), lit("BUILDING")).as("seg_or_null"),
          coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("DEFAULT")).as("seg_filled"),
          r4(greatest(col("c_acctbal"), lit(0.0))).as("bal_clamped_lo"),
          r4(least(col("c_acctbal"), lit(1000.0))).as("bal_clamped_hi"),
          when(col("c_acctbal") < 0, "overdrawn")
            .when(col("c_acctbal") < 1000, "low")
            .when(col("c_acctbal") < 5000, "mid")
            .otherwise("high").as("bal_band"))
        .orderBy("c_custkey")),

    // #51 the one scalar UDF (water-year), alongside the preferred
    // expression form — results must agree row-for-row.
    "q_udf_scalar" -> ((s, d) => {
      // UTC-pinned (Timestamp.toLocalDateTime would use the JVM default TZ)
      val wyUdf = udf((ts: java.sql.Timestamp) => {
        val ld = ts.toInstant.atZone(java.time.ZoneOffset.UTC).toLocalDate
        ld.getYear + (if (ld.getMonthValue >= 10) 1 else 0)
      })
      t(s, d, "orders")
        .select(
          col("o_orderkey"),
          wyUdf(col("o_orderdate")).as("wy_udf"),
          waterYearExpr(col("o_orderdate")).as("wy_expr"))
        .orderBy("o_orderkey")
    }),
  )

  def oracle: Seq[(String, String)] = Seq(
    "q_string_funcs" ->
      """SELECT c_custkey,
        | CAST(regexp_extract(c_name, '([0-9]+)', 1) AS BIGINT) AS name_num,
        | lower(c_mktsegment) AS seg_lower,
        | substring(c_mktsegment, 1, 3) AS seg3,
        | CAST(length(c_name) AS INT) AS name_len,
        | concat_ws('|', c_mktsegment, CAST(c_custkey AS VARCHAR)) AS label,
        | trim('  pad  ') AS trimmed,
        | replace(c_name, 'Customer', 'C') AS short_name
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_date_funcs" ->
      """SELECT o_orderkey,
        | date_trunc('month', o_orderdate) AS month_start,
        | CAST(year(o_orderdate) AS INT) AS yr,
        | CAST(month(o_orderdate) AS INT) AS mo,
        | CAST(day(o_orderdate) AS INT) AS dom,
        | CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since,
        | CAST(CAST(o_orderdate AS DATE) + 30 AS TIMESTAMP) AS due_date,
        | CAST(year(o_orderdate) + CASE WHEN month(o_orderdate) >= 10 THEN 1 ELSE 0 END AS INT) AS water_year
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_math_funcs" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        | CAST(round(CAST(abs(l_quantity - 25) AS DECIMAL(38,6)), 4) AS DOUBLE) AS abs_dev,
        | CAST(round(CAST(ln(l_extendedprice) AS DECIMAL(38,6)), 4) AS DOUBLE) AS ln_price,
        | CAST(round(CAST(pow(l_discount, 2) AS DECIMAL(38,6)), 4) AS DOUBLE) AS disc_sq,
        | CAST(round(CAST(sqrt(l_quantity) AS DECIMAL(38,6)), 4) AS DOUBLE) AS sqrt_qty,
        | CAST(ceil(l_quantity / 10) AS BIGINT) AS ceil_b,
        | CAST(floor(l_quantity / 10) AS BIGINT) AS floor_b,
        | l_orderkey % 7 AS key_mod
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, l_quantity""".stripMargin,
    "q_array_funcs" ->
      """SELECT vec_id,
        | CAST(len(embedding) AS INT) AS dim,
        | CAST(round(CAST(embedding[1] AS DECIMAL(38,6)), 4) AS DOUBLE) AS first,
        | CAST(round(CAST(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS DECIMAL(38,6)), 4) AS DOUBLE) AS vec_sum,
        | CAST(round(CAST(sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) AS DECIMAL(38,6)), 4) AS DOUBLE) AS l2_norm,
        | CAST(round(CAST(list_sum(list_transform(embedding[1:8], x -> CAST(x AS DOUBLE))) AS DECIMAL(38,6)), 4) AS DOUBLE) AS head8_sum
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "q_json_map_funcs" ->
      """SELECT event_id,
        | CAST(json_extract_string(props, '$.k') AS INT) AS k_path,
        | CAST(json_extract_string(props, '$.k') AS INT) AS k_map,
        | CAST(len(json_keys(props)) AS INT) AS n_keys
        |FROM events ORDER BY event_id""".stripMargin,
    "q_date_dim" ->
      """SELECT CAST(dt AS TIMESTAMP) AS day_ts,
        | CAST(year(dt) AS INT) AS yr, CAST(month(dt) AS INT) AS mo,
        | CAST(day(dt) AS INT) AS dom, CAST(quarter(dt) AS INT) AS qtr,
        | CAST(dayofweek(dt) + 1 AS INT) AS dow,
        | CAST(year(dt) + CASE WHEN month(dt) >= 10 THEN 1 ELSE 0 END AS INT) AS water_year
        |FROM (SELECT CAST(unnest(generate_series(DATE '1995-01-01',
        |  DATE '1995-12-31', INTERVAL 1 DAY)) AS DATE) AS dt)
        |ORDER BY day_ts""".stripMargin,
    "q_cond_funcs" ->
      """SELECT c_custkey,
        | nullif(c_mktsegment, 'BUILDING') AS seg_or_null,
        | coalesce(nullif(c_mktsegment, 'BUILDING'), 'DEFAULT') AS seg_filled,
        | CAST(round(CAST(greatest(c_acctbal, 0.0) AS DECIMAL(38,6)), 4) AS DOUBLE) AS bal_clamped_lo,
        | CAST(round(CAST(least(c_acctbal, 1000.0) AS DECIMAL(38,6)), 4) AS DOUBLE) AS bal_clamped_hi,
        | CASE WHEN c_acctbal < 0 THEN 'overdrawn'
        |      WHEN c_acctbal < 1000 THEN 'low'
        |      WHEN c_acctbal < 5000 THEN 'mid'
        |      ELSE 'high' END AS bal_band
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_udf_scalar" ->
      """SELECT o_orderkey,
        | CAST(year(o_orderdate) + CASE WHEN month(o_orderdate) >= 10 THEN 1 ELSE 0 END AS INT) AS wy_udf,
        | CAST(year(o_orderdate) + CASE WHEN month(o_orderdate) >= 10 THEN 1 ELSE 0 END AS INT) AS wy_expr
        |FROM orders ORDER BY o_orderkey""".stripMargin,
  )
}
