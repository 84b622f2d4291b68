package graft.operators

import graft.{QueryPack, Tables}
import graft.Tables._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Scans, projections, filters, joins, sorts, set ops — SURVEY.md §3B #1–14,
  * #32–36. Upstream analogs per row of the §3B table (SNOWAV mask filters,
  * metadata joins, ASO-flight as-of join, overlap-delete EXCEPT, plotorder
  * sorts — [U] citations in SURVEY.md §3A; /root/reference was empty, §0).
  *
  * Scale notes (100 TB): dimension joins use explicit `broadcast()`; the
  * fact-fact join shuffles on the join key only (AQE handles skew); the
  * as-of join is the union+window formulation — one shuffle by key, no
  * range-join explosion (SURVEY.md §5).
  */
object Relational extends QueryPack {

  /** Month-partitioned copy of `orders` (hive layout, written once per
    * (session, dataset) via Sinks.writePartitioned) — the fact-store shape
    * q_join_dpp reads so dynamic partition pruning has partitions to
    * prune. ~80 month partitions over the synthetic date range. */
  /** q_join_asof_tol tolerance (seconds): one day — matches ~35% of
    * purchases on the synthetic event stream (3% at one hour; the dial,
    * not the value, is the operator). */
  private val ASOF_TOL_S = 86400L

  private val dppMemo = scala.collection.concurrent.TrieMap[(SparkSession, String), String]()
  private def dppFactPath(s: SparkSession, d: String): String =
    dppMemo.getOrElseUpdate((s, d), {
      // versioned + data-token'd like Tables.indexDir: a store built by
      // older code or from since-regenerated data can never be reused
      val path = s"/tmp/graft-dpp/v1/${d.replaceAll("[^A-Za-z0-9.]", "_")}" +
        s"-${graft.Tables.dataToken(d)}/orders_by_month"
      // publishAtomic: a concurrent session on the same dataset either
      // wins the rename or reads the winner's complete store — never a
      // half-written directory (VERDICT r8 minor). repartition on the
      // partition column first: the single-row-group source reads as ONE
      // task, which would otherwise write all ~80 month directories
      // serially; partition-aligned exchange also means exactly one file
      // per month dir (no small-files explosion)
      graft.sources.Sinks.publishAtomic(path) { tmp =>
        graft.sources.Sinks.writePartitioned(
          t(s, d, "orders").withColumn("o_month", date_format(col("o_orderdate"), "yyyy-MM"))
            .repartition(col("o_month")),
          tmp, Seq("o_month"))
      }
    })

  def queries: Seq[(String, Fn)] = Seq(
    // #1 full scan + count. Analog: daily NetCDF scan.
    "q_scan_count" -> ((s, d) =>
      t(s, d, "lineitem").agg(count(lit(1)).as("cnt"))),

    // #2 projection + predicate pushdown: only 4 columns reach the scan,
    // filter lands in PushedFilters (verified via .explain in the spec).
    "q_scan_pruned" -> ((s, d) =>
      t(s, d, "lineitem")
        .where(col("l_shipdate") >= lit("1998-01-01").cast("timestamp"))
        // (l_orderkey, l_linenumber) is NOT unique in the synthetic data —
        // total order needs every output column.
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity")),

    // #3 multi-dir scan union. Analog: run_dirs discovery.
    "q_scan_union_dirs" -> ((s, d) =>
      t(s, d, "lineitem").unionByName(t(s, d, "lineitem"))
        .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
        .orderBy("l_returnflag")),

    // #4 arithmetic projection. Analog: depth→volume unit conversion.
    "q_project_expr" -> ((s, d) =>
      t(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        r4(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
        r4(col("l_extendedprice") * (lit(1) - col("l_discount")) *
          (lit(1) + col("l_tax"))).as("revenue_tax"))
        .orderBy("l_orderkey", "l_linenumber", "revenue", "revenue_tax")),

    // #5 compound predicates. Analog: mask + date-range + elevation filters.
    "q_filter_compound" -> ((s, d) =>
      t(s, d, "lineitem")
        .where(col("l_returnflag").isin("A", "R") &&
          col("l_quantity").between(10, 20) &&
          (col("l_linestatus") === "F" || col("l_discount") > 0.05) &&
          col("l_shipdate").isNotNull)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_discount")),

    // #6 broadcast dim join. Analog: basin↔watershed lookup.
    "q_join_broadcast" -> ((s, d) =>
      t(s, d, "customer")
        .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .select("c_custkey", "n_name", "r_name")
        .orderBy("c_custkey")),

    // #7 large equi join (shuffle). Analog: Results ⋈ RunMetadata.
    "q_join_shuffle" -> ((s, d) =>
      t(s, d, "lineitem")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n"))
        .orderBy("o_orderstatus")),

    // #8 multi-way join; dims broadcast, facts shuffle once on orderkey.
    // customer GROWS with scale factor → size-gated hint (at 100 TB it
    // sort-merges); nation is geography-bounded (25 rows) → forced is safe.
    "q_join_multi" -> ((s, d) =>
      t(s, d, "lineitem")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(maybeBroadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n"))
        .orderBy("n_name")),

    // #9 left outer + null handling. Analog: stn_validate.
    "q_join_left" -> ((s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders").where(col("o_orderstatus") === "P"),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"),
          coalesce(dsum(col("o_totalprice")), lit(0.0)).as("total_p"))
        .orderBy("c_custkey")),

    // FULL OUTER join completing the join-type family: customers vs
    // suppliers per nation — rows survive from EITHER side with null
    // plumbing on the other. Analog: reconciling two partially-overlapping
    // run inventories.
    "q_join_full" -> ((s, d) => {
      val c = t(s, d, "customer").groupBy(col("c_nationkey").cast("int").as("nk"))
        .agg(count(lit(1)).as("n_cust"))
      val sup = t(s, d, "supplier").groupBy(col("s_nationkey").cast("int").as("nk2"))
        .agg(count(lit(1)).as("n_supp"))
      c.join(sup, col("nk") === col("nk2"), "full_outer")
        .select(coalesce(col("nk"), col("nk2")).as("nationkey"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"))
        .orderBy("nationkey")
    }),

    // #10 left semi (EXISTS). Analog: "run already in DB" check.
    "q_join_semi" -> ((s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders").where(col("o_orderstatus") === "F"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")),

    // #11 left anti (NOT EXISTS). Analog: missing-day detection.
    "q_join_anti" -> ((s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders").where(col("o_orderstatus") === "P"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")),

    // #12 range (theta) join against a tiny banded dim — broadcast nested
    // loop, never a cartesian shuffle. Analog: np.digitize elevation bands.
    "q_join_range" -> ((s, d) => {
      import s.implicits._
      val bands = Seq((0, 0.0, 10.0), (1, 10.0, 20.0), (2, 20.0, 30.0),
        (3, 30.0, 40.0), (4, 40.0, 50.0), (5, 50.0, 60.0))
        .toDF("band_id", "lo", "hi")
      t(s, d, "lineitem")
        .join(broadcast(bands), col("l_quantity") >= col("lo") && col("l_quantity") < col("hi"))
        .groupBy("band_id")
        .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("sum_price"))
        .orderBy("band_id")
    }),

    // #12 at scale: the same interval join through Skew.binnedRangeJoin —
    // bin-bucketed into a HASH join (no nested loop anywhere in the plan;
    // PlanSpec asserts it). Same oracle as q_join_range: the rewrite is
    // row-identical by construction. This is the shape that survives when
    // the interval side outgrows a broadcast (e.g. 10⁸ sensor calibration
    // windows), where BNLJ is O(n·m) and a broadcast OOMs.
    "q_join_range_binned" -> ((s, d) => {
      import s.implicits._
      val bands = Seq((0, 0.0, 10.0), (1, 10.0, 20.0), (2, 20.0, 30.0),
        (3, 30.0, 40.0), (4, 40.0, 50.0), (5, 50.0, 60.0))
        .toDF("band_id", "lo", "hi")
      Skew.binnedRangeJoin(t(s, d, "lineitem"), col("l_quantity"),
          bands, col("lo"), col("hi"), binWidth = 10.0)
        .groupBy("band_id")
        .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("sum_price"))
        .orderBy("band_id")
    }),

    // #13 as-of join: for each purchase, latest view (same user) at-or-before
    // its ts. union+window formulation (SURVEY.md §7 hard-part 2): one
    // shuffle on user_id, no per-row range scan — the 100 TB-safe plan.
    // Analog: ASO flight ↔ nearest model day; inflow ↔ SWI.
    "q_join_asof" -> ((s, d) => {
      val ev = t(s, d, "events")
      val p = ev.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"),
          lit(null).cast("timestamp").as("view_ts"), lit(1).as("is_p"))
      val v = ev.where(col("event_type") === "view")
        .select(lit(null).cast("long").as("event_id"), col("user_id"), col("ts"),
          col("ts").as("view_ts"), lit(0).as("is_p"))
      // views sort before purchases at equal ts => inclusive (ts >= view_ts)
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("is_p"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      p.unionByName(v)
        .withColumn("prior_view_ts", last(col("view_ts"), ignoreNulls = true).over(w))
        .where(col("is_p") === 1)
        .select("event_id", "user_id", "ts", "prior_view_ts")
        .orderBy("event_id")
    }),

    // As-of join with TOLERANCE (pandas merge_asof(tolerance=…) / kdb wj
    // semantics): match the nearest prior view only if it is within one
    // day of the purchase, else null. Same single-shuffle union+window
    // shape as q_join_asof — the nearest prior row is THE only candidate,
    // so tolerance is a post-window null-out, not a range join: no extra
    // exchange, no pair blowup, scale identical to the untoleranced form.
    "q_join_asof_tol" -> ((s, d) => {
      val ev = t(s, d, "events")
      val p = ev.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"),
          lit(null).cast("timestamp").as("view_ts"), lit(1).as("is_p"))
      val v = ev.where(col("event_type") === "view")
        .select(lit(null).cast("long").as("event_id"), col("user_id"), col("ts"),
          col("ts").as("view_ts"), lit(0).as("is_p"))
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("is_p"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      p.unionByName(v)
        .withColumn("nearest", last(col("view_ts"), ignoreNulls = true).over(w))
        .where(col("is_p") === 1)
        .select(col("event_id"), col("user_id"), col("ts"),
          when(col("ts").cast("long") - col("nearest").cast("long") <= ASOF_TOL_S,
            col("nearest")).as("prior_view_ts"))
        .orderBy("event_id")
    }),

    // #14 bounded self/cross join. Analog: compare_runs pairing.
    "q_join_cross_pairs" -> ((s, d) => {
      val n = t(s, d, "nation")
      val a = n.select(col("n_regionkey").as("rk1"), col("n_nationkey").as("k1"),
        col("n_name").as("n1"))
      val b = n.select(col("n_regionkey").as("rk2"), col("n_nationkey").as("k2"),
        col("n_name").as("n2"))
      a.join(b, col("rk1") === col("rk2") && col("k1") < col("k2"))
        .select("n1", "n2").orderBy("n1", "n2")
    }),

    // SQL API surface: the same engine through spark.sql over temp views
    // (SNOWAV's library-query entry path, SURVEY.md §4 Entry 2). TPC-H Q3
    // shape: 3-way join + agg + top-k. The plan is identical to the
    // DataFrame form — Catalyst sees one logical plan either way.
    "q_sql_topk_revenue" -> ((s, d) => {
      t(s, d, "customer").createOrReplaceTempView("v_customer")
      t(s, d, "orders").createOrReplaceTempView("v_orders")
      t(s, d, "lineitem").createOrReplaceTempView("v_lineitem")
      s.sql(
        """SELECT o_orderkey,
          | CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
          | count(*) AS n_items
          |FROM v_customer JOIN v_orders ON c_custkey = o_custkey
          |JOIN v_lineitem ON l_orderkey = o_orderkey
          |WHERE c_mktsegment = 'BUILDING' AND o_orderstatus <> 'F'
          |GROUP BY o_orderkey
          |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin)
    }),

    // Correlated scalar subquery — Catalyst decorrelates it into a left
    // outer aggregate join (RewriteCorrelatedScalarSubquery), so the
    // executed plan has no per-row subquery. Analog: per-basin max lookup
    // in report tables.
    "q_sql_scalar_subquery" -> ((s, d) => {
      t(s, d, "customer").createOrReplaceTempView("v2_customer")
      t(s, d, "orders").createOrReplaceTempView("v2_orders")
      s.sql(
        """SELECT c_custkey,
          | CAST(round(CAST(coalesce(
          |   (SELECT max(o_totalprice) FROM v2_orders WHERE o_custkey = c_custkey),
          |   0.0) AS DECIMAL(38,6)), 4) AS DOUBLE) AS max_order
          |FROM v2_customer
          |ORDER BY c_custkey""".stripMargin)
    }),

    // Top-k per key through the custom whole-operator plan (graftx.TopKPerKey:
    // LogicalPlan + Strategy + partial/final SparkPlan pair). Map-side
    // bounded heaps ship ≤ k rows per key per partition into the shuffle —
    // the row_number formulation (q_window_rank) ships every row. Oracle is
    // the row_number SQL: results must be identical.
    "q_topk_per_key" -> ((s, d) =>
      org.apache.spark.sql.graftx.TopK.topKPerKey(
          t(s, d, "orders").select("o_custkey", "o_orderkey", "o_totalprice"),
          keyNames = Seq("o_custkey"),
          orderBy = Seq("o_totalprice" -> false, "o_orderkey" -> true),
          k = 3, rankName = "rnk")
        .orderBy("o_custkey", "rnk")),

    // Deterministic hash sampling: keep ~10% of orders by a stable md5
    // bucket of the key — reproducible across engines, runs, and cluster
    // sizes, unlike rand()-based sample(). The training-data-pipeline
    // subsampling op; at 100 TB it is a pushed-down filter (no shuffle,
    // no coordination) and any downstream agg sees an unbiased slice.
    "q_sample_hash" -> ((s, d) =>
      t(s, d, "orders")
        .where(pmod(h60(col("o_orderkey").cast("string")), lit(100)) < 10)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_sampled"),
          dsum(col("o_totalprice")).as("sum_price"))
        .orderBy("o_orderpriority")),

    // Composite report table (SNOWAV report/report.py analog): multi-way
    // join → hash agg → per-nation share (windowed exact-decimal sum) →
    // within-nation rank → ordered output. One query exercising the whole
    // operator chain a report page needs.
    "q_report_summary" -> ((s, d) => {
      val leaf = t(s, d, "lineitem")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(maybeBroadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name", "o_orderpriority")
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n"))
      val wTot = Window.partitionBy("n_name")
      val wRnk = Window.partitionBy("n_name")
        .orderBy(col("revenue").desc, col("o_orderpriority").asc)
      leaf
        .withColumn("share", r4(col("revenue") / dsumOver(col("revenue"), wTot)))
        .withColumn("rnk", row_number().over(wRnk))
        .select(col("n_name"), col("o_orderpriority"), r4(col("revenue")).as("revenue"),
          col("n"), col("share"), col("rnk"))
        .orderBy("n_name", "rnk")
    }),

    // #32 multi-key sort with explicit null placement. Analog: plotorder.
    "q_sort_multi" -> ((s, d) =>
      t(s, d, "customer")
        .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
        .orderBy(col("c_mktsegment").asc_nulls_last,
          col("c_acctbal").desc_nulls_last, col("c_custkey").asc)),

    // #33 top-k => TakeOrderedAndProject (no global sort materialization).
    "q_topk" -> ((s, d) =>
      t(s, d, "orders").select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(100)),

    // 2-D skyline (Pareto frontier): parts minimizing (price, size) under
    // strict dominance. Composed from existing ops instead of the naive
    // quadratic anti-join the oracle runs: a per-price min-size aggregate
    // kills within-price domination, then a strict-prefix running min
    // over the price-sorted FRONTIER CANDIDATES (|distinct prices| rows —
    // already reduced by the group-by; for an unbounded price domain
    // you'd bin prices first, the z-order grid pattern) kills cross-price
    // domination, and a semi-join restores the surviving part rows.
    // Linear + one small sorted pass vs the oracle's O(n²).
    "q_skyline" -> ((s, d) => {
      val parts = t(s, d, "part").where(col("p_partkey") % 5 === 0)
      val g = parts.groupBy(col("p_retailprice"))
        .agg(min(col("p_size")).as("min_size"))
      val w = Window.orderBy("p_retailprice")
        .rowsBetween(Window.unboundedPreceding, -1)
      val frontier = g
        .withColumn("pm", min(col("min_size")).over(w))
        .where(col("pm").isNull || col("pm") > col("min_size"))
        .select(col("p_retailprice"), col("min_size").as("p_size"))
      parts.join(maybeBroadcast(frontier), Seq("p_retailprice", "p_size"))
        .select("p_partkey", "p_name", "p_retailprice", "p_size")
        .orderBy("p_partkey")
    }),

    // #34 UNION ALL + DISTINCT. Analog: multi-run-dir concat.
    "q_union" -> ((s, d) =>
      t(s, d, "customer").select(col("c_nationkey").cast("int").as("k"))
        .union(t(s, d, "supplier").select(col("s_nationkey").cast("int").as("k")))
        .distinct()
        .orderBy("k")),

    // #35 INTERSECT. Analog: overlapping-date detection.
    "q_intersect" -> ((s, d) =>
      t(s, d, "customer").select(col("c_nationkey").cast("int").as("k"))
        .intersect(t(s, d, "supplier").select(col("s_nationkey").cast("int").as("k")))
        .orderBy("k")),

    // #36 EXCEPT. Analog: overlap-delete (keep rows not in incoming window).
    "q_except" -> ((s, d) =>
      t(s, d, "customer").select(col("c_custkey").as("k"))
        .except(t(s, d, "orders").select(col("o_custkey").as("k")))
        .orderBy("k")),

    // Dynamic partition pruning: a month-partitioned fact store joined on
    // its partition column to a dim filtered on a NON-join attribute. The
    // qualifying months are only known at runtime, so static pruning can't
    // fire — Catalyst's PartitionPruning rule reuses the dim broadcast as
    // a runtime IN-subquery on the fact scan's PartitionFilters, and the
    // fact reader never lists, opens, or scans the other ~68 month
    // directories. At 100 TB this is THE scan optimization: the dominant
    // cost is fact I/O and DPP turns it proportional to the selected
    // partition count. PlanSpec asserts `dynamicpruning` in the scan.
    "q_join_dpp" -> ((s, d) => {
      val fact = s.read.parquet(dppFactPath(s, d))
      val dim = t(s, d, "orders")
        .select(date_format(col("o_orderdate"), "yyyy-MM").as("month"),
          date_format(col("o_orderdate"), "yyyy").as("yr"))
        .distinct()
        .where(col("yr") === "1997")
      // dim is calendar-bounded (#months), never corpus-sized → forced
      // broadcast is safe and is what DPP's broadcast-reuse keys off
      fact.join(broadcast(dim), col("o_month") === col("month"))
        .groupBy("o_month")
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
        .orderBy("o_month")
    }),

    // Custom DataSource V2 scan (graft-grid, the raster-ingest analog):
    // synthetic deterministic grid through the full connector surface —
    // schema inference, stripe partition planning, y-bound stripe pruning,
    // x/y row-level pushdown, column pruning. The oracle regenerates the
    // identical grid with generate_series, so the connector itself is
    // hash-checked end to end.
    "q_source_grid" -> ((s, d) =>
      s.read.format("graft-grid")
        .option("width", 64).option("height", 64).option("stripes", 8)
        .load()
        .where(col("y") >= 16 && col("y") < 32 && col("x") < 10)
        .groupBy("x")
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sum_v"))
        .orderBy("x")),

    // DSv2 COMPLETE aggregate pushdown: the ungrouped count under fully-
    // pushed rectangular bounds is answered from grid metadata — the scan
    // emits ONE pre-aggregated row, zero cells (GridSourceSpec asserts the
    // PushedAggregate plan marker and both refusal paths).
    "q_source_grid_count" -> ((s, d) =>
      s.read.format("graft-grid")
        .option("width", 64).option("height", 64).option("stripes", 8)
        .load()
        .where(col("y") >= 16 && col("y") < 48 && col("x") >= 10)
        .agg(count(lit(1)).as("n"))),

    // Skew-mitigation surface: the same rows as a plain dim join, executed
    // through Skew.saltedJoin — facts carry a deterministic salt, the
    // 3-row dim replicates 8×, and the single hot l_returnflag key spreads
    // across 8 reducers instead of starving all but 3 tasks. The manual
    // fallback for when AQE's runtime skew split can't help (broadcast-
    // ineligible build side, first-stage skew).
    "q_join_salted" -> ((s, d) => {
      val facts = t(s, d, "lineitem").select(col("l_returnflag").as("flag"),
        col("l_orderkey"), col("l_extendedprice"))
      val dims = t(s, d, "lineitem").select(col("l_returnflag").as("flag"))
        .distinct()
        .withColumn("flag_label", concat(lit("flag_"), col("flag")))
      Skew.saltedJoin(facts, dims, "flag", col("l_orderkey"), buckets = 8)
        .groupBy("flag_label")
        .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("sum_price"))
        .orderBy("flag_label")
    }),
  )

  /** Shared by q_join_range and q_join_range_binned (row-identical ops). */
  private val rangeBandOracle =
    """SELECT band_id, count(*) AS n,
      | CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price
      |FROM lineitem JOIN (VALUES (0,0.0,10.0),(1,10.0,20.0),(2,20.0,30.0),
      |  (3,30.0,40.0),(4,40.0,50.0),(5,50.0,60.0)) b(band_id, lo, hi)
      | ON l_quantity >= lo AND l_quantity < hi
      |GROUP BY band_id ORDER BY band_id""".stripMargin

  def oracle: Seq[(String, String)] = Seq(
    "q_scan_count" -> "SELECT count(*) AS cnt FROM lineitem",
    "q_scan_pruned" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1998-01-01'
        |ORDER BY l_orderkey, l_linenumber, l_quantity""".stripMargin,
    "q_scan_union_dirs" ->
      """SELECT l_returnflag, count(*) AS n
        |FROM (SELECT * FROM lineitem UNION ALL SELECT * FROM lineitem)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_project_expr" ->
      """SELECT l_orderkey, l_linenumber,
        | CAST(round(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(38,6)), 4) AS DOUBLE) AS revenue,
        | CAST(round(CAST(l_extendedprice*(1-l_discount)*(1+l_tax) AS DECIMAL(38,6)), 4) AS DOUBLE) AS revenue_tax
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, revenue, revenue_tax""".stripMargin,
    "q_filter_compound" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount FROM lineitem
        |WHERE l_returnflag IN ('A','R') AND l_quantity BETWEEN 10 AND 20
        | AND (l_linestatus = 'F' OR l_discount > 0.05) AND l_shipdate IS NOT NULL
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_discount""".stripMargin,
    "q_join_broadcast" ->
      """SELECT c_custkey, n_name, r_name FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |ORDER BY c_custkey""".stripMargin,
    "q_join_shuffle" ->
      """SELECT o_orderstatus,
        | CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
        | count(*) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_join_multi" ->
      """SELECT n_name,
        | CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
        | count(*) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q_join_left" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
        | coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE), 0.0) AS total_p
        |FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_orderstatus = 'P') o
        | ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "q_join_full" ->
      """WITH c AS (SELECT CAST(c_nationkey AS INT) AS nk, count(*) AS n_cust
        |           FROM customer GROUP BY 1),
        |     s AS (SELECT CAST(s_nationkey AS INT) AS nk2, count(*) AS n_supp
        |           FROM supplier GROUP BY 1)
        |SELECT coalesce(nk, nk2) AS nationkey,
        | coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
        |FROM c FULL OUTER JOIN s ON nk = nk2
        |ORDER BY nationkey""".stripMargin,
    "q_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,
    "q_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin,
    "q_join_range" -> rangeBandOracle,
    // the binned rewrite is row-identical BY CONSTRUCTION — binding both
    // keys to the same SQL string expresses that contract (no drift risk)
    "q_join_range_binned" -> rangeBandOracle,
    "q_join_asof" ->
      """WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |     v AS (SELECT user_id, ts AS view_ts FROM events WHERE event_type = 'view')
        |SELECT p.event_id, p.user_id, p.ts, v.view_ts AS prior_view_ts
        |FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.view_ts
        |ORDER BY p.event_id""".stripMargin,
    "q_join_asof_tol" ->
      """WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |     v AS (SELECT user_id, ts AS view_ts FROM events WHERE event_type = 'view')
        |SELECT p.event_id, p.user_id, p.ts,
        | CASE WHEN date_diff('second', v.view_ts, p.ts) <= 86400
        |      THEN v.view_ts END AS prior_view_ts
        |FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.view_ts
        |ORDER BY p.event_id""".stripMargin,
    "q_join_cross_pairs" ->
      """SELECT a.n_name AS n1, b.n_name AS n2 FROM nation a JOIN nation b
        | ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
        |ORDER BY n1, n2""".stripMargin,
    "q_sql_topk_revenue" ->
      """SELECT o_orderkey,
        | CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
        | count(*) AS n_items
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING' AND o_orderstatus <> 'F'
        |GROUP BY o_orderkey
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,
    "q_sql_scalar_subquery" ->
      """SELECT c_custkey,
        | CAST(round(CAST(coalesce(
        |   (SELECT max(o_totalprice) FROM orders WHERE o_custkey = c_custkey),
        |   0.0) AS DECIMAL(38,6)), 4) AS DOUBLE) AS max_order
        |FROM customer
        |ORDER BY c_custkey""".stripMargin,
    "q_topk_per_key" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |   CAST(row_number() OVER (PARTITION BY o_custkey
        |     ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rnk
        |  FROM orders)
        |WHERE rnk <= 3 ORDER BY o_custkey, rnk""".stripMargin,
    // deliberately the naive quadratic anti-join — the ground truth the
    // composed (agg + prefix-min window + semi-join) plan must reproduce
    "q_skyline" ->
      """WITH u AS (SELECT * FROM part WHERE p_partkey % 5 = 0)
        |SELECT p_partkey, p_name, p_retailprice, p_size
        |FROM u a
        |WHERE NOT EXISTS (SELECT 1 FROM u b
        |  WHERE b.p_retailprice <= a.p_retailprice AND b.p_size <= a.p_size
        |    AND (b.p_retailprice < a.p_retailprice OR b.p_size < a.p_size))
        |ORDER BY p_partkey""".stripMargin,
    "q_sample_hash" ->
      """SELECT o_orderpriority, count(*) AS n_sampled,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price
        |FROM orders
        |WHERE ('0x'||substr(md5(o_orderkey::VARCHAR),1,15))::BIGINT % 100 < 10
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_report_summary" ->
      """WITH leaf AS (
        |  SELECT n_name, o_orderpriority,
        |   CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
        |   count(*) AS n
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY 1, 2)
        |SELECT n_name, o_orderpriority,
        | CAST(round(CAST(revenue AS DECIMAL(38,6)), 4) AS DOUBLE) AS revenue, n,
        | CAST(round(CAST(revenue / CAST(sum(CAST(revenue AS DECIMAL(38,6)))
        |   OVER (PARTITION BY n_name) AS DOUBLE) AS DECIMAL(38,6)), 4) AS DOUBLE) AS share,
        | CAST(row_number() OVER (PARTITION BY n_name
        |   ORDER BY revenue DESC, o_orderpriority ASC) AS INT) AS rnk
        |FROM leaf ORDER BY n_name, rnk""".stripMargin,
    "q_sort_multi" ->
      """SELECT c_custkey, c_name, c_acctbal, c_mktsegment FROM customer
        |ORDER BY c_mktsegment ASC NULLS LAST, c_acctbal DESC NULLS LAST, c_custkey""".stripMargin,
    "q_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "q_union" ->
      """SELECT DISTINCT k FROM (
        |  SELECT c_nationkey AS k FROM customer
        |  UNION ALL SELECT s_nationkey AS k FROM supplier)
        |ORDER BY k""".stripMargin,
    "q_intersect" ->
      """SELECT k FROM (
        |  SELECT c_nationkey AS k FROM customer
        |  INTERSECT SELECT s_nationkey AS k FROM supplier)
        |ORDER BY k""".stripMargin,
    "q_except" ->
      """SELECT k FROM (
        |  SELECT c_custkey AS k FROM customer
        |  EXCEPT SELECT o_custkey AS k FROM orders)
        |ORDER BY k""".stripMargin,
    "q_join_dpp" ->
      """WITH f AS (
        |  SELECT strftime(o_orderdate, '%Y-%m') AS o_month, o_totalprice
        |  FROM orders),
        |d AS (
        |  SELECT DISTINCT strftime(o_orderdate, '%Y-%m') AS month,
        |   strftime(o_orderdate, '%Y') AS yr
        |  FROM orders)
        |SELECT f.o_month, count(*) AS n_orders,
        | CAST(sum(CAST(f.o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS revenue
        |FROM f JOIN d ON f.o_month = d.month
        |WHERE d.yr = '1997'
        |GROUP BY f.o_month ORDER BY f.o_month""".stripMargin,
    "q_join_salted" ->
      """SELECT 'flag_' || l_returnflag AS flag_label, count(*) AS n,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price
        |FROM lineitem
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_source_grid" ->
      """WITH g AS (
        |  SELECT tx.x, ty.y, CAST((tx.x*31 + ty.y*17) % 97 AS INT) AS v
        |  FROM generate_series(0, 63) tx(x), generate_series(0, 63) ty(y))
        |SELECT CAST(x AS INT) AS x, count(*) AS n, CAST(sum(v) AS BIGINT) AS sum_v
        |FROM g WHERE y >= 16 AND y < 32 AND x < 10
        |GROUP BY x ORDER BY x""".stripMargin,
    "q_source_grid_count" ->
      """SELECT count(*) AS n
        |FROM generate_series(0, 63) tx(x), generate_series(0, 63) ty(y)
        |WHERE y >= 16 AND y < 48 AND x >= 10""".stripMargin,
  )
}
