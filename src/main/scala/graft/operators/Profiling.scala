package graft.operators

import graft.{QueryPack, Tables}
import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Data-profiling operators — the schema/quality census a pipeline runs
  * before trusting a new 100 TB delivery (DuckDB ships this as SUMMARIZE;
  * SNOWAV has no analog, SURVEY.md §0 [U] scheme).
  *
  * Scale notes (100 TB):
  * - q_profile_table runs ONE single-column aggregate PER PROFILED COLUMN
  *   and unions the 1-row results. That is deliberate: each pass's scan
  *   prunes to exactly one column (columnar I/O reads 1/11th of the
  *   table), and the union of 1-row aggregates is free — whereas the
  *   one-pass multi-distinct formulation plans an Expand (row
  *   multiplication × #distinct-aggs over ALL columns at once). Exact
  *   distinct per column is kept for oracle parity; the 100 TB dial is
  *   swapping `countDistinct` for `approx_count_distinct` per column —
  *   same plan shape, no shuffle of distinct values.
  * - q_profile_corr is one aggregate computing every pairwise co-moment
  *   in a single pass (map-side combinable), unpivoted to the pair list.
  */
object Profiling extends QueryPack {

  /** Numeric columns profiled for correlation (ordered pairs a < b). */
  private val CORR_COLS = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  /** q_dq_kanon threshold (see the query's calibration note). */
  private val KANON_K = 8

  def queries: Seq[(String, Fn)] = Seq(

    // Per-column census over lineitem: rows, nulls, exact distinct, and
    // type-split min/max (numeric columns report num bounds, string
    // columns string bounds — no cross-type casts, whose string
    // rendering differs between engines).
    "q_profile_table" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      def num(name: String): DataFrame = li.agg(
        lit(name).as("col_name"),
        count(lit(1)).as("n_rows"),
        count_if(col(name).isNull).as("n_nulls"),
        countDistinct(col(name)).as("n_distinct"),
        min(col(name)).cast(DoubleType).as("min_num"),
        max(col(name)).cast(DoubleType).as("max_num"),
        lit(null).cast(StringType).as("min_str"),
        lit(null).cast(StringType).as("max_str"))
      def str(name: String): DataFrame = li.agg(
        lit(name).as("col_name"),
        count(lit(1)).as("n_rows"),
        count_if(col(name).isNull).as("n_nulls"),
        countDistinct(col(name)).as("n_distinct"),
        lit(null).cast(DoubleType).as("min_num"),
        lit(null).cast(DoubleType).as("max_num"),
        min(col(name)).as("min_str"),
        max(col(name)).as("max_str"))
      Seq(num("l_orderkey"), num("l_quantity"), num("l_extendedprice"),
          str("l_returnflag"), str("l_linestatus"))
        .reduce(_ unionAll _)
        .orderBy("col_name")
    }),

    // Declarative data-quality constraint suite (Deequ-style): each check
    // reduces to a fraction-conforming metric compared against a 1.0
    // threshold — completeness, key uniqueness, referential integrity,
    // value domain, numeric range. ONE aggregate pass per table (a single
    // distinct-agg keeps the plan Expand-free) plus one broadcast
    // anti-join for RI; verdict rows are a stack over the 1-row
    // aggregates. unique_l_orderkey is a deliberately violated constraint
    // (lineitem has multiple lines per order) so both verdicts appear.
    "q_dq_checks" -> ((s, d) => {
      val liA = t(s, d, "lineitem").agg(
        count(lit(1)).as("n"),
        count_if(col("l_shipdate").isNotNull).as("n_ship"),
        countDistinct(col("l_orderkey")).as("nd_ok"),
        count_if(col("l_returnflag").isin("A", "N", "R")).as("n_flag"),
        count_if(col("l_discount") >= 0 && col("l_discount") <= 0.1).as("n_disc"))
      val ord = t(s, d, "orders")
      val orA = ord.agg(count(lit(1)).as("n"), countDistinct(col("o_orderkey")).as("nd"))
      // customer keys are a dimension — broadcast anti-join, no shuffle
      val riA = ord.join(broadcast(t(s, d, "customer").select(col("c_custkey"))),
          col("o_custkey") === col("c_custkey"), "left_anti")
        .agg(count(lit(1)).as("n_viol"))
      val liRows = liA.select(expr(
        """stack(4,
          | 'complete_l_shipdate', CAST(n_ship AS DOUBLE) / n,
          | 'unique_l_orderkey',   CAST(nd_ok AS DOUBLE) / n,
          | 'domain_l_returnflag', CAST(n_flag AS DOUBLE) / n,
          | 'range_l_discount',    CAST(n_disc AS DOUBLE) / n
          |) AS (check_name, metric)""".stripMargin))
      val orRows = orA.crossJoin(riA).select(expr(
        """stack(2,
          | 'unique_o_orderkey',  CAST(nd AS DOUBLE) / n,
          | 'ri_orders_customer', 1.0 - CAST(n_viol AS DOUBLE) / n
          |) AS (check_name, metric)""".stripMargin))
      liRows.unionAll(orRows)
        .select(col("check_name"), r4(col("metric")).as("metric"),
          lit(1.0).as("threshold"), (r4(col("metric")) >= 1.0).as("pass"))
        .orderBy("check_name")
    }),

    // k-anonymity audit over a quasi-identifier tuple: a record is
    // re-identifiable when its (segment, nation) equivalence class holds
    // fewer than K members. ONE hash aggregate (map-side combinable) over
    // the quasi-id, a risky flag per class, and the dataset's k-anonymity
    // (the min class size) broadcast onto every row from a 1-row
    // aggregate. K=8 is fixture-calibrated so the driver's sf0.01 gate
    // sees both verdicts.
    "q_dq_kanon" -> ((s, d) => {
      val classes = t(s, d, "customer")
        .groupBy("c_mktsegment", "c_nationkey")
        .agg(count(lit(1)).as("n"))
      val kAnon = classes.agg(min(col("n")).as("k_anonymity"))
      classes.crossJoin(broadcast(kAnon))
        .select(col("c_mktsegment"), col("c_nationkey"), col("n"),
          (col("n") < KANON_K).as("risky"), col("k_anonymity"))
        .orderBy("c_mktsegment", "c_nationkey")
    }),

    // Join-key skew census — the diagnostic a planner consults BEFORE
    // committing a 100 TB shuffle: per candidate key, distinct count,
    // max/mean frequency (the straggler ratio AQE's skew threshold
    // keys off), top-1 share, and Shannon entropy of the key
    // distribution. One groupBy per key column (each pass scans only
    // its column); every downstream stat aggregates the KEY HISTOGRAM
    // (|keys| rows), never the corpus; the entropy sum rides
    // DECIMAL(38,18) so histogram order can't drift it.
    "q_skew_report" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      def keyStats(name: String): DataFrame = {
        val hist = li.groupBy(col(name).as("k")).agg(count(lit(1)).as("f"))
          .withColumn("n", sum("f").over(Window.partitionBy())) // |keys| rows
        val p = col("f") / col("n")
        hist.agg(
          lit(name).as("key_col"),
          max("n").as("n_rows"),
          count(lit(1)).as("n_keys"),
          max("f").as("max_freq"),
          r4(max("f") * count(lit(1)).cast(DoubleType) / max("n")).as("skew_ratio"),
          r4(max("f").cast(DoubleType) / max("n")).as("top1_share"),
          r4(sum((-p * log(p)).cast(DecimalType(38, 18))).cast(DoubleType))
            .as("entropy"))
      }
      Seq("l_orderkey", "l_partkey", "l_suppkey").map(keyStats)
        .reduce(_.unionAll(_)).orderBy("key_col")
    }),

    // Join-cardinality estimation from key histograms: |A ⋈ B| =
    // Σ_k fA(k)·fB(k), computed by joining the two key HISTOGRAMS —
    // keys-sized inputs, never corpus-sized — which is how a planner
    // prices a join (and detects quadratic self-join blowup) without
    // running it. Exact, not a sketch: the histogram join IS the
    // estimator's definition, and the oracle recomputes it.
    "q_join_cardinality_est" -> ((s, d) => {
      def hist(df: DataFrame, c: String) =
        df.groupBy(col(c).as("k")).agg(count(lit(1)).as("f"))
      val li = t(s, d, "lineitem"); val o = t(s, d, "orders")
      def est(name: String, a: DataFrame, b: DataFrame) =
        a.join(b.withColumnRenamed("f", "fb"), Seq("k"))
          .agg(lit(name).as("join_name"),
            sum(col("f") * col("fb")).as("est_rows"),
            count(lit(1)).as("n_common_keys"))
      Seq(
        est("lineitem_orders_orderkey", hist(li, "l_orderkey"), hist(o, "o_orderkey")),
        est("lineitem_self_partkey", hist(li, "l_partkey"), hist(li, "l_partkey")),
        est("lineitem_self_suppkey", hist(li, "l_suppkey"), hist(li, "l_suppkey")),
        est("orders_customer_custkey", hist(o, "o_custkey"),
          hist(t(s, d, "customer"), "c_custkey")))
        .reduce(_.unionAll(_)).orderBy("join_name")
    }),

    // Chi-square independence test over the (market segment × order
    // priority) contingency table. ONE corpus aggregate builds the cell
    // counts; margins are window sums over the |R×C| aggregate rows
    // (25 here — windows over aggregates, never over the corpus).
    // Expected counts and cell contributions are deterministic IEEE
    // arithmetic on exact integer margins; the chi2 total rides a
    // DECIMAL(38,18) sum so cell order can't drift it, and lands on
    // every row from a 1-row broadcast (the q_dq_kanon shape).
    "q_stats_chi2" -> ((s, d) => {
      val cells = t(s, d, "orders")
        .join(maybeBroadcast(t(s, d, "customer")
          .select(col("c_custkey"), col("c_mktsegment"))),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment").as("seg"), col("o_orderpriority").as("prio"))
        .agg(count(lit(1)).as("observed"))
      val withE = cells
        .withColumn("rt", sum("observed").over(Window.partitionBy("seg")))
        .withColumn("ct", sum("observed").over(Window.partitionBy("prio")))
        .withColumn("n", sum("observed").over(Window.partitionBy()))
        .withColumn("expected", (col("rt") * col("ct")).cast(DoubleType) / col("n"))
        .withColumn("contrib",
          (col("observed") - col("expected")) * (col("observed") - col("expected")) /
            col("expected"))
      val total = withE.agg(
        sum(col("contrib").cast(DecimalType(38, 18))).cast(DoubleType).as("chi2"),
        ((countDistinct(col("seg")) - 1) * (countDistinct(col("prio")) - 1)).as("df"))
      withE.crossJoin(broadcast(total)) // 1-row aggregate
        .select(col("seg"), col("prio"), col("observed"),
          r4(col("expected")).as("expected"), r4(col("contrib")).as("contrib"),
          r4(col("chi2")).as("chi2"), col("df"))
        .orderBy("seg", "prio")
    }),

    // Snapshot reconciliation: diff two table versions by row
    // fingerprint. Each side collapses to (key, md5-of-normalized-row)
    // IN THE SCAN PROJECTION — the full-outer shuffle ships 8-byte keys
    // plus 32-byte hashes, never row payloads, which is what makes a
    // 100 TB diff feasible (changed payloads are then fetched by
    // semi-join on the emitted keys). Versions are carved
    // deterministically from `orders` by md5 bucket: bucket 2 is absent
    // from A (so it surfaces as added), bucket 0 absent from B
    // (removed), bucket 1 repriced in B (changed). Doubles enter the
    // fingerprint through DECIMAL(18,2) — double→string rendering is
    // NOT engine-portable, decimal rendering is.
    "q_table_diff" -> ((s, d) => {
      val bucket = pmod(h60(col("o_orderkey").cast("string")), lit(10))
      def fingerprint(price: Column) = md5(concat_ws("|",
        col("o_orderkey").cast("string"), col("o_orderstatus"),
        col("o_orderpriority"), price.cast(DecimalType(18, 2)).cast("string")))
      val base = t(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_orderpriority"),
          col("o_totalprice"), bucket.as("bk"))
      val verA = base.where(col("bk") =!= 2)
        .select(col("o_orderkey"), fingerprint(col("o_totalprice")).as("fp_a"))
      val verB = base.where(col("bk") =!= 0)
        .select(col("o_orderkey"),
          fingerprint(when(col("bk") === 1, col("o_totalprice") * 1.05)
            .otherwise(col("o_totalprice"))).as("fp_b"))
      verA.join(verB, Seq("o_orderkey"), "full_outer")
        .select(col("o_orderkey"),
          when(col("fp_b").isNull, "removed")
            .when(col("fp_a").isNull, "added")
            .when(col("fp_a") =!= col("fp_b"), "changed")
            .otherwise("unchanged").as("status"))
        .where(col("status") =!= "unchanged")
        .orderBy("o_orderkey")
    }),

    // Pairwise Pearson correlation matrix (upper triangle) over the
    // numeric measures — ONE aggregate pass computes all 6 co-moments,
    // then a literal-driven unpivot emits the pair rows.
    "q_profile_corr" -> ((s, d) => {
      val pairs = for {
        i <- CORR_COLS.indices; j <- CORR_COLS.indices if i < j
      } yield (CORR_COLS(i), CORR_COLS(j))
      val aggs = pairs.map { case (a, b) => r4(corr(col(a), col(b))).as(s"${a}__$b") }
      val one = t(s, d, "lineitem").agg(aggs.head, aggs.tail: _*)
      val stacked = pairs.map { case (a, b) =>
        s"'$a', '$b', `${a}__$b`"
      }.mkString(", ")
      one.select(expr(
          s"stack(${pairs.size}, $stacked) AS (col_a, col_b, pearson_r)"))
        .orderBy("col_a", "col_b")
    }),

    // Population-stability-index drift monitor: per order priority, the
    // PSI of the o_totalprice distribution between a reference window
    // (orders before PSI_SPLIT) and the current window — the
    // feature-drift check an ML pipeline runs before every retrain.
    // ONE conditional-count aggregate pass bins the corpus into
    // (priority, bin) cells with both periods' counts (map-side
    // combinable); proportions are Laplace-smoothed (+0.5 per bin) so
    // empty bins can't produce log(0); the PSI sum over ≤ PSI_BINS bins
    // rides DECIMAL(38,18) so bin order can't drift it (q_skew_report
    // playbook). Verdict bands at 0.1/0.25 are the industry rule of
    // thumb. Windows over the BIN table (≤ groups×bins rows), never the
    // corpus.
    "q_drift_psi" -> ((s, d) => {
      val isRef = col("o_orderdate") < lit(PSI_SPLIT).cast(TimestampType)
      val observed = t(s, d, "orders")
        .groupBy(col("o_orderpriority").as("prio"),
          least(floor(col("o_totalprice") / PSI_BIN_W), lit(PSI_BINS - 1L))
            .cast(LongType).as("bin"))
        .agg(count_if(isRef).as("n_ref"), count_if(!isRef).as("n_cur"))
      // the +0.5/bin Laplace denominator counts ALL PSI_BINS bins, so the
      // bin domain must be generated explicitly: a bin with zero rows in
      // both periods must still contribute its smoothed (p_ref, p_cur)
      // pair or the per-group probabilities don't sum to 1 and psi is
      // understated — the same absent-category class as the Benford
      // digit-domain fix (ADVICE r09). Domain is |prios| × PSI_BINS rows,
      // bounded at any corpus size.
      val domain = t(s, d, "orders")
        .select(col("o_orderpriority").as("prio")).distinct()
        .select(col("prio"),
          explode(sequence(lit(0L), lit(PSI_BINS - 1L))).as("bin"))
      val cells = domain.join(broadcast(observed), Seq("prio", "bin"), "left")
        .withColumn("n_ref", coalesce(col("n_ref"), lit(0L)))
        .withColumn("n_cur", coalesce(col("n_cur"), lit(0L)))
      val w = Window.partitionBy("prio")
      val smoothed = cells
        .withColumn("p_ref", (col("n_ref") + 0.5) /
          (sum("n_ref").over(w) + 0.5 * PSI_BINS))
        .withColumn("p_cur", (col("n_cur") + 0.5) /
          (sum("n_cur").over(w) + 0.5 * PSI_BINS))
        .withColumn("contrib",
          (col("p_cur") - col("p_ref")) * log(col("p_cur") / col("p_ref")))
      smoothed.groupBy("prio")
        .agg(sum("n_ref").as("n_ref"), sum("n_cur").as("n_cur"),
          sum(col("contrib").cast(DecimalType(38, 18))).cast(DoubleType).as("psi"))
        // the verdict binds to the SAME r4-rounded psi that is emitted, so
        // a published row can never read psi = 0.1 with verdict 'stable'
        .select(col("prio"), col("n_ref"), col("n_cur"), r4(col("psi")).as("psi"))
        .select(col("prio"), col("n_ref"), col("n_cur"), col("psi"),
          when(col("psi") < 0.1, "stable").when(col("psi") < 0.25, "moderate")
            .otherwise("shifted").as("verdict"))
        .orderBy("prio")
    }),

    // Benford first-digit audit over o_totalprice — the classic
    // fabricated-data screen. The digit is taken from the DECIMAL STRING
    // rendering of the integer part (floor→BIGINT→VARCHAR), never from
    // float log10 arithmetic, whose behavior at exact powers of ten is
    // not engine-portable. ONE aggregate collapses the corpus to ≤9
    // digit rows; expected shares are closed-form log10(1+1/d); the χ²
    // statistic sums over the 9 rows in DECIMAL(38,18) and lands on
    // every row from a 1-row broadcast (q_stats_chi2 shape).
    "q_dq_benford" -> ((s, d) => {
      val obs = t(s, d, "orders")
        .where(col("o_totalprice") >= 1)
        .groupBy(substring(floor(col("o_totalprice")).cast(LongType)
          .cast(StringType), 1, 1).as("digit"))
        .agg(count(lit(1)).as("n_obs"))
      // the standard test is a 9-category χ² — generate the 1-9 digit
      // domain explicitly so a digit with ZERO observations still
      // contributes its (0 - n_exp)²/n_exp term instead of silently
      // dropping out and understating chi2
      val digits = s.range(1, 10)
        .select(col("id").cast(StringType).as("digit"))
        .join(broadcast(obs), Seq("digit"), "left")
        .withColumn("n_obs", coalesce(col("n_obs"), lit(0L)))
        .withColumn("n", sum("n_obs").over(Window.partitionBy()))
      val expFrac = log(lit(1.0) + lit(1.0) / col("digit").cast(DoubleType)) / log(lit(10.0))
      val withE = digits
        .withColumn("frac_exp", expFrac)
        .withColumn("n_exp", col("n") * expFrac)
        .withColumn("contrib",
          (col("n_obs") - col("n_exp")) * (col("n_obs") - col("n_exp")) / col("n_exp"))
      val total = withE.agg(
        sum(col("contrib").cast(DecimalType(38, 18))).cast(DoubleType).as("chi2"))
      withE.crossJoin(broadcast(total)) // 1-row aggregate
        .select(col("digit"), col("n_obs"),
          r4(col("n_obs").cast(DoubleType) / col("n")).as("frac_obs"),
          r4(col("frac_exp")).as("frac_exp"), r4(col("chi2")).as("chi2"))
        .orderBy("digit")
    }),

    // Equi-depth decile histogram (see [[profileHistogram]]).
    "q_profile_histogram" -> ((s, d) => profileHistogram(s, d)),

    // The 100 TB path for the same histogram: decile bounds from the
    // GK/approx_percentile SKETCH (mergeable, O(accuracy) state per
    // partial) instead of exact percentile, which materializes the full
    // value list per group and is the scale-killer in this file. Rank
    // error is ≤ 1/accuracy of N per bound ⇒ every bin's depth is within
    // ±2·N/accuracy of N/10 and any row lands at most one bin from its
    // exact assignment (≤1-bin-shift bound asserted vs the exact twin in
    // PropertySpec). Sketch family ⇒ no hash oracle by design — the
    // exact twin above is the hash-checked query.
    "q_profile_histogram_approx" -> ((s, d) =>
      histogramFromBounds(s, d,
        t(s, d, "lineitem").agg(percentile_approx(col("l_extendedprice"),
            array((1 to 9).map(q => lit(q / 10.0)): _*), lit(HIST_ACCURACY))
          .as("bs"))
          .select(transform(col("bs"), b => r4(b)).as("bs")))),

    // Data-freshness audit — the staleness check a pipeline runs before
    // trusting an incremental source: per event stream, last-seen event
    // time, its lag behind the freshest stream, and a stale verdict.
    // ONE map-side-combinable aggregate collapses the corpus to
    // |streams| rows; the global high-water mark is a window over that
    // bounded aggregate, never the corpus.
    "q_dq_freshness" -> ((s, d) => {
      val agg = t(s, d, "events")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"), max(tsec(col("ts"))).as("last_sec"))
      agg
        .withColumn("lag_sec",
          max("last_sec").over(Window.partitionBy()) - col("last_sec"))
        .select(col("event_type"), col("n_events"), col("last_sec"),
          col("lag_sec"), (col("lag_sec") > FRESH_LAG).as("stale"))
        .orderBy("event_type")
    }),
  )

  /** q_dq_freshness staleness bound (seconds) — fixture-calibrated so
    * both verdicts appear at every sf tier (max inter-stream lag is
    * ~33 min at sf0.01, ~7 h at sf0.001). */
  private val FRESH_LAG = 1800L

  /** q_drift_psi dials: period boundary, bin width, bin count — orders
    * span 1995–2001 at totalprice < 500k, so 10 × 50k bins cover the
    * domain and the 1999 split puts ~60/40 of rows on each side. */
  private val PSI_SPLIT = "1999-01-01"
  private val PSI_BIN_W = 50000.0
  private val PSI_BINS = 10L

  /** Equi-depth histogram over l_extendedprice — the planner/profiler
    * bucket structure: decile BOUNDARIES from one exact-percentile
    * aggregate (a 1-row result, broadcast), then one binned count pass
    * where bin = #(boundaries below x) via an array predicate over the
    * 9-element literal-sized bound array. Two corpus passes, both
    * narrow + one hash agg; no corpus sort (the textbook ntile
    * formulation is a global sort). Exact percentile buffers per-value
    * counts in the aggregator, so the 100 TB dial is
    * `approx_percentile` for the BOUNDS pass — same plan shape, fixed
    * sketch memory — with the count pass unchanged (the q_profile_table
    * countDistinct playbook). Boundaries are r4-rounded BEFORE
    * the comparisons so both engines cut on identical doubles —
    * percentile interpolation is only 4dp-portable, and a 1-ulp bound
    * difference would flip boundary rows across bins. */
  /** approx_percentile accuracy dial: rank error ≤ N/HIST_ACCURACY per
    * bound. 10k ⇒ ±0.01% of rows per decile bound — sketch state is
    * O(accuracy·log N) doubles per partial, independent of corpus size. */
  private[graft] val HIST_ACCURACY = 10000

  /** Value-bucket width for the distributed exact-percentile prefix sum
    * (the q_stream_watermark two-phase shape): l_extendedprice spans
    * ~[900, 110k], so 1024-wide buckets give ~110 ordered buckets whose
    * per-bucket cumulative windows run in parallel. A degenerate domain
    * (everything in one bucket) only loses the parallelism, never the
    * result. */
  private val PCTL_BKT_W = 1024.0

  private def profileHistogram(s: SparkSession, d: String): DataFrame = {
    // Distributed EXACT decile bounds (r21): Catalyst's `percentile`
    // buffers every distinct value with its count in one OpenHashMap per
    // partial and merges + sorts the WHOLE value census (583k distinct at
    // sf0.1) in a single final-aggregate task — measured as the dominant
    // cost of this query (guide §1.2 step 1: the single-task merge is the
    // algorithmic bottleneck, not the scan). This is the classic
    // distributed-selection shape instead — no corpus-scale shuffle at
    // all, every phase parallel or bounded:
    //  1. value-range bucket histogram: one map-side-combinable count
    //     per [[PCTL_BKT_W]]-wide bucket (~110 rows at sf0.1);
    //  2. on that BOUNDED frame: exact bucket-prefix counts, N, and per
    //     decile q the target positions — position = q·(N−1), ranks
    //     ⌊pos⌋/⌈pos⌉ — each resolved to (bucket, rank-within-bucket);
    //  3. one corpus pass keeps ONLY rows of the ≤18 target buckets
    //     (broadcast semi-join), ranks them within their bucket by
    //     value, and a broadcast join picks the ≤18 ranked rows — ties
    //     among equal values are position-invariant, so the picked
    //     doubles are EXACTLY the values Catalyst's sorted census holds
    //     at those ranks;
    //  4. linear interpolation in the exact order of Catalyst's
    //     bytecode — (higher−pos)·lowerKey + (pos−lower)·higherKey — so
    //     the bounds are bitwise-identical to the single-task
    //     aggregate's (the oracle CTE is unchanged).
    // NULLs excluded from the bounds computation (ADVICE r21): Catalyst's
    // `percentile` ignores null inputs, while floor(null/W) would form a
    // null bucket that sorts first in the cumulative window and inflate
    // every bucket's prior. The fixture column is non-null, so this is
    // row-identity here; it pins the rewrite's equivalence on any data.
    val v = col("l_extendedprice")
    val li = t(s, d, "lineitem").where(v.isNotNull)
    val qs = (1 to 9).map(_ / 10.0)
    val bktAgg = li.groupBy(floor(v / PCTL_BKT_W).as("bkt"))
      .agg(count(lit(1)).as("bn"))
    val wPrior = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    val bktCum = bktAgg // ~110 rows: the windows below are bounded, not corpus-scale
      .withColumn("prior", coalesce(sum(col("bn")).over(wPrior), lit(0L)))
      .withColumn("n", sum(col("bn")).over(Window.partitionBy()))
    val targets = bktCum
      .select(col("bkt"), col("prior"), col("bn"), col("n"),
        explode(array(qs.map(lit): _*)).as("q"))
      .withColumn("pos", (col("n") - 1).cast(DoubleType) * col("q"))
      .withColumn("lower", floor(col("pos")))
      .withColumn("higher", ceil(col("pos")))
      .select(col("bkt"), col("prior"), col("bn"), col("q"), col("pos"),
        col("lower"), col("higher"),
        explode(array(
          struct(col("lower").as("p"), lit(true).as("is_lower")),
          struct(col("higher").as("p"), lit(false).as("is_lower")))).as("tp"))
      .where(col("tp.p") >= col("prior") && col("tp.p") < col("prior") + col("bn"))
      .select(col("bkt"), (col("tp.p") - col("prior") + 1).as("rn"),
        col("q"), col("pos"), col("lower"), col("higher"), col("tp.is_lower"))
    val wRn = Window.partitionBy("bkt").orderBy(v)
    val picked = li
      .withColumn("bkt", floor(v / PCTL_BKT_W))
      .join(broadcast(targets.select("bkt").distinct()), Seq("bkt"), "left_semi")
      .withColumn("rn", row_number().over(wRn).cast(LongType))
      .join(broadcast(targets), Seq("bkt", "rn"))
    val sel = picked.groupBy("q")
      .agg(max(when(col("is_lower"), v)).as("lk"),
        max(when(!col("is_lower"), v)).as("hk"),
        first(col("pos")).as("pos"),
        first(col("lower")).as("lower"), first(col("higher")).as("higher"))
      .select(col("q"),
        when(col("higher") === col("lower") || col("lk") === col("hk"), col("lk"))
          .otherwise(
            (col("higher").cast(DoubleType) - col("pos")) * col("lk") +
              (col("pos") - col("lower").cast(DoubleType)) * col("hk"))
          .as("b"))
    val bounds = sel
      .agg(array_sort(collect_list(struct(col("q"), col("b")))).as("t"))
      .select(transform(col("t"), x => r4(x.getField("b"))).as("bs"))
    histogramFromBounds(s, d, bounds)
  }

  /** Shared binning tail: count/min/max/frac per decile bin against a
    * 1-row broadcast bounds aggregate — the bounds SOURCE (exact
    * percentile vs approx sketch) is the only difference between the
    * exact and approx histogram queries. */
  private def histogramFromBounds(s: SparkSession, d: String,
      bounds: DataFrame): DataFrame = {
    val li = t(s, d, "lineitem")
    li.crossJoin(broadcast(bounds)) // 1-row aggregate
      .withColumn("bin",
        size(filter(col("bs"), b => col("l_extendedprice") > b)).cast(LongType))
      .groupBy("bin").agg(count(lit(1)).as("n_rows"),
        r4(min(col("l_extendedprice"))).as("lo"),
        r4(max(col("l_extendedprice"))).as("hi"))
      .withColumn("frac",
        r4(col("n_rows") / sum("n_rows").over(Window.partitionBy())))
      .orderBy("bin")
  }

  def oracle: Seq[(String, String)] = Seq(
    "q_profile_table" -> {
      def num(name: String) =
        s"""SELECT '$name' AS col_name, count(*) AS n_rows,
           | count(*) FILTER (WHERE $name IS NULL) AS n_nulls,
           | count(DISTINCT $name) AS n_distinct,
           | CAST(min($name) AS DOUBLE) AS min_num,
           | CAST(max($name) AS DOUBLE) AS max_num,
           | CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
           |FROM lineitem""".stripMargin
      def str(name: String) =
        s"""SELECT '$name', count(*),
           | count(*) FILTER (WHERE $name IS NULL),
           | count(DISTINCT $name),
           | CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
           | min($name), max($name)
           |FROM lineitem""".stripMargin
      Seq(num("l_orderkey"), num("l_quantity"), num("l_extendedprice"),
          str("l_returnflag"), str("l_linestatus"))
        .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    },
    "q_dq_checks" ->
      s"""WITH li AS (
         |  SELECT count(*) AS n,
         |   count(*) FILTER (WHERE l_shipdate IS NOT NULL) AS n_ship,
         |   count(DISTINCT l_orderkey) AS nd_ok,
         |   count(*) FILTER (WHERE l_returnflag IN ('A','N','R')) AS n_flag,
         |   count(*) FILTER (WHERE l_discount >= 0 AND l_discount <= 0.1) AS n_disc
         |  FROM lineitem),
         |ord AS (SELECT count(*) AS n, count(DISTINCT o_orderkey) AS nd FROM orders),
         |ri AS (SELECT count(*) AS n_viol FROM orders o
         |       WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)),
         |m AS (
         |  SELECT 'complete_l_shipdate' AS check_name, CAST(n_ship AS DOUBLE)/n AS metric FROM li
         |  UNION ALL SELECT 'unique_l_orderkey',   CAST(nd_ok AS DOUBLE)/n FROM li
         |  UNION ALL SELECT 'domain_l_returnflag', CAST(n_flag AS DOUBLE)/n FROM li
         |  UNION ALL SELECT 'range_l_discount',    CAST(n_disc AS DOUBLE)/n FROM li
         |  UNION ALL SELECT 'unique_o_orderkey',   CAST(nd AS DOUBLE)/n FROM ord
         |  UNION ALL SELECT 'ri_orders_customer',  1.0 - CAST(n_viol AS DOUBLE)/(SELECT n FROM ord) FROM ri)
         |SELECT check_name, ${r4sql("metric")} AS metric,
         | 1.0 AS threshold, (${r4sql("metric")} >= 1.0) AS pass
         |FROM m ORDER BY check_name""".stripMargin,
    "q_dq_kanon" ->
      s"""WITH classes AS (
         |  SELECT c_mktsegment, c_nationkey, count(*) AS n
         |  FROM customer GROUP BY 1, 2),
         |ka AS (SELECT min(n) AS k_anonymity FROM classes)
         |SELECT c_mktsegment, c_nationkey, n, (n < $KANON_K) AS risky, k_anonymity
         |FROM classes CROSS JOIN ka
         |ORDER BY c_mktsegment, c_nationkey""".stripMargin,
    "q_skew_report" -> {
      def one(c: String) =
        s"""SELECT '$c' AS key_col, max(n) AS n_rows, count(*) AS n_keys,
           | max(f) AS max_freq,
           | ${r4sql(s"max(f) * CAST(count(*) AS DOUBLE) / max(n)")} AS skew_ratio,
           | ${r4sql(s"CAST(max(f) AS DOUBLE) / max(n)")} AS top1_share,
           | ${r4sql(s"CAST(sum(CAST(-(f / n) * ln(f / n) AS DECIMAL(38,18))) AS DOUBLE)")} AS entropy
           |FROM (SELECT f, CAST(sum(f) OVER () AS BIGINT) AS n
           |      FROM (SELECT $c AS k, count(*) AS f FROM lineitem GROUP BY 1))""".stripMargin
      Seq("l_orderkey", "l_partkey", "l_suppkey").map(one)
        .mkString("", "\nUNION ALL\n", "\nORDER BY key_col")
    },
    "q_join_cardinality_est" -> {
      def est(name: String, ha: String, hb: String) =
        s"""SELECT '$name' AS join_name, CAST(sum(a.f * b.f) AS BIGINT) AS est_rows,
           | count(*) AS n_common_keys
           |FROM ($ha) a JOIN ($hb) b USING (k)""".stripMargin
      def h(tbl: String, c: String) = s"SELECT $c AS k, count(*) AS f FROM $tbl GROUP BY 1"
      Seq(
        est("lineitem_orders_orderkey", h("lineitem", "l_orderkey"), h("orders", "o_orderkey")),
        est("lineitem_self_partkey", h("lineitem", "l_partkey"), h("lineitem", "l_partkey")),
        est("lineitem_self_suppkey", h("lineitem", "l_suppkey"), h("lineitem", "l_suppkey")),
        est("orders_customer_custkey", h("orders", "o_custkey"), h("customer", "c_custkey")))
        .mkString("", "\nUNION ALL\n", "\nORDER BY join_name")
    },
    "q_stats_chi2" ->
      s"""WITH cells AS (
         |  SELECT c_mktsegment AS seg, o_orderpriority AS prio, count(*) AS observed
         |  FROM orders JOIN customer ON o_custkey = c_custkey
         |  GROUP BY 1, 2),
         |m AS (
         |  SELECT seg, prio, observed,
         |   sum(observed) OVER (PARTITION BY seg) AS rt,
         |   sum(observed) OVER (PARTITION BY prio) AS ct,
         |   sum(observed) OVER () AS n
         |  FROM cells),
         |c2 AS (
         |  SELECT seg, prio, observed, expected,
         |   (observed - expected)*(observed - expected)/expected AS contrib
         |  FROM (SELECT *, CAST(rt*ct AS DOUBLE)/n AS expected FROM m)),
         |tot AS (
         |  SELECT CAST(sum(CAST(contrib AS DECIMAL(38,18))) AS DOUBLE) AS chi2,
         |   (count(DISTINCT seg)-1)*(count(DISTINCT prio)-1) AS df
         |  FROM c2)
         |SELECT seg, prio, observed, ${r4sql("expected")} AS expected,
         | ${r4sql("contrib")} AS contrib, ${r4sql("chi2")} AS chi2, df
         |FROM c2 CROSS JOIN tot ORDER BY seg, prio""".stripMargin,
    "q_table_diff" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice,
        |   ('0x'||substr(md5(CAST(o_orderkey AS VARCHAR)),1,15))::BIGINT % 10 AS bk
        |  FROM orders),
        |va AS (
        |  SELECT o_orderkey, md5(CAST(o_orderkey AS VARCHAR)||'|'||o_orderstatus||'|'||
        |   o_orderpriority||'|'||CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR)) AS fp_a
        |  FROM base WHERE bk <> 2),
        |vb AS (
        |  SELECT o_orderkey, md5(CAST(o_orderkey AS VARCHAR)||'|'||o_orderstatus||'|'||
        |   o_orderpriority||'|'||CAST(CAST(
        |     CASE WHEN bk = 1 THEN o_totalprice * CAST(1.05 AS DOUBLE) ELSE o_totalprice END
        |   AS DECIMAL(18,2)) AS VARCHAR)) AS fp_b
        |  FROM base WHERE bk <> 0),
        |d AS (
        |  SELECT o_orderkey,
        |   CASE WHEN fp_b IS NULL THEN 'removed' WHEN fp_a IS NULL THEN 'added'
        |        WHEN fp_a <> fp_b THEN 'changed' ELSE 'unchanged' END AS status
        |  FROM va FULL OUTER JOIN vb USING (o_orderkey))
        |SELECT o_orderkey, status FROM d WHERE status <> 'unchanged'
        |ORDER BY o_orderkey""".stripMargin,
    "q_profile_corr" -> {
      val pairs = for {
        i <- CORR_COLS.indices; j <- CORR_COLS.indices if i < j
      } yield (CORR_COLS(i), CORR_COLS(j))
      val rows = pairs.map { case (a, b) =>
        s"SELECT '$a' AS col_a, '$b' AS col_b, ${r4sql(s"corr($a, $b)")} AS pearson_r FROM lineitem"
      }
      rows.mkString("", "\nUNION ALL\n", "\nORDER BY col_a, col_b")
    },
    "q_drift_psi" ->
      s"""WITH observed AS (
         |  SELECT o_orderpriority AS prio,
         |   least(CAST(floor(o_totalprice / $PSI_BIN_W) AS BIGINT), ${PSI_BINS - 1}) AS bin,
         |   count(*) FILTER (WHERE o_orderdate < TIMESTAMP '$PSI_SPLIT') AS n_ref,
         |   count(*) FILTER (WHERE o_orderdate >= TIMESTAMP '$PSI_SPLIT') AS n_cur
         |  FROM orders GROUP BY 1, 2),
         |dom AS (
         |  SELECT p.prio, b.b AS bin
         |  FROM (SELECT DISTINCT o_orderpriority AS prio FROM orders) p,
         |       generate_series(0, ${PSI_BINS - 1}) b(b)),
         |cells AS (
         |  SELECT d.prio, d.bin,
         |   coalesce(o.n_ref, 0) AS n_ref, coalesce(o.n_cur, 0) AS n_cur
         |  FROM dom d LEFT JOIN observed o ON d.prio = o.prio AND d.bin = o.bin),
         |sm AS (
         |  SELECT prio, n_ref, n_cur,
         |   (n_ref + 0.5) / (sum(n_ref) OVER (PARTITION BY prio) + 0.5 * $PSI_BINS) AS p_ref,
         |   (n_cur + 0.5) / (sum(n_cur) OVER (PARTITION BY prio) + 0.5 * $PSI_BINS) AS p_cur
         |  FROM cells),
         |agg AS (
         |  SELECT prio, CAST(sum(n_ref) AS BIGINT) AS n_ref,
         |   CAST(sum(n_cur) AS BIGINT) AS n_cur,
         |   CAST(sum(CAST((p_cur - p_ref) * ln(p_cur / p_ref) AS DECIMAL(38,18))) AS DOUBLE) AS psi
         |  FROM sm GROUP BY 1),
         |r AS (
         |  SELECT prio, n_ref, n_cur, ${r4sql("psi")} AS psi FROM agg)
         |SELECT prio, n_ref, n_cur, psi,
         | CASE WHEN psi < 0.1 THEN 'stable' WHEN psi < 0.25 THEN 'moderate'
         |      ELSE 'shifted' END AS verdict
         |FROM r ORDER BY prio""".stripMargin,
    "q_dq_benford" ->
      """WITH obs AS (
        |  SELECT substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS digit,
        |   count(*) AS n_obs
        |  FROM orders WHERE o_totalprice >= 1 GROUP BY 1),
        |digits AS (
        |  SELECT CAST(g.d AS VARCHAR) AS digit, coalesce(obs.n_obs, 0) AS n_obs
        |  FROM generate_series(1, 9) AS g(d)
        |  LEFT JOIN obs ON CAST(g.d AS VARCHAR) = obs.digit),
        |w AS (
        |  SELECT digit, n_obs, sum(n_obs) OVER () AS n,
        |   ln(CAST(1.0 AS DOUBLE) + CAST(1.0 AS DOUBLE) / CAST(digit AS DOUBLE))
        |     / ln(CAST(10.0 AS DOUBLE)) AS frac_exp
        |  FROM digits),
        |e AS (
        |  SELECT *, n * frac_exp AS n_exp,
        |   (n_obs - n * frac_exp) * (n_obs - n * frac_exp) / (n * frac_exp) AS contrib
        |  FROM w),
        |tot AS (
        |  SELECT CAST(sum(CAST(contrib AS DECIMAL(38,18))) AS DOUBLE) AS chi2 FROM e)
        |SELECT digit, n_obs,
        | CAST(round(CAST(CAST(n_obs AS DOUBLE) / n AS DECIMAL(38,6)), 4) AS DOUBLE) AS frac_obs,
        | CAST(round(CAST(frac_exp AS DECIMAL(38,6)), 4) AS DOUBLE) AS frac_exp,
        | CAST(round(CAST(chi2 AS DECIMAL(38,6)), 4) AS DOUBLE) AS chi2
        |FROM e CROSS JOIN tot ORDER BY digit""".stripMargin,
    "q_profile_histogram" -> {
      val qlist = (1 to 9).map(i => (i / 10.0).toString).mkString(", ")
      s"""WITH bounds AS (
         |  SELECT list_transform(quantile_cont(l_extendedprice, [$qlist]),
         |    b -> CAST(round(CAST(b AS DECIMAL(38,6)), 4) AS DOUBLE)) AS bs
         |  FROM lineitem),
         |binned AS (
         |  SELECT CAST(len(list_filter(bs, b -> l_extendedprice > b)) AS BIGINT) AS bin,
         |   l_extendedprice
         |  FROM lineitem CROSS JOIN bounds),
         |agg AS (
         |  SELECT bin, count(*) AS n_rows,
         |   ${r4sql("min(l_extendedprice)")} AS lo,
         |   ${r4sql("max(l_extendedprice)")} AS hi
         |  FROM binned GROUP BY 1)
         |SELECT bin, n_rows, lo, hi,
         | ${r4sql("CAST(n_rows AS DOUBLE) / sum(n_rows) OVER ()")} AS frac
         |FROM agg ORDER BY bin""".stripMargin
    },
    "q_dq_freshness" ->
      s"""WITH agg AS (
         |  SELECT event_type, count(*) AS n_events,
         |   max(CAST(floor(epoch(ts)) AS BIGINT)) AS last_sec
         |  FROM events GROUP BY 1),
         |w AS (
         |  SELECT *, CAST(max(last_sec) OVER () - last_sec AS BIGINT) AS lag_sec
         |  FROM agg)
         |SELECT event_type, n_events, last_sec, lag_sec,
         | lag_sec > $FRESH_LAG AS stale
         |FROM w ORDER BY event_type""".stripMargin,
  )
}
