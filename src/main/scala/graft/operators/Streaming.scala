package graft.operators

import graft.{QueryPack, Tables}
import graft.Tables._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.TimestampType

/** Streaming batch twins — SURVEY.md §3B #47–50 over `events`. The same
  * logical queries run as genuine Structured Streaming (readStream +
  * Trigger.AvailableNow) in graft.streaming.Streams, scalatest-covered;
  * the batch twins here are what the driver oracle-checks. Upstream analog:
  * SNOWAV's daily-cadence incremental processing loop ([U] SURVEY.md §3A).
  *
  * Scale notes (100 TB): tumbling/sliding aggregates are hash aggs keyed by
  * (window, type) — map-side combinable, one shuffle. The sliding window
  * expands each event into window_size/slide = 4 rows map-side (Spark's own
  * physical strategy for window()); session-ization shuffles once on
  * user_id; the watermark emulation is a running max over arrival order —
  * in the true streaming run this is the state-store watermark, no sort.
  */
object Streaming extends QueryPack {

  /** Session-inactivity gap (seconds) for q_event_paths; the fixture's
    * median inter-event gap is ~7 h, so 6 h yields multi-event sessions. */
  private val PATH_GAP = 21600L

  def queries: Seq[(String, Fn)] = Seq(
    // #47 1-hour tumbling window aggregate.
    "q_window_tumbling" -> ((s, d) =>
      t(s, d, "events")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(col("w.start").as("win_start"), col("event_type"), col("n"),
          r4(col("sum_value")).as("sum_value"))
        .orderBy("win_start", "event_type")),

    // #48 1-hour window sliding every 15 min (each event lands in 4 windows).
    "q_window_sliding" -> ((s, d) =>
      t(s, d, "events")
        .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(col("w.start").as("win_start"), col("n"),
          r4(col("sum_value")).as("sum_value"))
        .orderBy("win_start")),

    // #49 session windows (30-min gap) per user — gaps-and-islands twin of
    // session_window(ts, "30 minutes"): session end = last event (streaming
    // adds +gap to the end; we emit last-event time for oracle parity).
    "q_window_session" -> ((s, d) => {
      val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val cum = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "events")
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        // gap measured in FULL µs — session_window (the streaming twin
        // this query must mirror) compares true timestamps, and a
        // floor-second gap would split/merge sessions whose boundary
        // falls inside a second (same precision class as q_features_pit).
        // >= not >: session_window's windows are half-open [start,
        // last+gap), so an event at exactly prev+gap does NOT merge —
        // it opens a new session (review r11).
        .withColumn("new_sess",
          when(col("prev_ts").isNull ||
            unix_micros(col("ts").cast(TimestampType)) -
              unix_micros(col("prev_ts").cast(TimestampType)) >= 1800000000L,
            1).otherwise(0))
        .withColumn("sess_id", sum(col("new_sess")).over(cum))
        .groupBy("user_id", "sess_id")
        .agg(min(col("ts")).as("sess_start"), max(col("ts")).as("sess_end"),
          count(lit(1)).as("n_events"))
        .orderBy("user_id", "sess_id")
    }),

    // #50 watermark late-drop, batch-emulated deterministically: arrival
    // order = event_id; watermark = running max(ts) − 10 min; an event is
    // dropped iff ts < watermark at its arrival. On-time counts per hour.
    //
    // The global running max is a two-phase distributed prefix scan — the
    // naive `Window.orderBy(event_id)` (no partitionBy) funnels ALL rows
    // through one task. Phase 1 computes the running max WITHIN arrival
    // buckets (partitioned window, parallel); phase 2 takes the per-bucket
    // maxima (#buckets rows, broadcastable) and prefix-maxes those; the
    // event's watermark is greatest(within-bucket prefix, prior buckets'
    // max). Same shape as partial/final aggregation: the only global step
    // runs over tiny data.
    "q_stream_watermark" -> ((s, d) => {
      val B = 1000L // arrival-sequence bucket width
      val ev = t(s, d, "events")
        .withColumn("bkt", (col("event_id") / B).cast("long"))
      val wIn = Window.partitionBy("bkt").orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val local = ev.withColumn("run_ts", max(tsec(col("ts"))).over(wIn))
      val wPrior = Window.orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
      val bmax = ev.groupBy("bkt").agg(max(tsec(col("ts"))).as("bkt_max"))
        .withColumn("prior_max", max(col("bkt_max")).over(wPrior))
        .select("bkt", "prior_max")
      // bmax has one row per bucket (#events / B) — grows with data, so
      // the hint is size-gated like every data-proportional build side
      local.join(maybeBroadcast(bmax), "bkt")
        .withColumn("wm",
          greatest(col("run_ts"), coalesce(col("prior_max"), lit(Long.MinValue))) - 600)
        .withColumn("late", tsec(col("ts")) < col("wm"))
        .where(!col("late"))
        .groupBy(window(col("ts"), "1 hour").as("w"))
        .agg(count(lit(1)).as("n_on_time"))
        .select(col("w.start").as("win_start"), col("n_on_time"))
        .orderBy("win_start")
    }),

    // Streaming outlier alerts, batch-emulated: z-score of each event
    // against the mean/stddev of that user's STRICTLY PRIOR events
    // (prefix frame ordered by event time), alert when n_prior >= 10 and
    // rounded z >= 2. One partitioned window pass — a single shuffle on
    // user_id at any scale. The genuine streaming run is
    // Streams.outlierAlerts (Spark 4 transformWithState + RocksDB state
    // store, Welford moments in a per-user ValueState); StreamingSpec
    // asserts it emits exactly these rows across micro-batch splits.
    "q_stream_outliers" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      t(s, d, "events")
        .select(col("user_id"), col("event_id"), col("value"),
          ((col("value") - avg("value").over(w)) / stddev_samp("value").over(w)).as("zraw"),
          count(lit(1)).over(w).as("n_prior"))
        .where(col("n_prior") >= 10 && r4(col("zraw")) >= 2.0)
        .select(col("user_id"), col("event_id"), col("value"),
          r4(col("zraw")).as("z"))
        .orderBy("user_id", "event_id")
    }),

    // Batch twin of Streams.attributed — the stream-stream interval join
    // (purchases × views of the same user within the prior hour), rolled
    // up per user. The join is equi on user_id plus an event-time bound:
    // ONE shuffle on the user key; the time predicate evaluates inside
    // the join, which is exactly what lets the streaming run evict state
    // once the watermark passes (StreamingSpec proves the streaming plan
    // row-count-identical on finite input). LEFT join so purchases with
    // no qualifying view still count toward n_purchases.
    "q_stream_attribution" -> ((s, d) => {
      // the at-or-before-purchase bound compares FULL µs timestamps — a
      // floor-second pt would attribute a view up to a second AFTER the
      // purchase (same precision class as q_features_pit, ADVICE r09);
      // the 1-hour lookback is 3 600 000 000 µs
      val ev = t(s, d, "events")
      val p = ev.where(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"),
          unix_micros(col("ts").cast(TimestampType)).as("pt"))
      val v = ev.where(col("event_type") === "view")
        .select(col("user_id"), unix_micros(col("ts").cast(TimestampType)).as("vt"))
      val pairs = p.join(v,
        p("user_id") === v("user_id") &&
          v("vt") >= p("pt") - 3600000000L && v("vt") <= p("pt"), "left")
        .select(p("user_id"), col("p_id"), col("vt"))
      pairs.groupBy("user_id", "p_id").agg(count(col("vt")).as("n_views"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_purchases"),
          count_if(col("n_views") > 0).as("n_attributed"),
          sum(col("n_views")).as("n_view_pairs"))
        .orderBy("user_id")
    }),

    // Ordered funnel over event history: first view, first click AFTER
    // that view, first purchase AFTER that click — order matters, so
    // each stage is a conditional min over the previous stage's
    // timestamp. Per-user stage aggregates are tiny (≤1 row/user), so
    // the stage joins broadcast; the corpus-side work is three
    // map-side-combinable conditional mins. Final 3-row summary with
    // step-to-step conversion (the 3-row window is not a corpus sort).
    "q_event_funnel" -> ((s, d) => {
      // stage sequencing compares FULL µs timestamps — floor-second et
      // would let a click up to a second before its user's first view
      // count as "after" it (same precision class as q_features_pit,
      // ADVICE r09)
      val ev = t(s, d, "events")
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts").cast(TimestampType)).as("et"))
      val v = ev.where(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("et")).as("t1"))
      val c = ev.join(maybeBroadcast(v), "user_id")
        .where(col("event_type") === "click" && col("et") >= col("t1"))
        .groupBy("user_id").agg(min(col("et")).as("t2"))
      val p = ev.join(maybeBroadcast(c), "user_id")
        .where(col("event_type") === "purchase" && col("et") >= col("t2"))
        .groupBy("user_id").agg(min(col("et")).as("t3"))
      val steps = v.agg(count(lit(1)).as("n")).select(lit(1).as("step"), lit("view").as("stage"), col("n"))
        .unionAll(c.agg(count(lit(1)).as("n")).select(lit(2).as("step"), lit("click").as("stage"), col("n")))
        .unionAll(p.agg(count(lit(1)).as("n")).select(lit(3).as("step"), lit("purchase").as("stage"), col("n")))
      val w = Window.orderBy("step") // 3 rows — not a corpus sort
      steps
        .withColumn("conv", // step-to-step: n / previous stage's n (step 1 → 1.0)
          r4(col("n").cast("double") / coalesce(lag(col("n"), 1).over(w), col("n"))))
        .orderBy("step")
    }),

    // Point-in-time feature join — the feature-store correctness
    // primitive: for every purchase event (the label point), the latest
    // prior value and running count of each behavioral signal for that
    // user STRICTLY BEFORE the purchase instant, so no future leaks
    // into the features. All five features ride ONE (user_id) shuffle
    // and ONE ordered frame (ts, event_id — a total order) as
    // IGNORE-NULLS last / conditional count window functions; the
    // naive formulation is one as-of join PER FEATURE (5 shuffles,
    // 5 sort passes). At 100 TB the frame is per-user-bounded and the
    // plan shape is independent of the number of feature columns.
    "q_features_pit" -> ((s, d) => {
      // the window orders by the FULL µs timestamp (etu) with event_id as
      // tiebreak — ordering by the emitted floor-second et would let an
      // event later in real time but in the same second with a smaller
      // event_id count as "prior", violating strictly-before no-leakage
      val ev = t(s, d, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("value"), tsec(col("ts")).as("et"),
          unix_micros(col("ts").cast(TimestampType)).as("etu"))
      val w = Window.partitionBy("user_id").orderBy(col("etu"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      def lastVal(tp: String) =
        last(when(col("event_type") === tp, col("value")), ignoreNulls = true).over(w)
      def cnt(tp: String) =
        count(when(col("event_type") === tp, lit(1))).over(w)
      // one select, not a withColumn chain: each withColumn would wrap
      // its window in its own extracted-argument Project, leaving FIVE
      // Window nodes (5 passes over every sorted partition) that
      // CollapseWindow cannot merge across; projected together they
      // plan as ONE Window operator (plan-pinned in PropertySpec)
      ev
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("value"), col("et"),
          lastVal("view").as("f_view_last"), lastVal("click").as("f_click_last"),
          cnt("view").as("n_view"), cnt("click").as("n_click"),
          cnt("error").as("n_error"))
        .where(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("et"),
          r4(col("f_view_last")).as("f_view_last"),
          r4(col("f_click_last")).as("f_click_last"),
          col("n_view"), col("n_click"), col("n_error"),
          r4(col("value")).as("label_value"))
        .orderBy("user_id", "et", "event_id")
    }),

    // Trailing-7-day distinct active users per day — the scalable rewrite
    // of the naive per-day COUNT(DISTINCT) over a range self-join (which
    // rescans 7× per report day and keeps a distinct set per day): each
    // (user, active-day) fact CONTRIBUTES to the 7 report days it covers
    // (a bounded ×7 sequence-explode), one distinct pass dedups multiple
    // active days inside a window, and a plain count per report day
    // finishes — linear in activity, mergeable, no distinct state per
    // day. Report days past the data's horizon are cut by a 1-row max.
    "q_window_rolling_distinct" -> ((s, d) => {
      val act = t(s, d, "events")
        .select(col("user_id"), tsec(col("ts")).as("et"))
        .select(col("user_id"), expr("et div 86400").as("day"))
        .distinct()
      val maxd = act.agg(max(col("day")).as("maxd"))
      act.select(col("user_id"),
          explode(sequence(col("day"), col("day") + 6)).as("rday"))
        .distinct()
        .crossJoin(broadcast(maxd))
        .where(col("rday") <= col("maxd"))
        .groupBy("rday").agg(count(lit(1)).as("active_7d"))
        .select(col("rday").as("day"), col("active_7d"))
        .orderBy("day")
    }),

    // Top user-journey paths: sessionize each user's stream by a 6-hour
    // inactivity gap (gaps-and-islands — the batch twin of the streaming
    // sessionizer), serialize each session's ordered event types into a
    // path string, and rank paths by frequency. One shuffle on user_id
    // (window + session agg share it), one tiny path-frequency agg, and a
    // TakeOrderedAndProject for the top-20. The in-session ordering rides
    // array_sort over (ts, event_id) structs — deterministic under any
    // partial-aggregation order.
    "q_event_paths" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      // inactivity gap at FULL µs precision (PATH_GAP is seconds; compare
      // in µs) — same precision class as the q_window_session gap fix
      val sess = t(s, d, "events")
        .select(col("user_id"), col("event_id"), col("event_type"), col("ts"),
          unix_micros(col("ts").cast(TimestampType)).as("et"))
        .withColumn("pet", lag(col("et"), 1).over(w))
        .withColumn("new_sess",
          when(col("pet").isNull ||
            col("et") - col("pet") > PATH_GAP * 1000000L, 1).otherwise(0))
        .withColumn("sess", sum(col("new_sess")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("long"))
      val paths = sess.groupBy("user_id", "sess")
        .agg(array_join(transform(
            array_sort(collect_list(struct(col("ts"), col("event_id"), col("event_type")))),
            x => x.getField("event_type")), ">").as("path"),
          count(lit(1)).as("len"))
      paths.groupBy("path")
        .agg(count(lit(1)).as("n_sessions"), r4(avg(col("len"))).as("avg_len"))
        .orderBy(desc("n_sessions"), col("path")).limit(20)
    }),

    // First-order Markov transition matrix over each user's event stream:
    // (state → next state) hop counts and the per-state transition
    // probability — the model a sessionization / next-event-prediction
    // pipeline fits from raw events. One shuffle (the per-user window);
    // the matrix itself is |event types|² rows, so the probability
    // normalization window runs over a handful of aggregate rows.
    "q_event_transitions" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val hops = t(s, d, "events")
        .select(col("event_type").as("from_type"),
          lead(col("event_type"), 1).over(w).as("to_type"))
        .where(col("to_type").isNotNull)
        .groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
      hops
        .withColumn("p", r4(col("n").cast("double") /
          sum(col("n")).over(Window.partitionBy("from_type"))))
        .orderBy("from_type", "to_type")
    }),

    // Cohort retention: users grouped by first-seen week, activity
    // counted per (cohort, week offset). Week ids are integer epoch-week
    // arithmetic (engine-portable — calendar week truncation differs
    // across engines). Per-user firsts and the distinct (user, week)
    // activity set shuffle once each on user_id; the retention matrix is
    // weeks² rows.
    "q_event_retention" -> ((s, d) => {
      val wk = (c: org.apache.spark.sql.Column) =>
        floor(c.cast("double") / 604800.0).cast("long")
      val ev = t(s, d, "events").select(col("user_id"), tsec(col("ts")).as("et"))
      val firsts = ev.groupBy("user_id").agg(wk(min(col("et"))).as("cohort_wk"))
      val active = ev.select(col("user_id"), wk(col("et")).as("wk")).distinct()
      val sizes = firsts.groupBy("cohort_wk").agg(count(lit(1)).as("n_cohort"))
      active.join(maybeBroadcast(firsts), "user_id")
        .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("week_offset"))
        .agg(count(lit(1)).as("n_active")) // (user, wk) pre-distinct → count = users
        .join(maybeBroadcast(sizes), "cohort_wk")
        .select(col("cohort_wk"), col("week_offset"), col("n_active"),
          r4(col("n_active").cast("double") / col("n_cohort")).as("retention"))
        .orderBy("cohort_wk", "week_offset")
    }),

    // Seasonal-baseline anomaly detection: each event is scored against
    // the (event_type × hour-of-day) population baseline — the
    // conditional-expectation complement to q_stream_outliers'
    // per-user running z and q_agg_mad's global robust z. The baseline
    // is |types|×24 rows of exact decimal (n, Σx, Σx²) — bounded by the
    // SCHEMA, not the corpus — so it broadcasts and the scoring pass is
    // a narrow map over the scan. Z=1.6 is fixture-calibrated (values
    // are ~uniform, so |z| never exceeds √3 ≈ 1.73).
    "q_anomaly_seasonal" -> ((s, d) => {
      val hod = hour(col("ts"))
      val base = t(s, d, "events")
        .groupBy(col("event_type"), hod.as("hod"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DEC)).cast("double").as("sx"),
          sum((col("value") * col("value")).cast(DEC)).cast("double").as("sxx"))
        .where(col("n") > 1)
        .select(col("event_type"), col("hod"), (col("sx") / col("n")).as("mean"),
          sqrt((col("n") * col("sxx") - col("sx") * col("sx")) /
            (col("n") * (col("n") - 1))).as("std"))
      t(s, d, "events")
        .select(col("event_id"), col("event_type").as("e_type"),
          hod.as("e_hod"), col("value"))
        // explicit alias, not base("col"): both sides derive from the ONE
        // memoized events reader (Tables.t), so df("col") references are
        // ambiguous-self-join bait — qualified names are the stable form
        .join(broadcast(base.as("b")), // ≤ |event types| × 24 rows by construction
          col("e_type") === col("b.event_type") && col("e_hod") === col("b.hod"))
        .select(col("event_id"), col("b.event_type"), col("b.hod"),
          r4(col("value")).as("value"),
          r4((col("value") - col("mean")) / col("std")).as("z"))
        .where(abs(col("z")) > SEASONAL_Z) // on the ROUNDED z: boundary-stable
        .orderBy("event_id")
    }),

    // CDC latest-wins merge: the event stream is a changelog keyed by
    // user (op: 'error' = delete tombstone, anything else = upsert).
    // Base state (latest record before the cut) and the delta batch
    // (latest record after it) each collapse via one per-key top-1 —
    // the row_number plan the injected rule rewrites to TopKPerKey, so
    // only ≤1 row/key/partition reaches either shuffle — then merge is
    // ONE full-outer join on the key: delta wins where present,
    // surviving tombstones drop the key. The oracle recomputes
    // latest-wins over the FULL history — the O(delta) merge must equal
    // the O(corpus) recompute exactly, the same contract as
    // q_agg_incremental but for the non-commutative last-write-wins
    // algebra.
    "q_cdc_merge" -> ((s, d) => {
      val cut = lit(CDC_CUT).cast("timestamp")
      def latest(df: DataFrame, p: String) = df
        .withColumn("rn", row_number().over(Window.partitionBy("user_id")
          .orderBy(col("ts").desc, col("event_id").desc)))
        .where(col("rn") === 1)
        .select(col("user_id"), col("event_id").as(s"${p}_event_id"),
          col("event_type").as(s"${p}_type"), col("value").as(s"${p}_value"))
      val ev = t(s, d, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"), col("value"))
      val base = latest(ev.where(col("ts") < cut), "b")
      val delta = latest(ev.where(col("ts") >= cut), "d")
      base.join(delta, Seq("user_id"), "full_outer")
        .select(col("user_id"),
          coalesce(col("d_event_id"), col("b_event_id")).as("last_event_id"),
          coalesce(col("d_type"), col("b_type")).as("last_type"),
          r4(coalesce(col("d_value"), col("b_value"))).as("last_value"))
        .where(col("last_type") =!= "error") // tombstone: key deleted
        .orderBy("user_id")
    }),
  )

  /** Base/delta boundary for q_cdc_merge (events span Jan 2024). */
  private val CDC_CUT = "2024-01-20 00:00:00"

  /** q_anomaly_seasonal threshold (see the query's calibration note). */
  private val SEASONAL_Z = 1.6

  def oracle: Seq[(String, String)] = Seq(
    "q_window_tumbling" ->
      """SELECT date_trunc('hour', ts) AS win_start, event_type, count(*) AS n,
        | CAST(round(sum(CAST(value AS DECIMAL(38,6))), 4) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin,
    "q_window_sliding" ->
      """SELECT win_start, count(*) AS n,
        | CAST(round(sum(CAST(value AS DECIMAL(38,6))), 4) AS DOUBLE) AS sum_value
        |FROM (
        |  SELECT time_bucket(INTERVAL 15 MINUTE, ts)
        |          - k.k * INTERVAL 15 MINUTE AS win_start, value
        |  FROM events, generate_series(0, 3) k(k))
        |GROUP BY win_start ORDER BY win_start""".stripMargin,
    "q_window_session" ->
      """WITH seq AS (
        |  SELECT user_id, event_id, ts,
        |   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |flagged AS (
        |  SELECT user_id, event_id, ts,
        |   CASE WHEN prev_ts IS NULL
        |     OR epoch_us(ts) - epoch_us(prev_ts) >= 1800000000
        |    THEN 1 ELSE 0 END AS new_sess
        |  FROM seq),
        |sessed AS (
        |  SELECT user_id, ts,
        |   CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_id
        |  FROM flagged)
        |SELECT user_id, sess_id, min(ts) AS sess_start, max(ts) AS sess_end,
        | count(*) AS n_events
        |FROM sessed GROUP BY 1, 2 ORDER BY user_id, sess_id""".stripMargin,
    "q_stream_watermark" ->
      """WITH wm AS (
        |  SELECT ts,
        |   max(CAST(floor(epoch(ts)) AS BIGINT)) OVER (ORDER BY event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 600 AS wm_sec
        |  FROM events)
        |SELECT date_trunc('hour', ts) AS win_start, count(*) AS n_on_time
        |FROM wm WHERE CAST(floor(epoch(ts)) AS BIGINT) >= wm_sec
        |GROUP BY 1 ORDER BY win_start""".stripMargin,
    "q_stream_outliers" ->
      """WITH z AS (
        |  SELECT user_id, event_id, value,
        |   (value - avg(value) OVER w) / stddev_samp(value) OVER w AS zraw,
        |   count(*) OVER w AS n_prior
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |SELECT user_id, event_id, value,
        | CAST(round(CAST(zraw AS DECIMAL(38,6)), 4) AS DOUBLE) AS z
        |FROM z
        |WHERE n_prior >= 10
        |  AND CAST(round(CAST(zraw AS DECIMAL(38,6)), 4) AS DOUBLE) >= 2.0
        |ORDER BY user_id, event_id""".stripMargin,
    "q_stream_attribution" ->
      """WITH p AS (
        |  SELECT event_id AS p_id, user_id, epoch_us(ts) AS pt
        |  FROM events WHERE event_type = 'purchase'),
        |v AS (
        |  SELECT user_id, epoch_us(ts) AS vt
        |  FROM events WHERE event_type = 'view'),
        |pp AS (
        |  SELECT p.user_id, p.p_id, count(v.vt) AS n_views
        |  FROM p LEFT JOIN v ON v.user_id = p.user_id
        |    AND v.vt >= p.pt - 3600000000 AND v.vt <= p.pt
        |  GROUP BY 1, 2)
        |SELECT user_id, count(*) AS n_purchases,
        | count(*) FILTER (WHERE n_views > 0) AS n_attributed,
        | CAST(sum(n_views) AS BIGINT) AS n_view_pairs
        |FROM pp GROUP BY 1 ORDER BY user_id""".stripMargin,
    "q_features_pit" ->
      s"""WITH ev AS (
         |  SELECT user_id, event_id, event_type, value,
         |   CAST(floor(epoch(ts)) AS BIGINT) AS et,
         |   epoch_us(ts) AS etu
         |  FROM events),
         |f AS (
         |  SELECT user_id, event_id, event_type, value, et,
         |   last_value(CASE WHEN event_type = 'view' THEN value END IGNORE NULLS)
         |     OVER w AS f_view_last,
         |   last_value(CASE WHEN event_type = 'click' THEN value END IGNORE NULLS)
         |     OVER w AS f_click_last,
         |   count(CASE WHEN event_type = 'view' THEN 1 END) OVER w AS n_view,
         |   count(CASE WHEN event_type = 'click' THEN 1 END) OVER w AS n_click,
         |   count(CASE WHEN event_type = 'error' THEN 1 END) OVER w AS n_error
         |  FROM ev
         |  WINDOW w AS (PARTITION BY user_id ORDER BY etu, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
         |SELECT user_id, event_id, et,
         | ${r4sql("f_view_last")} AS f_view_last,
         | ${r4sql("f_click_last")} AS f_click_last,
         | n_view, n_click, n_error, ${r4sql("value")} AS label_value
         |FROM f WHERE event_type = 'purchase'
         |ORDER BY user_id, et, event_id""".stripMargin,
    "q_event_funnel" ->
      s"""WITH ev AS (
         |  SELECT user_id, event_type, epoch_us(ts) AS et
         |  FROM events),
         |v AS (SELECT user_id, min(et) AS t1 FROM ev
         |      WHERE event_type = 'view' GROUP BY 1),
         |c AS (SELECT ev.user_id, min(et) AS t2 FROM ev JOIN v USING (user_id)
         |      WHERE event_type = 'click' AND et >= t1 GROUP BY 1),
         |p AS (SELECT ev.user_id, min(et) AS t3 FROM ev JOIN c USING (user_id)
         |      WHERE event_type = 'purchase' AND et >= t2 GROUP BY 1),
         |steps AS (
         |  SELECT 1 AS step, 'view' AS stage, count(*) AS n FROM v
         |  UNION ALL
         |  SELECT 2, 'click', count(*) FROM c
         |  UNION ALL
         |  SELECT 3, 'purchase', count(*) FROM p)
         |SELECT step, stage, n,
         | ${r4sql("CAST(n AS DOUBLE) / coalesce(lag(n) OVER (ORDER BY step), n)")} AS conv
         |FROM steps ORDER BY step""".stripMargin,
    "q_window_rolling_distinct" ->
      """WITH act AS (
        |  SELECT DISTINCT user_id, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
        |  FROM events),
        |mx AS (SELECT max(day) AS maxd FROM act),
        |offs AS (SELECT unnest(generate_series(0, 6)) AS o),
        |contrib AS (
        |  SELECT DISTINCT user_id, day + o AS rday FROM act CROSS JOIN offs)
        |SELECT rday AS day, count(*) AS active_7d
        |FROM contrib CROSS JOIN mx WHERE rday <= maxd
        |GROUP BY rday ORDER BY day""".stripMargin,
    "q_event_paths" ->
      s"""WITH e AS (
         |  SELECT user_id, event_id, event_type, ts,
         |   epoch_us(ts) AS et,
         |   lag(epoch_us(ts)) OVER
         |     (PARTITION BY user_id ORDER BY ts, event_id) AS pet
         |  FROM events),
         |s AS (
         |  SELECT *, CAST(sum(CASE WHEN pet IS NULL OR et - pet > ${PATH_GAP}000000
         |      THEN 1 ELSE 0 END)
         |    OVER (PARTITION BY user_id ORDER BY ts, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess
         |  FROM e),
         |p AS (
         |  SELECT user_id, sess,
         |   string_agg(event_type, '>' ORDER BY ts, event_id) AS path,
         |   count(*) AS len
         |  FROM s GROUP BY 1, 2)
         |SELECT path, count(*) AS n_sessions, ${r4sql("avg(len)")} AS avg_len
         |FROM p GROUP BY path ORDER BY n_sessions DESC, path LIMIT 20""".stripMargin,
    "q_event_transitions" ->
      s"""WITH hops AS (
         |  SELECT event_type AS from_type,
         |   lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
         |  FROM events),
         |m AS (SELECT from_type, to_type, count(*) AS n
         |      FROM hops WHERE to_type IS NOT NULL GROUP BY 1, 2)
         |SELECT from_type, to_type, n,
         | ${r4sql("CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY from_type)")} AS p
         |FROM m ORDER BY from_type, to_type""".stripMargin,
    "q_event_retention" ->
      s"""WITH ev AS (
         |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS et FROM events),
         |firsts AS (
         |  SELECT user_id,
         |   CAST(floor(min(et) / 604800.0) AS BIGINT) AS cohort_wk
         |  FROM ev GROUP BY 1),
         |active AS (
         |  SELECT DISTINCT user_id, CAST(floor(et / 604800.0) AS BIGINT) AS wk
         |  FROM ev),
         |sizes AS (SELECT cohort_wk, count(*) AS n_cohort FROM firsts GROUP BY 1),
         |m AS (
         |  SELECT f.cohort_wk, a.wk - f.cohort_wk AS week_offset, count(*) AS n_active
         |  FROM active a JOIN firsts f USING (user_id)
         |  GROUP BY 1, 2)
         |SELECT m.cohort_wk, m.week_offset, m.n_active,
         | ${r4sql("CAST(m.n_active AS DOUBLE) / s.n_cohort")} AS retention
         |FROM m JOIN sizes s USING (cohort_wk)
         |ORDER BY cohort_wk, week_offset""".stripMargin,
    "q_anomaly_seasonal" ->
      s"""WITH base AS (
         |  SELECT event_type, hour(ts) AS hod, count(*) AS n,
         |   CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sx,
         |   CAST(sum(CAST(value*value AS DECIMAL(38,6))) AS DOUBLE) AS sxx
         |  FROM events GROUP BY 1, 2 HAVING count(*) > 1),
         |b2 AS (
         |  SELECT event_type, hod, sx / n AS mean,
         |   sqrt((n*sxx - sx*sx) / (n*(n-1))) AS std
         |  FROM base),
         |z AS (
         |  SELECT e.event_id, b.event_type, b.hod, ${r4sql("e.value")} AS value,
         |   ${r4sql("(e.value - b.mean) / b.std")} AS z
         |  FROM events e JOIN b2 b
         |  ON e.event_type = b.event_type AND hour(e.ts) = b.hod)
         |SELECT * FROM z WHERE abs(z) > $SEASONAL_Z ORDER BY event_id""".stripMargin,
    // full-history latest-wins recompute — the O(delta) merge must equal it
    "q_cdc_merge" ->
      s"""WITH l AS (
         |  SELECT user_id, event_id AS last_event_id, event_type AS last_type, value,
         |   row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
         |  FROM events)
         |SELECT user_id, last_event_id, last_type, ${r4sql("value")} AS last_value
         |FROM l WHERE rn = 1 AND last_type <> 'error'
         |ORDER BY user_id""".stripMargin,
  )
}
