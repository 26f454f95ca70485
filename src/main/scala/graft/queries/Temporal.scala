package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.DetMath._
import graft.operators.{Align, AsOfJoin}

/** Events-table + temporal/positional operators: ns-timestamp handling,
  * time-bucketed aggregation (the batch twin of the streaming path),
  * JSON field extraction, as-of join, positional alignment.
  */
object Temporal {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.read(s, dir, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Positional alignment (reference create_table.py: df1["ids"]+2*df2["age"])
    "q28_align_positional" -> ((s, d) => {
      val a = t(s, d, "orders").select(col("o_orderkey"), col("o_totalprice"))
      val b = t(s, d, "orders").select(col("o_totalprice").as("p2"),
        col("o_orderkey").as("k2"))
      Align.alignByOrder(
          a, Seq(col("o_orderkey")),
          b, Seq(col("p2"), col("k2")))
        .select(col("o_orderkey"),
          rnd(col("o_totalprice") + lit(2) * col("p2"), 2).as("combo"))
    }),

    // Tumbling-hour aggregation over the ns-timestamp events stream table
    // (batch twin of streaming.EventStreams.hourlyCounts)
    // ---- q178: last-touch attribution ----
    // The marketing-analytics read of the event log: each purchase is
    // attributed to the SAME user's most recent click at or before it,
    // but only within a 24-hour window (older clicks don't get credit
    // — the match nulls out, exactly pandas merge_asof tolerance).
    // Reuses the one-shuffle union-carry as-of machinery (q31/q90);
    // clicks collapse to one row per (user, ts) first so the match is
    // deterministic. Shuffles once, on user_id.
    "q178_attribution" -> ((s, d) => {
      val ev = t(s, d, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts"), fixed(col("value"), 2).as("cents"))
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy("user_id", "ts").agg(max("event_id").as("click_id"))
      AsOfJoin.leftAsOf(purchases, "user_id", "ts",
          clicks, "user_id", "ts", Seq("click_id"),
          toleranceMicros = Some(24L * 3600 * 1000000))
        .select("purchase_id", "user_id", "cents", "click_id")
    }),

    // ---- q175: recency-decayed engagement score ----
    // Per-user activity score with a one-week half-life: weight =
    // 1e6 DIV 2^age_weeks — exponential decay spelled as an integer
    // SHIFT (ppm weights), because pow(0.5, fractional) rounds
    // differently per libm while 2^k division is exact everywhere.
    // decayed = Σ value_cents · w_ppm accumulates in pure BIGINTs, so
    // the aggregate is partition-order-independent. The corpus max ts
    // (decay anchor) is a 1-row broadcast; everything else is one
    // narrow pass + one user-keyed agg — recency weighting at corpus
    // scale without a single float sum.
    // ---- q200: hourly-completeness (gap) audit ----
    // The freshness/completeness check every ingestion SLA dashboard
    // runs: per event type, how many hours inside the type's observed
    // [first, last] span produced NO events. Pure integer arithmetic —
    // epoch-hour min/max + one distinct-hour count per type — so the
    // expected-grid size is (h1 - h0 + 1) with no grid materialization
    // at all (exploding a sequence() per type works but allocates the
    // full span; the subtraction is the 100 TB spelling). One shuffle
    // on event_type; distinct hours collapse map-side first.
    "q200_hourly_gaps" -> ((s, d) =>
      t(s, d, "events")
        .select(col("event_type"),
          expr("unix_micros(CAST(date_trunc('hour', ts) AS TIMESTAMP)) DIV 3600000000")
            .as("eh"))
        .groupBy("event_type")
        .agg(min("eh").as("h0"), max("eh").as("h1"),
          countDistinct(col("eh")).as("n_present"))
        .select(col("event_type"),
          expr("timestamp_micros(h0 * 3600000000)").as("first_hr"),
          expr("timestamp_micros(h1 * 3600000000)").as("last_hr"),
          (col("h1") - col("h0") + 1).as("n_expected"),
          col("n_present"),
          (col("h1") - col("h0") + 1 - col("n_present")).as("n_missing"))),

    "q175_decay_score" -> ((s, d) => {
      val ev = t(s, d, "events")
      val mx = ev.agg(max(col("ts")).as("mx"))
      ev.crossJoin(broadcast(mx))
        .withColumn("age_w", expr(
          "datediff(CAST(mx AS DATE), CAST(ts AS DATE)) DIV 7"))
        .withColumn("w_ppm", expr(
          "CAST(1000000 AS BIGINT) DIV (CAST(1 AS BIGINT) << LEAST(age_w, 62))"))
        .withColumn("cents", fixed(col("value"), 2))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          sum("cents").as("cents"),
          sum(expr("cents * w_ppm")).as("decayed_cents_ppm"))
    }),

    "q29_events_hourly" -> ((s, d) =>
      t(s, d, "events")
        .groupBy(date_trunc("hour", col("ts")).as("hr"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), sumFixed(col("value"), 2).as("sum_val"))),

    // ---- q160: cohort retention triangle ----
    // Users grouped by first-signup week; for each later week, how many
    // of the cohort were active — the product-analytics retention
    // matrix. Cohort = one windowless min-agg per user; activity weeks
    // dedup per (user, week); offsets are exact day-diffs DIV 7 on
    // week-truncated timestamps. Two hash aggs + one join on user_id.
    "q160_cohort_retention" -> ((s, d) => {
      val ev = t(s, d, "events")
      val cohort = ev.filter(col("event_type") === "signup")
        .groupBy("user_id")
        .agg(date_trunc("week", min(col("ts"))).as("cohort_wk"))
      val active = ev
        .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
        .distinct()
      active.join(cohort, "user_id")
        .filter(col("wk") >= col("cohort_wk"))
        .groupBy(col("cohort_wk"),
          expr("datediff(wk, cohort_wk) DIV 7").as("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
    }),

    // ---- q156: event-rate anomaly detection (2-sigma, exact) ----
    // Hours whose per-type event count deviates from that type's mean
    // by more than two standard deviations — the monitoring read over
    // the same hourly rollup q29 gates. The 2σ test is pure integer
    // cross-multiplication of exact count moments:
    // (x·n − S)² > 4·(n·S2 − S²)  ⇔  |x − μ| > 2σ — no float mean,
    // no float variance, no sqrt, so both engines flag the identical
    // hours. Per-type moments are a tiny broadcast back onto the
    // hourly table.
    "q156_rate_anomaly" -> ((s, d) => {
      val hourly = t(s, d, "events")
        .groupBy(date_trunc("hour", col("ts")).as("hr"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
      val m = hourly.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("cnt").as("s"),
          sum(col("cnt") * col("cnt")).as("s2"))
      hourly.join(broadcast(m), "event_type")
        .withColumn("dev2",
          expr("(cnt * n - s) * (cnt * n - s)"))
        .withColumn("thr", expr("4 * (n * s2 - s * s)"))
        .filter(col("dev2") > col("thr"))
        .select("event_type", "hr", "cnt", "dev2", "thr")
    }),

    // ---- q123: resample to an hourly grid + forward-fill ----
    // The pandas `resample('1h').last().ffill()` move, per user: the
    // last observed value in each hour (deterministic last = max ts,
    // tie-broken by event_id), re-indexed onto the user's full hourly
    // span, gaps carried forward. Plan: one hash agg to hourly points,
    // one tiny agg for spans, sequence()+explode generates the grid
    // INSIDE the row (no driver loop, no cross join), and the fill is
    // one window over the user's own partition — the state never
    // crosses users, so the shuffle key is the natural one. The grid
    // size is span-bounded per user, independent of corpus row count.
    "q123_resample_ffill" -> ((s, d) => {
      val hourly = t(s, d, "events")
        .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hr"))
        .agg(max(struct(col("ts"), col("event_id"), col("value"))).as("w"))
        .select(col("user_id"), col("hr"), col("w.value").as("v"))
      val grid = hourly.groupBy("user_id")
        .agg(min("hr").as("h0"), max("hr").as("h1"))
        .select(col("user_id"),
          explode(expr("sequence(h0, h1, interval 1 hour)")).as("hr"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("hr")
        .rowsBetween(Long.MinValue, 0)
      grid.join(hourly, Seq("user_id", "hr"), "left")
        .select(col("user_id"), col("hr"),
          last(col("v"), ignoreNulls = true).over(w).as("v_filled"))
    }),

    // ---- q126: time-weighted average per user ----
    // Each observation holds until the next one, so its weight is the
    // µs gap to the successor (the irregular-sampling mean a metrics
    // pipeline wants — a value that stood for 6 hours counts 6× one
    // that stood for 1). All arithmetic is exact integers (µs deltas ×
    // cent-scaled values; |num| ≤ 30d·1e5·1e2 ≈ 2.6e17 < 2^63) with ONE
    // float division at the end, so both engines produce bit-identical
    // doubles. One window + one agg, both on the natural user key.
    "q126_time_weighted" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      t(s, d, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          fixed(col("value"), 2).as("v100"),
          expr("unix_micros(CAST(ts AS TIMESTAMP))").as("us"))
        .withColumn("next_us", lead(col("us"), 1).over(w))
        .filter(col("next_us").isNotNull)
        .withColumn("dt", col("next_us") - col("us"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_intervals"),
          sum(col("dt")).as("span_us"),
          sum(col("dt") * col("v100")).as("num"))
        .filter(col("span_us") > 0)
        .select(col("user_id"), col("n_intervals"), col("span_us"),
          (col("num") / col("span_us") / lit(100.0)).as("tw_avg"))
    }),

    // ---- q128: sliding (overlapping) time windows ----
    // 2-hour windows sliding every hour: each event lands in exactly
    // two windows. Uses Spark's native window() generator (the same
    // construct Structured Streaming slides over, so the batch gate
    // here covers the streaming shape too); the oracle mirrors it as a
    // two-way shifted-trunc union. One explode (×2 fan-out) + one hash
    // agg — no self-join, no range join.
    "q128_sliding_counts" -> ((s, d) =>
      t(s, d, "events")
        .groupBy(window(col("ts"), "2 hours", "1 hour"),
          col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          sumFixed(col("value"), 2).as("sum_val"))
        .select(col("window.start").as("ws"), col("event_type"),
          col("cnt"), col("sum_val"))),

    // Semi-structured extraction from the JSON props column
    "q30_events_json" -> ((s, d) =>
      t(s, d, "events")
        .withColumn("k", regexp_extract(col("props"), "\"k\": ([0-9]+)", 1)
          .cast("long"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"), sum(col("k")).as("sum_k"),
          max(col("k")).as("max_k"))),

    // STREAMING tumbling-hour counts, oracle-gated: complete-mode run of
    // the q29 twin — the stream must hash-match the same oracle SQL.
    "q68_hourly_stream" -> ((s, d) =>
      graft.streaming.EventStreams.hourlyBatchEquivalent(s, d)),

    // As-of join: each event picks up the user's latest order on-or-before
    // the event time (right side deduped per (key,time) for determinism)
    "q31_asof_join" -> ((s, d) => {
      val ev = t(s, d, "events")
      val o = t(s, d, "orders")
        .groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(max("o_orderkey").as("o_orderkey"))
      AsOfJoin.leftAsOf(
          ev.select("event_id", "user_id", "ts"), "user_id", "ts",
          o, "o_custkey", "o_orderdate", Seq("o_orderkey", "o_orderdate"))
        .select("event_id", "user_id", "o_orderkey", "o_orderdate")
    }),

    // FORWARD as-of with tolerance (pandas merge_asof direction +
    // tolerance parity): each event attaches the user's NEXT order, but
    // only if it lands within 7 days — a nearest match farther out
    // yields nulls. The oracle uses DuckDB's native ASOF <= join with
    // the tolerance applied post-match (equivalent: the nearest
    // candidate is the only one that could be in tolerance).
    "q90_asof_forward" -> ((s, d) => {
      val ev = t(s, d, "events")
      val o = t(s, d, "orders")
        .groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(max("o_orderkey").as("o_orderkey"))
      AsOfJoin.leftAsOf(
          ev.select("event_id", "user_id", "ts"), "user_id", "ts",
          o, "o_custkey", "o_orderdate", Seq("o_orderkey", "o_orderdate"),
          direction = "forward",
          toleranceMicros = Some(7L * 24 * 3600 * 1000000L))
        .select("event_id", "user_id", "o_orderkey", "o_orderdate")
    }),

    // ---- q250: NEAREST as-of join (pandas direction='nearest') ----
    // Each click attaches the user's closest purchase IN EITHER time
    // direction, within a 6h tolerance; equidistant ties go backward
    // (pandas merge_asof's `<=` rule). Completes the as-of direction
    // surface (q31 backward, q90 forward). Plan shape: both carries
    // computed inside ONE unioned pass — two window orderings over the
    // same user_id partitioning, so one Exchange and two sorts, never a
    // per-key nested loop (AsOfJoin.leftAsOfNearest). The right side is
    // pre-deduped per (user, ts) so the carry pick is deterministic.
    "q250_asof_nearest" -> ((s, d) => {
      val ev = t(s, d, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id").as("p_user"), col("ts").as("pts"))
        .agg(max("event_id").as("purchase_id"))
      AsOfJoin.leftAsOf(clicks, "user_id", "ts",
          purchases, "p_user", "pts", Seq("purchase_id", "pts"),
          direction = "nearest",
          toleranceMicros = Some(6L * 3600 * 1000000L))
        .select(col("event_id"), col("user_id"), col("purchase_id"),
          col("pts").as("purchase_ts"))
    }),

    // ---- q267: repeat-purchase rate (commerce retention KPI) ----
    // Of users who purchased at all: how many purchased AGAIN, and how
    // many did so within 30 days of their first purchase — the
    // repeat-rate pair every commerce dashboard tracks. First/second
    // purchase via two user-keyed aggs (min ts, then min ts after the
    // first — no window over raw events needed); the report is one
    // row of exact ppm integers.
    "q267_repeat_purchase" -> ((s, d) => {
      val p = t(s, d, "events")
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"))
      val first = p.groupBy("user_id")
        .agg(min(col("ts")).as("t1"), count(lit(1)).as("np"))
      val second = p.join(first, "user_id")
        .filter(col("ts") > col("t1"))
        .groupBy("user_id").agg(min(col("ts")).as("t2"))
      first.join(second, Seq("user_id"), "left")
        .agg(count(lit(1)).as("n_buyers"),
          sum(when(col("np") >= 2, 1L).otherwise(0L)).as("n_repeat"),
          sum(when(
            unix_micros(col("t2").cast("timestamp")) -
              unix_micros(col("t1").cast("timestamp")) <=
              30L * 86400 * 1000000L, 1L).otherwise(0L)).as("n_repeat_30d"))
        .select(col("n_buyers"), col("n_repeat"), col("n_repeat_30d"),
          expr("n_repeat * 1000000 DIV n_buyers").as("repeat_ppm"),
          expr("n_repeat_30d * 1000000 DIV n_buyers").as("repeat30_ppm"))
    }),

    // ---- q258: weekday seasonality index per event type ----
    // cnt(dow)·7 / cnt(type) in exact ppm — 1e6 means a perfectly flat
    // week, 2e6 a day carrying twice its uniform share; the weekly
    // complement of q228's diurnal (hour-of-day) profile. One shuffle
    // on event_type; the per-type total is a window over the ≤7-row
    // group, so the report is |types|×7 at any corpus size.
    "q258_weekday_seasonality" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type")
      t(s, d, "events")
        .withColumn("dow", (dayofweek(col("ts")) - 1).cast("long"))
        .groupBy("event_type", "dow")
        .agg(count(lit(1)).as("cnt"))
        .withColumn("tot", sum("cnt").over(w))
        .select(col("event_type"), col("dow"), col("cnt"),
          expr("cnt * 7 * 1000000 DIV tot").as("idx_ppm"))
    }),

    // ---- q249: gap-and-island activity streaks ----
    // Longest run of CONSECUTIVE active days per user — the classic
    // gaps-and-islands shape: distinct (user, day), then
    // day_number − row_number is constant within a consecutive run, so
    // one groupBy on that difference measures every streak with no
    // self-join and no iteration. Two shuffles total (distinct on
    // (user, day), window+agg on user); the per-user day list is
    // bounded by the calendar, so no partition outgrows memory at any
    // corpus size.
    "q249_active_streaks" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("day")
      t(s, d, "events")
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
        .withColumn("grp",
          expr("datediff(day, DATE '1970-01-01')") -
            row_number().over(w))
        .groupBy("user_id", "grp")
        .agg(count(lit(1)).as("len"))
        .groupBy("user_id")
        .agg(max("len").as("max_streak"), count(lit(1)).as("n_streaks"))
    }),

    // ---- q224: event-type transition matrix (Markov estimation) ----
    // Per-user event sequences -> (prev, next) transition counts and
    // row-normalized probabilities in exact ppm (n·1e6 DIV row_total),
    // the first-order Markov chain behind session modeling and
    // next-event prediction features. One shuffle keyed on user_id for
    // the lag window (ordered by (ts, event_id) — event_id breaks
    // equal-timestamp ties so both engines see the identical
    // successor); the transition matrix itself is bounded by
    // |event_type|² rows, so the final agg and the per-prev row-total
    // window are tiny at any corpus size.
    "q224_event_transitions" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts", "event_id")
      val tw = org.apache.spark.sql.expressions.Window.partitionBy("prev")
      t(s, d, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"))
        .withColumn("prev", lag("event_type", 1).over(w))
        .filter(col("prev").isNotNull)
        .withColumnRenamed("event_type", "next")
        .groupBy("prev", "next")
        .agg(count(lit(1)).as("n"))
        .withColumn("tot", sum("n").over(tw))
        .select(col("prev"), col("next"), col("n"),
          expr("n * 1000000 DIV tot").as("p_ppm"))
    }),

    // ---- q225: CUSUM changepoint over the hourly event rate ----
    // Where did each event type's rate SHIFT? q156 flags outlier hours
    // (2σ point anomalies); this finds the level change: the hour
    // maximizing |Σ_{j≤i}(cnt_j·H − T)| — the classic CUSUM statistic
    // with the mean spelled as the exact cross-multiplication
    // cnt·H − T (no float mean), so both engines agree bit-for-bit and
    // ties resolve to the earliest hour. Work is bounded by the hourly
    // rollup (|types| × hours rows): the raw scan reduces map-side,
    // every window partitions by event_type, and the argmax is a
    // row_number over the same tiny frame — nothing here grows with
    // corpus size except the first agg, which is the q29 rollup shape.
    "q225_cusum_changepoint" -> ((s, d) => {
      val W = org.apache.spark.sql.expressions.Window
      val hourly = t(s, d, "events")
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
        .agg(count(lit(1)).as("cnt"))
      val wAll = W.partitionBy("event_type")
      val wOrd = W.partitionBy("event_type").orderBy("hr")
      val wPick = W.partitionBy("event_type")
        .orderBy(col("acs").desc, col("hr"))
      hourly
        .withColumn("hn", count(lit(1)).over(wAll))
        .withColumn("tot", sum("cnt").over(wAll))
        .withColumn("acs",
          abs(sum(col("cnt") * col("hn") - col("tot")).over(wOrd)))
        .withColumn("rk", row_number().over(wPick))
        .filter(col("rk") === 1)
        .select(col("event_type"), col("hr").as("cp_hour"),
          col("acs").as("max_abs_cusum"), col("hn").as("n_hours"))
    }),

    // ---- q226: rolling 7-day distinct users per day (DAU/WAU) ----
    // Distinct users active on each day and in the trailing 7-day
    // window — the engagement read every event pipeline serves.
    // Windowed COUNT(DISTINCT) doesn't compose as a running frame, so
    // the scalable spelling is: dedup to (day, user) FIRST (the big
    // map-side shrink — raw events collapse to at most users×days
    // rows), then fan each compact row out to the ≤7 window days it
    // serves and count distinct per day. The 7× fanout runs on the
    // deduped set, never the raw log; both aggs are two-phase
    // (partial distinct map-side). Days with no events drop out of
    // the join, matching the oracle.
    "q226_rolling_distinct" -> ((s, d) => {
      // explicit isnotnull(day): the final day===rday join INFERS this
      // filter on the dau branch only, which made the two branches'
      // scan+distinct subtrees canonically different — so ReuseExchange
      // could not fire and the events table was scanned AND
      // (day, user_id)-shuffled twice (plans/r17/q226_…_before.txt
      // nodes 1-6 vs 10-14). With the filter stated once below BOTH
      // branches, the partial-distinct exchange is computed once and
      // the wau branch reads it as ReusedExchange (guide §2.4). ts is
      // never null in the corpus, so the filter drops nothing; it only
      // restores subtree identity.
      val du = t(s, d, "events")
        .select(to_date(col("ts")).as("day"), col("user_id"))
        .filter(col("day").isNotNull).distinct()
      val u1 = du.groupBy("day").agg(countDistinct("user_id").as("dau"))
      val roll = du
        .withColumn("rday", explode(expr("sequence(day, date_add(day, 6))")))
        .groupBy("rday").agg(countDistinct("user_id").as("wau"))
      u1.join(roll, col("day") === col("rday"))
        // gate as midnight timestamps (the q29/q200 convention: DATE
        // round-trips with engine-specific pandas dtypes, TIMESTAMP
        // compares identically)
        .select(col("day").cast("timestamp").as("day"),
          col("dau"), col("wau"))
    }),

    // ---- q228: diurnal (hour-of-day) load profile per event type ----
    // Is the rate flat or peaked across the 24-hour clock? Per type:
    // the peak hour-of-day, its traffic share, and a uniformity
    // statistic Σ_hod (share_ppm·24 − 1e6)² — deviation is computed on
    // ppm SHARES, not raw counts, so the squared terms stay ≤ ~5e14
    // at ANY corpus size (squaring raw counts overflows BIGINT once a
    // type passes ~2e9 events). Observed hods only, both engines
    // alike. Work: one map-side-reducible agg to ≤ |types|×24 rows;
    // every window partitions by event_type on that tiny frame.
    "q228_diurnal_profile" -> ((s, d) => {
      val W = org.apache.spark.sql.expressions.Window
      val wAll = W.partitionBy("event_type")
      val wPick = W.partitionBy("event_type")
        .orderBy(col("cnt").desc, col("hod"))
      t(s, d, "events")
        .groupBy(col("event_type"), hour(col("ts")).cast("long").as("hod"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("n", sum("cnt").over(wAll))
        .withColumn("share_ppm", expr("cnt * 1000000 DIV n"))
        .withColumn("rk", row_number().over(wPick))
        .groupBy("event_type")
        .agg(max("n").as("n"),
          max(when(col("rk") === 1, col("hod"))).as("peak_hod"),
          max(when(col("rk") === 1, col("share_ppm")))
            .as("peak_share_ppm"),
          sum(expr("(share_ppm * 24 - 1000000)" +
            " * (share_ppm * 24 - 1000000)")).as("uniformity_dev2"))
    }),

    // ---- q229: week-over-week growth per event type ----
    // The trend read on the weekly rollup: each ISO week's count next
    // to the previous observed week's, with growth in exact ppm
    // ((cnt − prev)·1e6 DIV prev). date_trunc('week') starts Monday in
    // both engines; the lag window partitions by type over the
    // |types|×weeks rollup — corpus-size work is only the first agg,
    // which reduces map-side.
    "q229_wow_growth" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("wk")
      t(s, d, "events")
        .groupBy(col("event_type"), date_trunc("week", col("ts")).as("wk"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("prev", lag("cnt", 1).over(w))
        .filter(col("prev").isNotNull)
        .select(col("event_type"), col("wk"), col("cnt"), col("prev"),
          expr("(cnt - prev) * 1000000 DIV prev").as("growth_ppm"))
    }),

    // ---- q244: linear multi-touch attribution ----
    // q178 gives the purchase to the LAST click; this splits it
    // equally across EVERY click in the trailing 24 h — per-pair
    // credit cents·1e6 DIV n in exact micro-cents, rolled up per user.
    // The pair join is an equi-join on user_id with the interval
    // predicate applied in-join (candidates bounded by one user's
    // 24 h click activity — never cross-user); the per-purchase click
    // count is a window over those bounded pairs. Purchases with no
    // in-window click contribute nothing here (q178's tolerance-null
    // is the report that surfaces them).
    "q244_linear_attribution" -> ((s, d) => {
      val W = org.apache.spark.sql.expressions.Window
      val ev = t(s, d, "events")
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("pid"), col("user_id"),
          col("ts").as("pts"), fixed(col("value"), 2).as("cents"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("cid"), col("user_id"),
          col("ts").as("cts"))
      p.join(c, Seq("user_id"))
        .filter(col("cts") <= col("pts") &&
          unix_micros(col("pts").cast("timestamp")) -
            unix_micros(col("cts").cast("timestamp")) <
            24L * 3600 * 1000000L)
        .withColumn("n", count(lit(1)).over(W.partitionBy("pid")))
        .select(col("user_id"), col("cid"),
          expr("cents * 1000000 DIV n").as("ucents"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct("cid").as("n_clicks"),
          sum("ucents").as("credited_ucents"))
    }),

    // ---- q243: cohort lifetime-value (LTV) curve ----
    // q160 counts RETAINED users; this accumulates their REVENUE: per
    // signup-week cohort and week offset, purchase cents that week,
    // cumulative cents, and cumulative ARPU (cum DIV cohort size) —
    // the payback read every growth team charts. Purchases join the
    // user→cohort map (one shuffle on user_id), the curve windows
    // partition by cohort week over the |cohorts|×weeks rollup, and
    // all money stays exact integer cents.
    "q243_cohort_ltv" -> ((s, d) => {
      val W = org.apache.spark.sql.expressions.Window
      val ev = t(s, d, "events")
      val cohort = ev.filter(col("event_type") === "signup")
        .groupBy("user_id")
        .agg(date_trunc("week", min(col("ts"))).as("cohort_wk"))
      val cs = cohort.groupBy("cohort_wk")
        .agg(count(lit(1)).as("cohort_users"))
      val rev = ev.filter(col("event_type") === "purchase")
        .join(cohort, "user_id")
        .filter(col("ts") >= col("cohort_wk"))
        .groupBy(col("cohort_wk"),
          expr("datediff(date_trunc('week', ts), cohort_wk) DIV 7")
            .as("week_offset"))
        .agg(sum(fixed(col("value"), 2)).as("cents"))
      rev.withColumn("cum_cents", sum("cents").over(
          W.partitionBy("cohort_wk").orderBy("week_offset")))
        .join(cs, "cohort_wk")
        .select(col("cohort_wk"), col("week_offset"), col("cents"),
          col("cum_cents"), col("cohort_users"),
          expr("cum_cents DIV cohort_users").as("arpu_cents"))
    }),

    // ---- q234: STREAMING DAU/WAU maintenance (foreachBatch) ----
    // q226's engagement rollup kept current from the event stream:
    // history (day, user) presence pairs land once, the delta slice
    // streams in with each micro-batch appending only its own deduped
    // pairs, and the query-time rollup runs on the merged presence
    // set. Set union is idempotent, so the result equals the one-shot
    // q226 regardless of batch boundaries — the SAME oracle gates
    // both (shared SQL below). NOTE: executing this entry RUNS the
    // stream (an action).
    "q234_stream_dau" -> ((s, d) =>
      graft.streaming.EventStreams.dauStream(s, d))
  )

  /** One oracle, two gates: q29 (batch) and q68 (streaming twin) must
    * stay in lockstep by construction — a fix to one cannot miss the
    * other. */
  private val hourlyOracle: String =
    s"""SELECT CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP) AS hr, event_type,
      | COUNT(*) AS cnt, ${sumFixedSql("value", 2)} AS sum_val
      |FROM events GROUP BY 1, 2""".stripMargin

  /** One oracle, two gates: q226 (batch) and q234 (streaming
    * maintenance) must stay in lockstep by construction. */
  private val rollingDistinctOracle: String =
    """WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
      |  FROM events),
      | u1 AS (SELECT day, count(DISTINCT user_id) AS dau FROM du
      |  GROUP BY 1),
      | fan AS (SELECT day + CAST(x AS INTEGER) AS rday, user_id
      |  FROM du CROSS JOIN generate_series(0, 6) AS t(x)),
      | r AS (SELECT rday, count(DISTINCT user_id) AS wau FROM fan
      |  GROUP BY 1)
      |SELECT CAST(u1.day AS TIMESTAMP) AS day, u1.dau, r.wau
      |FROM u1 JOIN r ON u1.day = r.rday""".stripMargin

  val oracles: Map[String, String] = Map(
    "q28_align_positional" ->
      s"""WITH a AS (SELECT o_orderkey, o_totalprice,
        |   ROW_NUMBER() OVER (ORDER BY o_orderkey) AS pos FROM orders),
        | b AS (SELECT o_totalprice AS p2,
        |   ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey) AS pos FROM orders)
        |SELECT a.o_orderkey, ${rndSql("a.o_totalprice + 2 * b.p2", 2)} AS combo
        |FROM a JOIN b USING (pos)""".stripMargin,
    "q29_events_hourly" -> hourlyOracle,
    "q200_hourly_gaps" ->
      """WITH e AS (SELECT event_type,
        |   epoch_us(DATE_TRUNC('hour', CAST(ts AS TIMESTAMP))) // 3600000000
        |     AS eh FROM events),
        | g AS (SELECT event_type, min(eh) AS h0, max(eh) AS h1,
        |   count(DISTINCT eh) AS n_present FROM e GROUP BY 1)
        |SELECT event_type,
        | make_timestamp(h0 * 3600000000) AS first_hr,
        | make_timestamp(h1 * 3600000000) AS last_hr,
        | h1 - h0 + 1 AS n_expected, n_present,
        | h1 - h0 + 1 - n_present AS n_missing
        |FROM g""".stripMargin,
    "q175_decay_score" ->
      s"""WITH mx AS (SELECT MAX(CAST(ts AS TIMESTAMP)) AS mx FROM events),
        | e AS (SELECT user_id,
        |   ${fixedSql("value", 2)} AS cents,
        |   date_diff('day', CAST(CAST(ts AS TIMESTAMP) AS DATE),
        |     CAST(mx AS DATE)) // 7 AS age_w
        |  FROM events CROSS JOIN mx),
        | w AS (SELECT user_id, cents,
        |   CAST(1000000 AS BIGINT) // (CAST(1 AS BIGINT)
        |     << LEAST(age_w, 62)) AS w_ppm FROM e)
        |SELECT user_id, COUNT(*) AS n_events,
        | CAST(SUM(cents) AS BIGINT) AS cents,
        | CAST(SUM(cents * w_ppm) AS BIGINT) AS decayed_cents_ppm
        |FROM w GROUP BY user_id""".stripMargin,
    "q160_cohort_retention" ->
      """WITH base AS (SELECT user_id, event_type,
        |   CAST(ts AS TIMESTAMP) AS ts FROM events),
        | cohort AS (SELECT user_id,
        |   CAST(DATE_TRUNC('week', MIN(ts)) AS TIMESTAMP) AS cohort_wk
        |  FROM base WHERE event_type = 'signup' GROUP BY 1),
        | act AS (SELECT DISTINCT user_id,
        |   CAST(DATE_TRUNC('week', ts) AS TIMESTAMP) AS wk FROM base)
        |SELECT c.cohort_wk,
        | date_diff('day', c.cohort_wk, a.wk) // 7 AS week_offset,
        | count(DISTINCT a.user_id) AS n_users
        |FROM act a JOIN cohort c USING (user_id)
        |WHERE a.wk >= c.cohort_wk
        |GROUP BY 1, 2""".stripMargin,

    "q156_rate_anomaly" ->
      """WITH h AS (SELECT CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP) AS hr,
        |   event_type, count(*) AS cnt FROM events GROUP BY 1, 2),
        | m AS (SELECT event_type, count(*) AS n,
        |   CAST(SUM(cnt) AS BIGINT) AS s,
        |   CAST(SUM(cnt * cnt) AS BIGINT) AS s2 FROM h GROUP BY 1)
        |SELECT h.event_type, h.hr, h.cnt,
        | (h.cnt * m.n - m.s) * (h.cnt * m.n - m.s) AS dev2,
        | 4 * (m.n * m.s2 - m.s * m.s) AS thr
        |FROM h JOIN m USING (event_type)
        |WHERE (h.cnt * m.n - m.s) * (h.cnt * m.n - m.s)
        |  > 4 * (m.n * m.s2 - m.s * m.s)""".stripMargin,
    "q68_hourly_stream" -> hourlyOracle,
    "q123_resample_ffill" ->
      """WITH pts AS (SELECT user_id,
        |   CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP) AS hr, value AS v
        |  FROM (SELECT *, row_number() OVER (
        |     PARTITION BY user_id, DATE_TRUNC('hour', ts)
        |     ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
        |    FROM events)
        |  WHERE rn = 1),
        | grid AS (SELECT user_id,
        |   unnest(generate_series(min(hr), max(hr), INTERVAL 1 HOUR)) AS hr
        |  FROM pts GROUP BY user_id)
        |SELECT g.user_id, g.hr,
        | last_value(p.v IGNORE NULLS) OVER (PARTITION BY g.user_id
        |   ORDER BY g.hr ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |   AS v_filled
        |FROM grid g LEFT JOIN pts p
        |  ON g.user_id = p.user_id AND g.hr = p.hr""".stripMargin,
    "q30_events_json" ->
      """SELECT event_type, COUNT(*) AS cnt,
        | CAST(SUM(CAST(NULLIF(REGEXP_EXTRACT(props, '"k": ([0-9]+)', 1), '') AS BIGINT)) AS BIGINT) AS sum_k,
        | MAX(CAST(NULLIF(REGEXP_EXTRACT(props, '"k": ([0-9]+)', 1), '') AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type""".stripMargin,
    "q31_asof_join" ->
      """WITH o AS (SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
        |  FROM orders GROUP BY o_custkey, o_orderdate)
        |SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate
        |FROM events e ASOF LEFT JOIN o
        |  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate""".stripMargin,

    "q128_sliding_counts" ->
      s"""WITH w AS (
        | SELECT CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP) AS ws,
        |   event_type, value FROM events
        | UNION ALL
        | SELECT CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP)
        |     - INTERVAL 1 HOUR AS ws,
        |   event_type, value FROM events)
        |SELECT ws, event_type, COUNT(*) AS cnt,
        | ${sumFixedSql("value", 2)} AS sum_val
        |FROM w GROUP BY 1, 2""".stripMargin,

    "q126_time_weighted" ->
      s"""WITH e AS (SELECT user_id, event_id,
        |   CAST(ts AS TIMESTAMP) AS ts, ${fixedSql("value", 2)} AS v100
        |  FROM events),
        | l AS (SELECT *, lead(ts) OVER (PARTITION BY user_id
        |   ORDER BY ts, event_id) AS nts FROM e),
        | d AS (SELECT user_id,
        |   date_diff('microsecond', ts, nts) AS dt, v100
        |  FROM l WHERE nts IS NOT NULL),
        | a AS (SELECT user_id, count(*) AS n_intervals,
        |   CAST(SUM(dt) AS BIGINT) AS span_us,
        |   CAST(SUM(dt * v100) AS BIGINT) AS num
        |  FROM d GROUP BY 1 HAVING CAST(SUM(dt) AS BIGINT) > 0)
        |SELECT user_id, n_intervals, span_us,
        | num / span_us / 100.0 AS tw_avg FROM a""".stripMargin,

    "q178_attribution" ->
      s"""WITH base AS (SELECT event_id, event_type, user_id, value,
        |   CAST(ts AS TIMESTAMP) AS ts FROM events),
        | p AS (SELECT event_id AS purchase_id, user_id, ts,
        |   ${fixedSql("value", 2)} AS cents
        |  FROM base WHERE event_type = 'purchase'),
        | c AS (SELECT user_id, ts, MAX(event_id) AS click_id
        |  FROM base WHERE event_type = 'click' GROUP BY 1, 2)
        |SELECT p.purchase_id, p.user_id, p.cents,
        | CASE WHEN p.ts <= c.ts + INTERVAL 24 HOUR
        |   THEN c.click_id END AS click_id
        |FROM p ASOF LEFT JOIN c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin,

    "q90_asof_forward" ->
      """WITH o AS (SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
        |  FROM orders GROUP BY o_custkey, o_orderdate)
        |SELECT e.event_id, e.user_id,
        | CASE WHEN o.o_orderdate <= CAST(e.ts AS TIMESTAMP) + INTERVAL 7 DAY
        |   THEN o.o_orderkey END AS o_orderkey,
        | CASE WHEN o.o_orderdate <= CAST(e.ts AS TIMESTAMP) + INTERVAL 7 DAY
        |   THEN o.o_orderdate END AS o_orderdate
        |FROM events e ASOF LEFT JOIN o
        |  ON e.user_id = o.o_custkey AND e.ts <= o.o_orderdate""".stripMargin,

    // nearest = rank all same-user candidates by (|gap|, backward-first)
    // — tractable for the oracle because DuckDB's ASOF join has no
    // 'nearest' direction; tolerance applied post-pick like the engine.
    "q250_asof_nearest" ->
      """WITH c AS (SELECT event_id, user_id, ts FROM events
        |   WHERE event_type = 'click'),
        | p AS (SELECT user_id, ts AS pts, MAX(event_id) AS purchase_id
        |   FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        | cand AS (SELECT c.event_id, c.user_id, p.purchase_id, p.pts,
        |   abs(epoch_us(CAST(p.pts AS TIMESTAMP))
        |     - epoch_us(CAST(c.ts AS TIMESTAMP))) AS gap,
        |   CASE WHEN p.pts <= c.ts THEN 0 ELSE 1 END AS fwd
        |  FROM c JOIN p USING (user_id)),
        | best AS (SELECT *, row_number() OVER (PARTITION BY event_id
        |     ORDER BY gap, fwd) AS rn
        |  FROM cand)
        |SELECT c.event_id, c.user_id,
        | CASE WHEN b.gap <= 21600000000 THEN b.purchase_id END
        |   AS purchase_id,
        | CASE WHEN b.gap <= 21600000000 THEN b.pts END AS purchase_ts
        |FROM c LEFT JOIN (SELECT * FROM best WHERE rn = 1) b
        |  USING (event_id)""".stripMargin,

    "q267_repeat_purchase" ->
      """WITH p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
        |   FROM events WHERE event_type = 'purchase'),
        | f AS (SELECT user_id, MIN(ts) AS t1, count(*) AS np
        |  FROM p GROUP BY 1),
        | s2 AS (SELECT p.user_id, MIN(p.ts) AS t2
        |  FROM p JOIN f USING (user_id) WHERE p.ts > f.t1 GROUP BY 1),
        | a AS (SELECT CAST(count(*) AS BIGINT) AS n_buyers,
        |   CAST(SUM(CASE WHEN np >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |     AS n_repeat,
        |   CAST(SUM(CASE WHEN epoch_us(t2) - epoch_us(t1)
        |       <= 2592000000000 THEN 1 ELSE 0 END) AS BIGINT)
        |     AS n_repeat_30d
        |  FROM f LEFT JOIN s2 USING (user_id))
        |SELECT n_buyers, n_repeat, n_repeat_30d,
        | n_repeat * 1000000 // n_buyers AS repeat_ppm,
        | n_repeat_30d * 1000000 // n_buyers AS repeat30_ppm
        |FROM a""".stripMargin,

    "q258_weekday_seasonality" ->
      """WITH c AS (SELECT event_type, dayofweek(ts) AS dow,
        |   count(*) AS cnt
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, CAST(dow AS BIGINT) AS dow, cnt,
        | CAST(cnt * 7 * 1000000 //
        |   SUM(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS idx_ppm
        |FROM c""".stripMargin,

    "q249_active_streaks" ->
      """WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
        |   FROM events),
        | g AS (SELECT user_id, day,
        |   datediff('day', DATE '1970-01-01', day)
        |     - row_number() OVER (PARTITION BY user_id ORDER BY day)
        |     AS grp
        |  FROM days),
        | s AS (SELECT user_id, grp, count(*) AS len FROM g GROUP BY 1, 2)
        |SELECT user_id, MAX(len) AS max_streak,
        | CAST(count(*) AS BIGINT) AS n_streaks
        |FROM s GROUP BY 1""".stripMargin,

    "q224_event_transitions" ->
      """WITH o AS (SELECT user_id, event_id, event_type,
        |   lag(event_type) OVER (PARTITION BY user_id
        |     ORDER BY ts, event_id) AS prev
        |  FROM events),
        | c AS (SELECT prev, event_type AS next, count(*) AS n
        |  FROM o WHERE prev IS NOT NULL GROUP BY 1, 2)
        |SELECT prev, next, n,
        | CAST(n * 1000000 // SUM(n) OVER (PARTITION BY prev) AS BIGINT)
        |   AS p_ppm
        |FROM c""".stripMargin,

    "q225_cusum_changepoint" ->
      """WITH h AS (SELECT event_type,
        |   CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP) AS hr,
        |   count(*) AS cnt FROM events GROUP BY 1, 2),
        | w AS (SELECT event_type, hr, cnt,
        |   count(*) OVER (PARTITION BY event_type) AS hn,
        |   SUM(cnt) OVER (PARTITION BY event_type) AS tot FROM h),
        | c AS (SELECT event_type, hr, hn,
        |   ABS(SUM(cnt * hn - tot) OVER (PARTITION BY event_type
        |     ORDER BY hr)) AS acs FROM w),
        | r AS (SELECT event_type, hr, hn, acs,
        |   ROW_NUMBER() OVER (PARTITION BY event_type
        |     ORDER BY acs DESC, hr) AS rk FROM c)
        |SELECT event_type, hr AS cp_hour,
        | CAST(acs AS BIGINT) AS max_abs_cusum,
        | CAST(hn AS BIGINT) AS n_hours
        |FROM r WHERE rk = 1""".stripMargin,

    "q226_rolling_distinct" -> rollingDistinctOracle,
    // streaming maintenance must land on the identical one-shot rollup
    // (set-union idempotence of the presence pairs)
    "q234_stream_dau" -> rollingDistinctOracle,

    "q228_diurnal_profile" ->
      """WITH h AS (SELECT event_type, hour(ts) AS hod, count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        | w AS (SELECT event_type, hod, cnt,
        |   SUM(cnt) OVER (PARTITION BY event_type) AS n FROM h),
        | s AS (SELECT event_type, hod, n,
        |   CAST(cnt * 1000000 // n AS BIGINT) AS share_ppm,
        |   ROW_NUMBER() OVER (PARTITION BY event_type
        |     ORDER BY cnt DESC, hod) AS rk FROM w)
        |SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
        | MAX(CASE WHEN rk = 1 THEN hod END) AS peak_hod,
        | MAX(CASE WHEN rk = 1 THEN share_ppm END) AS peak_share_ppm,
        | CAST(SUM((share_ppm * 24 - 1000000)
        |   * (share_ppm * 24 - 1000000)) AS BIGINT) AS uniformity_dev2
        |FROM s GROUP BY 1""".stripMargin,

    "q244_linear_attribution" ->
      s"""WITH base AS (SELECT event_id, event_type, user_id, value,
        |   CAST(ts AS TIMESTAMP) AS ts FROM events),
        | p AS (SELECT event_id AS pid, user_id, ts AS pts,
        |   ${fixedSql("value", 2)} AS cents
        |  FROM base WHERE event_type = 'purchase'),
        | c AS (SELECT event_id AS cid, user_id, ts AS cts
        |  FROM base WHERE event_type = 'click'),
        | pairs AS (SELECT p.pid, p.user_id, c.cid, p.cents
        |  FROM p JOIN c ON p.user_id = c.user_id
        |   AND c.cts <= p.pts
        |   AND EPOCH_US(p.pts) - EPOCH_US(c.cts) < 86400000000),
        | w AS (SELECT user_id, cid,
        |   cents * 1000000 // count(*) OVER (PARTITION BY pid)
        |     AS ucents FROM pairs)
        |SELECT user_id, count(*) AS n_pairs,
        | count(DISTINCT cid) AS n_clicks,
        | CAST(SUM(ucents) AS BIGINT) AS credited_ucents
        |FROM w GROUP BY 1""".stripMargin,

    "q243_cohort_ltv" ->
      s"""WITH base AS (SELECT user_id, event_type, value,
        |   CAST(ts AS TIMESTAMP) AS ts FROM events),
        | cohort AS (SELECT user_id,
        |   CAST(DATE_TRUNC('week', MIN(ts)) AS TIMESTAMP) AS cohort_wk
        |  FROM base WHERE event_type = 'signup' GROUP BY 1),
        | cs AS (SELECT cohort_wk, count(*) AS cohort_users FROM cohort
        |  GROUP BY 1),
        | rev AS (SELECT c.cohort_wk,
        |   date_diff('day', CAST(c.cohort_wk AS DATE),
        |     CAST(DATE_TRUNC('week', e.ts) AS DATE)) // 7 AS week_offset,
        |   CAST(SUM(${fixedSql("e.value", 2)}) AS BIGINT) AS cents
        |  FROM base e JOIN cohort c USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts >= c.cohort_wk
        |  GROUP BY 1, 2),
        | cum AS (SELECT cohort_wk, week_offset, cents,
        |   CAST(SUM(cents) OVER (PARTITION BY cohort_wk
        |     ORDER BY week_offset) AS BIGINT) AS cum_cents FROM rev)
        |SELECT cohort_wk, week_offset, cents, cum_cents,
        | cs.cohort_users,
        | CAST(cum_cents // cs.cohort_users AS BIGINT) AS arpu_cents
        |FROM cum JOIN cs USING (cohort_wk)""".stripMargin,

    "q229_wow_growth" ->
      """WITH wk AS (SELECT event_type,
        |   CAST(DATE_TRUNC('week', ts) AS TIMESTAMP) AS wk,
        |   count(*) AS cnt FROM events GROUP BY 1, 2),
        | l AS (SELECT event_type, wk, cnt,
        |   lag(cnt) OVER (PARTITION BY event_type ORDER BY wk) AS prev
        |  FROM wk)
        |SELECT event_type, wk, cnt, prev,
        | CAST((cnt - prev) * 1000000 // prev AS BIGINT) AS growth_ppm
        |FROM l WHERE prev IS NOT NULL""".stripMargin
  )
}
