package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables
import graft.functions.DetMath._

/** Reshaping + distribution surfaces: pivot/crosstab, batch
  * sessionization (gaps-and-islands, the batch twin of the streaming
  * session_window), exact multi-quantiles.
  */
object Shapes {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.read(s, dir, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // pivot: order counts + revenue per status, one column per priority
    // band (conditional aggregation — identical spelling cross-engine)
    "q57_pivot" -> ((s, d) => {
      val o = t(s, d, "orders")
        .withColumn("prio", substring(col("o_orderpriority"), 1, 1))
      o.groupBy("o_orderstatus")
        .pivot("prio", Seq("1", "2", "3", "4", "5"))
        .agg(count(lit(1)))
        .select(col("o_orderstatus"),
          coalesce(col("1"), lit(0L)).as("p1"),
          coalesce(col("2"), lit(0L)).as("p2"),
          coalesce(col("3"), lit(0L)).as("p3"),
          coalesce(col("4"), lit(0L)).as("p4"),
          coalesce(col("5"), lit(0L)).as("p5"))
    }),

    // batch sessionization: per-user sessions with a 30-minute gap via
    // gaps-and-islands (LAG -> new-session flag -> running session id)
    "q58_sessionize_batch" -> ((s, d) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "events")
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("new_sess",
          // microsecond-exact gap: unix_timestamp truncates to seconds
          // and would disagree with a fractional-second oracle on
          // boundary gaps
          (col("prev_ts").isNull ||
            unix_micros(col("ts").cast("timestamp")) -
            unix_micros(col("prev_ts").cast("timestamp")) > 1800L * 1000000L)
            .cast("int"))
        .withColumn("sess_id", sum(col("new_sess")).over(run))
        .groupBy(col("user_id"), col("sess_id"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("sess_start"),
          max(col("ts")).as("sess_end"),
          sumFixed(col("value"), 2).as("sum_val"))
    }),

    // STREAMING sessionization, oracle-gated: runs the session_window
    // stream to completion (complete mode) and returns the final table.
    // Session semantics: an event at exactly gap distance starts a NEW
    // session ([start, end) half-open), hence >= in the oracle's flag —
    // unlike q58's batch islands which use >.
    "q65_sessions_stream" -> ((s, d) =>
      graft.streaming.EventStreams.sessionsBatchEquivalent(s, d)),

    // exact multi-quantile (percentile_cont interpolation).
    // SCALE BOUND: `percentile` buffers every value of the group in the
    // aggregation buffer — fine while the largest group fits in executor
    // memory, an OOM wall beyond that. q83 is the bounded-memory
    // at-scale variant (the reference itself ships a t-digest
    // approximate_median, src/reduction.hpp:58-95, for the same reason).
    "q59_quantiles" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          rnd(expr("percentile(l_extendedprice, 0.25)"), 2).as("q25"),
          rnd(expr("percentile(l_extendedprice, 0.5)"), 2).as("q50"),
          rnd(expr("percentile(l_extendedprice, 0.75)"), 2).as("q75"),
          rnd(expr("percentile(l_extendedprice, 0.99)"), 2).as("q99"))),

    // ---- q242: session bounce rate per day ----
    // Engagement health over q58's gaps-and-islands sessions: per day
    // (of session start), session count, single-event "bounce"
    // sessions, and the bounce rate in exact ppm. Same one-shuffle
    // sessionization (windows keyed on user_id); the daily report is
    // span-bounded. Day is gated as a midnight timestamp (the q226
    // convention).
    "q242_bounce_rate" -> ((s, d) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val run = byUser.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)
      t(s, d, "events")
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("new_sess",
          (col("prev_ts").isNull ||
            unix_micros(col("ts").cast("timestamp")) -
            unix_micros(col("prev_ts").cast("timestamp")) >
              1800L * 1000000L).cast("int"))
        .withColumn("sess_id", sum(col("new_sess")).over(run))
        .groupBy(col("user_id"), col("sess_id"))
        .agg(count(lit(1)).as("n_events"), min(col("ts")).as("start"))
        .select(to_date(col("start")).cast("timestamp").as("day"),
          when(col("n_events") === 1, 1L).otherwise(0L).as("bounce"))
        .groupBy("day")
        .agg(count(lit(1)).as("n_sessions"), sum("bounce").as("n_bounce"))
        .select(col("day"), col("n_sessions"), col("n_bounce"),
          expr("n_bounce * 1000000 DIV n_sessions").as("bounce_ppm"))
    }),

    // ---- q259: sessionized purchase-conversion rate per day ----
    // The revenue-side twin of q242's bounce rate: per day (of session
    // start), how many q58 sessions contained at least one purchase,
    // in exact ppm. Same one-shuffle sessionization; the flag is a
    // per-session max over a 0/1, so the report never rescans events.
    "q259_session_conversion" -> ((s, d) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val run = byUser.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)
      t(s, d, "events")
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("new_sess",
          (col("prev_ts").isNull ||
            unix_micros(col("ts").cast("timestamp")) -
            unix_micros(col("prev_ts").cast("timestamp")) >
              1800L * 1000000L).cast("int"))
        .withColumn("sess_id", sum(col("new_sess")).over(run))
        .groupBy(col("user_id"), col("sess_id"))
        .agg(min(col("ts")).as("start"),
          max(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("conv"))
        .select(to_date(col("start")).cast("timestamp").as("day"),
          col("conv"))
        .groupBy("day")
        .agg(count(lit(1)).as("n_sessions"), sum("conv").as("n_conv"))
        .select(col("day"), col("n_sessions"), col("n_conv"),
          expr("n_conv * 1000000 DIV n_sessions").as("conv_ppm"))
    }),

    // ---- q261: concurrent sessions per hour (peak-load profile) ----
    // How many q58 sessions were LIVE in each hour — the capacity-
    // planning read: each session explodes to the hours its
    // [start, end] span touches (sequence() of hour-truncated bounds —
    // fan-out bounded by session length, which the 30-minute gap rule
    // keeps small), then one count per hour. No self-join, no
    // sweep-line global sort; the hourly report is span-bounded.
    "q261_concurrent_sessions" -> ((s, d) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val run = byUser.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)
      t(s, d, "events")
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("new_sess",
          (col("prev_ts").isNull ||
            unix_micros(col("ts").cast("timestamp")) -
            unix_micros(col("prev_ts").cast("timestamp")) >
              1800L * 1000000L).cast("int"))
        .withColumn("sess_id", sum(col("new_sess")).over(run))
        .groupBy(col("user_id"), col("sess_id"))
        .agg(min(col("ts")).as("start"), max(col("ts")).as("end"))
        .select(explode(expr(
          "sequence(date_trunc('hour', start), date_trunc('hour', end), " +
            "interval 1 hour)")).as("hr"))
        .groupBy("hr")
        .agg(count(lit(1)).as("n_active"))
    }),

    // ---- q141: session path mining ----
    // Sessionize (q58's gaps-and-islands), then mine the event-type
    // PATH of each session ("signup>click>purchase") and count how
    // often each journey occurs — the sequence-mining read of the
    // event log. The path is an ORDERED collect: sort the collected
    // (ts, event_id, type) structs in-row, so the string is a pure
    // function of the session's events (event_id breaks ts ties) and
    // the oracle's string_agg(... ORDER BY ts, event_id) replays it.
    // Per-session state is bounded by session length; the final agg is
    // path-cardinality-bounded.
    "q141_session_paths" -> ((s, d) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "events")
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("new_sess",
          (col("prev_ts").isNull ||
            unix_micros(col("ts").cast("timestamp")) -
            unix_micros(col("prev_ts").cast("timestamp")) > 1800L * 1000000L)
            .cast("int"))
        .withColumn("sess_id", sum(col("new_sess")).over(run))
        .groupBy(col("user_id"), col("sess_id"))
        .agg(concat_ws(">", expr(
          "transform(array_sort(collect_list(struct(ts, event_id, event_type)))," +
            " x -> x.event_type)")).as("path"))
        .groupBy("path")
        .agg(count(lit(1)).as("n_sessions"))
    }),

    // ---- q133: IQR outlier fences (Tukey) ----
    // Per group: exact q1/q3 order statistics picked by pure integer
    // rank (the q125 recipe — ceil(n*p) = (n*p+99) DIV 100, so both
    // engines choose the identical data value, no interpolation), then
    // fences q1/q3 ∓ 1.5·IQR from single correctly-rounded IEEE ops on
    // those exact values. Output: group size, outlier count, fences,
    // and the kept range — the outlier-removal preprocessing report.
    // The tiny 6-row bounds table broadcasts back onto the scan.
    "q133_iqr_outliers" -> ((s, d) => {
      val base = t(s, d, "lineitem").select(
        col("l_returnflag").as("g"), col("l_extendedprice").as("x"))
      val w = Window.partitionBy("g").orderBy(col("x"))
      val ranked = base
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("g")))
      val bounds = ranked.groupBy("g").agg(
        min(when(col("rn") === expr("(n * 25 + 99) DIV 100"), col("x")))
          .as("q1"),
        min(when(col("rn") === expr("(n * 75 + 99) DIV 100"), col("x")))
          .as("q3"))
        .withColumn("lo_fence", col("q1") - lit(1.5) * (col("q3") - col("q1")))
        .withColumn("hi_fence", col("q3") + lit(1.5) * (col("q3") - col("q1")))
      base.join(broadcast(bounds), Seq("g"))
        .groupBy("g")
        .agg(count(lit(1)).as("n"),
          sum(when(col("x") < col("lo_fence") ||
            col("x") > col("hi_fence"), 1L).otherwise(0L)).as("n_out"),
          min(col("lo_fence")).as("lo_fence"),
          min(col("hi_fence")).as("hi_fence"),
          min(when(col("x") >= col("lo_fence") &&
            col("x") <= col("hi_fence"), col("x"))).as("kept_min"),
          max(when(col("x") >= col("lo_fence") &&
            col("x") <= col("hi_fence"), col("x"))).as("kept_max"))
    }),

    // ---- q167: median-absolute-deviation robust dispersion ----
    // The robust twin of q110's z-score and q133's IQR fences: per
    // group, the MAD (median of |x - median|) plus how many rows sit
    // within 1 MAD of the median (core density) and beyond 1.5 MADs
    // (robust outliers). Both medians are the SAME ceil-rank order
    // statistic as q125/q133 ((n*50+99) DIV 100 — exact, no
    // interpolation drift), so every output is either an input value
    // or one deterministic double product. Two ranked window passes +
    // two broadcast joins of group-cardinality tables; the q59
    // group-sort caveat applies at extreme group sizes, with q83's
    // sketch as the documented approximate pre-pass.
    "q167_mad_dispersion" -> ((s, d) => {
      val base = t(s, d, "lineitem").select(
        col("l_returnflag").as("g"), col("l_extendedprice").as("x"))
      def ceilMedian(df: DataFrame, v: String, out: String) = df
        .withColumn("rn", row_number().over(
          Window.partitionBy("g").orderBy(col(v))).cast("long"))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("g")))
        .groupBy("g").agg(
          min(when(col("rn") === expr("(n * 50 + 99) DIV 100"), col(v)))
            .as(out))
      val med = ceilMedian(base, "x", "med")
      val dev = base.join(broadcast(med), Seq("g"))
        .withColumn("dev", abs(col("x") - col("med")))
      val mad = ceilMedian(dev, "dev", "mad")
      dev.join(broadcast(mad), Seq("g"))
        .groupBy("g")
        .agg(count(lit(1)).as("n"), min("med").as("med"),
          min("mad").as("mad"),
          sum(when(col("dev") <= col("mad"), 1L).otherwise(0L))
            .as("n_core"),
          sum(when(col("dev") > lit(1.5) * col("mad"), 1L).otherwise(0L))
            .as("n_out"))
    }),

    // ---- q173: quantile normalization onto the global distribution ----
    // The cross-group feature equalizer (the bioinformatics/feature-prep
    // move): each value maps to its group's percentile, then to the
    // GLOBAL order statistic at that percentile — after which every
    // group has the same marginal distribution. The global ordinal
    // comes from Align.withPosition (range-partitioned sort +
    // zipWithIndex, NO single-partition window), the reference grid is
    // 101 exact order statistics picked by one broadcast join, and
    // ranks tie-break on the full key so both engines assign identical
    // percentiles. Per-group ranking shuffles on g only.
    "q173_quantile_norm" -> ((s, d) => {
      val base = t(s, d, "lineitem").select(
        col("l_returnflag").as("g"), col("l_orderkey"),
        col("l_linenumber"), col("l_extendedprice").as("x"))
      val order = Seq(col("x"), col("l_orderkey"), col("l_linenumber"))
      val gv = graft.operators.Align.withPosition(base, order)
      val nTot = gv.agg(count(lit(1)).as("nn"))
      val grid = s.range(0, 101).toDF("p")
        .crossJoin(broadcast(nTot))
        .select(col("p").cast("long").as("p"),
          expr("p * (nn - 1) DIV 100").as("pos"))
      val ref = gv.join(broadcast(grid), "pos")
        .select(col("p"), col("x").as("x_norm"))
      val wg = Window.partitionBy("g").orderBy(order: _*)
      base
        .withColumn("rn", row_number().over(wg).cast("long"))
        .withColumn("ng", count(lit(1)).over(Window.partitionBy("g")))
        .withColumn("p", expr(
          "CASE WHEN ng > 1 THEN (rn - 1) * 100 DIV (ng - 1) ELSE CAST(0 AS BIGINT) END"))
        .join(broadcast(ref), "p")
        .select("g", "l_orderkey", "l_linenumber", "x", "p", "x_norm")
    }),

    // APPROXIMATE multi-quantile over a DETERMINISTIC md5 hash-sample
    // (the q89 sampler): both engines thin lineitem with the identical
    // content-hash predicate (8/16 of rows), then take EXACT
    // lower-nearest-rank quantiles OF THE SAMPLE — a real approximate-
    // quantile operator (rank error ~1/sqrt(sample), pinned vs q59's
    // exact answer in OperatorSpec) that DuckDB replays bit-for-bit,
    // unlike a GK/t-digest sketch whose internals are engine-private.
    // Work is bounded by the sample: the per-group rank sort sees only
    // kept rows, and at 100 TB the keepNibbles knob thins it to
    // whatever one group's sort budget allows. Spark's
    // approx_percentile stays the engine-native production spelling
    // (also pinned in OperatorSpec); q59 stays the exact one.
    "q83_approx_quantiles" -> ((s, d) => {
      val samp = t(s, d, "lineitem")
        .withColumn("rid",
          concat_ws(":", col("l_orderkey"), col("l_linenumber")))
      val kept = graft.operators.Sampling.hashSample(samp, "rid", 8)
        .select(col("l_returnflag"), col("l_extendedprice").as("x"))
      val ranked = kept
        .withColumn("rn", row_number().over(
          Window.partitionBy("l_returnflag").orderBy("x")).cast("long"))
        .withColumn("n", count(lit(1)).over(
          Window.partitionBy("l_returnflag")))
      def pick(p: Int) =
        max(when(expr(s"rn = ((n - 1) * $p) DIV 100 + 1"), col("x")))
      ranked.groupBy("l_returnflag").agg(
        pick(25).as("q25"), pick(50).as("q50"),
        pick(75).as("q75"), pick(99).as("q99"))
    }),

    // ---- q189: equi-DEPTH histogram (ANALYZE statistics) ----
    // The optimizer-statistics primitive q109's equal-WIDTH bins can't
    // give you: bin edges at the sample's p10..p90 order statistics
    // (q83's deterministic md5 half-sample + exact ranks), so bins hold
    // ~equal row counts and selectivity estimates stay accurate on
    // skewed columns — what ANALYZE TABLE computes for a CBO. The 9
    // edges collapse to ONE row (bounded agg), broadcast onto the full
    // scan, and each row's bin is an in-row 9-element array filter —
    // no per-row join, no second shuffle; the final count is one hash
    // agg on ≤10 groups. Edges from the sample, counts from the FULL
    // table: the sample bounds the sort, the histogram stays exact.
    "q189_equidepth_hist" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val samp = graft.operators.Sampling.hashSample(
        li.withColumn("rid",
          concat_ws(":", col("l_orderkey"), col("l_linenumber"))), "rid", 8)
        .select(col("l_extendedprice").as("x"))
      val ranked = samp
        .withColumn("rn", row_number().over(
          Window.orderBy("x")).cast("long"))
        .withColumn("n", count(lit(1)).over(
          Window.partitionBy(lit(1))))
      val rankSet = (10 to 90 by 10)
        .map(p => s"rn = ((n - 1) * $p) DIV 100 + 1").mkString(" OR ")
      val edges = ranked.filter(expr(rankSet))
        .agg(sort_array(collect_set(col("x"))).as("es"))
      li.select(col("l_extendedprice").as("x"))
        .crossJoin(broadcast(edges))
        .select(expr("size(filter(es, e -> x >= e))").as("bin"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n_rows"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q57_pivot" ->
      """SELECT o_orderstatus,
        | COUNT(*) FILTER (WHERE SUBSTR(o_orderpriority, 1, 1) = '1') AS p1,
        | COUNT(*) FILTER (WHERE SUBSTR(o_orderpriority, 1, 1) = '2') AS p2,
        | COUNT(*) FILTER (WHERE SUBSTR(o_orderpriority, 1, 1) = '3') AS p3,
        | COUNT(*) FILTER (WHERE SUBSTR(o_orderpriority, 1, 1) = '4') AS p4,
        | COUNT(*) FILTER (WHERE SUBSTR(o_orderpriority, 1, 1) = '5') AS p5
        |FROM orders GROUP BY o_orderstatus""".stripMargin,

    "q58_sessionize_batch" ->
      s"""WITH base AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
        | lagged AS (SELECT *, LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts FROM base),
        | flagged AS (SELECT *, CAST(prev_ts IS NULL
        |     OR EPOCH_US(ts) - EPOCH_US(prev_ts) > 1800000000 AS INT) AS new_sess FROM lagged),
        | sess AS (SELECT *, CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_id FROM flagged)
        |SELECT user_id, sess_id, COUNT(*) AS n_events,
        | MIN(ts) AS sess_start, MAX(ts) AS sess_end,
        | ${sumFixedSql("value", 2)} AS sum_val
        |FROM sess GROUP BY user_id, sess_id""".stripMargin,

    "q242_bounce_rate" ->
      """WITH base AS (SELECT event_id, user_id,
        |   CAST(ts AS TIMESTAMP) AS ts FROM events),
        | lagged AS (SELECT *, LAG(ts) OVER (PARTITION BY user_id
        |   ORDER BY ts, event_id) AS prev_ts FROM base),
        | flagged AS (SELECT *, CAST(prev_ts IS NULL
        |     OR EPOCH_US(ts) - EPOCH_US(prev_ts) > 1800000000 AS INT)
        |   AS new_sess FROM lagged),
        | sess AS (SELECT *, CAST(SUM(new_sess) OVER (
        |     PARTITION BY user_id ORDER BY ts, event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |   AS BIGINT) AS sess_id FROM flagged),
        | sf AS (SELECT user_id, sess_id, COUNT(*) AS n_events,
        |   MIN(ts) AS start FROM sess GROUP BY 1, 2),
        | dy AS (SELECT CAST(CAST(start AS DATE) AS TIMESTAMP) AS day,
        |   CASE WHEN n_events = 1 THEN 1 ELSE 0 END AS bounce FROM sf)
        |SELECT day, count(*) AS n_sessions,
        | CAST(SUM(bounce) AS BIGINT) AS n_bounce,
        | CAST(SUM(bounce) * 1000000 // count(*) AS BIGINT)
        |   AS bounce_ppm
        |FROM dy GROUP BY 1""".stripMargin,

    "q259_session_conversion" ->
      """WITH base AS (SELECT event_id, user_id, event_type,
        |   CAST(ts AS TIMESTAMP) AS ts FROM events),
        | lagged AS (SELECT *, LAG(ts) OVER (PARTITION BY user_id
        |   ORDER BY ts, event_id) AS prev_ts FROM base),
        | flagged AS (SELECT *, CAST(prev_ts IS NULL
        |     OR EPOCH_US(ts) - EPOCH_US(prev_ts) > 1800000000 AS INT)
        |   AS new_sess FROM lagged),
        | sess AS (SELECT *, CAST(SUM(new_sess) OVER (
        |     PARTITION BY user_id ORDER BY ts, event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |   AS BIGINT) AS sess_id FROM flagged),
        | sf AS (SELECT user_id, sess_id, MIN(ts) AS start,
        |   MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |     AS conv
        |  FROM sess GROUP BY 1, 2),
        | dy AS (SELECT CAST(CAST(start AS DATE) AS TIMESTAMP) AS day,
        |   conv FROM sf)
        |SELECT day, count(*) AS n_sessions,
        | CAST(SUM(conv) AS BIGINT) AS n_conv,
        | CAST(SUM(conv) * 1000000 // count(*) AS BIGINT) AS conv_ppm
        |FROM dy GROUP BY 1""".stripMargin,

    "q261_concurrent_sessions" ->
      """WITH base AS (SELECT event_id, user_id,
        |   CAST(ts AS TIMESTAMP) AS ts FROM events),
        | lagged AS (SELECT *, LAG(ts) OVER (PARTITION BY user_id
        |   ORDER BY ts, event_id) AS prev_ts FROM base),
        | flagged AS (SELECT *, CAST(prev_ts IS NULL
        |     OR EPOCH_US(ts) - EPOCH_US(prev_ts) > 1800000000 AS INT)
        |   AS new_sess FROM lagged),
        | sess AS (SELECT *, CAST(SUM(new_sess) OVER (
        |     PARTITION BY user_id ORDER BY ts, event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |   AS BIGINT) AS sess_id FROM flagged),
        | sp AS (SELECT user_id, sess_id, MIN(ts) AS s0, MAX(ts) AS s1
        |  FROM sess GROUP BY 1, 2),
        | hrs AS (SELECT unnest(generate_series(
        |    date_trunc('hour', s0), date_trunc('hour', s1),
        |    INTERVAL 1 HOUR)) AS hr FROM sp)
        |SELECT hr, count(*) AS n_active FROM hrs GROUP BY 1""".stripMargin,

    "q65_sessions_stream" ->
      s"""WITH base AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
        | lagged AS (SELECT *, LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts FROM base),
        | flagged AS (SELECT *, CAST(prev_ts IS NULL
        |     OR EPOCH_US(ts) - EPOCH_US(prev_ts) >= 1800000000 AS INT) AS new_sess FROM lagged),
        | sess AS (SELECT *, CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_id FROM flagged)
        |SELECT MIN(ts) AS sess_start, MAX(ts) + INTERVAL 30 MINUTE AS sess_end,
        | user_id, COUNT(*) AS n_events, ${sumFixedSql("value", 2)} AS sum_val
        |FROM sess GROUP BY user_id, sess_id""".stripMargin,

    // q58's session CTEs + an ordered string_agg per session
    "q141_session_paths" ->
      """WITH base AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
        |   event_type FROM events),
        | lagged AS (SELECT *, LAG(ts) OVER (PARTITION BY user_id
        |   ORDER BY ts, event_id) AS prev_ts FROM base),
        | flagged AS (SELECT *, CAST(prev_ts IS NULL
        |     OR EPOCH_US(ts) - EPOCH_US(prev_ts) > 1800000000 AS INT)
        |   AS new_sess FROM lagged),
        | sess AS (SELECT *, SUM(new_sess) OVER (PARTITION BY user_id
        |     ORDER BY ts, event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
        |   FROM flagged),
        | paths AS (SELECT user_id, sess_id,
        |   string_agg(event_type, '>' ORDER BY ts, event_id) AS path
        |  FROM sess GROUP BY 1, 2)
        |SELECT path, count(*) AS n_sessions FROM paths GROUP BY 1""".stripMargin,

    "q133_iqr_outliers" ->
      """WITH base AS (SELECT l_returnflag AS g, l_extendedprice AS x
        |   FROM lineitem),
        | ranked AS (SELECT *,
        |   row_number() OVER (PARTITION BY g ORDER BY x) AS rn,
        |   count(*) OVER (PARTITION BY g) AS n FROM base),
        | qs AS (SELECT g,
        |   MIN(CASE WHEN rn = (n * 25 + 99) // 100 THEN x END) AS q1,
        |   MIN(CASE WHEN rn = (n * 75 + 99) // 100 THEN x END) AS q3
        |  FROM ranked GROUP BY g),
        | bounds AS (SELECT g,
        |   q1 - 1.5 * (q3 - q1) AS lo_fence,
        |   q3 + 1.5 * (q3 - q1) AS hi_fence FROM qs)
        |SELECT b.g, count(*) AS n,
        | CAST(SUM(CASE WHEN b.x < bo.lo_fence OR b.x > bo.hi_fence
        |   THEN 1 ELSE 0 END) AS BIGINT) AS n_out,
        | MIN(bo.lo_fence) AS lo_fence, MIN(bo.hi_fence) AS hi_fence,
        | MIN(CASE WHEN b.x >= bo.lo_fence AND b.x <= bo.hi_fence
        |   THEN b.x END) AS kept_min,
        | MAX(CASE WHEN b.x >= bo.lo_fence AND b.x <= bo.hi_fence
        |   THEN b.x END) AS kept_max
        |FROM base b JOIN bounds bo ON b.g = bo.g
        |GROUP BY b.g""".stripMargin,

    "q173_quantile_norm" ->
      """WITH base AS (SELECT l_returnflag AS g, l_orderkey, l_linenumber,
        |   l_extendedprice AS x FROM lineitem),
        | gv AS (SELECT *, row_number() OVER
        |    (ORDER BY x, l_orderkey, l_linenumber) - 1 AS pos FROM base),
        | nn AS (SELECT count(*) AS nn FROM base),
        | grid AS (SELECT p, (p * (nn - 1)) // 100 AS pos
        |   FROM range(0, 101) t(p) CROSS JOIN nn),
        | ref AS (SELECT grid.p AS p, gv.x AS x_norm
        |   FROM gv JOIN grid USING (pos)),
        | ranked AS (SELECT *, row_number() OVER (PARTITION BY g
        |     ORDER BY x, l_orderkey, l_linenumber) AS rn,
        |   count(*) OVER (PARTITION BY g) AS ng FROM base),
        | withp AS (SELECT g, l_orderkey, l_linenumber, x,
        |   CASE WHEN ng > 1 THEN ((rn - 1) * 100) // (ng - 1)
        |     ELSE 0 END AS p FROM ranked)
        |SELECT g, l_orderkey, l_linenumber, x, p, x_norm
        |FROM withp JOIN ref USING (p)""".stripMargin,

    "q167_mad_dispersion" ->
      """WITH base AS (SELECT l_returnflag AS g, l_extendedprice AS x
        |   FROM lineitem),
        | r1 AS (SELECT *, row_number() OVER (PARTITION BY g ORDER BY x)
        |    AS rn, count(*) OVER (PARTITION BY g) AS n FROM base),
        | med AS (SELECT g,
        |   MIN(CASE WHEN rn = (n * 50 + 99) // 100 THEN x END) AS med
        |  FROM r1 GROUP BY g),
        | dev AS (SELECT b.g AS g, b.x, m.med, ABS(b.x - m.med) AS dev
        |  FROM base b JOIN med m ON m.g = b.g),
        | r2 AS (SELECT *, row_number() OVER (PARTITION BY g ORDER BY dev)
        |    AS rn, count(*) OVER (PARTITION BY g) AS n FROM dev),
        | mad AS (SELECT g,
        |   MIN(CASE WHEN rn = (n * 50 + 99) // 100 THEN dev END) AS mad
        |  FROM r2 GROUP BY g)
        |SELECT d.g AS g, count(*) AS n, MIN(d.med) AS med,
        | MIN(ma.mad) AS mad,
        | CAST(SUM(CASE WHEN d.dev <= ma.mad THEN 1 ELSE 0 END)
        |   AS BIGINT) AS n_core,
        | CAST(SUM(CASE WHEN d.dev > 1.5 * ma.mad THEN 1 ELSE 0 END)
        |   AS BIGINT) AS n_out
        |FROM dev d JOIN mad ma ON ma.g = d.g
        |GROUP BY d.g""".stripMargin,

    "q59_quantiles" ->
      s"""SELECT l_returnflag,
        | ${rndSql("QUANTILE_CONT(l_extendedprice, 0.25)", 2)} AS q25,
        | ${rndSql("QUANTILE_CONT(l_extendedprice, 0.5)", 2)} AS q50,
        | ${rndSql("QUANTILE_CONT(l_extendedprice, 0.75)", 2)} AS q75,
        | ${rndSql("QUANTILE_CONT(l_extendedprice, 0.99)", 2)} AS q99
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q83_approx_quantiles" -> {
      val rid = "CAST(l_orderkey AS VARCHAR) || ':' || " +
        "CAST(l_linenumber AS VARCHAR)"
      val keep = graft.functions.TextExpr.nibbleDuck(s"md5($rid)", 0)
      def pick(p: Int) =
        s"max(CASE WHEN rn = ((n - 1) * $p) // 100 + 1 THEN x END)"
      s"""WITH samp AS (SELECT l_returnflag, l_extendedprice AS x
        |   FROM lineitem WHERE $keep < 8),
        | r AS (SELECT l_returnflag, x,
        |   row_number() OVER (PARTITION BY l_returnflag ORDER BY x) AS rn,
        |   count(*) OVER (PARTITION BY l_returnflag) AS n FROM samp)
        |SELECT l_returnflag, ${pick(25)} AS q25, ${pick(50)} AS q50,
        | ${pick(75)} AS q75, ${pick(99)} AS q99
        |FROM r GROUP BY 1""".stripMargin
    },

    "q189_equidepth_hist" -> {
      val rid = "CAST(l_orderkey AS VARCHAR) || ':' || " +
        "CAST(l_linenumber AS VARCHAR)"
      val keep = graft.functions.TextExpr.nibbleDuck(s"md5($rid)", 0)
      val rankSet = (10 to 90 by 10)
        .map(p => s"rn = ((n - 1) * $p) // 100 + 1").mkString(" OR ")
      s"""WITH samp AS (SELECT l_extendedprice AS x
        |   FROM lineitem WHERE $keep < 8),
        | r AS (SELECT x, row_number() OVER (ORDER BY x) AS rn,
        |   count(*) OVER () AS n FROM samp),
        | ed AS (SELECT list_sort(list(DISTINCT x)) AS es FROM r
        |   WHERE $rankSet),
        | b AS (SELECT CAST(len(list_filter(ed.es,
        |     e -> l.l_extendedprice >= e)) AS INT) AS bin
        |   FROM lineitem l CROSS JOIN ed)
        |SELECT bin, count(*) AS n_rows FROM b GROUP BY 1""".stripMargin
    }
  )
}
