package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.RangeJoin

/** Range/interval-join inventory + the approximate-distinct surface.
  * The distinct sketches (q54 one-shot, q94 incremental) are the
  * deterministic md5-register HLL of functions.DetSketch, so BOTH are
  * fully oracle-gated; the engine-native `approx_count_distinct` /
  * `hll_union_agg` production spellings are pinned against exact counts
  * in OperatorSpec instead (the graft_ngrams-vs-declarative split).
  */
object Ranges {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.read(s, dir, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // keyed interval join: each event matched to the SAME user's signup
    // windows (1 hour after a signup) — equi key + range filter
    "q52_interval_keyed" -> ((s, d) => {
      val e = t(s, d, "events")
      val w = t(s, d, "events")
        .filter(col("event_type") === "signup")
        .select(col("user_id").as("w_user"), col("event_id").as("wid"),
          col("ts").as("ws"), (col("ts") + expr("INTERVAL 1 HOUR")).as("we"))
      RangeJoin.keyed(e, "user_id", "ts", w, "w_user", "ws", "we")
        .select(col("wid"), col("event_id"))
    }),

    // unkeyed interval join via time bucketing: all events falling into
    // any signup's 1-hour window
    "q53_interval_bucketed" -> ((s, d) => {
      val e = t(s, d, "events")
      val w = t(s, d, "events")
        .filter(col("event_type") === "signup")
        .select(col("event_id").as("wid"), col("ts").as("ws"),
          (col("ts") + expr("INTERVAL 1 HOUR")).as("we"))
      RangeJoin.bucketed(e, "ts", w, "ws", "we", granularitySecs = 3600L)
        .select(col("wid"), col("event_id"))
    }),

    // Interval-OVERLAP join (both sides intervals): pairs of signup
    // windows that intersect — scheduling/attribution conflicts, the
    // third member of the range-join family (q52 keyed point-in-
    // interval, q53 unkeyed point-in-interval). Canonical-bucket
    // assignment keeps exactly one match per pair with no dedup pass;
    // the oracle is the direct theta join.
    "q95_interval_overlap" -> ((s, d) => {
      val w = t(s, d, "events")
        .filter(col("event_type") === "signup")
      val a = w.select(col("event_id").as("ida"), col("ts").as("as_"),
        (col("ts") + expr("INTERVAL 1 HOUR")).as("ae"))
      val b = w.select(col("event_id").as("idb"), col("ts").as("bs"),
        (col("ts") + expr("INTERVAL 1 HOUR")).as("be"))
      RangeJoin.overlapBucketed(a, "as_", "ae", b, "bs", "be", 3600L)
        .filter(col("ida") < col("idb"))
        .select("ida", "idb")
    }),

    // Approximate distinct (reference's count_distinct is exact only;
    // this is the at-scale variant): the DETERMINISTIC md5-register HLL
    // (functions.DetSketch — integer-only harmonic mean + precomputed
    // linear-counting table), so DuckDB replays the identical registers
    // and the row is hash-gated. Register state is ≤ 256 rows per
    // group; the partial MAX combines map-side, so the shuffle carries
    // ≤ 256 rows per (partition, group) at any corpus size. The
    // engine-native approx_count_distinct stays the production
    // spelling (OperatorSpec pins it within tolerance of exact).
    "q54_approx_distinct" -> ((s, d) => {
      import graft.operators.Sketches
      val li = t(s, d, "lineitem")
      val est = Sketches.detEstimate(
        Sketches.detRegisters(li, Seq("l_returnflag"), "l_orderkey"),
        Seq("l_returnflag"), "approx_orders")
      val cnt = li.groupBy("l_returnflag").agg(count(lit(1)).as("cnt"))
      est.join(cnt, Seq("l_returnflag"))
    }),

    // INCREMENTAL distinct counting: per-batch register sketches
    // PERSISTED (the analytics twin of q85's persisted band index),
    // exercised as it would run in production — a register table built
    // from history (batches 0-2), then ONE new batch APPENDING only its
    // own registers (scanning just that batch, no recount of history),
    // then a MAX-merge at query time. Register union is exact over the
    // sketch lattice (MAX of MAXes = MAX of the union), so the merged
    // estimate equals a one-shot sketch over all events — which is
    // exactly what the DuckDB oracle computes, making the incremental
    // path hash-gated end to end. The engine-native hll_union_agg
    // spelling keeps its OperatorSpec parity pin.
    "q94_incr_distinct" -> ((s, d) => {
      import graft.operators.Sketches
      val ev = t(s, d, "events")
        .withColumn("b", pmod(col("event_id"), lit(4)))
      def regsOf(batches: org.apache.spark.sql.DataFrame) =
        Sketches.detRegisters(batches, Seq("b", "event_type"), "user_id")
      graft.sources.Tables.writeTable(
        regsOf(ev.filter(col("b") < 3)), "graft_det_registers")
      // the incremental step: the new batch's registers append — only
      // this batch is scanned, history stays untouched
      regsOf(ev.filter(col("b") === 3))
        .write.mode("append").format("parquet")
        .saveAsTable("graft_det_registers")
      Sketches.detEstimate(
        s.table("graft_det_registers")
          .groupBy("event_type", "rb").agg(max("rv").as("rv")),
        Seq("event_type"), "approx_users")
    }),

    // ---- q140: incremental rollup onto a persisted aggregate ----
    // The EXACT-additive twin of q94's sketch merge: hourly
    // (count, exact-cents sum) partials per event_type are persisted
    // from history (batches 0-2); ingesting the new batch scans ONLY
    // that batch, appends its partials, and the query-time merge
    // re-aggregates partials — never raw history. Counts and scaled-
    // integer sums are associative, so the merged rollup hash-matches
    // a full recompute (the oracle) exactly; the single final division
    // converts cents once. The materialized-view maintenance move every
    // metrics pipeline runs at 100 TB: history cost is paid once, each
    // delta costs only its own scan.
    "q140_incr_rollup" -> ((s, d) => {
      import graft.operators.Rollup
      val ev = t(s, d, "events")
        .withColumn("b", pmod(col("event_id"), lit(4)))
      graft.sources.Tables.writeTable(
        Rollup.hourlyPartials(ev.filter(col("b") < 3)), "graft_rollup_hist")
      Rollup.hourlyPartials(ev.filter(col("b") === 3))
        .write.mode("append").format("parquet")
        .saveAsTable("graft_rollup_hist")
      Rollup.mergePartials(s, "graft_rollup_hist")
    }),

    // ---- q142: STREAMING incremental rollup (foreachBatch) ----
    // q140's maintenance loop run as it runs in production: the delta
    // slice arrives as a file STREAM and each micro-batch appends only
    // its own partials via foreachBatch; additivity makes the merge
    // equal a full recompute regardless of micro-batch boundaries.
    // Same full-recompute oracle as q140 — hash-green proves the
    // streaming path byte-equivalent to both the batch path and the
    // one-shot aggregation.
    "q142_stream_rollup" -> ((s, d) =>
      graft.streaming.EventStreams.incrementalRollupStream(s, d)),

    // ---- q186: STREAMING incremental distinct (foreachBatch) ----
    // q94's register maintenance run as a stream (exactly q142 : q140):
    // each micro-batch appends only its own md5-register rows; MAX-
    // merge over the register lattice is associative, commutative AND
    // idempotent, so the estimate equals the one-shot sketch no matter
    // how the source chopped the delta into micro-batches — and a
    // replayed batch is harmless, which count-partials cannot claim.
    // Same one-shot oracle as q94.
    "q186_stream_distinct" -> ((s, d) =>
      graft.streaming.EventStreams.incrementalDistinctStream(s, d)),

    // ---- q187: sketch-cube reaggregation (hour -> day) ----
    // The "sketch cube" move every metrics stack runs at 100 TB:
    // hour-grain distinct-user registers are built ONCE from raw
    // events; the day grain is then derived by MAX-merging hour
    // registers — NO rescan of raw data, state ≤ M rows per (hour,
    // type). Plain counts can't do this (distinct isn't additive);
    // the register lattice makes coarse grains exact derivations of
    // fine ones, and the oracle (registers computed at day grain
    // directly) hash-proves that equality.
    "q187_sketch_reagg" -> ((s, d) => {
      import graft.operators.Sketches
      val ev = t(s, d, "events")
        .withColumn("hr", expr("date_trunc('hour', ts)"))
      val hourRegs = Sketches.detRegisters(
        ev, Seq("hr", "event_type"), "user_id")
      // day grain as TIMESTAMP (not DATE): the driver's canonicalizer
      // reads Spark DATE as python objects but DuckDB DATE as
      // datetime64 — the q140 time-grain convention
      val dayRegs = hourRegs
        .withColumn("day", expr("date_trunc('day', hr)"))
        .groupBy("day", "event_type", "rb").agg(max("rv").as("rv"))
      Sketches.detEstimate(dayRegs, Seq("day", "event_type"),
        "approx_users")
    }),

    // ---- q190: INCREMENTAL approximate quantiles ----
    // q94's maintenance story for ORDER statistics: the deterministic
    // md5 half-sample is a pure content-hash row predicate, so the
    // union of per-batch samples IS the sample of the union — persist
    // each batch's sample rows (batches 0-2 seed, batch 3 appends,
    // scanning only itself), then exact ranks over the merged sample
    // reproduce the one-shot q83 answer EXACTLY (same oracle). The
    // sample lattice is set-union where the register lattice is MAX —
    // both make incremental maintenance exact, which rank sketches
    // (GK/t-digest) only approximate.
    "q190_incr_quantiles" -> ((s, d) => {
      val li = t(s, d, "lineitem")
        .withColumn("rid",
          concat_ws(":", col("l_orderkey"), col("l_linenumber")))
        .withColumn("b", pmod(col("l_orderkey"), lit(4)))
      def sampOf(part: DataFrame) =
        graft.operators.Sampling.hashSample(part, "rid", 8)
          .select(col("l_returnflag"), col("l_extendedprice").as("x"))
      graft.sources.Tables.writeTable(
        sampOf(li.filter(col("b") < 3)), "graft_quant_samples")
      sampOf(li.filter(col("b") === 3))
        .write.mode("append").format("parquet")
        .saveAsTable("graft_quant_samples")
      val merged = s.table("graft_quant_samples")
      val ranked = merged
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("l_returnflag").orderBy("x")).cast("long"))
        .withColumn("n", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("l_returnflag")))
      def pick(p: Int) =
        max(when(expr(s"rn = ((n - 1) * $p) DIV 100 + 1"), col("x")))
      ranked.groupBy("l_returnflag").agg(
        pick(25).as("q25"), pick(50).as("q50"),
        pick(75).as("q75"), pick(99).as("q99"))
    }),

    // ---- q290: STREAMING approximate quantiles ----
    // The streaming face of q190's persisted half-sample, completing
    // the order-statistics lattice (q83 one-shot : q190 incremental :
    // q290 streaming — the q94 : q186 relationship on the set-union
    // sample lattice). Each micro-batch filters ITSELF with the pure
    // content-hash sample predicate and OVERWRITES its own
    // batch_id=<bid> partition (foreachBatch is at-least-once; the
    // overwrite makes a replayed batch rewrite identical rows in
    // place — this corpus's lineitem carries no unique row key to
    // dedup on instead); exact ranks over the merged sample
    // reproduce one-shot q83 — the gate shares q190's oracle
    // verbatim. See
    // EventStreams.streamingQuantilesStream for the scale shape.
    "q290_stream_quantiles" -> ((s, d) =>
      graft.streaming.EventStreams.streamingQuantilesStream(s, d)),

    // ---- q191: sketch set-operation cardinalities ----
    // The join-selectivity primitive a planner wants WITHOUT running
    // the join: distinct order-placing customers (A, from orders) and
    // registered customers (B, from customer) each as a register
    // sketch; |A∪B| from the MAX-merged registers (register union ≡
    // set union), |A∩B| by inclusion-exclusion, containment of B in A
    // in exact ppm of the estimates. Three bounded register tables and
    // three 1-row crossJoins — no join of the base tables anywhere.
    // Every number is the deterministic integer estimator, so DuckDB
    // replays the whole derivation bit-for-bit.
    "q191_sketch_set_ops" -> ((s, d) => {
      import graft.operators.Sketches.{detRegisters, detEstimate}
      val ra = detRegisters(
        t(s, d, "orders").select(col("o_custkey").as("v")), Seq(), "v")
      val rb = detRegisters(
        t(s, d, "customer").select(col("c_custkey").as("v")), Seq(), "v")
      val ru = ra.unionAll(rb).groupBy("rb").agg(max("rv").as("rv"))
      detEstimate(ra, Seq(), "n_a")
        .crossJoin(detEstimate(rb, Seq(), "n_b"))
        .crossJoin(detEstimate(ru, Seq(), "n_union"))
        .select(col("n_a"), col("n_b"), col("n_union"),
          expr("greatest(n_a + n_b - n_union, CAST(0 AS BIGINT))")
            .as("n_intersect"),
          expr("greatest(n_a + n_b - n_union, CAST(0 AS BIGINT))" +
            " * 1000000 DIV n_b").as("contained_ppm"))
    })
  )

  /** Full recompute over all events — the invariant BOTH rollup
    * maintenance paths (q140 batch, q142 streaming) must reproduce. */
  private val fullRollupSql: String =
    s"""SELECT CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP) AS hr, event_type,
      | COUNT(*) AS cnt,
      | ${graft.functions.DetMath.sumFixedSql("value", 2)} AS sum_val
      |FROM events GROUP BY 1, 2""".stripMargin

  /** DuckDB rendering of the deterministic register sketch over
    * `table`, grouped on the select-list `gSel` (aliased group columns,
    * referenced downstream as `gNames`), counting distinct `v` — the
    * exact mirror of Sketches.detRegisters + detEstimate. */
  private def detDistinctDuck(table: String, gSel: String, gNames: String,
      v: String, outCol: String): String = {
    import graft.functions.DetSketch._
    val nG = gNames.split(",").length
    val regsBy = (1 to nG + 1).mkString(", ")
    val estBy = (1 to nG).mkString(", ")
    s"""WITH h AS (SELECT $gSel, ${hDuck(v)} AS h FROM $table),
      | bw AS (SELECT $gNames, ${bucketDuck("h")} AS rb,
      |   ${wDuck("h")} AS w40 FROM h),
      | rk AS (SELECT $gNames, rb, ${rankCase("w40")} AS r FROM bw),
      | regs AS (SELECT $gNames, rb, max(r) AS rv FROM rk
      |   GROUP BY $regsBy)
      |SELECT $gNames, $estimateDuck AS $outCol FROM regs
      |GROUP BY $estBy""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    // one-shot register sketch, replayed bit-for-bit
    "q54_approx_distinct" ->
      s"""WITH est AS (${detDistinctDuck("lineitem", "l_returnflag",
            "l_returnflag", "l_orderkey", "approx_orders")}),
        | cnt AS (SELECT l_returnflag, count(*) AS cnt FROM lineitem
        |   GROUP BY 1)
        |SELECT e.l_returnflag, e.approx_orders, c.cnt
        |FROM est e JOIN cnt c USING (l_returnflag)""".stripMargin,

    // the MAX-merged incremental registers must equal the one-shot
    // sketch over ALL events (union exactness of the register lattice)
    "q94_incr_distinct" ->
      detDistinctDuck("events", "event_type", "event_type",
        "user_id", "approx_users"),

    // streaming maintenance must land on the identical one-shot sketch
    "q186_stream_distinct" ->
      detDistinctDuck("events", "event_type", "event_type",
        "user_id", "approx_users"),

    // day-grain registers computed DIRECTLY from events must equal the
    // Spark side's MAX-merge of hour-grain registers (lattice
    // coarsening exactness)
    "q187_sketch_reagg" ->
      detDistinctDuck("events",
        "CAST(DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)" +
          " AS day, event_type",
        "day, event_type", "user_id", "approx_users"),

    // the merged per-batch samples are exactly the one-shot half-sample
    // (content-hash predicate ⇒ union of samples = sample of union), so
    // the oracle is q83's one-shot sample quantiles verbatim
    "q190_incr_quantiles" -> {
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

    // the streamed-and-merged sample must land on the identical
    // one-shot half-sample quantiles (q190's oracle verbatim)
    "q290_stream_quantiles" -> {
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

    // the whole inclusion-exclusion derivation replayed on the same
    // registers
    "q191_sketch_set_ops" -> {
      import graft.functions.DetSketch._
      def regsCte(tag: String, table: String, v: String) =
        s"""h$tag AS (SELECT ${hDuck(v)} AS h FROM $table),
          | bw$tag AS (SELECT ${bucketDuck("h")} AS rb,
          |   ${wDuck("h")} AS w40 FROM h$tag),
          | rk$tag AS (SELECT rb, ${rankCase("w40")} AS r FROM bw$tag),
          | regs_$tag AS (SELECT rb, max(r) AS rv FROM rk$tag GROUP BY 1)""".stripMargin
      s"""WITH ${regsCte("a", "orders", "o_custkey")},
        | ${regsCte("b", "customer", "c_custkey")},
        | regs_u AS (SELECT rb, max(rv) AS rv FROM
        |   (SELECT * FROM regs_a UNION ALL SELECT * FROM regs_b)
        |   GROUP BY 1),
        | ea AS (SELECT $estimateDuck AS n_a FROM regs_a),
        | eb AS (SELECT $estimateDuck AS n_b FROM regs_b),
        | eu AS (SELECT $estimateDuck AS n_union FROM regs_u)
        |SELECT n_a, n_b, n_union,
        | greatest(n_a + n_b - n_union, 0) AS n_intersect,
        | CAST(greatest(n_a + n_b - n_union, 0) * 1000000 // n_b
        |   AS BIGINT) AS contained_ppm
        |FROM ea CROSS JOIN eb CROSS JOIN eu""".stripMargin
    },

    // the merged persisted rollup must equal a FULL recompute over all
    // events — the materialized-view maintenance invariant
    "q140_incr_rollup" -> fullRollupSql,
    // one oracle, two gates: the batch (q140) and streaming (q142)
    // maintenance paths must both equal the full recompute
    "q142_stream_rollup" -> fullRollupSql,

    "q95_interval_overlap" ->
      """WITH base AS (SELECT event_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
        | w AS (SELECT event_id AS wid, ts AS ws,
        |   ts + INTERVAL 1 HOUR AS we FROM base WHERE event_type = 'signup')
        |SELECT x.wid AS ida, y.wid AS idb
        |FROM w x JOIN w y
        | ON x.wid < y.wid AND x.ws < y.we AND y.ws < x.we""".stripMargin,

    "q52_interval_keyed" ->
      """WITH base AS (SELECT event_id, event_type, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        | w AS (SELECT user_id AS w_user, event_id AS wid, ts AS ws,
        |   ts + INTERVAL 1 HOUR AS we FROM base WHERE event_type = 'signup')
        |SELECT w.wid, e.event_id
        |FROM base e JOIN w
        | ON e.user_id = w.w_user AND e.ts >= w.ws AND e.ts < w.we""".stripMargin,
    "q53_interval_bucketed" ->
      """WITH base AS (SELECT event_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
        | w AS (SELECT event_id AS wid, ts AS ws, ts + INTERVAL 1 HOUR AS we
        |  FROM base WHERE event_type = 'signup')
        |SELECT w.wid, e.event_id
        |FROM w JOIN base e ON e.ts >= w.ws AND e.ts < w.we""".stripMargin
  )
}
