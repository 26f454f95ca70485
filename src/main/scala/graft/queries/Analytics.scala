package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.DetMath._

/** TPC-H-shaped analytics over the full star schema — multi-way join
  * chains, selective filters, and aggregation on top. These are the
  * plans that exercise Catalyst's join ordering + broadcast selection
  * across 3-5 tables, which the 2-table queries don't.
  */
object Analytics {

  /** q182's pinned profiling column list — shared by the Spark side and
    * the oracle so both always name the identical columns. */
  private val ProfileCols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
    "o_totalprice", "o_orderdate", "o_orderpriority")

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.read(s, dir, n)

  /** q215's fixed audit predicate: orders in Q1 1998. */
  private val PruneLo = "1998-01-01"
  private val PruneHi = "1998-04-01"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- q215: zone-map pruning audit (layout decides scan cost) ----
    // THE 100 TB scan lever: a reader skips a whole file when its
    // (min, max) column statistics exclude the predicate — but only a
    // layout that CLUSTERS the filter column makes those zone maps
    // tight. This audit computes per-shard date zone maps under two
    // layouts of the same orders table — 'keyrange' (arrival order,
    // shards of 2048 orderkeys) and 'month' (date-partitioned, the
    // q132 clustering move) — and, for a fixed quarter predicate,
    // reports which shards a stats-based reader skips plus the TRUE
    // match count (can_skip rows always show n_match = 0: the zone map
    // never lies, spec-pinned). On the random arrival layout every
    // shard spans most of the date range ⇒ ~zero skips; on the month
    // layout all but 3 shards skip — the measured argument for
    // date-partitioning a fact table. One pass per layout, two tiny
    // aggs, no joins.
    "q215_prune_audit" -> ((s, d) => {
      val o = t(s, d, "orders")
      def audit(layout: String, shard: Column): DataFrame =
        o.groupBy(lit(layout).as("layout"), shard.as("shard"))
          .agg(count(lit(1)).as("n_rows"),
            min("o_orderdate").as("dmin"), max("o_orderdate").as("dmax"),
            sum(when(col("o_orderdate") >= lit(PruneLo) &&
              col("o_orderdate") < lit(PruneHi), 1L).otherwise(0L))
              .as("n_match"))
          .withColumn("can_skip",
            col("dmax") < lit(PruneLo) || col("dmin") >= lit(PruneHi))
      audit("keyrange", expr("o_orderkey DIV 2048"))
        .unionAll(audit("month",
          (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
            .cast("long")))
    }),

    // ---- q255: EXISTS-shaped semi-join report (TPC-H Q4 shape) ----
    // Orders in one quarter counted per priority when AT LEAST ONE of
    // their lineitems shipped more than 90 days after the order date —
    // the late-fulfillment audit. The EXISTS spells as a LEFT SEMI join
    // with the date predicate inside the join condition, so each order
    // emits at most once with NO post-join dedup and the lineitem side
    // never materializes payload columns (Spark prunes it to the join
    // keys). One key-partitioned shuffle; the quarter filter prunes the
    // probe side at the scan. (TPC-H Q4 proper tests commit<receipt;
    // this corpus ships only l_shipdate, so lateness is vs order date.)
    "q255_late_orders" -> ((s, d) => {
      val o = t(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1997-07-01") &&
          col("o_orderdate") < lit("1997-10-01"))
      val l = t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_shipdate"))
      o.join(l,
          col("o_orderkey") === col("l_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAY"),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
    }),

    // ---- q285: suppliers who kept orders waiting (TPC-H Q21 shape) ----
    // The classic EXISTS + NOT-EXISTS double self-correlation — which
    // suppliers were the SOLE late shipper on a finished multi-supplier
    // order — re-expressed as ONE grouped pass instead of the textbook
    // pair of lineitem self-joins: per (order, supplier) compute a late
    // flag (max-when — late iff any of that supplier's lines shipped
    // >90 days after the order date, q255's lateness rule since this
    // corpus carries no commit/receipt dates), then per order count
    // suppliers and late suppliers; qualifying orders (>=2 suppliers,
    // exactly 1 late) join back to their late row. That is one shuffle
    // on the join key and two key-local aggregations — the double
    // self-join's second lineitem-sized shuffle never happens, and no
    // NOT EXISTS decorrelation is left to chance. The supplier-name
    // join is a broadcast-sized dim at any SF where suppliers fit (or
    // AQE's shuffle join where they don't).
    "q285_waiting_suppliers" -> ((s, d) => {
      val o = t(s, d, "orders")
        .filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_orderdate"))
      val los = t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
        .agg(max(when(col("l_shipdate") >
          col("o_orderdate") + expr("INTERVAL 90 DAY"), 1L)
          .otherwise(0L)).as("late"))
      val qual = los.groupBy("ok")
        .agg(count(lit(1)).as("n_sup"), sum("late").as("n_late"))
        .filter(col("n_sup") >= 2 && col("n_late") === 1)
        .select("ok")
      los.filter(col("late") === 1)
        .join(qual, "ok")
        .groupBy("sk").agg(count(lit(1)).as("numwait"))
        .join(t(s, d, "supplier"), col("sk") === col("s_suppkey"))
        .select(col("s_name"), col("numwait"))
    }),

    // ---- q286: sales opportunity (TPC-H Q22 shape) ----
    // Rich customers gone DORMANT (no order since 2000-01-01 — this
    // corpus has no order-less customers, so the classic "never
    // ordered" predicate would gate on an always-empty result),
    // rolled up by nation: the
    // scalar-subquery threshold (average positive balance) broadcasts
    // as a 1-row aggregate and the comparison cross-multiplies exact
    // cents (bal·n > sum — no float average ever materializes), the
    // "never ordered" is a LEFT ANTI join against the orders key
    // column only, and the nation dim broadcasts. One shuffle on
    // custkey (the anti join), one |nations|-row aggregate. Balances
    // aggregate as exact cents (DetMath.fixed) so both engines hash
    // the same BIGINTs.
    "q286_sales_opportunity" -> ((s, d) => {
      val avgPos = t(s, d, "customer")
        .select(fixed(col("c_acctbal"), 2).as("bal_c"))
        .filter(col("bal_c") > 0)
        .agg(sum("bal_c").as("s"), count(lit(1)).as("n"))
      // anti-join FIRST (it shrinks the customer side before anything
      // else touches it — also the order Catalyst picks for the NOT
      // EXISTS spelling, which SqlSurfaceSpec pins against this plan),
      // then compute cents once on the survivors.
      t(s, d, "customer")
        .join(t(s, d, "orders")
          .filter(col("o_orderdate") >= lit("2000-01-01"))
          .select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_nationkey"), fixed(col("c_acctbal"), 2).as("bal_c"))
        .crossJoin(broadcast(avgPos))
        .filter(col("bal_c") * col("n") > col("s"))
        .join(broadcast(t(s, d, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"))
        .agg(count(lit(1)).as("numcust"), sum("bal_c").as("tot_cents"))
    }),

    // ---- q287: small-quantity-order revenue (TPC-H Q17 shape) ----
    // The agg-then-join-back correlation: revenue from lineitems whose
    // quantity is under 20% of their part's average order quantity,
    // over one selective part slice (Brand#23, size < 10). The
    // correlated AVG decorrelates into a per-part (sum, count) agg
    // joined back to the same filtered fact rows, and the 0.2·avg
    // comparison cross-multiplies integers (5·qty·cnt < sum_q) so no
    // float average exists in either engine. The part filter reaches
    // the parquet scan; both lineitem passes run on the part-pruned
    // subset; revenue sums exact cents. One partkey shuffle, one 1-row
    // result.
    "q287_small_qty_revenue" -> ((s, d) => {
      val p = t(s, d, "part")
        .filter(col("p_brand") === "Brand#23" && col("p_size") < 10)
        .select("p_partkey")
      // project AFTER the part join so the cast/floor only run on the
      // part-pruned survivors (also the plan the SQL spelling
      // optimizes to — SqlSurfaceSpec pins the two together)
      val l = t(s, d, "lineitem")
        .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
        .join(p, col("l_partkey") === col("p_partkey"))
        .select(col("l_partkey"), col("l_quantity").cast("long").as("qty"),
          fixed(col("l_extendedprice"), 2).as("price_c"))
      val pa = l.groupBy("l_partkey")
        .agg(sum("qty").as("sum_q"), count(lit(1)).as("cnt"))
      l.join(pa, "l_partkey")
        .filter(col("qty") * col("cnt") * 5 < col("sum_q"))
        .agg(count(lit(1)).as("n_items"),
          sum("price_c").as("rev_cents"))
    }),

    // ---- q266: market share (TPC-H Q8 shape, 5-way star join) ----
    // Each ASIA nation's share of the region's yearly revenue — the
    // query shape that exercises Catalyst's join reordering across the
    // full star (lineitem⋈orders⋈customer⋈nation⋈region, dims
    // broadcast, region filter pruned into the build side). Revenue is
    // exact integer cents×(100−disc%); the share divides both sides by
    // 100 BEFORE the ppm cross-multiply so the product stays far from
    // BIGINT overflow at any corpus size — the identical truncation
    // runs in both engines, so the ppm hash-matches. Share window
    // partitions by year over the |nations|-bounded rollup.
    "q266_market_share" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window.partitionBy("yr")
      t(s, d, "lineitem")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, d, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        // revenue units summed INLINE in the agg (not via withColumn):
        // a pre-projected product and an in-agg product optimize to
        // different (if equivalent) plans, and the SQL spelling — whose
        // plan SqlSurfaceSpec pins to this one — can only express the
        // inline form.
        .groupBy(year(col("o_orderdate")).cast("long").as("yr"),
          col("n_name"))
        .agg(sum(fixed(col("l_extendedprice"), 2) *
          (lit(100L) - fixed(col("l_discount"), 2))).as("rev_u"))
        .withColumn("tot", sum("rev_u").over(w))
        .select(col("yr"), col("n_name"), col("rev_u"),
          expr("(rev_u DIV 100) * 1000000 DIV (tot DIV 100)")
            .as("share_ppm"))
    }),

    // ---- q265: A/B test two-proportion z-test (exact integers) ----
    // Purchase-rate difference between deterministic arms (event_id
    // parity) with the pooled two-proportion z-test decided by pure
    // integer cross-multiplication: z² > 3.8415 (95%) ⇔
    // (x1·n2 − x2·n1)²·N·10⁴ > 38415·n1·n2·X·(N−X) — the same
    // no-float-no-sqrt move as q156's 2σ test, but the products reach
    // ~1e26, so both engines compute them in exact wide arithmetic
    // (DECIMAL(38,0) here, HUGEINT in the oracle). One scan, one 1-row
    // conditional aggregate; the verdict is a boolean both engines
    // derive identically.
    "q265_ab_test" -> ((s, d) =>
      t(s, d, "events")
        .select(pmod(col("event_id"), lit(2)).as("arm"),
          when(col("event_type") === "purchase", 1L).otherwise(0L)
            .as("conv"))
        .agg(
          sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n1"),
          sum(when(col("arm") === 0, col("conv")).otherwise(0L)).as("x1"),
          sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n2"),
          sum(when(col("arm") === 1, col("conv")).otherwise(0L)).as("x2"))
        .select(col("n1"), col("x1"), col("n2"), col("x2"),
          expr("x1 * 1000000 DIV n1 - x2 * 1000000 DIV n2")
            .as("diff_ppm"),
          // widen INSIDE the cross-products (not around them): x1·n2
          // itself crosses 2^63 around 1e10 rows/arm, where non-ANSI
          // Spark wraps silently while DuckDB raises — no intermediate
          // may be computed in BIGINT.
          expr(
            "(CAST(x1 AS DECIMAL(38,0)) * n2 - CAST(x2 AS DECIMAL(38,0)) * n1) " +
              "* (CAST(x1 AS DECIMAL(38,0)) * n2 - CAST(x2 AS DECIMAL(38,0)) * n1) " +
              "* (n1 + n2) * 10000 > CAST(38415 AS DECIMAL(38,0)) " +
              "* n1 * n2 * (x1 + x2) * (n1 + n2 - x1 - x2)")
            .as("significant"))),

    // ---- q276: sample-ratio-mismatch (SRM) check for A/B arms ----
    // The guardrail every experimentation platform runs BEFORE reading
    // q265's z-test: do the arm sizes match the designed 50/50 split?
    // One-degree chi-square against N/2 expected, decided by the q265
    // integer cross-multiplication recipe — χ² = (n1−n2)²/N > 3.8415
    // ⇔ (n1−n2)²·10⁴ > 38415·N, widened in DECIMAL(38,0) so no
    // intermediate can wrap at any N. Two assignment schemes in one
    // report: the parity split (balanced by construction — SRM must
    // stay false) and a deliberately biased mod-3 split (the broken
    // randomizer SRM exists to catch — must flag). Unit = distinct
    // user, the grain arms are assigned at; one dedup + two 1-row
    // conditional aggregates, nothing grows with event volume.
    "q276_srm_check" -> ((s, d) => {
      val u = t(s, d, "events").select("user_id").distinct()
      def row(scheme: String, arm: org.apache.spark.sql.Column) =
        u.select(arm.as("arm"))
          .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n1"),
            sum(when(col("arm") =!= 0, 1L).otherwise(0L)).as("n2"))
          .select(lit(scheme).as("scheme"), col("n1"), col("n2"),
            expr("n1 * 1000000 DIV (n1 + n2)").as("share_ppm"),
            expr("CAST(n1 - n2 AS DECIMAL(38,0)) * (n1 - n2) * 10000 " +
              "> CAST(38415 AS DECIMAL(38,0)) * (n1 + n2)").as("srm"))
      row("parity", pmod(col("user_id"), lit(2)))
        .unionAll(row("mod3_biased",
          when(pmod(col("user_id"), lit(3)) === 0, lit(0L))
            .otherwise(lit(1L))))
    }),

    // ---- q260: top-k per group WITH TIES (dense_rank semantics) ----
    // The two best supplier balance TIERS per nation — dense_rank keeps
    // every supplier on a tied balance, the semantics row_number-based
    // top-k (q16/q77) silently truncates. No arithmetic on the double
    // key (raw parquet values order identically in both engines);
    // window partitions by nation.
    "q260_topk_ties" -> ((s, d) => {
      t(s, d, "supplier")
        .join(t(s, d, "nation"),
          col("s_nationkey") === col("n_nationkey"))
        .withColumn("rk",
          dense_rank().over(org.apache.spark.sql.expressions.Window
            .partitionBy("n_name").orderBy(col("s_acctbal").desc))
            .cast("long"))
        .filter(col("rk") <= 2)
        .select("n_name", "s_name", "s_acctbal", "rk")
    }),

    // ---- q247: PIVOT (long→wide), the inverse of q97's melt ----
    // Event counts by type × day-of-week, pivoted into one column per
    // weekday through Spark's native pivot with an EXPLICIT value list
    // (no extra distinct-values job, stable column order — the form
    // that scales, since an inferred pivot must first collect the
    // value domain to the driver). Spark's dayofweek is 1-based
    // Sunday=1; DuckDB's dayofweek is Sunday=0 — the −1 aligns them.
    // Absent (type, day) combos surface as 0 like the oracle's FILTER
    // counts. One shuffle on event_type; the pivot is map-side
    // conditional aggregation, exactly the oracle's FILTER spelling.
    "q247_pivot_dow" -> ((s, d) =>
      t(s, d, "events")
        .withColumn("dow", (dayofweek(col("ts")) - 1).cast("long"))
        .groupBy("event_type")
        .pivot("dow", Seq(0L, 1L, 2L, 3L, 4L, 5L, 6L))
        .agg(count(lit(1)))
        .na.fill(0L)
        .toDF("event_type", "d0", "d1", "d2", "d3", "d4", "d5", "d6")),

    // Rolling time-series frame (trailing mean over the last 3 OBSERVED
    // months of revenue per nation): the sliding ROWS frame q22/q64
    // don't cover. NOTE ROWS frames slide over existing rows — a month
    // with no orders is skipped, not zero-filled; calendar-window
    // semantics would need a RANGE frame or gap fill. The moving mean
    // divides an exact integer window SUM by the frame COUNT, so both
    // engines do the identical two IEEE ops.
    "q73_moving_avg" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val monthly = t(s, d, "orders")
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(t(s, d, "nation"), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"), date_trunc("month", col("o_orderdate")).as("mon"))
        .agg(sum(fixed(col("o_totalprice"), 2)).as("rev_cents"))
      val w = Window.partitionBy("n_name").orderBy("mon").rowsBetween(-2, 0)
      monthly.select(col("n_name"), col("mon"),
        (col("rev_cents") / 100.0).as("rev"),
        (sum(col("rev_cents")).over(w).cast("double") /
          (lit(100.0) * count(lit(1)).over(w))).as("rev_ma3"))
    }),

    // CALENDAR-window twin of q73: RANGE frame over a month index, so
    // the trailing mean covers the last 3 calendar months — a month
    // with no orders shrinks the window's row count instead of being
    // skipped (q73's ROWS frame slides over observed rows). This is
    // the RANGE-frame spelling q73's comment points to.
    "q91_moving_avg_cal" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val monthly = t(s, d, "orders")
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(t(s, d, "nation"), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"), date_trunc("month", col("o_orderdate")).as("mon"))
        .agg(sum(fixed(col("o_totalprice"), 2)).as("rev_cents"))
      val w = Window.partitionBy("n_name")
        .orderBy((year(col("mon")) * 12 + month(col("mon")) - 1).cast("long"))
        .rangeBetween(-2, 0)
      monthly.select(col("n_name"), col("mon"),
        (col("rev_cents") / 100.0).as("rev"),
        (sum(col("rev_cents")).over(w).cast("double") /
          (lit(100.0) * count(lit(1)).over(w))).as("rev_ma3_cal"))
    }),

    // Fuzzy string matching: blocked levenshtein pairs (classic entity
    // resolution). The blocking key is COMPOSED — noun x 8-char length
    // band — but both dimensions are drawn from FIXED vocabularies
    // (this corpus: 3 nouns x 3 bands = 9 blocks), so block size grows
    // O(N/9) and uncapped pair work O(N²/9): measured 4.7e9 candidate
    // pairs at sf1 — the query that could not finish the r10 sf1 sweep.
    // Fix is the same discipline as every other dedup self-join in the
    // tree: each HOME block (noun, band) is capped at BucketCap's 512
    // representatives via the shared distribution-independent keep
    // rule, bounding verify work to blocks x 3 x cap² regardless of N.
    // The cap is the identity at gate scale (sf0.01 max block = 261 <
    // 512), so hash-green still proves the ±1-band probe drops no
    // pairs: lev <= 2 bounds the length difference by 2 < 8, a
    // qualifying pair's bands differ by at most 1, and each left row
    // probes its own band ± 1 (each surviving pair matches exactly
    // once). The oracle mirrors the cap on the identical (noun, band)
    // sizes but blocks on the noun ALONE. The edit-distance DP is
    // integer-exact in both engines.
    "q78_fuzzy_pairs" -> ((s, d) => {
      val cap = graft.operators.BucketCap.DefaultCap
      val b0 = t(s, d, "part")
        .select(col("p_partkey").as("id"), col("p_name").as("nm"))
        .withColumn("noun", expr("split_part(nm, ' ', 2)"))
        .withColumn("band", expr("length(nm) DIV 8"))
      val sizes = b0.groupBy("noun", "band").agg(count(lit(1)).as("bsz"))
      val b = b0.join(sizes, Seq("noun", "band"))
        .filter(expr(graft.operators.BucketCap.keepSql("id", "bsz", cap)))
        .drop("bsz")
      val probes = b.withColumn("pb",
        explode(array(col("band") - 1, col("band"), col("band") + 1)))
      probes.as("x").join(b.as("y"),
          col("x.noun") === col("y.noun") && col("x.pb") === col("y.band") &&
            col("x.id") < col("y.id"))
        .withColumn("lev", levenshtein(col("x.nm"), col("y.nm")))
        .filter(col("lev") <= 2)
        .select(col("x.id").as("ida"), col("y.id").as("idb"), col("lev"))
    }),

    // Typed Aggregator surface, ORACLE-GATED (the custom-UDAF family
    // was spec-only before): TopKLong keeps only the k largest values
    // per group in its buffer (bounded state, the aggregation-side
    // TakeOrderedAndProject), running partial→final like any built-in
    // agg through the typed groupByKey API. Exact cent values so both
    // engines rank identical integers.
    "q96_typed_topk" -> ((s, d) => {
      import s.implicits._
      val cents = t(s, d, "lineitem")
        .select(col("l_returnflag"), fixed(col("l_extendedprice"), 2).as("cents"))
        .as[(String, Long)]
      val top3 = new graft.functions.TypedAggregators.TopKLong(3)
      cents.groupByKey(_._1).mapValues(_._2)
        .agg(top3.toColumn.name("tops"))
        .toDF("l_returnflag", "tops")
        .select(col("l_returnflag"),
          element_at(col("tops"), 1).as("top1"),
          element_at(col("tops"), 2).as("top2"),
          element_at(col("tops"), 3).as("top3"))
    }),

    // Grouped Pearson correlation from EXACT integer moments: quantity
    // (small ints) x discount (scaled to 0..10), so every moment sum
    // stays far under 2^63 at any SF and the final corr is the same
    // three IEEE ops on identical integers in both engines.
    "q79_corr_stats" -> ((s, d) =>
      t(s, d, "lineitem")
        .select(col("l_returnflag"),
          // Spark's cast truncates toward zero (its trunc() is the date
          // fn); the oracle spells CAST(TRUNC(x)) since DuckDB rounds
          col("l_quantity").cast("bigint").as("x"),
          fixed(col("l_discount"), 2).as("y"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum("x").as("sx"), sum("y").as("sy"),
          sum(expr("x*x")).as("sx2"), sum(expr("y*y")).as("sy2"),
          sum(expr("x*y")).as("sxy"))
        // combine moments in DOUBLE: each sum converts exactly (all
        // < 2^53 through SF in the thousands) and the products round
        // identically in both engines; an int64 n*sxy would overflow
        // once a group passes ~1.4e8 rows
        // degenerate-group guard (n=1 / constant measure): NULL in both
        // engines instead of Spark ANSI DIVIDE_BY_ZERO vs DuckDB NULL
        .select(col("l_returnflag"), col("n"),
          expr("""CASE WHEN (CAST(n AS DOUBLE)*CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)) <= 0
                    OR (CAST(n AS DOUBLE)*CAST(sy2 AS DOUBLE) - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE)) <= 0 THEN NULL
                 ELSE (CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE)) /
                 (SQRT(CAST(n AS DOUBLE)*CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)) *
                  SQRT(CAST(n AS DOUBLE)*CAST(sy2 AS DOUBLE) - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE))) END""")
            .as("corr_qd"))),

    // pandas describe() shape, deterministically: count/mean/std/min/max
    // per column from exact integer moments combined in DOUBLE (sample
    // std, ddof=1) — summary statistics without float-order drift.
    "q82_describe" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      def statsOf(colName: String, scaled: Column, scale: Double) =
        li.agg(
          lit(colName).as("column"),
          count(scaled).as("n"),
          sum(scaled).as("s"),
          sum(scaled * scaled).as("s2"),
          min(scaled).as("min_s"),
          max(scaled).as("max_s"))
        .select(col("column"), col("n"),
          (col("s").cast("double") / (lit(scale) * col("n").cast("double")))
            .as("mean"),
          (sqrt((col("n").cast("double") * col("s2").cast("double") -
            col("s").cast("double") * col("s").cast("double")) /
            (col("n").cast("double") * (col("n") - 1).cast("double"))) / scale)
            .as("std"),
          (col("min_s").cast("double") / scale).as("min_v"),
          (col("max_s").cast("double") / scale).as("max_v"))
      statsOf("l_quantity", col("l_quantity").cast("bigint"), 1.0)
        .union(statsOf("l_discount", fixed(col("l_discount"), 2), 100.0))
    }),

    // TPC-H Q1 shape: full pricing summary
    "q47_pricing_summary" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sumFixed(col("l_quantity"), 2).as("sum_qty"),
          sumFixed(col("l_extendedprice"), 2).as("sum_base_price"),
          (sum(fixed(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)) / 10000.0)
            .as("sum_disc_price"),
          (sum(fixed(col("l_extendedprice") * (lit(1) - col("l_discount")) *
            (lit(1) + col("l_tax")), 4)) / 10000.0).as("sum_charge"),
          avgFixed(col("l_quantity"), 2, 4).as("avg_qty"),
          avgFixed(col("l_extendedprice"), 2, 4).as("avg_price"),
          avgFixed(col("l_discount"), 2, 4).as("avg_disc"),
          count(lit(1)).as("count_order"))),

    // TPC-H Q3 shape: 3-way join, revenue top-10
    "q48_shipping_priority" -> ((s, d) => {
      val c = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, d, "orders")
        .filter(col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      val l = t(s, d, "lineitem")
        .filter(col("l_shipdate") > lit("1996-06-30").cast("timestamp"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg((sum(fixed(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)) / 10000.0)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // TPC-H Q5 shape: 5-way join through the region/nation dimensions
    "q49_local_supplier_volume" -> ((s, d) => {
      val r = t(s, d, "region").filter(col("r_name") === "ASIA")
      val n = t(s, d, "nation")
      val cu = t(s, d, "customer")
      val o = t(s, d, "orders")
      val l = t(s, d, "lineitem")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(cu, o("o_custkey") === cu("c_custkey"))
        .join(n, cu("c_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("n_name"))
        .agg((sum(fixed(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)) / 10000.0)
          .as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // TPC-H Q10 shape: returned-item customer ranking
    "q50_returned_items" -> ((s, d) => {
      val l = t(s, d, "lineitem").filter(col("l_returnflag") === "R")
      val o = t(s, d, "orders")
      val cu = t(s, d, "customer")
      val n = t(s, d, "nation")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(cu, o("o_custkey") === cu("c_custkey"))
        .join(n, cu("c_nationkey") === n("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg((sum(fixed(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)) / 10000.0)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // part/supplier join with LIKE filter (string predicate pushdown)
    "q51_part_supplier" -> ((s, d) => {
      val p = t(s, d, "part").filter(col("p_type").like("%ECO%"))
      val su = t(s, d, "supplier")
      val l = t(s, d, "lineitem")
      l.join(p, l("l_partkey") === p("p_partkey"))
        .join(su, l("l_suppkey") === su("s_suppkey"))
        .groupBy(col("p_brand"), col("s_name"))
        .agg(sumFixed(col("l_quantity"), 2).as("sum_qty"),
          count(lit(1)).as("cnt"))
    }),

    // ---- q138: chi-square independence (lang x source) ----
    // Is document language independent of its source? Observed counts
    // vs expected (row_total * col_total / N), with the expected value
    // and the per-cell chi-square term in exact parts-per-million
    // integer arithmetic: term = ((o*N - rt*ct)^2 DIV (rt*ct)) * 1e6
    // DIV N. Overflow bound: the squared deviation (o*N - rt*ct)^2 can
    // reach ~N^4/16 for a maximally skewed 2-cell table, so the exact
    // BIGINT path is safe to N ~= 1e5 rows worst-case (far above the
    // gated corpus; much higher when marginals are balanced). Beyond
    // that, the CELL table is still tiny — recompute the term there
    // with 128-bit arithmetic (DuckDB HUGEINT / Spark DECIMAL(38)) or
    // drop the ppm scale; the plan shape is unchanged.
    // Shape: one tiny hash agg, two re-aggs of the CELL table (never
    // the corpus), marginals broadcast back onto the cells. Cells with
    // zero observed count carry no row (gate covers observed cells).
    // ---- q181: Pareto frontier (skyline) over supplier aggregates ----
    // "Best suppliers by revenue AND breadth, no weighting": the
    // non-dominated set over (total cents, distinct parts supplied).
    // The skyline runs on the AGGREGATED supplier-cardinality table —
    // the corpus-size work is one hash agg; the dominance anti-join is
    // quadratic only in suppliers (always ≪ rows, and partitionable by
    // grid cells if a catalog ever outgrows one executor). Dominance
    // is the standard strict-in-at-least-one spelling, identical in
    // both engines, all-integer.
    "q181_pareto_frontier" -> ((s, d) => {
      val agg = t(s, d, "lineitem")
        .groupBy(col("l_suppkey"))
        .agg(sum(fixed(col("l_extendedprice"), 2)).as("cents"),
          countDistinct(col("l_partkey")).as("n_parts"))
      val dom = agg.select(col("cents").as("dc"), col("n_parts").as("dp"))
      agg.join(dom,
          col("dc") >= col("cents") && col("dp") >= col("n_parts") &&
            (col("dc") > col("cents") || col("dp") > col("n_parts")),
          "left_anti")
        .select("l_suppkey", "cents", "n_parts")
    }),

    // ---- q182: column profile (missingness + cardinality) ----
    // The per-column data-profiling pass a pipeline runs on an
    // unfamiliar table: null count and distinct cardinality for EVERY
    // column in ONE scan — Spark plans the multi-column
    // count(DISTINCT) through a single Expand (one pass, ×ncols
    // fan-out), then stack() unpivots the 1-row aggregate into the
    // (column, metric) report. At 100 TB swap the exact distincts for
    // approx_count_distinct (q54's sketch family) — the plan shape is
    // unchanged. Both this side and the oracle profile the SAME pinned
    // ProfileCols list (not o.columns), so a schema evolution in the
    // corpus surfaces as a compile-visible diff, not a silent gate
    // divergence.
    // ---- q201: distribution-drift audit between ingest batches ----
    // The monitoring gate every training-data pipeline puts between
    // "new batch landed" and "new batch admitted": does the value
    // distribution of the delta match history? Histogram both sides on
    // a fixed integer grid (floor(value) — fixed bins, not quantiles,
    // so the comparison needs no global sort), normalize to exact ppm
    // shares, and score the drift as the L1 distance Σ|p_hist - p_new|
    // (total-variation ×2 — the integer-exact cousin of PSI, which
    // needs ln and so can't be hash-gated). Plan: one (type, bin) hash
    // agg over the corpus, per-type totals as a window over the ≤101-
    // row bin table (never the raw data), one tiny final agg.
    "q201_dist_drift" -> ((s, d) => {
      val wt = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type")
      val bins = t(s, d, "events")
        .withColumn("b", pmod(col("event_id"), lit(4)))
        .withColumn("bin", floor(col("value")).cast("long"))
        .groupBy("event_type", "bin")
        .agg(sum(when(col("b") < 3, 1L).otherwise(0L)).as("ca"),
          sum(when(col("b") === 3, 1L).otherwise(0L)).as("cb"))
        .withColumn("ta", sum("ca").over(wt))
        .withColumn("tb", sum("cb").over(wt))
      bins
        .withColumn("pa", expr("ca * 1000000 DIV ta"))
        .withColumn("pb", expr("cb * 1000000 DIV tb"))
        .groupBy("event_type")
        .agg(max("ta").as("n_hist"), max("tb").as("n_new"),
          sum(abs(col("pa") - col("pb"))).as("l1_ppm"))
    }),

    "q182_column_profile" -> ((s, d) => {
      val o = t(s, d, "orders")
      val cols = ProfileCols
      val aggs = cols.flatMap(c => Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"null_$c"),
        countDistinct(col(c)).as(s"dist_$c")))
      val row = o.agg(aggs.head, aggs.drop(1): _*)
      val stack = cols.map(c => s"'$c', null_$c, dist_$c").mkString(", ")
      row.select(expr(
        s"stack(${cols.size}, $stack) AS (col_name, n_null, n_distinct)"))
    }),

    // ---- q183: per-group trend regression from exact moments ----
    // "Is this event type's daily volume growing?": least-squares
    // slope/intercept of daily cents against the day index, per type.
    // All five moments (n, Σx, Σy, Σxy, Σx²) accumulate as exact
    // BIGINTs — the same discipline as q79's correlation — and the
    // closed-form coefficients are each ONE IEEE division of two
    // BIGINTs, so both engines produce bit-identical doubles. Two hash
    // aggs (day grain, then type grain); nothing here is corpus-order
    // or partitioning dependent.
    "q183_trend_regression" -> ((s, d) => {
      val daily = t(s, d, "events")
        .groupBy(col("event_type"),
          expr("datediff(CAST(ts AS DATE), DATE'2024-01-01')").as("x"))
        .agg(sum(fixed(col("value"), 2)).as("y"))
      daily.groupBy("event_type")
        .agg(count(lit(1)).as("n_days"),
          sum("x").as("sx"), sum("y").as("sy"),
          sum(expr("x * y")).as("sxy"), sum(expr("x * x")).as("sx2"))
        .select(col("event_type"), col("n_days"),
          expr("CAST(n_days * sxy - sx * sy AS DOUBLE) / " +
            "CAST(n_days * sx2 - sx * sx AS DOUBLE)")
            .as("slope_cents_per_day"),
          expr("CAST(sy * sx2 - sx * sxy AS DOUBLE) / " +
            "CAST(n_days * sx2 - sx * sx AS DOUBLE)")
            .as("intercept_cents"))
    }),

    // ---- q174: corpus datasheet (one-query dataset card) ----
    // The "datasheet for datasets" summary a curation run publishes:
    // row counts for every table in the corpus plus the headline text
    // stats (token volume, language/source fan-out, exact-dup volume)
    // as one (metric, value) table. Each leg is a single count/sum agg
    // over one table — ten independent scans that parallelize freely
    // and union into a constant-size result at any corpus scale.
    "q174_corpus_datasheet" -> ((s, d) => {
      def rows(n: String) = t(s, d, n)
        .agg(lit(s"rows_$n").as("metric"), count(lit(1)).as("value"))
      val names = Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings")
      val docsT = {
        graft.functions.TextNative.register(s)
        t(s, d, "documents")
      }
      val extras = Seq(
        docsT.agg(lit("doc_tokens").as("metric"),
          sum(expr("size(graft_tokens(text))")).as("value")),
        docsT.agg(lit("doc_langs").as("metric"),
          countDistinct(col("lang")).as("value")),
        docsT.agg(lit("doc_sources").as("metric"),
          countDistinct(col("source")).as("value")),
        // docs sharing their exact text fingerprint with another doc
        graft.operators.Dedup.exactGroups(docsT, "doc_id", "text")
          .filter(col("n_docs") >= 2)
          .agg(lit("exact_dup_docs").as("metric"),
            coalesce(sum(col("n_docs")), lit(0L)).as("value")))
      (names.map(rows) ++ extras).reduce(_ unionAll _)
    }),

    "q138_chi2_independence" -> ((s, d) => {
      val o = Tables.read(s, d, "documents")
        .groupBy("lang", "source").agg(count(lit(1)).as("obs"))
      val rt = o.groupBy("lang").agg(sum("obs").as("rt"))
      val ct = o.groupBy("source").agg(sum("obs").as("ct"))
      val n = o.agg(sum("obs").as("n"))
      o.join(broadcast(rt), "lang").join(broadcast(ct), "source")
        .crossJoin(broadcast(n))
        .select(col("lang"), col("source"), col("obs"),
          expr("(rt * ct * 1000000) DIV n").as("e_ppm"),
          expr("(((obs * n - rt * ct) * (obs * n - rt * ct)) DIV (rt * ct))" +
            " * 1000000 DIV n").as("term_ppm"))
    }),

    // ---- q227: ABC revenue segmentation per market ----
    // Within each nation, rank customers by lifetime revenue and split
    // at 50% / 80% cumulative share — class A customers carry the
    // first half of the market's revenue, B the next 30%, C the tail
    // (the inventory-management ABC cut, the cumulative-share
    // complement of q181's skyline). All comparisons are integer
    // cross-multiplications of exact cents (cum·100 ≤ tot·50), the
    // report is |nation|×3 rows, and — unlike a global Pareto curve —
    // the running-sum window partitions by nation, so no single
    // reducer ever sees more than one market's customers. The
    // orders→customer join shuffles on the customer key both sides;
    // revenue is pre-aggregated to customer grain BEFORE the window,
    // so the sort input is customers, not orders.
    "q227_abc_segmentation" -> ((s, d) => {
      val W = org.apache.spark.sql.expressions.Window
      val rev = t(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(fixed(col("o_totalprice"), 2)).as("cents"))
      val cust = t(s, d, "customer")
        .select(col("c_custkey"), col("c_nationkey"))
      val wOrd = W.partitionBy("c_nationkey")
        .orderBy(col("cents").desc, col("c_custkey"))
      val wAll = W.partitionBy("c_nationkey")
      rev.join(cust, col("o_custkey") === col("c_custkey"))
        .withColumn("cum", sum("cents").over(wOrd))
        .withColumn("tot", sum("cents").over(wAll))
        .withColumn("cls",
          when(col("cum") * 100 <= col("tot") * 50, "A")
            .when(col("cum") * 100 <= col("tot") * 80, "B")
            .otherwise("C"))
        .groupBy("c_nationkey", "cls")
        .agg(count(lit(1)).as("n_customers"), sum("cents").as("cents"),
          max("tot").as("tot"))
        .select(col("c_nationkey"), col("cls"), col("n_customers"),
          col("cents"), expr("cents * 1000000 DIV tot").as("share_ppm"))
    }),

    // ---- q230: market-basket association rules over order baskets ----
    // Brand pairs bought together in one order: support, directional
    // confidence, and lift, all in exact ppm — the q144 association
    // read on the RELATIONAL side, with the full rule triple instead
    // of lift alone. The basket stream dedups to (order, brand) first;
    // the pair join is a self-join CO-PARTITIONED on l_orderkey (both
    // sides shuffle once on the same key, intra-order pairing is
    // local), and everything after is bounded by |brands|²: per-brand
    // basket counts broadcast, the 1-row basket total crossJoins (the
    // allow-listed q80/q144 shape). Same ppm integer bound as q144:
    // n_ab·N·1e6 needs N ≤ ~3e6 baskets; beyond that divide by n_a
    // before scaling.
    "q230_basket_rules" -> ((s, d) => {
      val ob = t(s, d, "lineitem")
        .join(t(s, d, "part").select(col("p_partkey"), col("p_brand")),
          col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("ok"), col("p_brand").as("brand"))
        .distinct()
      val nb = ob.groupBy("brand").agg(count(lit(1)).as("n_b"))
      val n = ob.agg(countDistinct("ok").as("n"))
      val pairs = ob.as("x")
        .join(ob.as("y"), col("x.ok") === col("y.ok") &&
          col("x.brand") < col("y.brand"))
        .select(col("x.brand").as("a"), col("y.brand").as("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("n_ab"))
        .filter(col("n_ab") >= 10)
      pairs
        .join(broadcast(nb.select(col("brand").as("a"),
          col("n_b").as("na"))), "a")
        .join(broadcast(nb.select(col("brand").as("b"),
          col("n_b").as("nb"))), "b")
        .crossJoin(broadcast(n))
        .select(col("a"), col("b"), col("n_ab"),
          expr("n_ab * 1000000 DIV n").as("support_ppm"),
          expr("n_ab * 1000000 DIV na").as("conf_ab_ppm"),
          expr("n_ab * 1000000 DIV nb").as("conf_ba_ppm"),
          expr("(n_ab * n * 1000000) DIV (na * nb)").as("lift_ppm"))
    }),

    // ---- q275: Apriori frequent triples (itemset mining, k = 3) ----
    // q230 stops at pairs; this runs the Apriori step up to 3-itemsets
    // with BOTH of its scale disciplines visible in the plan:
    // (1) candidate GENERATION is in-row — each basket collapses to
    // its sorted distinct-brand array (one shuffle to order grain,
    // basket size is the lineitem fan-in, single digits on this
    // schema) and the C(B,3) combinations are produced by a nested
    // transform/flatten INSIDE the row, so no third self-join and no
    // second corpus shuffle exists; (2) candidate PRUNING is the
    // Apriori downward-closure move — exploded triples are
    // semi-joined against the broadcast frequent-PAIR table on all
    // three sub-pairs BEFORE the counting aggregate, so the agg only
    // ever sees candidates whose every subset is frequent (the prune
    // is per-triple-identity, so it cannot change surviving counts —
    // which is what lets the oracle apply the same filter after its
    // count). Everything downstream of the basket agg is bounded by
    // |brands|³. Output: support and the {a,b} → c confidence in
    // exact ppm.
    "q275_apriori_triples" -> ((s, d) => {
      val ob = t(s, d, "lineitem")
        .join(t(s, d, "part").select(col("p_partkey"), col("p_brand")),
          col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("ok"), col("p_brand").as("brand"))
        .distinct()
      val n = ob.agg(countDistinct("ok").as("n"))
      val l2 = ob.as("x")
        .join(ob.as("y"), col("x.ok") === col("y.ok") &&
          col("x.brand") < col("y.brand"))
        .select(col("x.brand").as("a"), col("y.brand").as("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("n_ab"))
        .filter(col("n_ab") >= 10)
      val triples = ob.groupBy("ok")
        .agg(expr("array_sort(collect_list(brand))").as("bs"))
        .filter(size(col("bs")) >= 3)
        .select(explode(expr(
          "flatten(transform(sequence(1, size(bs) - 2), i -> " +
            "flatten(transform(sequence(i + 1, size(bs) - 1), j -> " +
            "transform(sequence(j + 1, size(bs)), k -> " +
            "struct(element_at(bs, i) AS a, element_at(bs, j) AS b, " +
            "element_at(bs, k) AS c))))))")).as("t"))
        .select(col("t.a").as("a"), col("t.b").as("b"), col("t.c").as("c"))
      triples
        .join(broadcast(l2.select(col("a").as("a"), col("b").as("c"))),
          Seq("a", "c"), "left_semi")
        .join(broadcast(l2.select(col("a").as("b"), col("b").as("c"))),
          Seq("b", "c"), "left_semi")
        .join(broadcast(l2.select(col("a"), col("b"),
          col("n_ab").as("nab"))), Seq("a", "b"))
        .groupBy("a", "b", "c")
        .agg(count(lit(1)).as("n_abc"), max("nab").as("nab"))
        .filter(col("n_abc") >= 10)
        .crossJoin(broadcast(n))
        .select(col("a"), col("b"), col("c"), col("n_abc"),
          expr("n_abc * 1000000 DIV n").as("support_ppm"),
          expr("n_abc * 1000000 DIV nab").as("conf_ab_c_ppm"))
    }),

    // ---- q231: Gini concentration of revenue per market ----
    // How unequal is each nation's customer revenue? The Lorenz-order
    // Gini in exact ppm via the rank form
    // G = (2·Σ rank·x − (n+1)·Σx) / (n·Σx), ranks ascending by
    // (cents, custkey) — the distribution-shape complement of q227's
    // ABC classes, same customer-aggregate grain, same
    // partitioned-by-nation window (no global sort). Equal incomes
    // give exactly 0. Integer bound: Σ rank·cents ~ n²·avg fits BIGINT
    // to ~1e6 customers/market at cents scale; shard hotter markets
    // before the window if a single market outgrows that.
    "q231_gini_concentration" -> ((s, d) => {
      val W = org.apache.spark.sql.expressions.Window
      val rev = t(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(fixed(col("o_totalprice"), 2)).as("cents"))
      val cust = t(s, d, "customer")
        .select(col("c_custkey"), col("c_nationkey"))
      val wRk = W.partitionBy("c_nationkey")
        .orderBy(col("cents"), col("c_custkey"))
      rev.join(cust, col("o_custkey") === col("c_custkey"))
        .withColumn("rk", row_number().over(wRk).cast("long"))
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_customers"), sum("cents").as("cents"),
          sum(expr("rk * cents")).as("ws"))
        .select(col("c_nationkey"), col("n_customers"), col("cents"),
          // DECIMAL(38,0) cross-multiply: 2*ws*1e6 passes 9.2e18 (the
          // BIGINT rail) already at sf0.1 — the r8 scale sweep caught
          // the long overflow. IntegralDivide on decimals is exact and
          // returns BIGINT; the oracle mirrors in HUGEINT (q265's move)
          expr("(CAST(2 AS DECIMAL(38,0)) * ws" +
            " - CAST(n_customers + 1 AS DECIMAL(38,0)) * cents)" +
            " * 1000000 DIV (CAST(n_customers AS DECIMAL(38,0)) * cents)")
            .as("gini_ppm"))
    }),

    // ---- q232: RFM segmentation per market ----
    // Customers cut into recency/frequency/monetary terciles WITHIN
    // their nation (1 = bottom third, 3 = top third on each axis:
    // 3/3/3 = recent + frequent + big spender), reported as the 27-cell
    // segment grid per market. Terciles are pure rank arithmetic —
    // (rn − 1)·3 DIV n + 1 with (value, custkey) orderings so ties
    // break identically in both engines; no percentile interpolation
    // anywhere. Like q227/q231 the grain is the customer AGGREGATE and
    // every window partitions by nation, so there is no global sort
    // and no reducer sees more than one market.
    "q232_rfm_segments" -> ((s, d) => {
      val W = org.apache.spark.sql.expressions.Window
      def terc(out: String, ord: Seq[org.apache.spark.sql.Column])(
          df: DataFrame): DataFrame =
        df.withColumn("rn", row_number()
            .over(W.partitionBy("c_nationkey").orderBy(ord: _*))
            .cast("long"))
          .withColumn(out, expr("(rn - 1) * 3 DIV nn + 1"))
          .drop("rn")
      val g = t(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(max("o_orderdate").as("last_d"),
          count(lit(1)).as("n_orders"),
          sum(fixed(col("o_totalprice"), 2)).as("cents"))
        .join(t(s, d, "customer")
          .select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .withColumn("nn", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("c_nationkey")))
      val scored = Seq(
        ("r_score", Seq(col("last_d"), col("c_custkey"))),
        ("f_score", Seq(col("n_orders"), col("c_custkey"))),
        ("m_score", Seq(col("cents"), col("c_custkey"))))
        .foldLeft(g) { case (df, (out, ord)) => terc(out, ord)(df) }
      scored.groupBy("c_nationkey", "r_score", "f_score", "m_score")
        .agg(count(lit(1)).as("n_customers"), sum("cents").as("cents"))
    }),

    // ---- q236: functional-dependency audit (FD discovery) ----
    // Does column A determine column B? For each audited (det → dep)
    // pair: distinct determinant values, how many have MORE than one
    // dependent variant (FD violations), and the worst variant count —
    // the data-profiling pass behind key discovery and normalization
    // checks (q182's profile tells you cardinality; this tells you
    // STRUCTURE). o_orderkey → o_custkey is the deliberate positive
    // control (a real key, 0 violations). Each audit is one two-phase
    // agg shuffled on its determinant, the report is one row per
    // audit, and audits union — nothing scales past the widest
    // determinant cardinality.
    "q236_fd_audit" -> ((s, d) => {
      def fd(df: DataFrame, tbl: String, det: String,
          dep: String): DataFrame =
        df.groupBy(col(det))
          .agg(countDistinct(col(dep)).as("v"))
          .agg(count(lit(1)).as("n_keys"),
            sum(when(col("v") > 1, 1L).otherwise(0L)).as("n_violating"),
            max("v").as("max_variants"))
          .select(lit(tbl).as("tbl"), lit(det).as("det"),
            lit(dep).as("dep"), col("n_keys"), col("n_violating"),
            col("max_variants"))
      fd(t(s, d, "orders"), "orders", "o_orderkey", "o_custkey")
        .unionAll(fd(t(s, d, "orders"), "orders", "o_custkey",
          "o_orderpriority"))
        .unionAll(fd(t(s, d, "customer"), "customer", "c_nationkey",
          "c_mktsegment"))
        .unionAll(fd(t(s, d, "lineitem"), "lineitem", "l_orderkey",
          "l_suppkey"))
        .unionAll(fd(t(s, d, "part"), "part", "p_brand", "p_type"))
    }),

    // ---- q237: order-fulfillment accumulating snapshot ----
    // The warehouse accumulating-snapshot read: per order, first and
    // last line shipment collapse out of lineitem (one agg on
    // l_orderkey), then per (priority, order month): order count, mean
    // order→first-ship lag and first→last-ship span in exact
    // centi-days (sum·100 DIV n — no float mean), and the worst span.
    // Both shuffles key on the order: lineitem reduces BEFORE the join
    // so the join carries order-grain rows, and the report is
    // |priorities|×months rows.
    "q237_fulfillment_snapshot" -> ((s, d) => {
      val li = t(s, d, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(min("l_shipdate").as("first_ship"),
          max("l_shipdate").as("last_ship"))
      t(s, d, "orders")
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderpriority"),
          date_trunc("month", col("o_orderdate")).as("mon"),
          datediff(col("first_ship"), col("o_orderdate")).cast("long")
            .as("lag_d"),
          datediff(col("last_ship"), col("first_ship")).cast("long")
            .as("span_d"))
        .groupBy("o_orderpriority", "mon")
        .agg(count(lit(1)).as("n_orders"),
          sum("lag_d").as("sl"), sum("span_d").as("ss"),
          max("span_d").as("max_span_d"))
        .select(col("o_orderpriority"), col("mon"), col("n_orders"),
          expr("sl * 100 DIV n_orders").as("lag_cdays"),
          expr("ss * 100 DIV n_orders").as("span_cdays"),
          col("max_span_d"))
    }),

    // ---- q241: hierarchical revenue shares (nation within region) ----
    // Percent-of-parent contribution analytics over the geo hierarchy:
    // each nation's revenue as ppm of its REGION and of the WORLD.
    // Orders pre-aggregate to customer grain before touching the
    // (tiny, broadcast) nation/region dims; the region subtotal is a
    // window over the |nations| rollup partitioned by region, and only
    // the 1-row grand total crossJoins (allow-listed q80 shape).
    "q241_geo_rollup_shares" -> ((s, d) => {
      val W = org.apache.spark.sql.expressions.Window
      val cents = t(s, d, "orders")
        .groupBy("o_custkey")
        .agg(sum(fixed(col("o_totalprice"), 2)).as("cents"))
      val geo = t(s, d, "customer")
        .select(col("c_custkey"), col("c_nationkey"))
        .join(broadcast(t(s, d, "nation")
          .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")
          .select(col("r_regionkey"), col("r_name"))),
          col("n_regionkey") === col("r_regionkey"))
      val perNation = cents
        .join(geo, col("o_custkey") === col("c_custkey"))
        .groupBy("r_name", "n_name").agg(sum("cents").as("cents"))
      val tot = perNation.agg(sum("cents").as("gt"))
      perNation
        .withColumn("rt", sum("cents").over(W.partitionBy("r_name")))
        .crossJoin(broadcast(tot))
        .select(col("r_name"), col("n_name"), col("cents"),
          expr("cents * 1000000 DIV rt").as("share_region_ppm"),
          expr("cents * 1000000 DIV gt").as("share_global_ppm"))
    })
  )

  /** Monthly revenue per nation — shared by q73 (ROWS frame) and q91
    * (RANGE frame) so the two framings stay comparable. */
  private val monthlyCte: String =
    s"""monthly AS (
      | SELECT n_name, DATE_TRUNC('month', o_orderdate) AS mon,
      |   CAST(SUM(${fixedSql("o_totalprice", 2)}) AS BIGINT) AS rev_cents
      | FROM orders
      | JOIN customer ON o_custkey = c_custkey
      | JOIN nation ON c_nationkey = n_nationkey
      | GROUP BY 1, 2)""".stripMargin

  private val discPrice4 = fixedSql("l_extendedprice * (1 - l_discount)", 4)
  private val charge4 =
    fixedSql("l_extendedprice * (1 - l_discount) * (1 + l_tax)", 4)

  val oracles: Map[String, String] = Map(
    "q215_prune_audit" ->
      s"""WITH k AS (SELECT 'keyrange' AS layout,
        |   o_orderkey // 2048 AS shard, o_orderdate FROM orders),
        | m AS (SELECT 'month' AS layout,
        |   CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
        |     AS shard, o_orderdate FROM orders),
        | u AS (SELECT * FROM k UNION ALL SELECT * FROM m),
        | g AS (SELECT layout, shard, count(*) AS n_rows,
        |   MIN(o_orderdate) AS dmin, MAX(o_orderdate) AS dmax,
        |   CAST(SUM(CASE WHEN o_orderdate >= TIMESTAMP '$PruneLo'
        |     AND o_orderdate < TIMESTAMP '$PruneHi'
        |     THEN 1 ELSE 0 END) AS BIGINT) AS n_match
        |  FROM u GROUP BY 1, 2)
        |SELECT layout, shard, n_rows, dmin, dmax, n_match,
        | (dmax < TIMESTAMP '$PruneLo' OR dmin >= TIMESTAMP '$PruneHi')
        |   AS can_skip
        |FROM g""".stripMargin,

    "q266_market_share" ->
      s"""WITH j AS (SELECT year(o_orderdate) AS yr, n_name,
        |   ${fixedSql("l_extendedprice", 2)}
        |     * (100 - ${fixedSql("l_discount", 2)}) AS rev_u
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'ASIA'),
        | g AS (SELECT CAST(yr AS BIGINT) AS yr, n_name,
        |   CAST(SUM(rev_u) AS BIGINT) AS rev_u
        |  FROM j GROUP BY 1, 2),
        | t AS (SELECT *, CAST(SUM(rev_u) OVER (PARTITION BY yr)
        |   AS BIGINT) AS tot FROM g)
        |SELECT yr, n_name, rev_u,
        | (rev_u // 100) * 1000000 // (tot // 100) AS share_ppm
        |FROM t""".stripMargin,

    "q265_ab_test" ->
      """WITH e AS (SELECT event_id % 2 AS arm,
        |   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv
        |  FROM events),
        | a AS (SELECT
        |   CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |   CAST(SUM(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT) AS x1,
        |   CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        |   CAST(SUM(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT) AS x2
        |  FROM e)
        |SELECT n1, x1, n2, x2,
        | x1 * 1000000 // n1 - x2 * 1000000 // n2 AS diff_ppm,
        | (CAST(x1 AS HUGEINT) * n2 - CAST(x2 AS HUGEINT) * n1)
        |   * (CAST(x1 AS HUGEINT) * n2 - CAST(x2 AS HUGEINT) * n1)
        |   * (n1 + n2) * 10000 > CAST(38415 AS HUGEINT)
        |   * n1 * n2 * (x1 + x2) * (n1 + n2 - x1 - x2) AS significant
        |FROM a""".stripMargin,

    "q260_topk_ties" ->
      """WITH r AS (SELECT n_name, s_name, s_acctbal,
        |   CAST(dense_rank() OVER (PARTITION BY n_name
        |     ORDER BY s_acctbal DESC) AS BIGINT) AS rk
        |  FROM supplier JOIN nation ON s_nationkey = n_nationkey)
        |SELECT n_name, s_name, s_acctbal, rk FROM r WHERE rk <= 2""".stripMargin,

    "q255_late_orders" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-07-01'
        |  AND o_orderdate < TIMESTAMP '1997-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
        |GROUP BY 1""".stripMargin,

    "q285_waiting_suppliers" ->
      """WITH los AS (SELECT l_orderkey AS ok, l_suppkey AS sk,
        |   MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
        |     THEN 1 ELSE 0 END) AS late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F' GROUP BY 1, 2),
        | qual AS (SELECT ok FROM los GROUP BY ok
        |  HAVING count(*) >= 2 AND SUM(late) = 1),
        | w AS (SELECT sk, CAST(count(*) AS BIGINT) AS numwait
        |  FROM los JOIN qual USING (ok) WHERE late = 1 GROUP BY 1)
        |SELECT s_name, numwait FROM w JOIN supplier ON sk = s_suppkey""".stripMargin,

    "q286_sales_opportunity" ->
      s"""WITH c AS (SELECT c_custkey, c_nationkey,
        |   ${fixedSql("c_acctbal", 2)} AS bal_c FROM customer),
        | a AS (SELECT CAST(SUM(bal_c) AS BIGINT) AS s,
        |   CAST(count(*) AS BIGINT) AS n FROM c WHERE bal_c > 0),
        | rich AS (SELECT c.* FROM c, a WHERE bal_c * n > s),
        | nc AS (SELECT rich.* FROM rich
        |  WHERE NOT EXISTS (SELECT 1 FROM orders
        |    WHERE o_custkey = rich.c_custkey
        |      AND o_orderdate >= TIMESTAMP '2000-01-01'))
        |SELECT n_name AS nation, CAST(count(*) AS BIGINT) AS numcust,
        | CAST(SUM(bal_c) AS BIGINT) AS tot_cents
        |FROM nc JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1""".stripMargin,

    "q287_small_qty_revenue" ->
      s"""WITH l AS (SELECT l_partkey,
        |   CAST(l_quantity AS BIGINT) AS qty,
        |   ${fixedSql("l_extendedprice", 2)} AS price_c
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_brand = 'Brand#23' AND p_size < 10),
        | pa AS (SELECT l_partkey, CAST(SUM(qty) AS BIGINT) AS sum_q,
        |   CAST(count(*) AS BIGINT) AS cnt FROM l GROUP BY 1)
        |SELECT CAST(count(*) AS BIGINT) AS n_items,
        | CAST(SUM(price_c) AS BIGINT) AS rev_cents
        |FROM l JOIN pa USING (l_partkey)
        |WHERE qty * cnt * 5 < sum_q""".stripMargin,

    "q247_pivot_dow" ->
      """SELECT event_type,
        | count(*) FILTER (WHERE dayofweek(ts) = 0) AS d0,
        | count(*) FILTER (WHERE dayofweek(ts) = 1) AS d1,
        | count(*) FILTER (WHERE dayofweek(ts) = 2) AS d2,
        | count(*) FILTER (WHERE dayofweek(ts) = 3) AS d3,
        | count(*) FILTER (WHERE dayofweek(ts) = 4) AS d4,
        | count(*) FILTER (WHERE dayofweek(ts) = 5) AS d5,
        | count(*) FILTER (WHERE dayofweek(ts) = 6) AS d6
        |FROM events GROUP BY 1""".stripMargin,

    "q201_dist_drift" ->
      """WITH bins AS (SELECT event_type,
        |   CAST(FLOOR(value) AS BIGINT) AS bin,
        |   CAST(SUM(CASE WHEN event_id % 4 < 3 THEN 1 ELSE 0 END)
        |     AS BIGINT) AS ca,
        |   CAST(SUM(CASE WHEN event_id % 4 = 3 THEN 1 ELSE 0 END)
        |     AS BIGINT) AS cb
        |  FROM events GROUP BY 1, 2),
        | w AS (SELECT *,
        |   CAST(SUM(ca) OVER (PARTITION BY event_type) AS BIGINT) AS ta,
        |   CAST(SUM(cb) OVER (PARTITION BY event_type) AS BIGINT) AS tb
        |  FROM bins)
        |SELECT event_type, max(ta) AS n_hist, max(tb) AS n_new,
        | CAST(SUM(ABS(ca * 1000000 // ta - cb * 1000000 // tb))
        |   AS BIGINT) AS l1_ppm
        |FROM w GROUP BY 1""".stripMargin,

    "q181_pareto_frontier" ->
      s"""WITH agg AS (SELECT l_suppkey,
        |   CAST(SUM(${fixedSql("l_extendedprice", 2)}) AS BIGINT) AS cents,
        |   count(DISTINCT l_partkey) AS n_parts
        |  FROM lineitem GROUP BY 1)
        |SELECT s.l_suppkey, s.cents, s.n_parts FROM agg s
        |WHERE NOT EXISTS (SELECT 1 FROM agg t
        |  WHERE t.cents >= s.cents AND t.n_parts >= s.n_parts
        |    AND (t.cents > s.cents OR t.n_parts > s.n_parts))""".stripMargin,

    "q183_trend_regression" ->
      s"""WITH daily AS (SELECT event_type,
        |   date_diff('day', DATE '2024-01-01',
        |     CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS x,
        |   CAST(SUM(${fixedSql("value", 2)}) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        | m AS (SELECT event_type, COUNT(*) AS n_days,
        |   CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |   CAST(SUM(x * y) AS BIGINT) AS sxy,
        |   CAST(SUM(x * x) AS BIGINT) AS sx2
        |  FROM daily GROUP BY 1)
        |SELECT event_type, n_days,
        | CAST(n_days * sxy - sx * sy AS DOUBLE)
        |   / CAST(n_days * sx2 - sx * sx AS DOUBLE) AS slope_cents_per_day,
        | CAST(sy * sx2 - sx * sxy AS DOUBLE)
        |   / CAST(n_days * sx2 - sx * sx AS DOUBLE) AS intercept_cents
        |FROM m""".stripMargin,

    "q182_column_profile" -> {
      val cols = ProfileCols
      cols.map(c =>
        s"""SELECT '$c' AS col_name, COUNT(*) - COUNT($c) AS n_null,
           | COUNT(DISTINCT $c) AS n_distinct FROM orders""".stripMargin)
        .mkString("\nUNION ALL ")
    },

    "q174_corpus_datasheet" -> {
      import graft.functions.TextExpr.{fingerprintDuck, toksDuck}
      val names = Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings")
      val rowLegs = names.map(n =>
        s"SELECT 'rows_$n' AS metric, count(*) AS value FROM $n")
      (rowLegs ++ Seq(
        s"""SELECT 'doc_tokens', CAST(SUM(len(${toksDuck("text")}))
           |  AS BIGINT) FROM documents""".stripMargin,
        "SELECT 'doc_langs', count(DISTINCT lang) FROM documents",
        "SELECT 'doc_sources', count(DISTINCT source) FROM documents",
        s"""SELECT 'exact_dup_docs', COALESCE(CAST(SUM(n_docs) AS BIGINT), 0)
           |FROM (SELECT count(*) AS n_docs FROM (SELECT
           |    ${fingerprintDuck(toksDuck("text"))} AS fp FROM documents)
           |  GROUP BY fp HAVING count(*) >= 2)""".stripMargin))
        .mkString("\nUNION ALL ")
    },

    "q138_chi2_independence" ->
      """WITH o AS (SELECT lang, source, count(*) AS obs FROM documents
        |   GROUP BY 1, 2),
        | rt AS (SELECT lang, CAST(SUM(obs) AS BIGINT) AS rt FROM o
        |   GROUP BY 1),
        | ct AS (SELECT source, CAST(SUM(obs) AS BIGINT) AS ct FROM o
        |   GROUP BY 1),
        | nn AS (SELECT CAST(SUM(obs) AS BIGINT) AS n FROM o)
        |SELECT o.lang, o.source, o.obs,
        | (rt.rt * ct.ct * 1000000) // nn.n AS e_ppm,
        | (((o.obs * nn.n - rt.rt * ct.ct) * (o.obs * nn.n - rt.rt * ct.ct))
        |   // (rt.rt * ct.ct)) * 1000000 // nn.n AS term_ppm
        |FROM o JOIN rt USING (lang) JOIN ct USING (source)
        | CROSS JOIN nn""".stripMargin,

    "q82_describe" -> {
      def duckStats(colName: String, scaledExpr: String, scale: String) =
        s"""SELECT '$colName' AS column, COUNT(x) AS n,
          | CAST(SUM(x) AS DOUBLE) / ($scale * CAST(COUNT(x) AS DOUBLE)) AS mean,
          | SQRT((CAST(COUNT(x) AS DOUBLE) * CAST(SUM(x*x) AS DOUBLE) -
          |   CAST(SUM(x) AS DOUBLE) * CAST(SUM(x) AS DOUBLE)) /
          |   (CAST(COUNT(x) AS DOUBLE) * CAST(COUNT(x) - 1 AS DOUBLE))) / $scale AS std,
          | CAST(MIN(x) AS DOUBLE) / $scale AS min_v,
          | CAST(MAX(x) AS DOUBLE) / $scale AS max_v
          |FROM (SELECT $scaledExpr AS x FROM lineitem)""".stripMargin
      duckStats("l_quantity", "CAST(TRUNC(l_quantity) AS BIGINT)", "1.0") +
        "\nUNION ALL\n" +
        duckStats("l_discount", fixedSql("l_discount", 2), "100.0")
    },

    // Blocks on the noun ALONE (no length band): matching the Spark
    // result hash-for-hash proves the composed noun+band+neighbor-probe
    // plan recalls every within-noun lev<=2 pair.
    "q78_fuzzy_pairs" ->
      s"""WITH b0 AS (SELECT p_partkey AS id, p_name AS nm,
        |  split_part(p_name, ' ', 2) AS blk,
        |  length(p_name) // 8 AS band FROM part),
        | sz AS (SELECT blk, band, count(*) AS bsz FROM b0 GROUP BY 1, 2),
        | b AS (SELECT b0.id, b0.nm, b0.blk FROM b0
        |  JOIN sz ON b0.blk = sz.blk AND b0.band = sz.band
        |  WHERE ${graft.operators.BucketCap.keepDuck(
                   "b0.id", "sz.bsz", graft.operators.BucketCap.DefaultCap)})
        |SELECT x.id AS ida, y.id AS idb, levenshtein(x.nm, y.nm) AS lev
        |FROM b x JOIN b y ON x.blk = y.blk AND x.id < y.id
        |WHERE levenshtein(x.nm, y.nm) <= 2""".stripMargin,

    "q96_typed_topk" ->
      s"""WITH c AS (SELECT l_returnflag,
        |   ${fixedSql("l_extendedprice", 2)} AS cents FROM lineitem),
        | l AS (SELECT l_returnflag,
        |   list(cents ORDER BY cents DESC) AS xs FROM c GROUP BY l_returnflag)
        |SELECT l_returnflag, CAST(xs[1] AS BIGINT) AS top1,
        | CAST(xs[2] AS BIGINT) AS top2, CAST(xs[3] AS BIGINT) AS top3
        |FROM l""".stripMargin,

    "q79_corr_stats" ->
      s"""WITH m AS (SELECT l_returnflag,
        |  CAST(TRUNC(l_quantity) AS BIGINT) AS x,
        |  ${fixedSql("l_discount", 2)} AS y FROM lineitem),
        | agg AS (SELECT l_returnflag, COUNT(*) AS n,
        |  CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |  CAST(SUM(x*x) AS BIGINT) AS sx2, CAST(SUM(y*y) AS BIGINT) AS sy2,
        |  CAST(SUM(x*y) AS BIGINT) AS sxy
        | FROM m GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        | CASE WHEN (CAST(n AS DOUBLE)*CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)) <= 0
        |   OR (CAST(n AS DOUBLE)*CAST(sy2 AS DOUBLE) - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE)) <= 0 THEN NULL
        | ELSE (CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE)) /
        |  (SQRT(CAST(n AS DOUBLE)*CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)) *
        |   SQRT(CAST(n AS DOUBLE)*CAST(sy2 AS DOUBLE) - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE))) END AS corr_qd
        |FROM agg""".stripMargin,

    "q73_moving_avg" ->
      s"""WITH $monthlyCte
        |SELECT n_name, mon, rev_cents / 100.0 AS rev,
        | CAST(SUM(rev_cents) OVER w AS DOUBLE) / (100.0 * COUNT(*) OVER w) AS rev_ma3
        |FROM monthly
        |WINDOW w AS (PARTITION BY n_name ORDER BY mon
        |  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)""".stripMargin,

    "q91_moving_avg_cal" ->
      s"""WITH $monthlyCte,
        | m2 AS (SELECT *, CAST(EXTRACT(YEAR FROM mon) * 12 +
        |     EXTRACT(MONTH FROM mon) - 1 AS BIGINT) AS mon_idx FROM monthly)
        |SELECT n_name, mon, rev_cents / 100.0 AS rev,
        | CAST(SUM(rev_cents) OVER w AS DOUBLE) / (100.0 * COUNT(*) OVER w) AS rev_ma3_cal
        |FROM m2
        |WINDOW w AS (PARTITION BY n_name ORDER BY mon_idx
        |  RANGE BETWEEN 2 PRECEDING AND CURRENT ROW)""".stripMargin,

    "q47_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
        | ${sumFixedSql("l_quantity", 2)} AS sum_qty,
        | ${sumFixedSql("l_extendedprice", 2)} AS sum_base_price,
        | SUM($discPrice4) / 10000.0 AS sum_disc_price,
        | SUM($charge4) / 10000.0 AS sum_charge,
        | ${avgFixedSql("l_quantity", 2, 4)} AS avg_qty,
        | ${avgFixedSql("l_extendedprice", 2, 4)} AS avg_price,
        | ${avgFixedSql("l_discount", 2, 4)} AS avg_disc,
        | COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q48_shipping_priority" ->
      s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
        | SUM($discPrice4) / 10000.0 AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |  AND l_shipdate > TIMESTAMP '1996-06-30'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "q49_local_supplier_volume" ->
      s"""SELECT n_name,
        | SUM($discPrice4) / 10000.0 AS revenue,
        | COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name""".stripMargin,

    "q50_returned_items" ->
      s"""SELECT c_custkey, c_name, n_name,
        | SUM($discPrice4) / 10000.0 AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    "q51_part_supplier" ->
      s"""SELECT p_brand, s_name,
        | ${sumFixedSql("l_quantity", 2)} AS sum_qty,
        | COUNT(*) AS cnt
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |WHERE p_type LIKE '%ECO%'
        |GROUP BY p_brand, s_name""".stripMargin,

    "q227_abc_segmentation" ->
      s"""WITH rev AS (SELECT o_custkey,
        |   CAST(SUM(${fixedSql("o_totalprice", 2)}) AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        | j AS (SELECT c_nationkey, c_custkey, cents
        |  FROM rev JOIN customer ON o_custkey = c_custkey),
        | w AS (SELECT c_nationkey, cents,
        |   SUM(cents) OVER (PARTITION BY c_nationkey
        |     ORDER BY cents DESC, c_custkey) AS cum,
        |   SUM(cents) OVER (PARTITION BY c_nationkey) AS tot FROM j),
        | cl AS (SELECT c_nationkey,
        |   CASE WHEN cum * 100 <= tot * 50 THEN 'A'
        |     WHEN cum * 100 <= tot * 80 THEN 'B' ELSE 'C' END AS cls,
        |   cents, tot FROM w)
        |SELECT c_nationkey, cls, count(*) AS n_customers,
        | CAST(SUM(cents) AS BIGINT) AS cents,
        | CAST(SUM(cents) * 1000000 // MAX(tot) AS BIGINT) AS share_ppm
        |FROM cl GROUP BY 1, 2""".stripMargin,

    "q230_basket_rules" ->
      """WITH ob AS (SELECT DISTINCT l_orderkey AS ok, p_brand AS brand
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        | nb AS (SELECT brand, count(*) AS n_b FROM ob GROUP BY 1),
        | nn AS (SELECT count(DISTINCT ok) AS n FROM ob),
        | p AS (SELECT x.brand AS a, y.brand AS b, count(*) AS n_ab
        |  FROM ob x JOIN ob y ON x.ok = y.ok AND x.brand < y.brand
        |  GROUP BY 1, 2 HAVING count(*) >= 10)
        |SELECT a, b, n_ab,
        | CAST(n_ab * 1000000 // nn.n AS BIGINT) AS support_ppm,
        | CAST(n_ab * 1000000 // na.n_b AS BIGINT) AS conf_ab_ppm,
        | CAST(n_ab * 1000000 // nb2.n_b AS BIGINT) AS conf_ba_ppm,
        | CAST((n_ab * nn.n * 1000000) // (na.n_b * nb2.n_b) AS BIGINT)
        |   AS lift_ppm
        |FROM p
        |JOIN nb na ON p.a = na.brand
        |JOIN nb nb2 ON p.b = nb2.brand
        |CROSS JOIN nn""".stripMargin,

    "q275_apriori_triples" ->
      """WITH ob AS (SELECT DISTINCT l_orderkey AS ok, p_brand AS brand
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        | nn AS (SELECT count(DISTINCT ok) AS n FROM ob),
        | p AS (SELECT x.brand AS a, y.brand AS b, count(*) AS n_ab
        |  FROM ob x JOIN ob y ON x.ok = y.ok AND x.brand < y.brand
        |  GROUP BY 1, 2 HAVING count(*) >= 10),
        | t AS (SELECT x.brand AS a, y.brand AS b, z.brand AS c,
        |   count(*) AS n_abc
        |  FROM ob x
        |  JOIN ob y ON x.ok = y.ok AND x.brand < y.brand
        |  JOIN ob z ON y.ok = z.ok AND y.brand < z.brand
        |  GROUP BY 1, 2, 3 HAVING count(*) >= 10)
        |SELECT t.a, t.b, t.c, t.n_abc,
        | CAST(t.n_abc * 1000000 // nn.n AS BIGINT) AS support_ppm,
        | CAST(t.n_abc * 1000000 // pab.n_ab AS BIGINT) AS conf_ab_c_ppm
        |FROM t
        |JOIN p pab ON t.a = pab.a AND t.b = pab.b
        |JOIN p pac ON t.a = pac.a AND t.c = pac.b
        |JOIN p pbc ON t.b = pbc.a AND t.c = pbc.b
        |CROSS JOIN nn""".stripMargin,

    "q276_srm_check" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        | p AS (SELECT
        |   CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |   CAST(SUM(CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n2
        |  FROM u),
        | m AS (SELECT
        |   CAST(SUM(CASE WHEN user_id % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |   CAST(SUM(CASE WHEN user_id % 3 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n2
        |  FROM u)
        |SELECT 'parity' AS scheme, n1, n2,
        |  n1 * 1000000 // (n1 + n2) AS share_ppm,
        |  CAST(n1 - n2 AS HUGEINT) * (n1 - n2) * 10000
        |    > CAST(38415 AS HUGEINT) * (n1 + n2) AS srm
        |FROM p
        |UNION ALL
        |SELECT 'mod3_biased' AS scheme, n1, n2,
        |  n1 * 1000000 // (n1 + n2) AS share_ppm,
        |  CAST(n1 - n2 AS HUGEINT) * (n1 - n2) * 10000
        |    > CAST(38415 AS HUGEINT) * (n1 + n2) AS srm
        |FROM m""".stripMargin,

    "q231_gini_concentration" ->
      s"""WITH rev AS (SELECT o_custkey,
        |   CAST(SUM(${fixedSql("o_totalprice", 2)}) AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        | j AS (SELECT c_nationkey, c_custkey, cents
        |  FROM rev JOIN customer ON o_custkey = c_custkey),
        | r AS (SELECT c_nationkey, cents,
        |   ROW_NUMBER() OVER (PARTITION BY c_nationkey
        |     ORDER BY cents, c_custkey) AS rk FROM j),
        | g AS (SELECT c_nationkey, count(*) AS n_customers,
        |   CAST(SUM(cents) AS BIGINT) AS cents,
        |   CAST(SUM(rk * cents) AS BIGINT) AS ws FROM r GROUP BY 1)
        |SELECT c_nationkey, n_customers, cents,
        | CAST((CAST(2 AS HUGEINT) * ws
        |     - CAST(n_customers + 1 AS HUGEINT) * cents) * 1000000
        |   // (CAST(n_customers AS HUGEINT) * cents) AS BIGINT)
        |   AS gini_ppm
        |FROM g""".stripMargin,

    "q232_rfm_segments" ->
      s"""WITH g AS (SELECT o_custkey, max(o_orderdate) AS last_d,
        |   count(*) AS n_orders,
        |   CAST(SUM(${fixedSql("o_totalprice", 2)}) AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        | j AS (SELECT c_nationkey, c_custkey, last_d, n_orders, cents,
        |   count(*) OVER (PARTITION BY c_nationkey) AS nn
        |  FROM g JOIN customer ON o_custkey = c_custkey),
        | sc AS (SELECT c_nationkey, cents, nn,
        |   (ROW_NUMBER() OVER (PARTITION BY c_nationkey
        |     ORDER BY last_d, c_custkey) - 1) * 3 // nn + 1 AS r_score,
        |   (ROW_NUMBER() OVER (PARTITION BY c_nationkey
        |     ORDER BY n_orders, c_custkey) - 1) * 3 // nn + 1 AS f_score,
        |   (ROW_NUMBER() OVER (PARTITION BY c_nationkey
        |     ORDER BY cents, c_custkey) - 1) * 3 // nn + 1 AS m_score
        |  FROM j)
        |SELECT c_nationkey, r_score, f_score, m_score,
        | count(*) AS n_customers, CAST(SUM(cents) AS BIGINT) AS cents
        |FROM sc GROUP BY 1, 2, 3, 4""".stripMargin,

    "q236_fd_audit" -> {
      def fd(tbl: String, det: String, dep: String) =
        s"""SELECT '$tbl' AS tbl, '$det' AS det, '$dep' AS dep,
          | count(*) AS n_keys,
          | CAST(SUM(CASE WHEN v > 1 THEN 1 ELSE 0 END) AS BIGINT)
          |   AS n_violating,
          | CAST(MAX(v) AS BIGINT) AS max_variants
          |FROM (SELECT $det, count(DISTINCT $dep) AS v FROM $tbl
          |  GROUP BY 1)""".stripMargin
      Seq(
        fd("orders", "o_orderkey", "o_custkey"),
        fd("orders", "o_custkey", "o_orderpriority"),
        fd("customer", "c_nationkey", "c_mktsegment"),
        fd("lineitem", "l_orderkey", "l_suppkey"),
        fd("part", "p_brand", "p_type")).mkString("\nUNION ALL\n")
    },

    "q237_fulfillment_snapshot" ->
      """WITH li AS (SELECT l_orderkey, min(l_shipdate) AS first_ship,
        |   max(l_shipdate) AS last_ship FROM lineitem GROUP BY 1),
        | j AS (SELECT o_orderpriority,
        |   CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS mon,
        |   date_diff('day', CAST(o_orderdate AS DATE),
        |     CAST(first_ship AS DATE)) AS lag_d,
        |   date_diff('day', CAST(first_ship AS DATE),
        |     CAST(last_ship AS DATE)) AS span_d
        |  FROM orders JOIN li ON o_orderkey = l_orderkey)
        |SELECT o_orderpriority, mon, count(*) AS n_orders,
        | CAST(SUM(lag_d) * 100 // count(*) AS BIGINT) AS lag_cdays,
        | CAST(SUM(span_d) * 100 // count(*) AS BIGINT) AS span_cdays,
        | CAST(MAX(span_d) AS BIGINT) AS max_span_d
        |FROM j GROUP BY 1, 2""".stripMargin,

    "q241_geo_rollup_shares" ->
      s"""WITH cc AS (SELECT o_custkey,
        |   CAST(SUM(${fixedSql("o_totalprice", 2)}) AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        | pn AS (SELECT r_name, n_name,
        |   CAST(SUM(cents) AS BIGINT) AS cents
        |  FROM cc
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  GROUP BY 1, 2),
        | w AS (SELECT r_name, n_name, cents,
        |   CAST(SUM(cents) OVER (PARTITION BY r_name) AS BIGINT) AS rt,
        |   CAST(SUM(cents) OVER () AS BIGINT) AS gt FROM pn)
        |SELECT r_name, n_name, cents,
        | CAST(cents * 1000000 // rt AS BIGINT) AS share_region_ppm,
        | CAST(cents * 1000000 // gt AS BIGINT) AS share_global_ppm
        |FROM w""".stripMargin
  )
}
