package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{Table => T}
import graft.sources.Tables
import graft.functions.DetMath._

/** The reference's full relational surface (SURVEY.md §2) as oracle-gated
  * queries over the driver corpus. Every query has a DuckDB-equivalent SQL
  * oracle. All double rounding/summation goes through [[graft.functions.DetMath]]
  * so results are bit-identical across engines and partition orders.
  */
object Relational {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.read(s, dir, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S1 read + P4 projection
    "q01_project" -> ((s, d) =>
      t(s, d, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")),

    // P1 filter — predicate pushed to the parquet scan
    "q02_filter" -> ((s, d) =>
      T(t(s, d, "lineitem"))
        .filter(col("l_quantity") > 30 && col("l_returnflag") === "R")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .df),

    // P2/P3 set_column + arithmetic expression AST ops
    "q03_set_column" -> ((s, d) =>
      t(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        rnd(col("l_extendedprice") * (lit(1) - col("l_discount")), 2).as("revenue"),
        rnd(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")), 2).as("charge"),
        (col("l_quantity") + 10.0).as("qty_plus"),
        (col("l_quantity") - 1.0).as("qty_minus"),
        rnd(col("l_extendedprice") / 7.0, 3).as("price_div"))),

    // P3 comparison ops (the 6 comparison AST nodes), as 0/1 ints
    "q04_expr_compare" -> ((s, d) =>
      t(s, d, "orders").select(
        col("o_orderkey"),
        (col("o_totalprice") > 150000.0).cast("int").as("gt_f"),
        (col("o_totalprice") >= 150000.0).cast("int").as("ge_f"),
        (col("o_totalprice") < 50000.0).cast("int").as("lt_f"),
        (col("o_totalprice") <= 50000.0).cast("int").as("le_f"),
        (col("o_orderstatus") === "F").cast("int").as("eq_f"),
        (col("o_orderstatus") =!= "F").cast("int").as("ne_f"))),

    // A1 two-level hash aggregation (reference trace 3)
    "q05_groupby_sum" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sumFixed(col("l_quantity"), 2).as("sum_qty"),
          sumFixed(col("l_extendedprice"), 2).as("sum_price"),
          avgFixed(col("l_quantity"), 2, 4).as("avg_qty"),
          count(col("l_orderkey")).as("cnt"))),

    // A2 full aggregation vocabulary (sum/count/all/any/median/
    // count_distinct/distinct/first/last — SURVEY.md §2.4)
    "q06_agg_vocab" -> ((s, d) =>
      t(s, d, "orders")
        .groupBy("o_orderstatus")
        .agg(
          sumFixed(col("o_totalprice"), 2).as("sum_price"),
          count(lit(1)).as("cnt"),
          countDistinct(col("o_custkey")).as("n_cust"),
          rnd(median(col("o_totalprice")), 2).as("med_price"),
          every(col("o_totalprice") > 1000.0).cast("int").as("all_gt"),
          some(col("o_totalprice") > 400000.0).cast("int").as("any_gt"),
          array_join(sort_array(collect_set(col("o_orderpriority"))), ",").as("prios"),
          min("o_orderkey").as("first_key"),
          max("o_orderkey").as("last_key"))),

    // J1 inner equi join
    "q07_join_inner" -> ((s, d) => {
      val c = t(s, d, "customer"); val o = t(s, d, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "inner")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
          col("o_orderkey"), rnd(col("o_totalprice"), 2).as("o_price"))
    }),

    // J1 multi-key equi join (Demo.ipynb 2-key shape)
    "q08_join_two_key" -> ((s, d) => {
      val a = t(s, d, "orders").select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val b = t(s, d, "orders").select(col("o_orderkey"), col("o_orderstatus"), col("o_orderpriority"))
      a.join(b, Seq("o_orderkey", "o_orderstatus"), "inner")
        .select(col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
          rnd(col("o_totalprice"), 2).as("price"), col("o_orderpriority").as("prio"))
    }),

    "q09_join_left" -> ((s, d) => {
      val o = t(s, d, "orders")
      val c = t(s, d, "customer").filter(col("c_acctbal") > 5000)
      o.join(c, o("o_custkey") === c("c_custkey"), "left")
        .select(col("o_orderkey"), col("o_custkey"), col("c_name"),
          rnd(col("c_acctbal"), 2).as("bal"))
    }),

    "q10_join_right" -> ((s, d) => {
      val c = t(s, d, "customer").filter(col("c_acctbal") > 5000)
      val o = t(s, d, "orders")
      c.join(o, o("o_custkey") === c("c_custkey"), "right")
        .select(col("o_orderkey"), col("o_custkey"), col("c_name"))
    }),

    "q11_join_full" -> ((s, d) => {
      val c = t(s, d, "customer").filter(col("c_acctbal") > 5000)
        .select(col("c_custkey"), col("c_name"))
      val o = t(s, d, "orders").filter(col("o_totalprice") > 300000)
        .select(col("o_custkey"), col("o_orderkey"))
      c.join(o, c("c_custkey") === o("o_custkey"), "full")
        .select(col("c_custkey").as("lkey"), col("o_custkey").as("rkey"),
          col("c_name"), col("o_orderkey"))
    }),

    "q12_join_semi" -> ((s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders").filter(col("o_totalprice") > 300000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    }),

    "q13_join_anti" -> ((s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders").filter(col("o_totalprice") > 300000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    }),

    // right_semi / right_anti — no Spark `how`, planned via the façade's
    // side swap (SURVEY.md §2.3)
    "q14_join_right_semi" -> ((s, d) => {
      val o = T(t(s, d, "orders"))
      val c = T(t(s, d, "customer").filter(col("c_acctbal") > 5000))
      o.merge(c, leftOn = Seq("o_custkey"), rightOn = Seq("c_custkey"),
          how = "right_semi")
        .select("c_custkey", "c_name").df
    }),

    "q15_join_right_anti" -> ((s, d) => {
      val o = T(t(s, d, "orders"))
      val c = T(t(s, d, "customer").filter(col("c_acctbal") > 5000))
      o.merge(c, leftOn = Seq("o_custkey"), rightOn = Seq("c_custkey"),
          how = "right_anti")
        .select("c_custkey", "c_name").df
    }),

    // O1 global sort + top-k (TakeOrderedAndProject)
    "q16_sort_topk" -> ((s, d) =>
      t(s, d, "lineitem")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .select(col("l_orderkey"), col("l_linenumber"),
          rnd(col("l_extendedprice"), 2).as("price"))
        .limit(100)),

    // U1 concat (n-ary union all, zero shuffle)
    "q17_concat" -> ((s, d) => {
      val li = t(s, d, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_returnflag")
      T.concat(Seq(
        T(li.filter(col("l_returnflag") === "A")),
        T(li.filter(col("l_returnflag") === "R")))).df
    }),

    // A3 scalar reductions (whole-column, no keys)
    "q18_reduce_scalar" -> ((s, d) =>
      t(s, d, "lineitem").agg(
        sumFixed(col("l_quantity"), 2).as("sum_qty"),
        count(lit(1)).as("n_rows"),
        count(col("l_quantity")).as("n_qty"),
        avgFixed(col("l_extendedprice"), 2, 2).as("avg_price"),
        rnd(min(col("l_extendedprice")), 2).as("min_price"),
        rnd(max(col("l_extendedprice")), 2).as("max_price"))),

    "q19_distinct" -> ((s, d) =>
      t(s, d, "lineitem").select("l_returnflag", "l_linestatus").distinct()),

    "q20_intersect" -> ((s, d) =>
      t(s, d, "customer").select(col("c_nationkey").as("k"))
        .intersect(t(s, d, "supplier").select(col("s_nationkey").as("k")))),

    "q21_except" -> ((s, d) =>
      t(s, d, "customer").select(col("c_nationkey").as("k"))
        .except(t(s, d, "supplier").select(col("s_nationkey").as("k")))),

    // §2.7 window functions (superset: reference has none)
    // r17: the single-window spelling — partitionBy(l_returnflag),
    // i.e. THREE partitions — capped the running-aggregate family's
    // parallelism at 3 at every scale: one reducer per flag owns the
    // flag's ENTIRE row set, the lone headline plan that did not
    // survive 100 TB. Rewritten on ParWindow.runningWindow (guide
    // §2.5): P contiguous range chunks computed in parallel, merged
    // with ≤P-row summary offsets — row-identical output (the
    // equivalence is spec-pinned on a tie-rich fixture AND on this
    // corpus against the old spelling; oracle hash unchanged).
    "q22_window" -> ((s, d) =>
      graft.operators.ParWindow.runningWindow(
          t(s, d, "lineitem").select("l_orderkey", "l_linenumber",
            "l_returnflag", "l_extendedprice", "l_quantity"),
          "l_returnflag",
          Seq(("l_extendedprice", false), ("l_orderkey", true),
            ("l_linenumber", true)),
          lagCol = "l_quantity", sumCol = fixed(col("l_quantity"), 2),
          rnName = "rn", rkName = "rk", prevName = "prev_qty",
          runName = "_run_cents")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_returnflag"), col("rn"), col("rk"), col("prev_qty"),
          (col("_run_cents") / 100.0).as("run_qty"))),

    // High-cardinality window: partitioned by l_orderkey (~N/4 distinct
    // keys, <=7 rows each), so the shuffle spreads evenly and per-group
    // state is tiny at any scale — this is the window plan that survives
    // 100x, complementing q22 whose 3-value partition key caps
    // parallelism at 3 for the running aggregate.
    "q64_window_highcard" -> ((s, d) => {
      // (l_orderkey, l_linenumber) is NOT unique in the synthetic corpus;
      // extendedprice+partkey make the sort total so LAG is deterministic
      val w = Window.partitionBy(col("l_orderkey"))
        .orderBy(col("l_linenumber"), col("l_extendedprice"), col("l_partkey"))
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        sum(col("l_quantity").cast("bigint")).over(run).as("run_qty"),
        row_number().over(w).as("line_rank"),
        rnd(lag(col("l_extendedprice"), 1).over(w), 2).as("prev_price"))
    }),

    // Salted join, oracle-proved semantically transparent: one hot key
    // spread over 8 salt buckets must produce byte-identical aggregates
    // to the plain join the oracle runs.
    "q70_salted_join" -> ((s, d) =>
      graft.operators.Skew.saltedJoin(
          t(s, d, "lineitem"), "l_orderkey",
          Seq("l_partkey", "l_linenumber"),
          t(s, d, "orders"), "o_orderkey", n = 8)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sumFixed(col("l_extendedprice"), 2).as("sum_price"))),

    // pandas-facade chain: setColumn → fillna → astype → rename →
    // value_counts ⋈ groupby-sum (merge suffixes the colliding key)
    "q66_pandas_facade" -> ((s, d) => {
      val base = T(t(s, d, "customer"))
        .setColumn("bal",
          when(col("c_acctbal") < 0, lit(null)).otherwise(col("c_acctbal")))
        .fillna(0.0, Seq("bal"))
        .astype("bal", "bigint")
        .rename("c_mktsegment" -> "segment")
      val vc = base.valueCounts("segment").rename("count" -> "n")
      val sums = base.groupby("segment").agg("bal" -> "sum")
        .rename("sum(bal)" -> "sum_bal")
      vc.merge(sums, on = Seq("segment")).df
        .select(col("segment_l").as("segment"), col("n"), col("sum_bal"))
    }),

    // grouping-set superset
    "q23_rollup" -> ((s, d) =>
      t(s, d, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"), sumFixed(col("l_quantity"), 2).as("sum_qty"))),

    // distribution-rank window family: ntile / percent_rank / cume_dist
    // / first_value — exact integer-ratio doubles, engine-identical
    "q77_rank_stats" -> ((s, d) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal"), col("c_custkey"))
      t(s, d, "customer").select(
        col("c_custkey"), col("c_mktsegment"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cdist"),
        first_value(col("c_custkey")).over(w).as("poorest"))
    }),

    // full cube: all 2^2 grouping sets in one pass
    "q74_cube" -> ((s, d) =>
      t(s, d, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"), sumFixed(col("l_quantity"), 2).as("sum_qty"))),

    // ---- q150: explicit GROUPING SETS + grouping_id ----
    // Arbitrary set selection ((flag, status), (status), ()) — the
    // shape neither rollup (q23) nor cube (q74) expresses (no
    // (flag)-only set), plus the grouping_id bit vector that
    // disambiguates a rolled-up NULL from a data NULL. The DataFrame
    // API stops at rollup/cube, so this goes through spark.sql — the
    // same Catalyst Expand node either way, one pass over the scan.
    "q150_grouping_sets" -> ((s, d) => {
      t(s, d, "lineitem").createOrReplaceTempView("graft_li_gs")
      s.sql(s"""SELECT l_returnflag, l_linestatus,
        | grouping_id() AS gid, COUNT(*) AS cnt,
        | SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT))
        |   / CAST(100 AS DOUBLE) AS sum_qty
        |FROM graft_li_gs
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |  (l_linestatus), ())""".stripMargin)
    }),

    // scalar-function superset (reference has zero string functions)
    "q24_string_funcs" -> ((s, d) =>
      t(s, d, "customer").select(
        col("c_custkey"),
        upper(col("c_name")).as("uname"),
        lower(col("c_mktsegment")).as("lseg"),
        substring(col("c_name"), 1, 8).as("pre"),
        length(col("c_name")).as("nlen"),
        concat_ws("_", col("c_mktsegment"), col("c_name")).as("tag"))),

    // datetime filter + extraction (mirrors reference test_datetime.py)
    "q25_datetime" -> ((s, d) =>
      t(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_orderdate"),
          year(col("o_orderdate")).cast("int").as("yr"),
          month(col("o_orderdate")).cast("int").as("mo"),
          date_trunc("month", col("o_orderdate")).as("mon_start"))),

    // groupby on a timestamp-derived key (test_datetime.py scenario 5)
    "q26_datetime_groupby" -> ((s, d) =>
      t(s, d, "orders")
        .groupBy(date_trunc("month", col("o_orderdate")).as("mon"))
        .agg(count(lit(1)).as("cnt"), sumFixed(col("o_totalprice"), 2).as("sum_price"))),

    // Demo.ipynb pipeline shape: join -> groupby-count (the baseline metric)
    "q27_demo_pipeline" -> ((s, d) => {
      val c = t(s, d, "customer"); val o = t(s, d, "orders")
      o.join(c, o("o_custkey") === c("c_custkey"), "inner")
        .groupBy("c_mktsegment")
        .agg(count(col("o_orderkey")).as("cnt"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q01_project" ->
      "SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag FROM lineitem",
    "q02_filter" ->
      "SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice FROM lineitem WHERE l_quantity > 30 AND l_returnflag = 'R'",
    "q03_set_column" ->
      s"""SELECT l_orderkey, l_linenumber,
        | ${rndSql("l_extendedprice * (1 - l_discount)", 2)} AS revenue,
        | ${rndSql("l_extendedprice * (1 - l_discount) * (1 + l_tax)", 2)} AS charge,
        | l_quantity + 10.0 AS qty_plus,
        | l_quantity - 1.0 AS qty_minus,
        | ${rndSql("l_extendedprice / 7.0", 3)} AS price_div
        |FROM lineitem""".stripMargin,
    "q04_expr_compare" ->
      """SELECT o_orderkey,
        | CAST(o_totalprice > 150000.0 AS INT) AS gt_f,
        | CAST(o_totalprice >= 150000.0 AS INT) AS ge_f,
        | CAST(o_totalprice < 50000.0 AS INT) AS lt_f,
        | CAST(o_totalprice <= 50000.0 AS INT) AS le_f,
        | CAST(o_orderstatus = 'F' AS INT) AS eq_f,
        | CAST(o_orderstatus <> 'F' AS INT) AS ne_f
        |FROM orders""".stripMargin,
    "q05_groupby_sum" ->
      s"""SELECT l_returnflag, l_linestatus,
        | ${sumFixedSql("l_quantity", 2)} AS sum_qty,
        | ${sumFixedSql("l_extendedprice", 2)} AS sum_price,
        | ${avgFixedSql("l_quantity", 2, 4)} AS avg_qty,
        | COUNT(l_orderkey) AS cnt
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q06_agg_vocab" ->
      s"""SELECT o_orderstatus,
        | ${sumFixedSql("o_totalprice", 2)} AS sum_price,
        | COUNT(*) AS cnt,
        | COUNT(DISTINCT o_custkey) AS n_cust,
        | ${rndSql("MEDIAN(o_totalprice)", 2)} AS med_price,
        | CAST(BOOL_AND(o_totalprice > 1000.0) AS INT) AS all_gt,
        | CAST(BOOL_OR(o_totalprice > 400000.0) AS INT) AS any_gt,
        | ARRAY_TO_STRING(LIST_SORT(LIST(DISTINCT o_orderpriority)), ',') AS prios,
        | MIN(o_orderkey) AS first_key,
        | MAX(o_orderkey) AS last_key
        |FROM orders GROUP BY o_orderstatus""".stripMargin,
    "q07_join_inner" ->
      s"""SELECT c_custkey, c_name, c_mktsegment, o_orderkey,
        | ${rndSql("o_totalprice", 2)} AS o_price
        |FROM customer JOIN orders ON c_custkey = o_custkey""".stripMargin,
    "q08_join_two_key" ->
      s"""SELECT a.o_orderkey AS k, a.o_orderstatus AS st,
        | ${rndSql("a.o_totalprice", 2)} AS price, b.o_orderpriority AS prio
        |FROM orders a JOIN orders b
        | ON a.o_orderkey = b.o_orderkey AND a.o_orderstatus = b.o_orderstatus""".stripMargin,
    "q09_join_left" ->
      s"""SELECT o_orderkey, o_custkey, c_name, ${rndSql("c_acctbal", 2)} AS bal
        |FROM orders LEFT JOIN (SELECT * FROM customer WHERE c_acctbal > 5000) c
        | ON o_custkey = c_custkey""".stripMargin,
    "q10_join_right" ->
      """SELECT o_orderkey, o_custkey, c_name
        |FROM (SELECT * FROM customer WHERE c_acctbal > 5000) c
        | RIGHT JOIN orders ON o_custkey = c_custkey""".stripMargin,
    "q11_join_full" ->
      """SELECT c.c_custkey AS lkey, o.o_custkey AS rkey, c.c_name, o.o_orderkey
        |FROM (SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 5000) c
        | FULL JOIN (SELECT o_custkey, o_orderkey FROM orders WHERE o_totalprice > 300000) o
        | ON c.c_custkey = o.o_custkey""".stripMargin,
    "q12_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 300000)""".stripMargin,
    "q13_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 300000)""".stripMargin,
    "q14_join_right_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_acctbal > 5000
        |  AND EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "q15_join_right_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_acctbal > 5000
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "q16_sort_topk" ->
      s"""SELECT l_orderkey, l_linenumber, ${rndSql("l_extendedprice", 2)} AS price
        |FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100""".stripMargin,
    "q17_concat" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem WHERE l_returnflag = 'A'
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem WHERE l_returnflag = 'R'""".stripMargin,
    "q18_reduce_scalar" ->
      s"""SELECT ${sumFixedSql("l_quantity", 2)} AS sum_qty,
        | COUNT(*) AS n_rows,
        | COUNT(l_quantity) AS n_qty,
        | ${avgFixedSql("l_extendedprice", 2, 2)} AS avg_price,
        | ${rndSql("MIN(l_extendedprice)", 2)} AS min_price,
        | ${rndSql("MAX(l_extendedprice)", 2)} AS max_price
        |FROM lineitem""".stripMargin,
    "q19_distinct" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    "q20_intersect" ->
      "SELECT c_nationkey AS k FROM customer INTERSECT SELECT s_nationkey AS k FROM supplier",
    "q21_except" ->
      "SELECT c_nationkey AS k FROM customer EXCEPT SELECT s_nationkey AS k FROM supplier",
    "q22_window" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag,
        | ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn,
        | RANK() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rk,
        | LAG(l_quantity) OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS prev_qty,
        | SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)) OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0 AS run_qty
        |FROM lineitem""".stripMargin,
    "q64_window_highcard" ->
      s"""SELECT l_orderkey, l_linenumber,
        | CAST(SUM(CAST(TRUNC(l_quantity) AS BIGINT)) OVER (PARTITION BY l_orderkey
        |   ORDER BY l_linenumber, l_extendedprice, l_partkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_qty,
        | ROW_NUMBER() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_extendedprice, l_partkey) AS line_rank,
        | ${rndSql("LAG(l_extendedprice) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_extendedprice, l_partkey)", 2)} AS prev_price
        |FROM lineitem""".stripMargin,
    "q70_salted_join" ->
      s"""SELECT o_orderpriority, COUNT(*) AS n,
        | ${sumFixedSql("l_extendedprice", 2)} AS sum_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin,
    "q66_pandas_facade" ->
      """WITH base AS (SELECT c_mktsegment AS segment,
        |  CAST(TRUNC(COALESCE(CASE WHEN c_acctbal < 0 THEN NULL
        |    ELSE c_acctbal END, 0.0)) AS BIGINT) AS bal FROM customer)
        |SELECT segment, COUNT(*) AS n, CAST(SUM(bal) AS BIGINT) AS sum_bal
        |FROM base GROUP BY segment""".stripMargin,
    "q23_rollup" ->
      s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
        | ${sumFixedSql("l_quantity", 2)} AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,
    "q77_rank_stats" ->
      """SELECT c_custkey, c_mktsegment,
        | NTILE(4) OVER w AS quartile,
        | PERCENT_RANK() OVER w AS pct_rank,
        | CUME_DIST() OVER w AS cdist,
        | FIRST_VALUE(c_custkey) OVER w AS poorest
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)""".stripMargin,
    "q74_cube" ->
      s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
        | ${sumFixedSql("l_quantity", 2)} AS sum_qty
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin,
    "q150_grouping_sets" ->
      s"""SELECT l_returnflag, l_linestatus,
        | GROUPING(l_returnflag, l_linestatus) AS gid, COUNT(*) AS cnt,
        | ${sumFixedSql("l_quantity", 2)} AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |  (l_linestatus), ())""".stripMargin,
    "q24_string_funcs" ->
      """SELECT c_custkey, UPPER(c_name) AS uname, LOWER(c_mktsegment) AS lseg,
        | SUBSTR(c_name, 1, 8) AS pre, LENGTH(c_name) AS nlen,
        | CONCAT_WS('_', c_mktsegment, c_name) AS tag
        |FROM customer""".stripMargin,
    "q25_datetime" ->
      """SELECT o_orderkey, o_orderdate,
        | CAST(YEAR(o_orderdate) AS INT) AS yr,
        | CAST(MONTH(o_orderdate) AS INT) AS mo,
        | DATE_TRUNC('month', o_orderdate) AS mon_start
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'""".stripMargin,
    "q26_datetime_groupby" ->
      s"""SELECT DATE_TRUNC('month', o_orderdate) AS mon, COUNT(*) AS cnt,
        | ${sumFixedSql("o_totalprice", 2)} AS sum_price
        |FROM orders GROUP BY 1""".stripMargin,
    "q27_demo_pipeline" ->
      """SELECT c_mktsegment, COUNT(o_orderkey) AS cnt
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin
  )
}
