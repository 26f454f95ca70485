package graft

/** SQL-surface pin (VERDICT r8 optional directive 7): the `spark.sql`
  * spelling of a query and its DataFrame-façade spelling must share ONE
  * Catalyst plan — asserted as equality of canonicalized optimized
  * plans (canonicalization normalizes expression IDs and alias names,
  * so the comparison is structural: same scans, same filters, same
  * aggregates, same join shape). A divergence would mean the SQL
  * surface silently plans differently from the gated façade — the
  * exact risk this spec exists to catch.
  */
class SqlSurfaceSpec extends SparkTestBase
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {

  import org.apache.spark.sql.catalyst.expressions.{And, IsNotNull}
  import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}

  private lazy val ready: Unit = Sql.registerViews(spark, sf)

  /** Remove `IsNotNull` conjuncts from Filter nodes. Catalyst infers
    * not-null filters from join/predicate constraints, and the set it
    * infers differs between an explicit left-semi join and the
    * decorrelated form of the equivalent EXISTS (the rewrite does not
    * re-infer on the outer key) — a one-conjunct delta that is noise
    * for this spec's purpose. Must run BEFORE `.canonicalized`:
    * canonicalization fuses And chains into MultiCommutativeOp, which
    * splitConjunctivePredicates can't split. */
  private def modNotNull(p: LogicalPlan): LogicalPlan = p.transform {
    case Filter(cond, child) =>
      splitConjunctivePredicates(cond)
        .filterNot(_.isInstanceOf[IsNotNull])
        .reduceOption(And).map(Filter(_, child)).getOrElse(child)
  }

  private def assertSamePlan(name: String, sqlText: String,
      moduloNotNull: Boolean = false): Unit = {
    ready
    def prep(p: LogicalPlan): LogicalPlan =
      (if (moduloNotNull) modNotNull(p) else p).canonicalized
    val facade = prep(SparkEntry.queries(name)(spark, sf)
      .queryExecution.optimizedPlan)
    val viaSql = prep(Sql.sql(spark, sqlText)
      .queryExecution.optimizedPlan)
    assert(facade == viaSql,
      s"$name: SQL and façade optimized plans diverge\n--- façade ---\n" +
        s"$facade\n--- sql ---\n$viaSql")
  }

  test("q01_project: SQL and façade share one optimized plan") {
    assertSamePlan("q01_project",
      "SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag FROM lineitem")
  }

  test("q02_filter: SQL and façade share one optimized plan (pushdown included)") {
    assertSamePlan("q02_filter",
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem WHERE l_quantity > 30 AND l_returnflag = 'R'""".stripMargin)
  }

  test("q05_groupby_sum: SQL and façade share one optimized plan") {
    assertSamePlan("q05_groupby_sum",
      """SELECT l_returnflag, l_linestatus,
        |  SUM(CAST(FLOOR(l_quantity * 100.0D + 0.5D) AS BIGINT)) / 100.0D AS sum_qty,
        |  SUM(CAST(FLOOR(l_extendedprice * 100.0D + 0.5D) AS BIGINT)) / 100.0D AS sum_price,
        |  FLOOR((SUM(CAST(FLOOR(l_quantity * 100.0D + 0.5D) AS BIGINT)) / 100.0D
        |    / COUNT(1)) * 10000.0D + 0.5D) / 10000.0D AS avg_qty,
        |  COUNT(l_orderkey) AS cnt
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin)
  }

  test("q07_join_inner: SQL and façade share one optimized plan") {
    assertSamePlan("q07_join_inner",
      """SELECT c_custkey, c_name, c_mktsegment, o_orderkey,
        |  FLOOR(o_totalprice * 100.0D + 0.5D) / 100.0D AS o_price
        |FROM customer JOIN orders ON c_custkey = o_custkey""".stripMargin)
  }

  // ---- r9 optional directive: the TPC-H-shaped subset, where a SQL
  // spelling is the natural user entry point ----

  private def F(e: String, d: Int) = functions.DetMath.fixedSql(e, d)
  private def SF(e: String, d: Int) = functions.DetMath.sumFixedSql(e, d)
  private def AF(e: String, d: Int, o: Int) =
    functions.DetMath.avgFixedSql(e, d, o)

  test("q47_pricing_summary (TPC-H Q1): SQL and façade share one optimized plan") {
    assertSamePlan("q47_pricing_summary",
      s"""SELECT l_returnflag, l_linestatus,
        |  ${SF("l_quantity", 2)} AS sum_qty,
        |  ${SF("l_extendedprice", 2)} AS sum_base_price,
        |  SUM(${F("l_extendedprice * (1 - l_discount)", 4)}) / 10000.0D
        |    AS sum_disc_price,
        |  SUM(${F("l_extendedprice * (1 - l_discount) * (1 + l_tax)", 4)})
        |    / 10000.0D AS sum_charge,
        |  ${AF("l_quantity", 2, 4)} AS avg_qty,
        |  ${AF("l_extendedprice", 2, 4)} AS avg_price,
        |  ${AF("l_discount", 2, 4)} AS avg_disc,
        |  COUNT(1) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin)
  }

  test("q49_local_supplier_volume (TPC-H Q5): SQL and façade share one optimized plan") {
    assertSamePlan("q49_local_supplier_volume",
      s"""SELECT n_name,
        |  SUM(${F("l_extendedprice * (1 - l_discount)", 4)}) / 10000.0D
        |    AS revenue,
        |  COUNT(1) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name""".stripMargin)
  }

  test("q255_late_orders (TPC-H Q4): SQL EXISTS decorrelates to the façade's semi join") {
    // moduloNotNull: the EXISTS decorrelation does not re-infer
    // isnotnull(o_orderkey) on the outer side the way the explicit
    // left-semi join does; the pin is modulo that inferred conjunct
    // (the row-equality belt below covers the semantics).
    assertSamePlan("q255_late_orders",
      """SELECT o_orderpriority, COUNT(1) AS order_count
        |FROM orders
        |WHERE o_orderdate >= '1997-07-01' AND o_orderdate < '1997-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
        |GROUP BY o_orderpriority""".stripMargin,
      moduloNotNull = true)
  }

  test("q266_market_share (TPC-H Q8): SQL and façade share one optimized plan") {
    assertSamePlan("q266_market_share",
      s"""WITH rev AS (
        |  SELECT /*+ BROADCAST(nation), BROADCAST(region) */
        |    CAST(YEAR(o_orderdate) AS BIGINT) AS yr, n_name,
        |    SUM(${F("l_extendedprice", 2)} * (100 - ${F("l_discount", 2)}))
        |      AS rev_u
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'ASIA'
        |  GROUP BY CAST(YEAR(o_orderdate) AS BIGINT), n_name)
        |SELECT yr, n_name, rev_u,
        |  (rev_u DIV 100) * 1000000
        |    DIV (SUM(rev_u) OVER (PARTITION BY yr) DIV 100) AS share_ppm
        |FROM rev""".stripMargin)
  }

  test("q285_waiting_suppliers (TPC-H Q21): SQL and façade share one optimized plan") {
    // The SQL spelling mirrors the façade's one-grouped-pass shape (a
    // CTE of per-(order, supplier) late flags used twice) rather than
    // the textbook EXISTS + NOT-EXISTS pair — that is the point: the
    // user-facing SQL entry is the decorrelated form whose second
    // lineitem shuffle never exists, and this pin proves both
    // spellings plan identically.
    assertSamePlan("q285_waiting_suppliers",
      """WITH los AS (
        |  SELECT l_orderkey AS ok, l_suppkey AS sk,
        |    MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
        |      THEN 1L ELSE 0L END) AS late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F'
        |  GROUP BY l_orderkey, l_suppkey),
        |qual AS (
        |  SELECT ok FROM los GROUP BY ok
        |  HAVING COUNT(1) >= 2 AND SUM(late) = 1)
        |SELECT s_name, numwait FROM (
        |  SELECT sk, COUNT(1) AS numwait
        |  FROM los JOIN qual USING (ok)
        |  WHERE late = 1
        |  GROUP BY sk) w
        |JOIN supplier ON sk = s_suppkey""".stripMargin)
  }

  test("q286_sales_opportunity (TPC-H Q22): SQL NOT EXISTS decorrelates to the façade's anti join") {
    // moduloNotNull for the same reason as q255: the NOT-EXISTS
    // decorrelation and the explicit left-anti join infer different
    // isnotnull conjuncts; the row-equality belt covers semantics.
    assertSamePlan("q286_sales_opportunity",
      s"""WITH c AS (
        |  SELECT c_custkey, c_nationkey, ${F("c_acctbal", 2)} AS bal_c
        |  FROM customer),
        |avg_pos AS (
        |  SELECT SUM(bal_c) AS s, COUNT(1) AS n FROM c WHERE bal_c > 0),
        |dormant AS (
        |  SELECT /*+ BROADCAST(avg_pos) */ c_custkey, c_nationkey, bal_c
        |  FROM c CROSS JOIN avg_pos
        |  WHERE bal_c * n > s
        |    AND NOT EXISTS (SELECT 1 FROM orders
        |      WHERE o_custkey = c_custkey AND o_orderdate >= '2000-01-01'))
        |SELECT /*+ BROADCAST(nation) */ n_name AS nation,
        |  COUNT(1) AS numcust, SUM(bal_c) AS tot_cents
        |FROM dormant JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,
      moduloNotNull = true)
  }

  test("q287_small_qty_revenue (TPC-H Q17): SQL and façade share one optimized plan") {
    // The correlated-AVG shape spelled as its decorrelated join-back;
    // 5·qty·cnt < sum_q keeps the comparison in exact integers in both
    // spellings.
    assertSamePlan("q287_small_qty_revenue",
      s"""WITH p AS (
        |  SELECT p_partkey FROM part
        |  WHERE p_brand = 'Brand#23' AND p_size < 10),
        |l AS (
        |  SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty,
        |    ${F("l_extendedprice", 2)} AS price_c
        |  FROM lineitem JOIN p ON l_partkey = p_partkey),
        |pa AS (
        |  SELECT l_partkey, SUM(qty) AS sum_q, COUNT(1) AS cnt
        |  FROM l GROUP BY l_partkey)
        |SELECT COUNT(1) AS n_items, SUM(price_c) AS rev_cents
        |FROM l JOIN pa USING (l_partkey)
        |WHERE qty * cnt * 5 < sum_q""".stripMargin)
  }

  test("TPC-H-shaped SQL spellings return the façade's rows") {
    ready
    for ((name, sqlText) <- Seq(
      "q255_late_orders" ->
        """SELECT o_orderpriority, COUNT(1) AS order_count
          |FROM orders
          |WHERE o_orderdate >= '1997-07-01' AND o_orderdate < '1997-10-01'
          |  AND EXISTS (SELECT 1 FROM lineitem
          |    WHERE l_orderkey = o_orderkey
          |      AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
          |GROUP BY o_orderpriority""".stripMargin,
      "q47_pricing_summary" ->
        s"""SELECT l_returnflag, l_linestatus,
          |  ${SF("l_quantity", 2)} AS sum_qty,
          |  ${SF("l_extendedprice", 2)} AS sum_base_price,
          |  SUM(${F("l_extendedprice * (1 - l_discount)", 4)}) / 10000.0D
          |    AS sum_disc_price,
          |  SUM(${F("l_extendedprice * (1 - l_discount) * (1 + l_tax)", 4)})
          |    / 10000.0D AS sum_charge,
          |  ${AF("l_quantity", 2, 4)} AS avg_qty,
          |  ${AF("l_extendedprice", 2, 4)} AS avg_price,
          |  ${AF("l_discount", 2, 4)} AS avg_disc,
          |  COUNT(1) AS count_order
          |FROM lineitem
          |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
          |GROUP BY l_returnflag, l_linestatus""".stripMargin,
      "q266_market_share" ->
        s"""WITH rev AS (
          |  SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS yr, n_name,
          |    SUM(${F("l_extendedprice", 2)} * (100 - ${F("l_discount", 2)}))
          |      AS rev_u
          |  FROM lineitem
          |  JOIN orders ON l_orderkey = o_orderkey
          |  JOIN customer ON o_custkey = c_custkey
          |  JOIN nation ON c_nationkey = n_nationkey
          |  JOIN region ON n_regionkey = r_regionkey
          |  WHERE r_name = 'ASIA'
          |  GROUP BY CAST(YEAR(o_orderdate) AS BIGINT), n_name)
          |SELECT yr, n_name, rev_u,
          |  (rev_u DIV 100) * 1000000
          |    DIV (SUM(rev_u) OVER (PARTITION BY yr) DIV 100) AS share_ppm
          |FROM rev""".stripMargin,
      "q49_local_supplier_volume" ->
        s"""SELECT n_name,
          |  SUM(${F("l_extendedprice * (1 - l_discount)", 4)}) / 10000.0D
          |    AS revenue,
          |  COUNT(1) AS n_items
          |FROM lineitem
          |JOIN orders ON l_orderkey = o_orderkey
          |JOIN customer ON o_custkey = c_custkey
          |JOIN nation ON c_nationkey = n_nationkey
          |JOIN region ON n_regionkey = r_regionkey
          |WHERE r_name = 'ASIA'
          |GROUP BY n_name""".stripMargin,
      "q285_waiting_suppliers" ->
        """WITH los AS (
          |  SELECT l_orderkey AS ok, l_suppkey AS sk,
          |    MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
          |      THEN 1L ELSE 0L END) AS late
          |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          |  WHERE o_orderstatus = 'F'
          |  GROUP BY l_orderkey, l_suppkey),
          |qual AS (
          |  SELECT ok FROM los GROUP BY ok
          |  HAVING COUNT(1) >= 2 AND SUM(late) = 1)
          |SELECT s_name, numwait FROM (
          |  SELECT sk, COUNT(1) AS numwait
          |  FROM los JOIN qual USING (ok)
          |  WHERE late = 1
          |  GROUP BY sk) w
          |JOIN supplier ON sk = s_suppkey""".stripMargin,
      "q286_sales_opportunity" ->
        s"""WITH c AS (
          |  SELECT c_custkey, c_nationkey, ${F("c_acctbal", 2)} AS bal_c
          |  FROM customer),
          |avg_pos AS (
          |  SELECT SUM(bal_c) AS s, COUNT(1) AS n FROM c WHERE bal_c > 0),
          |dormant AS (
          |  SELECT c_custkey, c_nationkey, bal_c
          |  FROM c CROSS JOIN avg_pos
          |  WHERE bal_c * n > s
          |    AND NOT EXISTS (SELECT 1 FROM orders
          |      WHERE o_custkey = c_custkey AND o_orderdate >= '2000-01-01'))
          |SELECT n_name AS nation,
          |  COUNT(1) AS numcust, SUM(bal_c) AS tot_cents
          |FROM dormant JOIN nation ON c_nationkey = n_nationkey
          |GROUP BY n_name""".stripMargin,
      "q287_small_qty_revenue" ->
        s"""WITH p AS (
          |  SELECT p_partkey FROM part
          |  WHERE p_brand = 'Brand#23' AND p_size < 10),
          |l AS (
          |  SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty,
          |    ${F("l_extendedprice", 2)} AS price_c
          |  FROM lineitem JOIN p ON l_partkey = p_partkey),
          |pa AS (
          |  SELECT l_partkey, SUM(qty) AS sum_q, COUNT(1) AS cnt
          |  FROM l GROUP BY l_partkey)
          |SELECT COUNT(1) AS n_items, SUM(price_c) AS rev_cents
          |FROM l JOIN pa USING (l_partkey)
          |WHERE qty * cnt * 5 < sum_q""".stripMargin)) {
      val facade = SparkEntry.queries(name)(spark, sf)
      val viaSql = Sql.sql(spark, sqlText)
      assert(facade.exceptAll(viaSql).isEmpty &&
        viaSql.exceptAll(facade).isEmpty,
        s"$name: SQL spelling returns different rows than the façade")
    }
  }

  test("SQL results hash-match the façade results, not just the plan") {
    ready
    // belt over the plan-equality braces: same rows out (q05's full
    // aggregate, the most arithmetic-heavy of the pinned spellings)
    val facade = SparkEntry.queries("q05_groupby_sum")(spark, sf)
    val viaSql = Sql.sql(spark,
      """SELECT l_returnflag, l_linestatus,
        |  SUM(CAST(FLOOR(l_quantity * 100.0D + 0.5D) AS BIGINT)) / 100.0D AS sum_qty,
        |  SUM(CAST(FLOOR(l_extendedprice * 100.0D + 0.5D) AS BIGINT)) / 100.0D AS sum_price,
        |  FLOOR((SUM(CAST(FLOOR(l_quantity * 100.0D + 0.5D) AS BIGINT)) / 100.0D
        |    / COUNT(1)) * 10000.0D + 0.5D) / 10000.0D AS avg_qty,
        |  COUNT(l_orderkey) AS cnt
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin)
    assert(facade.exceptAll(viaSql).isEmpty && viaSql.exceptAll(facade).isEmpty,
      "SQL spelling returns different rows than the façade")
  }
}
