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
class SqlSurfaceSpec extends SparkTestBase {

  private lazy val ready: Unit = Sql.registerViews(spark, sf)

  private def assertSamePlan(name: String, sqlText: String): Unit = {
    ready
    val facade = SparkEntry.queries(name)(spark, sf)
      .queryExecution.optimizedPlan.canonicalized
    val viaSql = Sql.sql(spark, sqlText)
      .queryExecution.optimizedPlan.canonicalized
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
