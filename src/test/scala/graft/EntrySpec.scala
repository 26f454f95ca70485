package graft

/** The driver's smoke contract: entry() on sf0.001 returns rows, and
  * every declared query has either an oracle or a documented reason
  * (rows-only HLL). */
class EntrySpec extends SparkTestBase {
  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
  test("query and oracle keys line up") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q))
    val rowsOnly = q -- o
    assert(rowsOnly == Set("q54_approx_distinct", "q83_approx_quantiles",
      "q94_incr_distinct"),
      s"unexpected oracle-less queries: $rowsOnly")
  }
  test("every query runs on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n >= 0, name)
    }
  }
}
