package graft

/** The driver's smoke contract: entry() on sf0.001 returns rows, and
  * EVERY declared query has a DuckDB oracle — the approximate surfaces
  * (q54/q83/q94) are gated through their deterministic md5 spellings,
  * so the oracle-less allow-set is empty. */
class EntrySpec extends SparkTestBase {
  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
  test("query and oracle keys line up") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q))
    val rowsOnly = q -- o
    assert(rowsOnly.isEmpty, s"unexpected oracle-less queries: $rowsOnly")
  }
  test("every query runs on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n >= 0, name)
    }
  }
}
