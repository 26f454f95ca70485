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
  test("every query runs on sf0.001 and emits only atomic columns") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      // the driver's pandas canonicalizer sorts on every column and
      // cannot hash array/struct/map cells (the q118 red-row class) —
      // gated projections must be scalar-only
      import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
      val nonAtomic = df.schema.fields.filter(f => f.dataType match {
        case _: ArrayType | _: MapType | _: StructType => true
        case _ => false
      })
      assert(nonAtomic.isEmpty,
        s"$name emits non-scalar columns: ${nonAtomic.map(_.name).mkString(",")}")
      assert(df.count() >= 0, name)
    }
  }
  test("Verify resume seeds prior errors back (round-trips its own escaper)") {
    // the exact writer spelling from Verify.dumpErrors
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val errs = Map(
      "q01_project" -> "org.apache.spark.SparkException: boom",
      "q99_cms_heavy" -> "path \"x\\y\"\nnot found\t(line 2)")
    val json = errs.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    val parsed = Verify.parseErrors(json)
    assert(parsed == errs,
      "resume seeding must round-trip the writer exactly " +
        s"(got $parsed)")
    assert(Verify.parseErrors("{}").isEmpty)
  }
}
