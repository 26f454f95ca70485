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
    // r17 regression: multi-KB values (oracle_sql.json seeding on the
    // filtered-top-up path) must parse in O(1) stack — the previous
    // regex spelling StackOverflowed at ~2.8 KB and reported a healthy
    // replay as VERIFY-CRASH. 400 KB here: ~3 orders past the gate.
    val big = Map("q199_label_prop" ->
      ("SELECT * FROM t WHERE x = 'y' -- " + "pad \\\"deep\\\" " * 20000))
    val bigJson = big.toSeq
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    assert(Verify.parseErrors(bigJson) == big)
    // adjacent quoted strings WITHOUT a colon are not a pair (the
    // regex required the colon; the linear scan must too)
    assert(Verify.parseErrors("""{"a" "b", "c": "d"}""") ==
      Map("c" -> "d"))
  }

  test("Bench.stopThenGate: the gate line survives a throwing stop()") {
    // ADVICE r15: spark.stop() can throw on local-cluster teardown
    // races; the gate JSON must still be the last stdout line or the
    // driver-side parse regresses to the very "parsed": null failure
    // the print-after-stop ordering fixed.
    def lastLineWith(stop: () => Unit): String = {
      val bos = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(bos, true, "UTF-8")) {
        Bench.stopThenGate(stop, """{"metric":"total","value":1}""")
      }
      bos.toString("UTF-8").trim.linesIterator.toSeq.last
    }
    assert(lastLineWith(() => ()) == """{"metric":"total","value":1}""")
    assert(lastLineWith(() => throw new RuntimeException("teardown race"))
      == """{"metric":"total","value":1}""")
  }

  test("Verify adaptive-gates bypass is scoped per name; blanket 'run' " +
      "is retired and fails loudly") {
    val none = Verify.adaptiveBypassFn(None)
    assert(!none("q302_ann_adaptive"))
    // VERDICT r16 #8: the blanket bypass is a footgun (it turns the
    // unlisted family's PRECONDITION markers into bare mismatches) and
    // nothing has needed it since certify named the twins — a leftover
    // value must fail with the fix in the message, not silently bypass
    val ex = intercept[IllegalArgumentException] {
      Verify.adaptiveBypassFn(Some("run"))
    }
    assert(ex.getMessage.contains("retired") &&
      ex.getMessage.contains("q302_ann_adaptive"))
    val scoped = Verify.adaptiveBypassFn(
      Some("q302_ann_adaptive, q303_hard_negatives_adaptive"))
    assert(scoped("q302_ann_adaptive"))
    assert(scoped("q303_hard_negatives_adaptive"))
    assert(!scoped("q39_minhash_pairs"),
      "an unlisted gate name must keep its clamp pre-flight")
    assert(!scoped("q85_incremental_dedup"))
  }

  test("Bench.medianOf: lower-median of successes; failures never " +
      "masquerade as observations; all-failed stays -1") {
    assert(Bench.medianOf(Seq(3.0, 1.0, 2.0)) == 2.0)
    assert(Bench.medianOf(Seq(1.0, 2.0)) == 1.0)      // lower-median
    assert(Bench.medianOf(Seq(9.0)) == 9.0)
    assert(Bench.medianOf(Seq(-1.0, 5.0, 4.0)) == 4.0) // failure dropped
    assert(Bench.medianOf(Seq(-1.0, -1.0)) == -1.0)
    assert(Bench.medianOf(Nil) == -1.0)
    // the r17 motivating case: one I/O-drawn outlier must not grade
    assert(Bench.medianOf(Seq(8.4, 7.3, 14.1)) == 8.4)
  }

  test("Bench.warmPassExtraFn: scale-scoped stabilization opt-in parses " +
      "names, dedups, and fails loudly on a typo") {
    val known = Set("q130_pagerank", "q39_minhash_pairs")
    assert(Bench.warmPassExtraFn(None, known) == Nil)
    assert(Bench.warmPassExtraFn(Some(""), known) == Nil)
    assert(Bench.warmPassExtraFn(Some("q130_pagerank"), known) ==
      Seq("q130_pagerank"))
    assert(Bench.warmPassExtraFn(
      Some(" q130_pagerank , q39_minhash_pairs,q130_pagerank"), known) ==
      Seq("q130_pagerank", "q39_minhash_pairs"))
    // a misspelled name must not silently run the unstabilized protocol
    // while the receipt claims the stabilizers were on
    val ex = intercept[IllegalArgumentException] {
      Bench.warmPassExtraFn(Some("q130_pagernak"), known)
    }
    assert(ex.getMessage.contains("q130_pagernak") &&
      ex.getMessage.contains("SPARK_GRAFT_WARMPASS_EXTRA"))
  }

  test("LshScaleProbe pinned protocol: stride derives from n alone and " +
      "holds the sample near the 2000-query target") {
    import graft.tools.LshScaleProbe.{PinnedTargetQueries, pinnedStride}
    assert(PinnedTargetQueries == 2000L)
    assert(pinnedStride(200000L) == 100) // the r15 sf10 configuration
    assert(pinnedStride(20000L) == 10)   // sf1: now also 2000 queries
    assert(pinnedStride(1999L) == 1)     // tiny corpora: every vector
    assert(pinnedStride(0L) == 1)
    for (n <- Seq(2000L, 3000L, 65536L, 1L << 30)) {
      val q = n / pinnedStride(n)
      assert(q >= 2000 && q < 4000, s"n=$n samples $q queries")
    }
  }

  test("BandedDump: a 4-arg text invocation dies with the usage line, " +
      "not ArrayIndexOutOfBounds") {
    val ex = intercept[IllegalArgumentException] {
      graft.tools.BandedDump.main(Array("/x", "/y", "text", "24"))
    }
    assert(ex.getMessage.contains("usage"), ex.getMessage)
  }
}
