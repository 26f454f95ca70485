package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.DetMath
import graft.functions.TextExpr._
import graft.operators.{Sketches, Skew}

/** Round-4 pipeline operators: reshaping (unpivot), bounded-state
  * membership/frequency sketches (Bloom, count-min), RAG-shape text
  * chunking + token-budget packing, PII scrubbing, the typed mapGroups
  * surface, two-stage salted aggregation, and the oracle-gated
  * stream-stream join run.
  *
  * Every probabilistic structure here is DETERMINISTIC (md5-derived hash
  * positions, no library seeds), so the DuckDB oracle replays the exact
  * structure — approximation does not mean unverifiable.
  */
object Pipelines {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.read(s, dir, n)
  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.read(s, dir, "documents")

  // Bloom geometry: k hash functions over an m-position space. m = 2^18
  // keeps the whole bit set ≤ 256k rows (≈2 MB broadcast) while holding
  // the false-positive rate ≈ (1-e^{-kn/m})^k ≈ 1e-8 at n=400 corpus
  // docs — and still < 2% at n=10M with the same geometry scaled 100×.
  private val BloomK = 3
  private val BloomM = 1 << 18
  // Count-min geometry: d independent rows × w cells; error ≤ N/w per
  // estimate with probability 1 - (1/2)^d.
  private val CmsD = Sketches.CmsDefD
  private val CmsW = Sketches.CmsDefW
  // Chunking: C-token chunks every S tokens (overlap C-S), the RAG
  // retrieval shape; packing: B-token bins in doc_id order per source.
  private val ChunkC = 40
  private val ChunkS = 32
  private val PackB = 500
  // Vocab coverage: top-N tokens by corpus frequency (the synthetic
  // corpus has ~31 distinct tokens, so N=20 leaves a real OOV tail).
  private val VocabN = 20
  // q196: a quasi-identifier class needs >= L distinct sensitive values
  // (order priorities have a 5-value vocabulary, so L=3 leaves both
  // risky and safe classes at every SF).
  private val LDiversity = 3
  // q209: token budget per inference batch — each batch holds
  // (BatchToks DIV class-cap) docs padded to the class cap, so batch
  // tensor shape is (docs, cap) with docs*cap <= BatchToks.
  private val BatchToks = 256L

  /** Oracle CTEs yielding `ch(doc_id, chunk_idx, chunk)` — the DuckDB
    * twin of [[chunkFrame]], shared by the q100 and q151 oracles. */
  private lazy val chunkCtes: String =
    s"""toks AS (SELECT doc_id, ${toksDuck("text")} AS t
      |   FROM documents),
      | b AS (SELECT doc_id, t, len(t) AS n,
      |   CASE WHEN len(t) <= $ChunkC THEN 0
      |     ELSE (len(t) - $ChunkC + ${ChunkS - 1}) // $ChunkS END AS extra
      |   FROM toks),
      | c AS (SELECT doc_id, t, n,
      |   unnest(range(0, extra + 1)) AS chunk_idx FROM b),
      | ch AS (SELECT doc_id, chunk_idx,
      |   t[chunk_idx * $ChunkS + 1 :
      |     least(n, chunk_idx * $ChunkS + $ChunkC)] AS chunk FROM c)""".stripMargin

  /** q100's chunk stream (doc_id, chunk_idx, n_toks, chunk_md5) —
    * shared by the chunking gate itself and q151's chunk-level dedup. */
  private def chunkFrame(s: SparkSession, d: String): DataFrame =
    docs(s, d)
      .select(col("doc_id"), expr(toksSpark("text")).as("t"))
      .withColumn("n", size(col("t")))
      .withColumn("extra", expr(
        s"CASE WHEN n <= $ChunkC THEN 0 " +
          s"ELSE CAST((n - $ChunkC + ${ChunkS - 1}) DIV $ChunkS AS INT) END"))
      .select(col("doc_id"), col("t"),
        explode(expr("sequence(0, extra)")).as("chunk_idx"))
      .withColumn("chunk",
        expr(s"slice(t, chunk_idx * $ChunkS + 1, $ChunkC)"))
      .select(col("doc_id"), col("chunk_idx"),
        size(col("chunk")).as("n_toks"),
        expr("md5(array_join(chunk, ' '))").as("chunk_md5"))

  // q107 measures as exact integers: quantity/price truncated to whole
  // units (Spark CAST truncates toward zero; the oracle spells
  // CAST(TRUNC(x)) since DuckDB's CAST rounds — q79's convention),
  // discount/tax as cents. Scales keep n*sum(x*y) << 2^63 via the
  // DOUBLE combine below even at sf100.
  private def corrMeasures: Seq[(String, org.apache.spark.sql.Column)] = Seq(
    "qty" -> col("l_quantity").cast("long"),
    "price" -> col("l_extendedprice").cast("long"),
    "disc" -> DetMath.fixed(col("l_discount"), 2),
    "tax" -> DetMath.fixed(col("l_tax"), 2))

  private val NbBins = 10

  /** z-score from WHOLE-DOLLAR integer moments (digits=0: cents-squared
    * sums would pass 2^63 at sf0.1 already; dollar squares stay exact
    * through sf100), identical IEEE op order in both engines: mean and
    * sample variance (ddof=1) combined in DOUBLE, NULL for degenerate
    * groups. References agg aliases n/sx/sx2. */
  private def zscoreExpr(c: String): String =
    s"""CASE WHEN (CAST(n AS DOUBLE)*CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)) <= 0 THEN NULL
       | ELSE (CAST(CAST(FLOOR($c * 1 + 0.5) AS BIGINT) AS DOUBLE)
       |   - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) /
       |  SQRT((CAST(n AS DOUBLE)*CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)) /
       |   (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))) END""".stripMargin

  private val corrPairs: Seq[(String, String)] = {
    val ns = Seq("qty", "price", "disc", "tax")
    for { i <- ns.indices; j <- (i + 1) until ns.size }
      yield (ns(i), ns(j))
  }

  /** Pearson r from integer moments, combined in DOUBLE (each moment
    * converts exactly below 2^53; an int64 n*sxy would overflow first).
    * Identical spelling runs in Spark SQL and DuckDB.
    *
    * A degenerate group (n=1 or a constant measure) zeroes a variance
    * term; unguarded, Spark (ANSI) throws DIVIDE_BY_ZERO while DuckDB
    * yields NULL — and a rounding-induced slightly-negative
    * discriminant makes DuckDB's SQRT abort where Spark returns NaN.
    * The CASE pins both engines to the same answer: NULL when either
    * variance is <= 0 (correlation is undefined there). */
  private def corrFromMoments(sa: String, qa: String, sb: String,
      qb: String, pab: String): String = {
    def vari(s: String, q: String) =
      s"(CAST(n AS DOUBLE)*CAST($q AS DOUBLE) - CAST($s AS DOUBLE)*CAST($s AS DOUBLE))"
    s"""CASE WHEN ${vari(sa, qa)} <= 0 OR ${vari(sb, qb)} <= 0 THEN NULL
       | ELSE (CAST(n AS DOUBLE)*CAST($pab AS DOUBLE) - CAST($sa AS DOUBLE)*CAST($sb AS DOUBLE)) /
       |  (SQRT(${vari(sa, qa)}) * SQRT(${vari(sb, qb)})) END""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- q97: unpivot / melt (wide -> long reshaping) ----
    // Spark's native unpivot; no shuffle at all — a projection-only
    // reshape that stays inside whole-stage codegen.
    "q97_unpivot" -> ((s, d) =>
      t(s, d, "lineitem").unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_extendedprice"),
          col("l_discount"), col("l_tax")),
        "measure", "val")),

    // ---- q98: Bloom-filter batch admission ----
    // "Have I seen this document?" with corpus-size-independent state:
    // the corpus' exact-dup fingerprints are folded into a ≤ m-row bit
    // set; the batch probes it. true_dup (exact semi-join) rides along
    // so the oracle verifies BOTH the filter bits and the no-false-
    // negative guarantee (maybe_dup ⊇ true_dup; OperatorSpec asserts).
    "q98_bloom_admission" -> ((s, d) => {
      val all = docs(s, d).withColumn("fp",
        expr(fingerprintSpark(toksSpark("text"))))
      val corpus = all.filter(col("doc_id") % 5 =!= 0)
      val batch = all.filter(col("doc_id") % 5 === 0)
      val bits = Sketches.bloomBuild(corpus, "fp", BloomK, BloomM)
      val probed = Sketches.bloomProbe(batch, "doc_id", "fp", bits,
        BloomK, BloomM)
      val truth = batch
        .join(corpus.select("fp").distinct(), Seq("fp"), "left_semi")
        .select(col("doc_id"), lit(true).as("true_dup"))
      probed.join(truth, Seq("doc_id"), "left")
        .select(col("doc_id"), col("maybe_present").as("maybe_dup"),
          coalesce(col("true_dup"), lit(false)).as("true_dup"))
    }),

    // ---- q292: INCREMENTAL Bloom-bit maintenance ----
    // q98's admission bits run as persisted maintenance, opening the
    // Bloom face of the lattice family (q98 one-shot : q292
    // incremental : q293 streaming). The bit set is the DISTINCT of
    // hash positions — a set-union lattice, idempotent like q94's
    // registers and unlike q272's additive CMS cells — so corpus
    // history (doc_id % 4 < 3 of the corpus slice) pays one scan into
    // the persisted ≤ m-row bit table, the delta (== 3) appends only
    // ITS positions, and the query-time distinct-merge equals the
    // one-shot bit set EXACTLY (union of per-part position sets = the
    // position set of the union). The batch probe and true-dup rider
    // are then q98 verbatim — same oracle. 100 TB: state bounded at m
    // rows; the delta append never rescans history.
    "q292_incr_bloom" -> ((s, d) => {
      val all = docs(s, d).withColumn("fp",
        expr(fingerprintSpark(toksSpark("text"))))
      val corpus = all.filter(col("doc_id") % 5 =!= 0)
        .withColumn("b", pmod(col("doc_id"), lit(4)))
      val batch = all.filter(col("doc_id") % 5 === 0)
      graft.sources.Tables.writeTable(
        Sketches.bloomBuild(corpus.filter(col("b") < 3), "fp",
          BloomK, BloomM),
        "graft_q292_bits")
      Sketches.bloomBuild(corpus.filter(col("b") === 3), "fp",
          BloomK, BloomM)
        .write.mode("append").format("parquet")
        .saveAsTable("graft_q292_bits")
      val bits = s.table("graft_q292_bits").distinct()
      val probed = Sketches.bloomProbe(batch, "doc_id", "fp", bits,
        BloomK, BloomM)
      val truth = batch
        .join(corpus.select("fp").distinct(), Seq("fp"), "left_semi")
        .select(col("doc_id"), lit(true).as("true_dup"))
      probed.join(truth, Seq("doc_id"), "left")
        .select(col("doc_id"), col("maybe_present").as("maybe_dup"),
          coalesce(col("true_dup"), lit(false)).as("true_dup"))
    }),

    // ---- q293: STREAMING Bloom-bit maintenance ----
    // The streaming face: the corpus delta arrives as a document
    // stream and each micro-batch appends its own bit rows (see
    // EventStreams.streamingBloomBits — set-union lattice, so replays
    // are exactly harmless under the read-side distinct). The probe
    // and rider are q98 verbatim — same oracle again.
    "q293_stream_bloom" -> ((s, d) => {
      val bits = graft.streaming.EventStreams.streamingBloomBits(
        s, d, BloomK, BloomM)
      val all = docs(s, d).withColumn("fp",
        expr(fingerprintSpark(toksSpark("text"))))
      val corpus = all.filter(col("doc_id") % 5 =!= 0)
      val batch = all.filter(col("doc_id") % 5 === 0)
      val probed = Sketches.bloomProbe(batch, "doc_id", "fp", bits,
        BloomK, BloomM)
      val truth = batch
        .join(corpus.select("fp").distinct(), Seq("fp"), "left_semi")
        .select(col("doc_id"), lit(true).as("true_dup"))
      probed.join(truth, Seq("doc_id"), "left")
        .select(col("doc_id"), col("maybe_present").as("maybe_dup"),
          coalesce(col("true_dup"), lit(false)).as("true_dup"))
    }),

    // ---- q99: count-min-sketch heavy hitters ----
    // Token frequencies from a d×w-bounded sketch (state independent of
    // vocabulary size), estimates = min over the d counters, top-20 by
    // estimate. The exact count rides along: the oracle then verifies
    // the sketch bits AND exposes the one-sided error (est >= exact).
    "q99_cms_heavy" -> ((s, d) => {
      val toks = docs(s, d)
        .select(explode(expr(toksSpark("text"))).as("tok"))
      val sketch = Sketches.cmsBuild(toks, "tok", CmsD, CmsW)
      val exact = toks.groupBy("tok").agg(count(lit(1)).as("exact"))
      Sketches.cmsEstimate(exact.select("tok"), "tok", sketch, CmsD, CmsW)
        .join(exact, "tok")
        .orderBy(col("est").desc, col("tok"))
        .limit(20)
    }),

    // ---- q272: INCREMENTAL CMS heavy hitters (the SUM lattice) ----
    // The count-min sketch run as persisted maintenance, closing the
    // sketch-lattice family's last open member: HLL registers merge by
    // MAX (q94/q186), md5 half-samples by set union (q190), manifest
    // digests by sum/xor (q207/q210) — CMS counters merge by SUM, and
    // because per-batch cell counts are plain addends, the merged
    // sketch is EXACTLY the one-shot sketch (not merely estimate-
    // equal), so q99's oracle gates this query verbatim. History
    // (batches 0-2) pays one scan into a persisted d×w-bounded partial
    // table; the new batch appends only its own cells; query-time
    // merge sums partials — raw history is never rescanned. Unlike the
    // MAX/union lattices a REPLAYED batch double-counts here (the same
    // caveat as q140's additive rollup), which is why admission (q88)
    // sits in front of additive maintenance in the ingest story.
    "q272_incr_cms" -> ((s, d) => {
      val dk = docs(s, d).withColumn("b", pmod(col("doc_id"), lit(4)))
      def toksOf(part: DataFrame) =
        part.select(explode(expr(toksSpark("text"))).as("tok"))
      Tables.writeTable(
        Sketches.cmsBuild(toksOf(dk.filter(col("b") < 3)), "tok", CmsD, CmsW),
        "graft_cms_hist")
      Sketches.cmsBuild(toksOf(dk.filter(col("b") === 3)), "tok", CmsD, CmsW)
        .write.mode("append").format("parquet")
        .saveAsTable("graft_cms_hist")
      val merged = s.table("graft_cms_hist")
        .groupBy("r", "cell").agg(sum("cnt").as("cnt"))
      val toks = toksOf(dk)
      val exact = toks.groupBy("tok").agg(count(lit(1)).as("exact"))
      Sketches.cmsEstimate(exact.select("tok"), "tok", merged, CmsD, CmsW)
        .join(exact, "tok")
        .orderBy(col("est").desc, col("tok"))
        .limit(20)
    }),

    // ---- q273: STREAMING incremental CMS maintenance ----
    // q272's persisted count-min kept current by a document file
    // stream: each micro-batch appends only its own d×w-bounded cell
    // partials via foreachBatch, and SUM-lattice exactness makes the
    // merge equal the one-shot sketch under any micro-batch boundaries
    // — q99's oracle gates it verbatim (the q186 : q94 relationship
    // applied to the additive sketch; semantics and the replayed-batch
    // caveat pinned in EventStreams.incrementalCmsStream).
    "q273_stream_cms" -> ((s, d) =>
      graft.streaming.EventStreams.incrementalCmsStream(s, d)),

    // ---- q100: overlapping token-window chunking (RAG shape) ----
    // Each doc explodes into ceil-spaced C-token windows every S tokens;
    // pure per-row explode — embarrassingly parallel, no shuffle.
    "q100_doc_chunks" -> ((s, d) => chunkFrame(s, d)),

    // ---- q155: join-key skew audit ----
    // The pre-join diagnostic that decides salting (q70/q104) vs plain
    // shuffle: per candidate key column, row/key counts, the hottest
    // key's frequency, its ppm share, and max/mean in ppm (the skew
    // factor AQE's skewedPartitionFactor thresholds against). One
    // stack + two hash aggs — the per-key table never leaves the
    // cluster, only the 3-row summary does.
    "q155_skew_report" -> ((s, d) =>
      t(s, d, "lineitem")
        .select(expr("stack(3, 'l_orderkey', l_orderkey, " +
          "'l_partkey', l_partkey, 'l_suppkey', l_suppkey) AS (key_col, k)"))
        .groupBy("key_col", "k").agg(count(lit(1)).as("c"))
        .groupBy("key_col")
        .agg(sum("c").as("n_rows"), count(lit(1)).as("n_keys"),
          max("c").as("max_c"))
        .select(col("key_col"), col("n_rows"), col("n_keys"), col("max_c"),
          expr("max_c * 1000000 DIV n_rows").as("top_ppm"),
          expr("max_c * n_keys * 1000000 DIV n_rows").as("skew_x_ppm"))),

    // ---- q151: chunk-granular dedup report ----
    // Doc-level dedup misses a doc that REPEATS another doc's passage
    // inside otherwise-fresh text; retrieval pipelines dedup at the
    // CHUNK level. First owner per chunk fingerprint = min
    // (doc_id, chunk_idx) struct (one hash agg with map-side partial
    // min); every later occurrence is a duplicate chunk, reported per
    // doc as an exact-ppm redundancy rate. Composes q100's chunker with
    // the q143 first-owner discipline one level down.
    "q151_chunk_dedup" -> ((s, d) => {
      val ch = chunkFrame(s, d)
      val first = ch.groupBy("chunk_md5")
        .agg(min(struct(col("doc_id"), col("chunk_idx"))).as("fo"))
      ch.join(first, "chunk_md5")
        .withColumn("is_dup",
          (col("doc_id") =!= col("fo.doc_id") ||
            col("chunk_idx") =!= col("fo.chunk_idx")).cast("long"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_chunks"), sum("is_dup").as("n_dup"))
        .select(col("doc_id"), col("n_chunks"), col("n_dup"),
          expr("n_dup * 1000000 DIV n_chunks").as("dup_ppm"))
    }),

    // ---- q101: token-budget sequence packing ----
    // Deterministic next-fit packing of the per-source doc stream into
    // B-token bins: running token total in doc_id order, bin =
    // (cum - n) DIV B. Packing is inherently sequential PER STREAM; the
    // per-source partition is the parallelism unit (at 100 TB each
    // ingest stream packs independently — there is no global order to
    // preserve across sources).
    "q101_pack_budget" -> ((s, d) => {
      val base = docs(s, d).select(col("doc_id"), col("source"),
        expr(s"size(${toksSpark("text")})").as("n"))
      val w = Window.partitionBy("source").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      base.withColumn("cum", sum("n").over(w))
        .withColumn("bin", expr(s"(cum - n) DIV $PackB"))
        .groupBy("source", "bin")
        .agg(count(lit(1)).as("n_docs"), sum("n").as("tok_sum"),
          min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
    }),

    // ---- q277: consistent-hash re-shard plan (8 -> 12 shards) ----
    // The data-plane twin of the rescale façade (reference wire op
    // `rescale`, /root/reference/src/utils.hpp:18-34): before moving a
    // byte, quantify how much data a shard expansion relocates under
    // the two classic placement schemes. Key position h = first 16 md5
    // bits of the doc id; the 12 node positions are md5("node:i") —
    // string-literal hashes Catalyst CONSTANT-FOLDS at plan time, so
    // each ring assignment compiles to an array_min over 8/12 literal
    // (clockwise-distance, node) structs: O(nodes) per row inside
    // whole-stage codegen, ZERO shuffle, no node table to join or
    // broadcast. The report is the textbook contrast made exact:
    // mod placement (h % P) moves ~1-1/P' of ALL keys on any resize,
    // ring-successor placement moves only the span the 4 new nodes
    // claim (~34% of the 16-bit ring here; positions verified
    // pairwise-distinct, so every argmin is unique and both engines
    // agree). One narrow projection + one 1-row 3-counter aggregate;
    // node count is the only growth axis. The oracle re-derives the
    // same ring relationally (nodes CTE x distinct-h argmin join).
    "q277_reshard_plan" -> ((s, d) => {
      // The argmin-uniqueness claim above is load-bearing: on a position
      // tie Spark's struct array_min tie-breaks by node id while DuckDB's
      // arg_min is nondeterministic, so a node-count or label change
      // could silently de-align the engines. Assert pairwise-distinct
      // ring positions (12-node set covers the 8-node prefix) at build.
      def ringPosJvm(i: Int): Long = {
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(s"node:$i".getBytes("UTF-8"))
          .take(2).map("%02x".format(_)).mkString
        java.lang.Long.parseLong(hex, 16)
      }
      val ringPositions = (0 until 12).map(ringPosJvm)
      require(ringPositions.distinct.size == ringPositions.size,
        s"q277 ring positions must be pairwise distinct: $ringPositions")
      def posSql(i: Int): String =
        s"CAST(conv(substring(md5('node:$i'), 1, 4), 16, 10) AS BIGINT)"
      def ringNode(n: Int): Column = {
        val entries = (0 until n).map(i =>
          struct(expr(s"(${posSql(i)} - h + 65536) % 65536").as("dist"),
            lit(i.toLong).as("node")))
        array_min(array(entries: _*)).getField("node")
      }
      docs(s, d)
        .select(expr("CAST(conv(substring(md5(CAST(doc_id AS STRING)), " +
          "1, 4), 16, 10) AS BIGINT)").as("h"))
        .select((col("h") % 8).as("o_mod"), (col("h") % 12).as("n_mod"),
          ringNode(8).as("o_ring"), ringNode(12).as("n_ring"))
        .agg(count(lit(1)).as("n_keys"),
          sum(when(col("o_mod") =!= col("n_mod"), 1L).otherwise(0L))
            .as("mv_mod"),
          sum(when(col("o_ring") =!= col("n_ring"), 1L).otherwise(0L))
            .as("mv_ring"))
        .select(expr("stack(2, " +
          "'mod', n_keys, mv_mod, mv_mod * 1000000 DIV n_keys, " +
          "'ring', n_keys, mv_ring, mv_ring * 1000000 DIV n_keys) " +
          "AS (scheme, n_keys, n_moved, moved_ppm)"))
    }),

    // ---- q209: length-bucketed inference micro-batching ----
    // The batch planner an embedding/scoring pass over the corpus runs:
    // docs bucket by token-length CLASS (next power of two — fixed
    // tensor shapes, the padding-efficiency move), and each class packs
    // greedily into batches of (BatchToks DIV class-cap) docs, so every
    // batch's padded shape fits the same token budget. The class bound
    // is pure integer bit-math (1 << bitlength(n-1)) — no float log2,
    // so both engines agree exactly. Batch numbering is a row_number
    // per (source, class): the batching unit is the ingest shard, as in
    // q101's packing — classes within a shard order independently, so
    // parallelism is (shards × classes) and no global sort exists.
    // pad_waste = padded cells minus real tokens — the fraction the
    // class geometry wastes, the number you tune BatchToks against.
    "q209_length_batches" -> ((s, d) => {
      val base = docs(s, d).select(col("doc_id"), col("source"),
        expr(s"size(${toksSpark("text")})").as("n"))
        .filter(col("n") > 0)
      val cls = base.withColumn("cap_len", expr(
        """CASE WHEN n <= 1 THEN CAST(1 AS BIGINT)
          | ELSE CAST(shiftleft(1, length(bin(n - 1))) AS BIGINT)
          | END""".stripMargin))
      val w = Window.partitionBy("source", "cap_len").orderBy("doc_id")
      cls.withColumn("rn", row_number().over(w))
        .withColumn("batch", expr(s"CAST(rn - 1 AS BIGINT) DIV " +
          s"greatest(CAST(1 AS BIGINT), $BatchToks DIV cap_len)"))
        .groupBy("source", "cap_len", "batch")
        .agg(count(lit(1)).as("n_docs"), sum("n").as("tok_sum"))
        .withColumn("pad_waste",
          col("cap_len") * col("n_docs") - col("tok_sum"))
    }),

    // ---- q102: PII scrub (regex redaction) ----
    // Deterministic synthetic PII is appended (the corpus itself is
    // clean), then emails and 4+-digit runs are redacted in two passes
    // (emails first, so their digits don't half-match as numbers).
    // Patterns are chosen to mean the same thing in Java regex (Spark)
    // and RE2 (DuckDB). Pure per-row projection — scan-speed.
    // ---- q179: k-anonymity audit (equivalence-class histogram) ----
    // The privacy gate run before releasing a quasi-identified table:
    // group rows by the quasi-identifier tuple (nation, segment,
    // account-balance band), then histogram the equivalence-class
    // sizes — every row in a class smaller than k=5 is re-identifiable
    // by QI lookup. Two hash aggs (rows -> classes -> size histogram),
    // each strictly smaller than the last; the flag column makes the
    // risky mass a one-filter read. Exact integers end to end.
    "q179_k_anonymity" -> ((s, d) =>
      t(s, d, "customer")
        .groupBy(col("c_nationkey"), col("c_mktsegment"),
          expr("CAST(FLOOR(c_acctbal / 1000) AS BIGINT)").as("bal_band"))
        .agg(count(lit(1)).as("class_size"))
        .groupBy("class_size")
        .agg(count(lit(1)).as("n_classes"),
          sum("class_size").as("n_customers"))
        .withColumn("is_risky", col("class_size") < 5)),

    // ---- q196: l-diversity audit ----
    // q179's k-anonymity counts how many people share a quasi-identifier
    // class; l-diversity asks the stronger question — within each class,
    // how many DISTINCT sensitive values exist (a class of 50 people who
    // all share one diagnosis is k-anonymous and still leaks). Quasi-ids
    // here are (nation, segment); the sensitive attribute is the
    // customer's order priority. Plan shape: one join customer->orders
    // (orders side is the big one and shuffles once on custkey), then a
    // two-level hash agg — distinct (class, sensitive) pairs collapse
    // map-side before the per-class count, so the shuffle carries at
    // most |classes| x |priority vocabulary| rows at any corpus size.
    // Output is class-cardinality; risky = fewer than L distinct values.
    "q196_l_diversity" -> ((s, d) => {
      val cls = t(s, d, "customer").join(
          t(s, d, "orders"),
          col("c_custkey") === col("o_custkey"))
        .select(col("c_nationkey"), col("c_mktsegment"),
          col("o_orderpriority"))
      val pairs = cls.distinct()
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(count(lit(1)).as("l_distinct"))
      val sizes = cls.groupBy("c_nationkey", "c_mktsegment")
        .agg(count(lit(1)).as("class_size"))
      sizes.join(pairs, Seq("c_nationkey", "c_mktsegment"))
        .withColumn("is_risky", col("l_distinct") < LDiversity)
    }),

    "q102_pii_scrub" -> ((s, d) => {
      val email = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
      val nums = "[0-9]{4,}"
      docs(s, d)
        .withColumn("raw", concat(col("text"),
          lit(" contact user"), col("doc_id").cast("string"),
          lit("@mail.example.com ref "),
          (col("doc_id") * 7919).cast("string")))
        .withColumn("n_emails",
          size(regexp_extract_all(col("raw"), lit(email), lit(0))))
        .withColumn("s1", regexp_replace(col("raw"), email, "<EMAIL>"))
        .withColumn("n_nums",
          size(regexp_extract_all(col("s1"), lit(nums), lit(0))))
        .withColumn("scrubbed", regexp_replace(col("s1"), nums, "<NUM>"))
        .select(col("doc_id"), col("n_emails"), col("n_nums"),
          length(col("scrubbed")).as("scrub_len"),
          expr("md5(scrubbed)").as("scrub_md5"))
    }),

    // ---- q103: typed mapGroups per-group profile ----
    // The KeyValueGroupedDataset.mapGroups surface (SURVEY.md §2.9
    // superset): arbitrary JVM logic per group, the iterator STREAMED
    // (no per-group buffering), aggregation state O(1) per group. Sums
    // use the DetMath exact-cents contract so the result is
    // byte-identical to the SQL oracle.
    "q103_grouped_map" -> ((s, d) => {
      import s.implicits._
      t(s, d, "lineitem")
        .select(col("l_returnflag"), col("l_quantity"),
          col("l_extendedprice"), col("l_orderkey"))
        .as[(String, Double, Double, Long)]
        .groupByKey(_._1)
        .mapGroups { (flag, rows) =>
          var n = 0L; var qtyCents = 0L; var priceCents = 0L
          var mn = Long.MaxValue; var mx = Long.MinValue
          rows.foreach { case (_, q, p, o) =>
            n += 1
            qtyCents += math.floor(q * 100 + 0.5).toLong
            priceCents += math.floor(p * 100 + 0.5).toLong
            if (o < mn) mn = o
            if (o > mx) mx = o
          }
          (flag, n, qtyCents / 100.0, priceCents / 100.0, mn, mx)
        }
        .toDF("l_returnflag", "n_rows", "sum_qty", "sum_price",
          "okey_min", "okey_max")
    }),

    // ---- q104: two-stage salted aggregation ----
    // The aggregation twin of q70's salted join: (key, salt) partials
    // spread a hot key over 32 tasks, SUM-merge restores the exact
    // unsalted result (integer cents — order-free). Oracle is the PLAIN
    // group-by: the gate proves salting is invisible in the answer.
    "q104_salted_agg" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      Skew.saltedAgg(li, Seq("l_returnflag", "l_linestatus"),
          Seq("l_orderkey"), n = 32,
          Seq("n_rows" -> count(lit(1)),
            "qty_cents" -> sum(DetMath.fixed(col("l_quantity"), 2)),
            "price_cents" -> sum(DetMath.fixed(col("l_extendedprice"), 2))))
        .select(col("l_returnflag"), col("l_linestatus"), col("n_rows"),
          (col("qty_cents") / 100.0).as("sum_qty"),
          (col("price_cents") / 100.0).as("sum_price"))
    }),

    // ---- q106: Bloom-pruned join (runtime filter) ----
    // A selective build side (urgent orders) is folded into the bounded
    // bit set; the big probe side (lineitem) is pruned by k broadcast
    // semi-joins BEFORE the real join shuffles it. The oracle is the
    // PLAIN join: pruning must be invisible in the answer (no false
    // negatives; false positives die in the real join).
    "q106_bloom_join" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val urgent = t(s, d, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      val bits = Sketches.bloomBuild(urgent, "o_orderkey", BloomK, BloomM)
      val pruned = Sketches.bloomPrune(li, col("l_orderkey"), bits,
        BloomK, BloomM)
      pruned.join(urgent, col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          (sum(DetMath.fixed(col("l_quantity"), 2)) / 100.0).as("sum_qty"))
    }),

    // ---- q107: one-pass pairwise correlation matrix ----
    // All 6 Pearson correlations between 4 lineitem measures from ONE
    // aggregation of exact integer moments (14 sums), then the pair
    // rows are exploded from the 3 aggregated rows — one data scan and
    // one shuffle for the whole matrix (q79 generalized). Integer
    // scales chosen so every moment stays << 2^63 through sf100.
    "q107_corr_matrix" -> ((s, d) => {
      val li = t(s, d, "lineitem")
        .select(Seq(col("l_returnflag")) ++ corrMeasures.map {
          case (nm, c) => c.as(s"v_$nm") } : _*)
      val names = corrMeasures.map(_._1)
      val moments =
        names.map(n => sum(col(s"v_$n")).as(s"s_$n")) ++
        names.map(n => sum(col(s"v_$n") * col(s"v_$n")).as(s"q_$n")) ++
        corrPairs.map { case (a, b) =>
          sum(col(s"v_$a") * col(s"v_$b")).as(s"p_${a}_$b") }
      val agg = li.groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), moments: _*)
      val pairStructs = corrPairs.map { case (a, b) =>
        struct(lit(s"${a}_$b").as("pair"),
          expr(corrFromMoments(s"s_$a", s"q_$a", s"s_$b", s"q_$b",
            s"p_${a}_$b")).as("corr"))
      }
      agg.select(col("l_returnflag"), col("n"),
          explode(array(pairStructs: _*)).as("pc"))
        .select(col("l_returnflag"), col("n"),
          col("pc.pair").as("pair"), col("pc.corr").as("corr"))
    }),

    // ---- q108: vocabulary coverage / OOV-rate scoring ----
    // Corpus top-N vocab (count desc, token asc — deterministic), then
    // each doc's out-of-vocabulary token fraction via a broadcast-sized
    // vocab left join. The standard "does this doc fit my tokenizer"
    // quality signal; vocab stays tiny relative to the corpus at any
    // scale, so the token-level join is map-side.
    "q108_vocab_oov" -> ((s, d) => {
      val toks = docs(s, d)
        .select(col("doc_id"), explode(expr(toksSpark("text"))).as("tok"))
      // top-N via orderBy+limit => TakeOrderedAndProject (parallel
      // partial top-N per partition), NOT a row_number window, which
      // would funnel the whole vocabulary through one partition; the
      // (cnt desc, tok asc) total order makes the cut deterministic
      val vocab = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("tok"))
        .limit(VocabN)
        .select(col("tok"), lit(true).as("in_vocab"))
      toks.join(vocab, Seq("tok"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_toks"),
          sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("oov_cnt"))
        .withColumn("oov_ratio",
          col("oov_cnt").cast("double") / col("n_toks"))
    }),

    // ---- q109: equal-width feature binning histogram ----
    // Per-group [min, max] range split into NbBins equal buckets, per-
    // bucket counts: the feature-bucketing step of a training pipeline.
    // Two passes (tiny min/max agg broadcast back, then a scan-speed
    // per-row bucket expression + histogram agg); the bucket arithmetic
    // is the same IEEE ops in both engines, with x == max clamped into
    // the top bucket and constant groups pinned to bucket 1.
    "q109_feature_bins" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val rng = li.groupBy("l_returnflag")
        .agg(min("l_extendedprice").as("lo"), max("l_extendedprice").as("hi"))
      li.join(broadcast(rng), "l_returnflag")
        .withColumn("bucket", expr(
          s"""CASE WHEN hi = lo THEN CAST(1 AS BIGINT)
             | ELSE least(CAST($NbBins AS BIGINT),
             |   CAST(FLOOR((l_extendedprice - lo) / (hi - lo) * $NbBins)
             |     AS BIGINT) + 1) END""".stripMargin))
        .groupBy("l_returnflag", "bucket")
        .agg(count(lit(1)).as("cnt"))
    }),

    // ---- q110: per-group z-score normalization ----
    // Standardized features from exact integer whole-dollar moments
    // (sample std, ddof=1) combined in DOUBLE — every row normalized
    // against its group in one extra broadcast join, no window.
    // Degenerate groups (n=1 / constant) yield NULL like q107.
    "q110_zscore" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val m = li.groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(DetMath.fixed(col("l_extendedprice"), 0)).as("sx"),
          sum(DetMath.fixed(col("l_extendedprice"), 0) *
            DetMath.fixed(col("l_extendedprice"), 0)).as("sx2"))
      li.join(broadcast(m), "l_returnflag")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          expr(zscoreExpr("l_extendedprice")).as("z"))
    }),

    // ---- q111: event funnel (signup -> click -> purchase) ----
    // Strictly-ordered conversion: first signup, first click AFTER it,
    // first purchase after that — per-stage user counts. Each stage is
    // one equi-join on user_id plus a min-aggregation: the standard
    // funnel shape, all shuffles keyed on the same column so they
    // co-locate.
    "q111_funnel" -> ((s, d) => {
      val ev = t(s, d, "events")
      def firstAfter(tpe: String, prev: DataFrame, prevTs: String,
          outTs: String): DataFrame =
        ev.filter(col("event_type") === tpe)
          .join(prev, Seq("user_id"))
          .filter(col("ts") > col(prevTs))
          .groupBy("user_id").agg(min(col("ts")).as(outTs))
      val su = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min(col("ts")).as("ts0"))
      val cl = firstAfter("click", su, "ts0", "ts1")
      val pu = firstAfter("purchase", cl, "ts1", "ts2")
      su.agg(lit("signup").as("stage"), count(lit(1)).as("users"))
        .unionAll(cl.agg(lit("click_after_signup").as("stage"),
          count(lit(1)).as("users")))
        .unionAll(pu.agg(lit("purchase_after_click").as("stage"),
          count(lit(1)).as("users")))
    }),

    // ---- q246: deadline-bounded funnel (conversion windows) ----
    // q111's strictly-ordered funnel with DEADLINES: the click must
    // land within 7 days of first signup, the purchase within 7 days
    // of that click — stage users who convert too late fall out,
    // which is how growth funnels are actually scored. Same one-key
    // join chain (every shuffle on user_id co-locates); the bound is
    // exact µs arithmetic inside the stage filter.
    "q246_windowed_funnel" -> ((s, d) => {
      val ev = t(s, d, "events")
      val week = 7L * 24 * 3600 * 1000000L
      def firstWithin(tpe: String, prev: DataFrame, prevTs: String,
          outTs: String): DataFrame =
        ev.filter(col("event_type") === tpe)
          .join(prev, Seq("user_id"))
          .filter(col("ts") > col(prevTs) &&
            unix_micros(col("ts").cast("timestamp")) -
            unix_micros(col(prevTs).cast("timestamp")) <= week)
          .groupBy("user_id").agg(min(col("ts")).as(outTs))
      val su = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min(col("ts")).as("ts0"))
      val cl = firstWithin("click", su, "ts0", "ts1")
      val pu = firstWithin("purchase", cl, "ts1", "ts2")
      su.agg(lit("signup").as("stage"), count(lit(1)).as("users"))
        .unionAll(cl.agg(lit("click_7d").as("stage"),
          count(lit(1)).as("users")))
        .unionAll(pu.agg(lit("purchase_7d").as("stage"),
          count(lit(1)).as("users")))
    }),

    // ---- q233: signup→purchase conversion curve by day offset ----
    // q111 counts WHO converts; this shows WHEN: for each whole-day
    // offset since first signup, how many users made their first
    // post-signup purchase at that lag, cumulatively, and as ppm of
    // ALL signups (non-converters thin the ppm but add no row). Day
    // offsets are exact integer µs arithmetic. Both user-grain aggs
    // shuffle on user_id; the curve itself lives on the day-offset
    // table (bounded by the corpus time span), so its cumulative
    // global window and the 1-row signup-total broadcast are the
    // allow-listed bounded shapes (q147/q80 precedents).
    "q233_conversion_curve" -> ((s, d) => {
      val ev = t(s, d, "events")
      val su = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min("ts").as("ts0"))
      val pu = ev.filter(col("event_type") === "purchase")
        .join(su, Seq("user_id"))
        .filter(col("ts") > col("ts0"))
        .groupBy("user_id")
        .agg(min("ts").as("ts1"), min("ts0").as("t0"))
      val conv = pu.withColumn("off_d",
          expr("(unix_micros(CAST(ts1 AS TIMESTAMP)) - unix_micros(CAST(t0 AS TIMESTAMP))) DIV 86400000000"))
        .groupBy("off_d").agg(count(lit(1)).as("n_conv"))
      val tot = su.agg(count(lit(1)).as("n_signups"))
      val wc = Window.orderBy("off_d")
      conv.withColumn("cum_conv", sum("n_conv").over(wc))
        .crossJoin(broadcast(tot))
        .select(col("off_d"), col("n_conv"), col("cum_conv"),
          expr("cum_conv * 1000000 DIV n_signups").as("cum_ppm"))
    }),

    // ---- q105: stream-stream join, run to completion ----
    // purchasesAfterSignup as an actual streaming run (q65/q68 pattern):
    // both sides watermarked, state bounded by the 1-hour interval; the
    // driver hash-checks the emitted matches against the batch interval
    // join. NOTE: executing this entry RUNS the stream (an action).
    "q105_stream_join" -> ((s, d) =>
      graft.streaming.EventStreams.joinBatchEquivalent(s, d)),

    // ---- q169: LEFT OUTER stream-stream join (conversion report) ----
    // q105 shows only converters; this emits EVERY signup once — with
    // its in-window purchases or with NULLs — the funnel report a
    // streaming pipeline actually publishes. Unmatched rows flush on
    // watermark-driven state eviction (a staged far-future sentinel
    // advances the final watermark past every join window; see
    // EventStreams.signupConversions). NOTE: RUNS the stream.
    "q169_stream_left_join" -> ((s, d) =>
      graft.streaming.EventStreams.conversionsBatchEquivalent(s, d)),

    // ---- q254: FULL OUTER stream-stream join (reconciliation) ----
    // q105 shows converters, q169 adds non-converting signups; this
    // also surfaces ORPHAN purchases (no signup in the preceding hour)
    // — the two-sided reconciliation report that closes the streaming
    // join-type surface. Unmatched rows from BOTH sides flush on
    // watermark eviction via the q169 sentinel machinery. NOTE: RUNS
    // the stream.
    "q254_stream_full_outer" -> ((s, d) =>
      graft.streaming.EventStreams.reconciliationBatchEquivalent(s, d)),

    // ---- q180: stream-static enrichment join, run to completion ----
    // The dimension-lookup pattern every streaming pipeline starts
    // with: events stream joined to the static customer dim (stateless
    // map-side lookup, dim re-planned per micro-batch), rolled up per
    // (segment, type). NOTE: RUNS the stream.
    "q180_stream_enrich" -> ((s, d) =>
      graft.streaming.EventStreams.enrichBatchEquivalent(s, d)),

    // ---- q197: streaming exactly-once dedup of a replayed feed ----
    // The events table staged twice (at-least-once redelivery) and
    // collapsed by watermark-bounded dropDuplicates state back to the
    // single-delivery table, bit-for-bit — the oracle reads the
    // original table, so equality PROVES the replay was fully absorbed.
    // State is one key per event inside the 1-hour watermark horizon,
    // evicted as the watermark advances. NOTE: RUNS the stream.
    "q197_stream_dedup" -> ((s, d) =>
      graft.streaming.EventStreams.replayedDedupStream(s, d))
  )

  // ---- oracle SQL (DuckDB dialect, same algorithms) ----

  /** Bloom/CMS position of expression `v` in [0, m) for a seed given as
    * a SQL expression: DuckDB twin of Sketches.position
    * (nibble-polynomial hex decode, see TextExpr.hexIntDuck). */
  private def posDuckDyn(v: String, seedExpr: String, m: Int): String =
    s"(${hexIntDuck(s"md5($seedExpr || ':' || $v)", 7)} % $m)"

  private def posDuck(v: String, seed: Int, m: Int): String =
    posDuckDyn(v, s"'$seed'", m)

  private def posListDuck(v: String, k: Int, m: Int): String =
    (0 until k).map(posDuck(v, _, m)).mkString("[", ", ", "]")

  /** q99's CMS heavy-hitters replay — shared verbatim by q272's
    * incremental path (SUM-lattice exactness makes the two queries
    * answer-identical by construction; the shared oracle pins it). */
  /** q98's oracle — shared verbatim with q292/q293 (the Bloom bit set
    * is a set-union lattice, so incremental and streaming maintenance
    * land on the identical bits). */
  private lazy val bloomAdmissionSql: String =
    s"""WITH fps AS (SELECT doc_id,
      |   ${fingerprintDuck(toksDuck("text"))} AS fp FROM documents),
      | corpus AS (SELECT * FROM fps WHERE doc_id % 5 <> 0),
      | batch AS (SELECT * FROM fps WHERE doc_id % 5 = 0),
      | bits AS (SELECT DISTINCT pos FROM
      |   (SELECT unnest(${posListDuck("fp", BloomK, BloomM)}) AS pos
      |    FROM corpus)),
      | probe AS (SELECT doc_id,
      |   unnest(${posListDuck("fp", BloomK, BloomM)}) AS pos FROM batch),
      | hits AS (SELECT p.doc_id, count(*) AS h
      |   FROM probe p JOIN bits b ON p.pos = b.pos GROUP BY 1),
      | truth AS (SELECT DISTINCT b.doc_id
      |   FROM batch b JOIN corpus c ON b.fp = c.fp)
      |SELECT b.doc_id,
      | coalesce(h.h, 0) = $BloomK AS maybe_dup,
      | (t.doc_id IS NOT NULL) AS true_dup
      |FROM batch b
      |LEFT JOIN hits h ON b.doc_id = h.doc_id
      |LEFT JOIN truth t ON b.doc_id = t.doc_id""".stripMargin

  private lazy val cmsHeavySql: String =
    s"""WITH toks AS (SELECT unnest(${toksDuck("text")}) AS tok
      |   FROM documents),
      | cells AS (SELECT tok, g.r,
      |   ${posDuckDyn("tok", "CAST(g.r AS VARCHAR)", CmsW)} AS cell
      |   FROM toks CROSS JOIN generate_series(0, ${CmsD - 1}) AS g(r)),
      | sketch AS (SELECT r, cell, count(*) AS cnt
      |   FROM cells GROUP BY 1, 2),
      | exact AS (SELECT tok, count(*) AS exact FROM toks GROUP BY 1),
      | cand AS (SELECT e.tok, g.r,
      |   ${posDuckDyn("e.tok", "CAST(g.r AS VARCHAR)", CmsW)} AS cell
      |   FROM exact e CROSS JOIN generate_series(0, ${CmsD - 1}) AS g(r)),
      | est AS (SELECT c.tok, min(coalesce(s.cnt, 0)) AS est
      |   FROM cand c LEFT JOIN sketch s ON c.r = s.r AND c.cell = s.cell
      |   GROUP BY 1)
      |SELECT e.tok, est.est, e.exact
      |FROM est JOIN exact e ON est.tok = e.tok
      |ORDER BY est.est DESC, e.tok
      |LIMIT 20""".stripMargin

  val oracles: Map[String, String] = Map(
    "q97_unpivot" ->
      """SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS val FROM lineitem
        |UNION ALL SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
        |UNION ALL SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
        |UNION ALL SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem""".stripMargin,

    "q98_bloom_admission" -> bloomAdmissionSql,

    // Incremental == one-shot on the Bloom set-union lattice (the
    // distinct-merge of per-part position sets IS the one-shot bit
    // set), so the oracle is q98's verbatim — hash equality proves the
    // persisted maintenance path bit-equivalent to a full rebuild.
    "q292_incr_bloom" -> bloomAdmissionSql,

    // The streaming face shares the same one-shot oracle: micro-batch
    // boundaries are invisible to a set-union lattice, and replays are
    // idempotent under the read-side distinct.
    "q293_stream_bloom" -> bloomAdmissionSql,

    "q99_cms_heavy" -> cmsHeavySql,

    // Incremental == one-shot on the CMS SUM lattice (per-batch cell
    // counts are addends of the one-shot counts), so the ORACLE IS
    // q99's — hash equality proves the persisted maintenance path
    // byte-equivalent to a full recompute, the q140 : fullRollupSql
    // relationship applied to the count-min sketch.
    "q272_incr_cms" -> cmsHeavySql,

    // The streaming face shares the same one-shot oracle: micro-batch
    // boundaries are invisible to a SUM lattice.
    "q273_stream_cms" -> cmsHeavySql,

    "q100_doc_chunks" ->
      s"""WITH $chunkCtes
        |SELECT doc_id, chunk_idx, len(chunk) AS n_toks,
        | md5(array_to_string(chunk, ' ')) AS chunk_md5
        |FROM ch""".stripMargin,

    "q155_skew_report" ->
      """WITH s AS (
        |  SELECT 'l_orderkey' AS key_col, l_orderkey AS k FROM lineitem
        |  UNION ALL SELECT 'l_partkey', l_partkey FROM lineitem
        |  UNION ALL SELECT 'l_suppkey', l_suppkey FROM lineitem),
        | f AS (SELECT key_col, k, count(*) AS c FROM s GROUP BY 1, 2),
        | a AS (SELECT key_col, CAST(SUM(c) AS BIGINT) AS n_rows,
        |   count(*) AS n_keys, CAST(MAX(c) AS BIGINT) AS max_c
        |  FROM f GROUP BY 1)
        |SELECT key_col, n_rows, n_keys, max_c,
        | (max_c * 1000000) // n_rows AS top_ppm,
        | (max_c * n_keys * 1000000) // n_rows AS skew_x_ppm
        |FROM a""".stripMargin,

    "q151_chunk_dedup" ->
      s"""WITH $chunkCtes,
        | f AS (SELECT doc_id, chunk_idx,
        |   md5(array_to_string(chunk, ' ')) AS chunk_md5 FROM ch),
        | fo AS (SELECT chunk_md5, MIN(doc_id) AS fo_doc FROM f GROUP BY 1),
        | fo2 AS (SELECT x.chunk_md5, x.fo_doc, MIN(y.chunk_idx) AS fo_idx
        |  FROM fo x JOIN f y ON y.chunk_md5 = x.chunk_md5
        |    AND y.doc_id = x.fo_doc
        |  GROUP BY 1, 2),
        | d AS (SELECT f.doc_id,
        |   CASE WHEN f.doc_id <> fo2.fo_doc
        |     OR f.chunk_idx <> fo2.fo_idx THEN 1 ELSE 0 END AS is_dup
        |  FROM f JOIN fo2 USING (chunk_md5))
        |SELECT doc_id, count(*) AS n_chunks,
        | CAST(SUM(is_dup) AS BIGINT) AS n_dup,
        | (CAST(SUM(is_dup) AS BIGINT) * 1000000) // count(*) AS dup_ppm
        |FROM d GROUP BY 1""".stripMargin,

    "q101_pack_budget" ->
      s"""WITH t AS (SELECT doc_id, source,
        |   len(${toksDuck("text")}) AS n FROM documents),
        | c AS (SELECT doc_id, source, n,
        |   SUM(n) OVER (PARTITION BY source ORDER BY doc_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |   FROM t)
        |SELECT source, CAST((cum - n) // $PackB AS BIGINT) AS bin,
        | count(*) AS n_docs, CAST(SUM(n) AS BIGINT) AS tok_sum,
        | MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        |FROM c GROUP BY 1, 2""".stripMargin,

    "q277_reshard_plan" ->
      s"""WITH k AS (SELECT ${hexIntDuck("md5(CAST(doc_id AS VARCHAR))", 4)}
        |   AS h FROM documents),
        | kh AS (SELECT h, count(*) AS c FROM k GROUP BY 1),
        | nodes AS (SELECT i,
        |   ${hexIntDuck("md5('node:' || CAST(i AS VARCHAR))", 4)} AS p
        |  FROM range(12) t(i)),
        | a AS (SELECT kh.h, kh.c,
        |   arg_min(n.i, (n.p - kh.h + 65536) % 65536) AS n_ring
        |  FROM kh CROSS JOIN nodes n GROUP BY 1, 2),
        | o AS (SELECT kh.h,
        |   arg_min(n.i, (n.p - kh.h + 65536) % 65536) AS o_ring
        |  FROM kh CROSS JOIN nodes n WHERE n.i < 8 GROUP BY 1),
        | m AS (SELECT a.h, a.c, a.n_ring, o.o_ring,
        |   a.h % 8 AS o_mod, a.h % 12 AS n_mod
        |  FROM a JOIN o ON a.h = o.h),
        | s AS (SELECT CAST(SUM(c) AS BIGINT) AS n_keys,
        |   CAST(SUM(CASE WHEN o_mod <> n_mod THEN c ELSE 0 END)
        |     AS BIGINT) AS mv_mod,
        |   CAST(SUM(CASE WHEN o_ring <> n_ring THEN c ELSE 0 END)
        |     AS BIGINT) AS mv_ring
        |  FROM m)
        |SELECT 'mod' AS scheme, n_keys, mv_mod AS n_moved,
        |  mv_mod * 1000000 // n_keys AS moved_ppm FROM s
        |UNION ALL
        |SELECT 'ring' AS scheme, n_keys, mv_ring AS n_moved,
        |  mv_ring * 1000000 // n_keys AS moved_ppm FROM s""".stripMargin,

    "q209_length_batches" ->
      s"""WITH t AS (SELECT doc_id, source,
        |   len(${toksDuck("text")}) AS n FROM documents),
        | c AS (SELECT doc_id, source, n,
        |   CAST(CASE WHEN n <= 1 THEN 1
        |     ELSE 1 << length(bin(n - 1)) END AS BIGINT) AS cap_len
        |  FROM t WHERE n > 0),
        | r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY source, cap_len
        |   ORDER BY doc_id) AS rn FROM c),
        | b AS (SELECT source, cap_len,
        |   CAST(rn - 1 AS BIGINT)
        |     // greatest(CAST(1 AS BIGINT), $BatchToks // cap_len)
        |     AS batch, n FROM r)
        |SELECT source, cap_len, batch, count(*) AS n_docs,
        | CAST(SUM(n) AS BIGINT) AS tok_sum,
        | CAST(cap_len * count(*) - SUM(n) AS BIGINT) AS pad_waste
        |FROM b GROUP BY 1, 2, 3""".stripMargin,

    "q102_pii_scrub" ->
      """WITH r AS (SELECT doc_id,
        |   text || ' contact user' || CAST(doc_id AS VARCHAR)
        |     || '@mail.example.com ref ' || CAST(doc_id * 7919 AS VARCHAR)
        |   AS raw FROM documents),
        | s AS (SELECT doc_id,
        |   len(regexp_extract_all(raw,
        |     '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS n_emails,
        |   regexp_replace(raw, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}',
        |     '<EMAIL>', 'g') AS s1 FROM r)
        |SELECT doc_id, n_emails,
        | len(regexp_extract_all(s1, '[0-9]{4,}')) AS n_nums,
        | length(regexp_replace(s1, '[0-9]{4,}', '<NUM>', 'g')) AS scrub_len,
        | md5(regexp_replace(s1, '[0-9]{4,}', '<NUM>', 'g')) AS scrub_md5
        |FROM s""".stripMargin,

    "q103_grouped_map" ->
      """SELECT l_returnflag, count(*) AS n_rows,
        | SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)) / 100.0 AS sum_qty,
        | SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) / 100.0 AS sum_price,
        | MIN(l_orderkey) AS okey_min, MAX(l_orderkey) AS okey_max
        |FROM lineitem GROUP BY 1""".stripMargin,

    "q104_salted_agg" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
        | SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)) / 100.0 AS sum_qty,
        | SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) / 100.0 AS sum_price
        |FROM lineitem GROUP BY 1, 2""".stripMargin,

    "q106_bloom_join" ->
      """SELECT l_returnflag, count(*) AS n,
        | SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)) / 100.0 AS sum_qty
        |FROM lineitem l JOIN orders o
        | ON l.l_orderkey = o.o_orderkey AND o.o_orderpriority = '1-URGENT'
        |GROUP BY 1""".stripMargin,

    "q107_corr_matrix" -> {
      val moments =
        corrMeasures.map(_._1).map(n =>
          s"CAST(SUM(v_$n) AS BIGINT) AS s_$n, " +
            s"CAST(SUM(v_$n*v_$n) AS BIGINT) AS q_$n") ++
        corrPairs.map { case (a, b) =>
          s"CAST(SUM(v_$a*v_$b) AS BIGINT) AS p_${a}_$b" }
      val pairSelects = corrPairs.map { case (a, b) =>
        s"""SELECT l_returnflag, n, '${a}_$b' AS pair,
           |${corrFromMoments(s"s_$a", s"q_$a", s"s_$b", s"q_$b",
              s"p_${a}_$b")} AS corr FROM agg""".stripMargin
      }
      s"""WITH m AS (SELECT l_returnflag,
        |  CAST(TRUNC(l_quantity) AS BIGINT) AS v_qty,
        |  CAST(TRUNC(l_extendedprice) AS BIGINT) AS v_price,
        |  ${graft.functions.DetMath.fixedSql("l_discount", 2)} AS v_disc,
        |  ${graft.functions.DetMath.fixedSql("l_tax", 2)} AS v_tax
        | FROM lineitem),
        | agg AS (SELECT l_returnflag, COUNT(*) AS n,
        |  ${moments.mkString(",\n  ")}
        | FROM m GROUP BY l_returnflag)
        |${pairSelects.mkString("\nUNION ALL\n")}""".stripMargin
    },

    "q108_vocab_oov" ->
      s"""WITH toks AS (SELECT doc_id, unnest(${toksDuck("text")}) AS tok
        |   FROM documents),
        | vc AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY 1),
        | vocab AS (SELECT tok FROM
        |   (SELECT tok, row_number() OVER (ORDER BY cnt DESC, tok) AS rn
        |    FROM vc) WHERE rn <= $VocabN)
        |SELECT t.doc_id, count(*) AS n_toks,
        | CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |   AS oov_cnt,
        | CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |   / count(*) AS oov_ratio
        |FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
        |GROUP BY 1""".stripMargin,

    "q109_feature_bins" ->
      s"""WITH rng AS (SELECT l_returnflag, MIN(l_extendedprice) AS lo,
        |   MAX(l_extendedprice) AS hi FROM lineitem GROUP BY 1)
        |SELECT l.l_returnflag,
        | CASE WHEN hi = lo THEN CAST(1 AS BIGINT)
        |  ELSE least(CAST($NbBins AS BIGINT),
        |    CAST(FLOOR((l_extendedprice - lo) / (hi - lo) * $NbBins)
        |      AS BIGINT) + 1) END AS bucket,
        | count(*) AS cnt
        |FROM lineitem l JOIN rng ON l.l_returnflag = rng.l_returnflag
        |GROUP BY 1, 2""".stripMargin,

    "q110_zscore" ->
      s"""WITH m AS (SELECT l_returnflag, COUNT(*) AS n,
        |  CAST(SUM(CAST(FLOOR(l_extendedprice * 1 + 0.5) AS BIGINT)) AS BIGINT) AS sx,
        |  CAST(SUM(CAST(FLOOR(l_extendedprice * 1 + 0.5) AS BIGINT)
        |    * CAST(FLOOR(l_extendedprice * 1 + 0.5) AS BIGINT)) AS BIGINT) AS sx2
        | FROM lineitem GROUP BY 1)
        |SELECT l_orderkey, l_linenumber, l.l_returnflag,
        | ${zscoreExpr("l_extendedprice")} AS z
        |FROM lineitem l JOIN m ON l.l_returnflag = m.l_returnflag""".stripMargin,

    "q111_funnel" ->
      """WITH base AS (SELECT user_id, event_type,
        |   CAST(ts AS TIMESTAMP) AS ts FROM events),
        | su AS (SELECT user_id, MIN(ts) AS ts0 FROM base
        |   WHERE event_type = 'signup' GROUP BY 1),
        | cl AS (SELECT e.user_id, MIN(e.ts) AS ts1 FROM base e
        |   JOIN su ON e.user_id = su.user_id AND e.ts > su.ts0
        |   WHERE e.event_type = 'click' GROUP BY 1),
        | pu AS (SELECT e.user_id, MIN(e.ts) AS ts2 FROM base e
        |   JOIN cl ON e.user_id = cl.user_id AND e.ts > cl.ts1
        |   WHERE e.event_type = 'purchase' GROUP BY 1)
        |SELECT 'signup' AS stage, count(*) AS users FROM su
        |UNION ALL SELECT 'click_after_signup', count(*) FROM cl
        |UNION ALL SELECT 'purchase_after_click', count(*) FROM pu""".stripMargin,

    "q246_windowed_funnel" ->
      """WITH base AS (SELECT user_id, event_type,
        |   CAST(ts AS TIMESTAMP) AS ts FROM events),
        | su AS (SELECT user_id, MIN(ts) AS ts0 FROM base
        |   WHERE event_type = 'signup' GROUP BY 1),
        | cl AS (SELECT e.user_id, MIN(e.ts) AS ts1 FROM base e
        |   JOIN su ON e.user_id = su.user_id AND e.ts > su.ts0
        |    AND EPOCH_US(e.ts) - EPOCH_US(su.ts0) <= 604800000000
        |   WHERE e.event_type = 'click' GROUP BY 1),
        | pu AS (SELECT e.user_id, MIN(e.ts) AS ts2 FROM base e
        |   JOIN cl ON e.user_id = cl.user_id AND e.ts > cl.ts1
        |    AND EPOCH_US(e.ts) - EPOCH_US(cl.ts1) <= 604800000000
        |   WHERE e.event_type = 'purchase' GROUP BY 1)
        |SELECT 'signup' AS stage, count(*) AS users FROM su
        |UNION ALL SELECT 'click_7d', count(*) FROM cl
        |UNION ALL SELECT 'purchase_7d', count(*) FROM pu""".stripMargin,

    "q233_conversion_curve" ->
      """WITH su AS (SELECT user_id, min(ts) AS ts0 FROM events
        |   WHERE event_type = 'signup' GROUP BY 1),
        | pu AS (SELECT e.user_id, min(e.ts) AS ts1, min(su.ts0) AS t0
        |   FROM events e JOIN su ON e.user_id = su.user_id
        |   WHERE e.event_type = 'purchase' AND e.ts > su.ts0
        |   GROUP BY 1),
        | conv AS (SELECT (epoch_us(ts1) - epoch_us(t0)) // 86400000000
        |     AS off_d, count(*) AS n_conv FROM pu GROUP BY 1),
        | tot AS (SELECT count(*) AS n_signups FROM su)
        |SELECT off_d, n_conv,
        | CAST(SUM(n_conv) OVER (ORDER BY off_d) AS BIGINT) AS cum_conv,
        | CAST(SUM(n_conv) OVER (ORDER BY off_d) * 1000000 // n_signups
        |   AS BIGINT) AS cum_ppm
        |FROM conv CROSS JOIN tot""".stripMargin,

    "q105_stream_join" ->
      """WITH base AS (SELECT event_id, event_type, user_id, value,
        |   CAST(ts AS TIMESTAMP) AS ts FROM events),
        | s AS (SELECT event_id AS signup_id, user_id, ts
        |   FROM base WHERE event_type = 'signup'),
        | p AS (SELECT event_id AS purchase_id, user_id, ts, value
        |   FROM base WHERE event_type = 'purchase')
        |SELECT s.signup_id, p.purchase_id, p.user_id AS user_id, p.value
        |FROM p JOIN s
        | ON p.user_id = s.user_id AND p.ts >= s.ts
        |  AND p.ts < s.ts + INTERVAL 1 HOUR""".stripMargin,

    "q180_stream_enrich" ->
      s"""SELECT c.c_mktsegment, e.event_type, count(*) AS cnt,
        | ${DetMath.sumFixedSql("e.value", 2)} AS sum_val
        |FROM events e JOIN customer c ON c.c_custkey = e.user_id
        |GROUP BY 1, 2""".stripMargin,

    "q197_stream_dedup" ->
      """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id,
        | event_type, value FROM events""".stripMargin,

    "q196_l_diversity" ->
      s"""WITH cls AS (SELECT c_nationkey, c_mktsegment, o_orderpriority
        |  FROM customer JOIN orders ON c_custkey = o_custkey),
        | sizes AS (SELECT c_nationkey, c_mktsegment, count(*) AS class_size
        |  FROM cls GROUP BY 1, 2),
        | lv AS (SELECT c_nationkey, c_mktsegment,
        |   count(DISTINCT o_orderpriority) AS l_distinct
        |  FROM cls GROUP BY 1, 2)
        |SELECT c_nationkey, c_mktsegment, class_size, l_distinct,
        | l_distinct < $LDiversity AS is_risky
        |FROM sizes JOIN lv USING (c_nationkey, c_mktsegment)""".stripMargin,

    "q179_k_anonymity" ->
      """WITH cls AS (SELECT c_nationkey, c_mktsegment,
        |   CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_band,
        |   count(*) AS class_size
        |  FROM customer GROUP BY 1, 2, 3)
        |SELECT class_size, count(*) AS n_classes,
        | CAST(SUM(class_size) AS BIGINT) AS n_customers,
        | class_size < 5 AS is_risky
        |FROM cls GROUP BY class_size""".stripMargin,

    "q169_stream_left_join" ->
      """WITH base AS (SELECT event_id, event_type, user_id, value,
        |   CAST(ts AS TIMESTAMP) AS ts FROM events),
        | s AS (SELECT event_id AS signup_id, user_id, ts
        |   FROM base WHERE event_type = 'signup'),
        | p AS (SELECT event_id AS purchase_id, user_id, ts, value
        |   FROM base WHERE event_type = 'purchase')
        |SELECT s.signup_id, s.user_id AS user_id, p.purchase_id, p.value
        |FROM s LEFT JOIN p
        | ON p.user_id = s.user_id AND p.ts >= s.ts
        |  AND p.ts < s.ts + INTERVAL 1 HOUR""".stripMargin,

    "q254_stream_full_outer" ->
      """WITH base AS (SELECT event_id, event_type, user_id, value,
        |   CAST(ts AS TIMESTAMP) AS ts FROM events),
        | s AS (SELECT event_id AS signup_id, user_id, ts
        |   FROM base WHERE event_type = 'signup'),
        | p AS (SELECT event_id AS purchase_id, user_id, ts, value
        |   FROM base WHERE event_type = 'purchase')
        |SELECT s.signup_id, COALESCE(s.user_id, p.user_id) AS user_id,
        | p.purchase_id, p.value
        |FROM s FULL OUTER JOIN p
        | ON p.user_id = s.user_id AND p.ts >= s.ts
        |  AND p.ts < s.ts + INTERVAL 1 HOUR""".stripMargin
  )
}
