package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.TextExpr._
import graft.operators.Sampling

/** Round-6 corpus-curation operators: benchmark decontamination,
  * boilerplate-phrase scoring, an inverted index, latest-record-per-key
  * argmax without a window sort, deterministic shard assignment for
  * training-data export, and within-document token co-occurrence.
  *
  * These are the remaining day-to-day moves of an LLM training-data
  * pipeline the inventory didn't yet cover; the reference has no text
  * surface at all (tables only, SURVEY.md §1.1), so all six are
  * extensions. Every count/hash here is integer or md5-derived, so the
  * DuckDB oracle replays each one exactly.
  */
object Curation {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.read(s, dir, n)
  private def docs(s: SparkSession, dir: String): DataFrame = {
    graft.functions.TextNative.register(s)
    Tables.read(s, dir, "documents")
  }

  /** Native one-pass tokenizer — bit-identical to TextExpr.toksSpark
    * (the spec spelling the oracle keeps using); the gram queries here
    * tokenize the whole corpus per scan, so the fused JVM loop beats
    * the interpreted HigherOrderFunction chain measurably. */
  private val toksNat = "graft_tokens(text)"

  // Decontamination gram width: measured on the driver corpus, 3-grams
  // flag 89% of training docs (the vocabulary is tiny, so trigram
  // collisions are chance, not contamination) while 4-grams flag ~9% —
  // the realistic "this doc quotes the benchmark" signal. Real
  // pipelines use 8-13-gram overlap on natural text; the width is a
  // parameter, the plan shape is what scales.
  private val DecontN = 4
  // q280's cross-split contamination gram width: the 13-gram GPT-3
  // standard scaled to this 10-99-token corpus — wide enough that a
  // verbatim hit is quotation, narrow enough that most docs carry
  // grams at all (docs under ContamN tokens have none and fall out).
  private val ContamN = 8
  // Boilerplate: a 3-gram appearing in >= BoilDf distinct docs is
  // corpus-boilerplate (the C4 move, phrase-level since this corpus has
  // no newlines to split into lines).
  private val BoilN = 3
  private val BoilDf = 5
  // q195's duplicated-span gram width: 4 tokens — wide enough that a
  // cross-doc repeat is copied text, not vocabulary chance (same
  // measurement as DecontN); real pipelines run 50-token windows.
  private val DupSpanN = 4
  private val Shards = 8
  // Per-stratum hard cap for the quota sample.
  private val QuotaK = 40
  // q252/q274: floor(log2(col)) as a 20-branch CASE cascade over powers
  // of two — the SAME text runs in Spark and DuckDB, so no libm log
  // enters either engine (values ∈ [0, 1e6]; 0 falls to the ELSE,
  // capping a pair's surprisal at 20 bits).
  private def log2CaseOn(c: String): String = "CASE " + (19 to 0 by -1)
    .map(k => s"WHEN $c >= ${1L << k} THEN $k").mkString(" ") + " ELSE 0 END"
  private val Log2Case: String = log2CaseOn("p_ppm")
  // q148's token budget — selects a strict subset at every SF.
  private val TokenBudget = 10000L
  // q164's retrieval query terms: two common tokens plus the one rare
  // token in the synthetic vocabulary, so the idf weighting is visible.
  private val Bm25Terms = Seq("spark", "vector", "dup")
  private val Bm25K = 5
  // q208's conjunctive query: three mid-frequency terms, so the AND
  // intersection is a strict subset of every single term's postings.
  private val BoolTerms = Seq("vector", "merge", "stream")
  // q235's skip-gram context window (tokens to the right of the
  // center) and report threshold.
  private val SkipW = 3
  private val SkipMin = 20L

  /** Exploded (doc_id, gram) pairs of word n-grams — NOT deduplicated:
    * a caller that needs "docs containing" semantics must place its own
    * .distinct() AFTER whatever filter shrinks the stream, so the
    * dedup shuffle runs over the smallest possible set (q116 dedups
    * only the benchmark-matched pairs; q117 genuinely needs the
    * corpus-wide distinct because document frequency is a corpus-wide
    * stat). */
  private def gramPairs(d: DataFrame, n: Int): DataFrame =
    d.select(col("doc_id"),
      explode(expr(s"graft_ngrams(text, $n)")).as("g"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- q116: benchmark decontamination ----
    // Docs with doc_id % 19 == 0 stand in for a held-out benchmark; a
    // training doc sharing ANY full 4-gram with the benchmark set is
    // contaminated. 100 TB shape: the benchmark gram set is tiny and
    // BROADCAST — the corpus side is scanned once, exploded, and
    // semi-join-filtered map-side with NO shuffle; only the matched
    // pairs are deduplicated and counted (the dedup shuffle runs over
    // the hit set, never the corpus), and the hit flags join back
    // without a forced broadcast — hit cardinality is corpus-bounded,
    // so that join is left to AQE. Output keeps every training doc
    // with its hit count, so both the keep and drop sides of the gate
    // are proven.
    "q116_decontaminate" -> ((s, d) => {
      val pairs = gramPairs(docs(s, d), DecontN)
      val benchGrams = pairs.filter(col("doc_id") % 19 === 0)
        .select("g").distinct()
      val hits = pairs.filter(col("doc_id") % 19 =!= 0)
        .join(broadcast(benchGrams), Seq("g"), "left_semi")
        .distinct()
        .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
      docs(s, d).filter(col("doc_id") % 19 =!= 0)
        .join(hits, Seq("doc_id"), "left")
        .select(col("doc_id"), col("source"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"),
          col("n_hits").isNull.as("keep"))
    }),

    // ---- q280: cross-split exact n-gram contamination ----
    // The GPT-3-style decontamination measurement, at the scale shape
    // q116 deliberately avoids: there the "benchmark" gram set is tiny
    // and BROADCAST; here BOTH sides are corpus-scale — train is 90% of
    // the corpus and eval 10% (q278's md5-range split, computed IN-ROW
    // on the gram stream since it is a pure function of doc_id — no
    // split-table join at all). The contamination check is therefore a
    // gram-keyed SHUFFLE semi-join (hash-partition both sides on g;
    // AQE picks the physical join — never a broadcast), reported from
    // the EVAL side: for each eval doc, how many of its distinct
    // $ContamN-grams appear verbatim anywhere in train. The gram width
    // is the 13-gram standard scaled to this 10-99-token corpus (same
    // reasoning as DecontN); eval docs shorter than $ContamN tokens
    // have no grams and fall out in BOTH engines (documented, not
    // hidden). Per-doc aggregates combine map-side; nothing in the
    // plan grows faster than the gram stream itself.
    "q280_gram_contamination" -> ((s, d) => {
      val g = gramPairs(docs(s, d), ContamN)
        .withColumn("rk", expr(TextDedup.splitRkSpark("doc_id")))
      val trainG = g.filter(col("rk") === 0).select("g").distinct()
      val evalG = g.filter(col("rk") > 0)
        .select("doc_id", "rk", "g").distinct()
      val perDoc = evalG.groupBy("doc_id", "rk")
        .agg(count(lit(1)).as("n_grams"))
      val hits = evalG.join(trainG, Seq("g"), "left_semi")
        .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
      perDoc.join(hits, Seq("doc_id"), "left")
        .select(col("doc_id"),
          TextDedup.splitName(col("rk")).as("split"),
          col("n_grams"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"),
          (coalesce(col("n_hits"), lit(0L)) > 0).as("contaminated"))
    }),

    // ---- q288: incremental decontamination admission ----
    // q116's benchmark gate run the way a crawl pipeline actually runs
    // it: the benchmark gram set is built ONCE and PERSISTED (the
    // frozen eval suite), and the training corpus arrives in batches —
    // here 4 deterministic doc_id%4 increments — each probing the
    // persisted index independently. Because the index is frozen and
    // batches are disjoint, the union of per-batch admissions equals
    // the one-shot gate REGARDLESS of batch boundaries; this query
    // therefore shares q116's oracle verbatim, so the incremental ==
    // one-shot law is hash-proven by the gate itself (and pinned
    // cross-query in OperatorSpec). Scale: per batch the index is a
    // broadcast semi-join over the batch's gram stream only — no
    // corpus-side rescan, no shuffle beyond the per-doc agg; the
    // 4-way loop is a bounded driver constant (the q202/q270
    // precedent), each iteration a separate read of the persisted
    // index exactly as separate pipeline runs would.
    "q288_incr_decontaminate" -> ((s, d) => {
      val benchGrams = gramPairs(docs(s, d), DecontN)
        .filter(col("doc_id") % 19 === 0).select("g").distinct()
      graft.sources.Tables.writeTable(benchGrams, "graft_gram_index_q288")
      val batches = (0 until 4).map { b =>
        val idx = s.table("graft_gram_index_q288")
        val batch = docs(s, d)
          .filter(col("doc_id") % 19 =!= 0 && col("doc_id") % 4 === b)
        val hits = gramPairs(batch, DecontN)
          .join(broadcast(idx), Seq("g"), "left_semi")
          .distinct()
          .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
        batch.join(hits, Seq("doc_id"), "left")
          .select(col("doc_id"), col("source"),
            coalesce(col("n_hits"), lit(0L)).as("n_hits"),
            col("n_hits").isNull.as("keep"))
      }
      batches.reduce(_ unionAll _)
    }),

    // ---- q289: STREAMING decontamination admission ----
    // q288's frozen-index gate maintained from a document stream —
    // completing the q116 lattice (one-shot : batch-incremental :
    // streaming, the q88/q193 relationship applied to exact-gram
    // contamination). Shares q116's oracle verbatim: the index is
    // frozen and micro-batches are disjoint, so admission is invariant
    // to how the source chops the stream. See
    // EventStreams.streamingDecontaminationStream for the replay
    // posture.
    "q289_stream_decontaminate" -> ((s, d) =>
      graft.streaming.EventStreams.streamingDecontaminationStream(
        s, d, DecontN)),

    // ---- q284: longest contaminated span per eval doc ----
    // q280 counts WHICH eval grams appear in train; this measures HOW
    // LONG the verbatim overlap runs — the triage signal that
    // separates a quoted sentence from a wholesale copy. Hit gram
    // positions (posexplode over the same fused graft_ngrams pass, so
    // position comes free) collapse to runs by the q195
    // gaps-and-islands move (pos − row_number per doc); the longest
    // run converts to tokens as run + N − 1. Scale: the train-gram
    // semi-join is q280's gram-keyed shuffle; the windows partition by
    // doc_id (per-doc state only — never a single-partition window);
    // zero-hit eval docs surface with max_run = 0 via the left join,
    // so clean docs are proven clean, not absent.
    "q284_contam_spans" -> ((s, d) => {
      val p = docs(s, d)
        .select(col("doc_id"),
          posexplode(expr(s"graft_ngrams(text, $ContamN)"))
            .as(Seq("i", "g")))
        .select(col("doc_id"),
          expr(TextDedup.splitRkSpark("doc_id")).as("rk"),
          (col("i") + 1).cast("long").as("pos"), col("g"))
      val trainG = p.filter(col("rk") === 0).select("g").distinct()
      val evalP = p.filter(col("rk") > 0)
      val hits = evalP.join(trainG, Seq("g"), "left_semi")
        .select("doc_id", "pos")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy("pos")
      val rmax = hits.withColumn("grp", col("pos") - row_number().over(w))
        .groupBy("doc_id", "grp").agg(count(lit(1)).as("run"))
        .groupBy("doc_id").agg(max("run").as("mrun"))
      evalP.groupBy("doc_id", "rk").agg(count(lit(1)).as("n_grams"))
        .join(rmax, Seq("doc_id"), "left")
        .select(col("doc_id"),
          TextDedup.splitName(col("rk")).as("split"),
          col("n_grams"),
          coalesce(col("mrun"), lit(0L)).as("max_run"),
          coalesce(col("mrun") + (ContamN - 1), lit(0L))
            .as("max_span_toks"))
    }),

    // ---- q117: boilerplate-phrase score ----
    // Corpus-frequent 3-grams (document frequency >= BoilDf) are
    // boilerplate; each doc reports how many of its distinct grams are
    // boilerplate — the per-doc quality signal a curation pipeline
    // thresholds on. Two shuffles on the gram (distinct + df agg) and
    // one on doc_id; the df table is reused for both sides via the
    // self-contained pairs frame, never recomputed per doc.
    "q117_boilerplate_grams" -> ((s, d) => {
      // corpus-wide distinct is inherent here: document frequency is a
      // corpus-wide statistic, so the (doc_id, gram) dedup shuffle is
      // the operator's real cost, not an accident
      val pairs = gramPairs(docs(s, d), BoilN).distinct()
      val boiler = pairs.groupBy("g")
        .agg(count(lit(1)).as("df")).filter(col("df") >= BoilDf)
        .select("g")
      val perDoc = pairs.groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"))
      val boilerPerDoc = pairs.join(boiler, Seq("g"))
        .groupBy("doc_id").agg(count(lit(1)).as("n_boiler"))
      perDoc.join(boilerPerDoc, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_grams"),
          coalesce(col("n_boiler"), lit(0L)).as("n_boiler"))
    }),

    // ---- q118: inverted index (term -> postings) ----
    // The retrieval-side artifact of a text corpus: per term, its
    // document frequency and the sorted posting list. One distinct +
    // one hash agg; collect_set is bounded by per-term df — at 100 TB a
    // production index delta-encodes and shards hot terms' postings,
    // but the build plan (distinct pairs -> agg by term) is this one.
    // The posting list is gated as a ','-joined string: the driver's
    // canonicalizer sorts columns with pandas, which can't hash
    // array-typed cells, so the array stays internal and the projection
    // is scalar-only.
    "q118_inverted_index" -> ((s, d) =>
      docs(s, d)
        .select(col("doc_id"),
          explode(expr(toksNat)).as("term"))
        .distinct()
        .groupBy("term")
        .agg(count(lit(1)).as("df"),
          sort_array(collect_set(col("doc_id"))).as("p"))
        .select(col("term"), col("df"),
          array_join(expr("transform(p, x -> cast(x as string))"), ",")
            .as("postings"))),

    // ---- q208: conjunctive boolean retrieval (AND of terms) ----
    // The query-time face of q118's inverted index: documents
    // containing ALL query terms, by counting distinct matched terms
    // per doc and keeping count == |query|. The token stream filters
    // to the (tiny, literal) query set BEFORE any shuffle, so the agg
    // input is only the matched postings — the same rows a posting-list
    // intersection would read, never the corpus. Rides q164's BM25
    // scorer as the boolean companion (AND semantics vs ranked OR);
    // tf_sum carries the total query-term mass for downstream ranking.
    "q208_boolean_retrieval" -> ((s, d) =>
      docs(s, d)
        .select(col("doc_id"), explode(expr(toksNat)).as("term"))
        .filter(col("term").isin(BoolTerms: _*))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_terms"), sum("tf").as("tf_sum"))
        .filter(col("n_terms") === BoolTerms.size)
        .select("doc_id", "tf_sum")),

    // ---- q119: latest record per key, windowless ----
    // "Current snapshot from an append log": per customer, the most
    // recent order (ties on the date broken by the higher key). ONE
    // aggregate of max(struct(date, key, payload)) — struct buffers
    // plan as SortAggregate, but the partial_max still combines
    // map-side, so the shuffle carries at most one row per (partition,
    // key) instead of every row the way the row_number() window
    // spelling does. The window twin is what q77 already grades; this
    // is the at-scale shape.
    "q119_latest_order" -> ((s, d) =>
      t(s, d, "orders")
        .groupBy("o_custkey")
        .agg(max(struct(col("o_orderdate"), col("o_orderkey"),
          col("o_totalprice"))).as("w"))
        .select(col("o_custkey"),
          col("w.o_orderdate").as("last_date"),
          col("w.o_orderkey").as("last_key"),
          col("w.o_totalprice").as("last_price"))),

    // ---- q120: deterministic shard assignment for export ----
    // Training-data export: every doc gets a shard = f(md5(doc_id)),
    // stable across runs/engines/cluster sizes; the gate checks the
    // per-shard composition (count, id range, char volume) so a
    // re-shard anywhere would hash-mismatch. The write itself is
    // `partitionBy("shard")` (PipelineSpec drives it); no shuffle is
    // needed to assign — it's a narrow column expression.
    "q120_shard_assign" -> ((s, d) =>
      Sampling.assignShard(docs(s, d), "doc_id", Shards)
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"),
          min("doc_id").as("min_id"), max("doc_id").as("max_id"),
          sum("n_chars").as("char_sum"))),

    // ---- q124: deterministic per-stratum quota sample ----
    // "At most K docs per language", chosen by md5 order of the id —
    // the hard-cap companion to the rate-based stratified sample (q89):
    // a dominant stratum is capped at exactly K, not thinned by a
    // ratio. The md5 sort key makes the selection a pure function of
    // the ids present, so engines and re-runs agree. One shuffle on the
    // stratum; at extreme per-stratum cardinality, pre-thin with
    // Sampling.hashSample to ~10K candidates first, then take the exact
    // quota — the composition stays deterministic.
    "q124_group_quota" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang")
        .orderBy(expr("md5(CAST(doc_id AS STRING))"), col("doc_id"))
      docs(s, d)
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= QuotaK)
        .select("doc_id", "lang", "source", "rk")
    }),

    // ---- q125: rank-based winsorization (clip at p05/p95) ----
    // Feature preprocessing: clamp each value to its group's 5th/95th
    // percentile VALUES, with the percentile rank computed in pure
    // integer arithmetic (ceil(n*p) = (n*p+99) DIV 100) so both engines
    // pick the identical order statistic — no interpolation, no float
    // rank drift. The clipped output is always one of the group's own
    // values, so doubles pass through untouched. Exact order statistics
    // sort each group once (the q59 caveat applies at extreme group
    // sizes; q83's approx_percentile is the documented at-scale
    // pre-pass for bounds).
    "q125_winsorize" -> ((s, d) => {
      val base = t(s, d, "lineitem").select(
        col("l_returnflag").as("g"), col("l_orderkey"),
        col("l_linenumber"), col("l_extendedprice").as("x"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("g").orderBy(col("x"))
      val ranked = base
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("n", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("g")))
      val bounds = ranked.groupBy("g").agg(
        min(when(col("rn") === expr("(n * 5 + 99) DIV 100"), col("x")))
          .as("lo"),
        min(when(col("rn") === expr("(n * 95 + 99) DIV 100"), col("x")))
          .as("hi"))
      base.join(broadcast(bounds), Seq("g"))
        .select(col("g"), col("l_orderkey"), col("l_linenumber"),
          least(greatest(col("x"), col("lo")), col("hi")).as("x_clip"))
    }),

    // ---- q127: equi-depth (quantile) binning ----
    // ntile(4) per group over the value: every bin holds n/4 rows (the
    // equal-WIDTH twin is q109). Ordering by the value alone keeps the
    // result deterministic even under ties: bin SIZES are fixed by
    // ntile, and a tied boundary value yields the same min/max on both
    // sides regardless of which tied row crosses the boundary — so
    // only (count, min, max) are exposed, never tie-sensitive sums.
    "q127_equidepth_bins" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("g").orderBy("x")
      t(s, d, "lineitem")
        .select(col("l_returnflag").as("g"),
          col("l_extendedprice").as("x"))
        .withColumn("bin", ntile(4).over(w).cast("long"))
        .groupBy("g", "bin")
        .agg(count(lit(1)).as("n"),
          min("x").as("lo"), max("x").as("hi"))
    }),

    // ---- q132: z-order (Morton) layout clustering ----
    // Interleave the low 8 bits of (l_partkey, l_suppkey) into one
    // z-value and bucket on its top 6 bits: every bucket then spans at
    // most 1/8 of EACH dimension's range — the property that makes a
    // z-clustered file layout prunable by predicates on EITHER column
    // (operators.Layout.writeZOrdered does the write;
    // ScaleSpec asserts per-partition locality). Pure integer bit
    // arithmetic, replayed exactly by the oracle.
    "q132_zorder_layout" -> ((s, d) =>
      t(s, d, "lineitem")
        .select(expr("l_partkey % 256").as("pa"),
          expr("l_suppkey % 256").as("sb"))
        .withColumn("zbucket",
          expr(s"${graft.operators.Layout.zExprSpark("pa", "sb", 8)} DIV 1024"))
        .groupBy("zbucket")
        .agg(count(lit(1)).as("n"),
          min("pa").as("pa_lo"), max("pa").as("pa_hi"),
          min("sb").as("sb_lo"), max("sb").as("sb_hi"))),

    // ---- q134: bigram language-model counts ----
    // Adjacent-token bigram counts with the conditional probability
    // P(b|a) in exact parts-per-million integer arithmetic
    // (c_ab * 1e6 DIV c_a) — the n-gram LM / next-token statistics
    // pass over a corpus. One narrow explode + two hash aggs; the
    // continuation total joins back on the (vocabulary-bounded) first
    // token. The >= 3 support floor bounds the output, applied AFTER
    // totals so probabilities stay corpus-true.
    "q134_bigram_lm" -> ((s, d) => {
      val g2 = docs(s, d).select(
        explode(expr("graft_ngrams(text, 2)")).as("g"))
        .select(split(col("g"), " ")(0).as("a"),
          split(col("g"), " ")(1).as("b"))
      val c = g2.groupBy("a", "b").agg(count(lit(1)).as("c_ab"))
      val tot = c.groupBy("a").agg(sum("c_ab").as("c_a"))
      c.join(tot, "a")
        .withColumn("p_ppm", expr("c_ab * 1000000 DIV c_a"))
        .filter(col("c_ab") >= 3)
        .select("a", "b", "c_ab", "p_ppm")
    }),

    // ---- q203: BPE merge scoring (tokenizer-training support) ----
    // The scoring pass of byte-pair-encoding training: corpus-weighted
    // counts of adjacent character pairs, top-10 merge candidates
    // (count desc, pair asc — BPE's "most frequent pair merges first").
    // Scale shape: ONE corpus scan collapses to the vocabulary-bounded
    // (token, frequency) table; the char-pair expansion then runs over
    // the VOCAB (thousands of rows), never the corpus, and the top-10
    // is a TakeOrdered heap. Real BPE iterates merge->recount; each
    // subsequent round rewrites only the vocab table, so round cost is
    // corpus-free after this first scan — exactly why BPE trainers
    // operate on word-frequency lists.
    "q203_bpe_merges" -> ((s, d) => {
      val tf = docs(s, d).select(explode(expr(toksNat)).as("w"))
        .groupBy("w").agg(count(lit(1)).as("f"))
      tf.filter(length(col("w")) >= 2)
        .select(col("f"), explode(expr(
          "transform(sequence(1, length(w) - 1), " +
            "i -> substring(w, i, 2))")).as("pair"))
        .groupBy("pair").agg(sum("f").as("cnt"))
        .orderBy(col("cnt").desc, col("pair")).limit(10)
    }),

    // ---- q204: bigram-LM document scoring (perplexity-proxy filter) ----
    // The CCNet/KenLM quality gate reshaped for hash-exactness: train
    // the q134 bigram model on the corpus, then score every document by
    // its mean next-token probability in exact ppm (sum of integer
    // p_ppm DIV pair count — the rational stand-in for mean log-prob,
    // which needs ln and can't be bit-gated; the ORDERING of docs, which
    // is what a filter thresholds, is monotone-equivalent for the
    // typical case). Scale shape: the LM is vocabulary²-bounded, so it
    // BROADCASTS and the corpus pair stream never shuffles for the
    // lookup; the per-doc mean collapses map-side (a doc's pairs are
    // row-local). Every pair of every doc exists in the corpus LM by
    // construction, so the join is total.
    "q204_lm_score" -> ((s, d) => {
      val pairs = docs(s, d)
        .select(col("doc_id"), explode(expr("graft_ngrams(text, 2)")).as("g"))
        .select(col("doc_id"), split(col("g"), " ")(0).as("a"),
          split(col("g"), " ")(1).as("b"))
      val c = pairs.groupBy("a", "b").agg(count(lit(1)).as("c_ab"))
      val tot = c.groupBy("a").agg(sum("c_ab").as("c_a"))
      val lm = broadcast(c.join(tot, "a")
        .select(col("a"), col("b"),
          expr("c_ab * 1000000 DIV c_a").as("p_ppm")))
      pairs.join(lm, Seq("a", "b"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_pairs"),
          expr("sum(p_ppm) DIV count(1)").as("score_ppm"))
    }),

    // ---- q252: bigram log2-surprisal scoring (exact-integer bits) ----
    // The ACTUAL log-prob shape q204's rational proxy sidesteps: per-doc
    // total surprisal Σ −log2(p) in whole bits, with floor(log2(p_ppm))
    // computed by a 20-branch CASE cascade over powers of two — pure
    // integer compares, so no libm call exists in either engine and the
    // score hash-matches bit-for-bit (same move as DetSketch's
    // compile-time ln table). Surprisal per pair = 20 − floor(log2
    // (p_ppm)) ≈ −log2(c_ab/c_a) since 2^20 ≈ 1e6 ppm. Same broadcast
    // LM + map-side per-doc collapse as q204; p_ppm = 0 (conditional
    // prob under 1 ppm) caps at the ELSE branch, 20 bits.
    "q252_surprisal" -> ((s, d) => {
      val pairs = docs(s, d)
        .select(col("doc_id"), explode(expr("graft_ngrams(text, 2)")).as("g"))
        .select(col("doc_id"), split(col("g"), " ")(0).as("a"),
          split(col("g"), " ")(1).as("b"))
      val c = pairs.groupBy("a", "b").agg(count(lit(1)).as("c_ab"))
      val tot = c.groupBy("a").agg(sum("c_ab").as("c_a"))
      val lm = broadcast(c.join(tot, "a")
        .select(col("a"), col("b"),
          expr("c_ab * 1000000 DIV c_a").as("p_ppm")))
      pairs.join(lm, Seq("a", "b"))
        .withColumn("l2", expr(Log2Case))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_pairs"),
          sum(lit(20L) - col("l2")).as("bits"))
        .withColumn("bits_cb_per_pair", expr("bits * 100 DIV n_pairs"))
    }),

    // ---- q262: span-corruption masking plan (T5/BERT-style) ----
    // The masked-LM data-prep pass, fully deterministic: token i of doc
    // d masks when the first md5("d:i") nibble < 2 (12.5% rate), and
    // the per-doc report counts masked tokens, contiguous mask SPANS
    // (flag-and-its-left-neighbor in-row — the islands count without a
    // window), mask rate ppm and mean span length in centitokens. All
    // IN-ROW over the token array: a narrow map-side pass at any
    // corpus size, no shuffle until the final per-doc projection
    // (which is the row itself).
    "q262_span_corruption" -> ((s, d) =>
      docs(s, d)
        .withColumn("toks", expr(toksNat))
        .withColumn("n", size(col("toks")).cast("long"))
        .filter(col("n") > 0)
        .withColumn("flags", expr(
          "transform(sequence(1, CAST(n AS INT)), i -> " +
            "CASE WHEN (instr('0123456789abcdef', substr(" +
            "md5(concat(CAST(doc_id AS STRING), ':', CAST(i AS STRING)))" +
            ", 1, 1)) - 1) < 2 THEN 1 ELSE 0 END)"))
        .withColumn("n_masked", expr(
          "aggregate(flags, CAST(0 AS BIGINT), (a, x) -> a + x)"))
        .withColumn("n_spans", expr(
          "aggregate(sequence(1, CAST(n AS INT)), CAST(0 AS BIGINT), " +
            "(a, i) -> a + CASE WHEN element_at(flags, i) = 1 AND " +
            "(i = 1 OR element_at(flags, i - 1) = 0) THEN 1 ELSE 0 END)"))
        .select(col("doc_id"), col("n").as("n_toks"), col("n_masked"),
          col("n_spans"),
          expr("n_masked * 1000000 DIV n").as("mask_ppm"),
          when(col("n_spans") > 0,
            expr("n_masked * 100 DIV n_spans")).as("mean_span_cb"))),

    // ---- q253: integer TF-IDF top terms per document ----
    // Each doc's 3 most characteristic terms by tf × idf with idf as
    // the exact rational (n_docs·1e6) DIV df — no log, so the ranking
    // is bit-stable across engines (idf's monotone-in-1/df core is
    // what the ranking uses; ties break on term asc). Scale shape: the
    // df table and the 1-row corpus count both BROADCAST (vocabulary-
    // bounded / scalar), so the per-doc term stream never reshuffles
    // for the lookup; the top-3 is a doc-partitioned window.
    "q253_tfidf_terms" -> ((s, d) => {
      val tf = docs(s, d)
        .select(col("doc_id"), explode(expr(toksNat)).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val dfTab = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val n = docs(s, d).agg(count(lit(1)).as("n_docs"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy(col("score").desc, col("term"))
      tf.join(broadcast(dfTab), "term")
        .crossJoin(broadcast(n))
        .withColumn("score", expr("tf * ((n_docs * 1000000) DIV df)"))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 3)
        .select("doc_id", "term", "tf", "df", "score", "rk")
    }),

    // ---- q139: cross-source vocabulary overlap (Jaccard matrix) ----
    // Pairwise token-set Jaccard between sources, in exact ppm integers
    // — the corpus-mixing diagnostic ("how much does crawlA share with
    // crawlB") run before choosing training mixture weights. The
    // (source, token) distinct table is vocabulary-bounded; the
    // cross-source join fans out per token only by the number of
    // sources carrying it (<= |sources|² per token, a constant), so
    // the plan is two hash aggs + one bounded equi-join at any corpus
    // size.
    "q139_source_overlap" -> ((s, d) => {
      val st = docs(s, d)
        .select(col("source"), explode(expr(toksNat)).as("tok"))
        .distinct()
      val sz = st.groupBy("source").agg(count(lit(1)).as("n"))
      val inter = st.as("x").join(st.as("y"),
          col("x.tok") === col("y.tok") &&
            col("x.source") < col("y.source"))
        .groupBy(col("x.source").as("src_a"), col("y.source").as("src_b"))
        .agg(count(lit(1)).as("inter"))
      inter
        .join(broadcast(sz.select(col("source").as("src_a"),
          col("n").as("na"))), "src_a")
        .join(broadcast(sz.select(col("source").as("src_b"),
          col("n").as("nb"))), "src_b")
        .select(col("src_a"), col("src_b"), col("inter"),
          expr("(inter * 1000000) DIV (na + nb - inter)").as("jac_ppm"))
    }),

    // ---- q143: first-owner novelty score ----
    // How much NEW content does each doc contribute? A doc's distinct
    // 4-grams are "novel" if no lower-id doc carries them (min doc_id
    // per gram = first owner — ingestion order by id). novelty_ppm =
    // novel/total in exact ppm integers. The contribution-scoring twin
    // of dedup: instead of dropping near-dups, rank docs by marginal
    // new material. Two gram-keyed hash aggs + one doc-keyed agg; docs
    // under 4 tokens carry no grams and yield no row (unnest parity).
    "q143_novelty" -> ((s, d) => {
      val pairs = gramPairs(docs(s, d), DecontN).distinct()
      val first = pairs.groupBy("g").agg(min("doc_id").as("first_id"))
      val perDoc = pairs.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
      val novel = pairs.join(first, "g")
        .filter(col("doc_id") === col("first_id"))
        .groupBy("doc_id").agg(count(lit(1)).as("n_novel"))
      perDoc.join(novel, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_grams"),
          coalesce(col("n_novel"), lit(0L)).as("n_novel"),
          expr("coalesce(n_novel, 0) * 1000000 DIV n_grams")
            .as("novelty_ppm"))
    }),

    // ---- q144: co-occurrence lift (association mining) ----
    // For token pairs sharing >= 5 docs: lift = P(a,b)/(P(a)P(b)) in
    // exact ppm integers — (n_ab * N * 1e6) DIV (n_a * n_b). The
    // PMI-without-log association score over q121's in-row pair
    // stream; token doc-counts come from one narrow explode of the
    // per-row distinct token set (no corpus-wide distinct shuffle —
    // in-row dedup suffices for doc counts). Integer bound: n_ab*N*1e6
    // needs N <= ~3e6 rows; beyond that, divide by n_a before scaling.
    "q144_pair_lift" -> ((s, d) => {
      val dd = docs(s, d)
      val dt = dd.select(
        explode(expr(s"array_distinct(${toksNat})")).as("tok"))
      val cnt = dt.groupBy("tok").agg(count(lit(1)).as("n_t"))
      val pairs = dd
        .select(expr(s"array_sort(array_distinct(${toksNat}))")
          .as("ts"))
        .select(posexplode(col("ts")).as(Seq("i", "a")), col("ts"))
        .select(col("a"),
          explode(expr("slice(ts, i + 2, size(ts))")).as("b"))
        .groupBy("a", "b")
        .agg(count(lit(1)).as("n_ab"))
        .filter(col("n_ab") >= 5)
      val n = dd.agg(count(lit(1)).as("n"))
      pairs
        .join(broadcast(cnt.select(col("tok").as("a"), col("n_t").as("na"))), "a")
        .join(broadcast(cnt.select(col("tok").as("b"), col("n_t").as("nb"))), "b")
        .crossJoin(broadcast(n))
        .select(col("a"), col("b"), col("n_ab"),
          expr("(n_ab * n * 1000000) DIV (na * nb)").as("lift_ppm"))
    }),

    // ---- q147: quality-threshold sweep ----
    // For every token-count bucket, how many docs and tokens survive a
    // ">= bucket" cut — the tuning curve read before choosing a
    // filter threshold. One corpus scan + one tiny hash agg; the
    // cumulative window runs over the BUCKET table (cardinality ≈
    // value range / 10), so its single-partition sort is a few dozen
    // rows regardless of corpus size.
    "q147_quality_sweep" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("bucket").desc)
        .rowsBetween(Long.MinValue, 0)
      docs(s, d)
        .select(expr("size(graft_tokens(text))").as("n_toks"))
        .withColumn("bucket", expr("n_toks DIV 10"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_docs"), sum("n_toks").as("toks"))
        .withColumn("cum_docs", sum("n_docs").over(w))
        .withColumn("cum_toks", sum("toks").over(w))
    }),

    // ---- q148: token-budget selection (two-phase, no global sort) ----
    // "Best docs first until the token budget is spent": quality =
    // integer stopword-per-mille, selection = all docs in strictly
    // better quality buckets plus a doc_id-ordered prefix of the
    // boundary bucket. TWO-PHASE plan: the cumulative window runs over
    // the tiny BUCKET table (phase 1), then only buckets reaching the
    // boundary join back and the within-bucket prefix window shuffles
    // on the bucket key (phase 2) — never a global sort of the corpus,
    // which is what makes a budget cut feasible at 100 TB. prev+in_cum
    // <= B covers full buckets and the boundary prefix with one
    // predicate.
    "q148_token_budget" -> ((s, d) => {
      val B = TokenBudget
      val e = docs(s, d)
        .withColumn("toks", expr(toksNat))
        .withColumn("n_toks", size(col("toks")))
        .filter(col("n_toks") > 0)
        .withColumn("n_stop", expr(
          graft.functions.TextExpr.hitCountSpark("toks",
            graft.functions.TextExpr.langWords.toMap.apply("en"))))
        .select(col("doc_id"), col("n_toks"),
          expr("(n_stop * 1000) DIV n_toks").as("q_milli"))
      val wq = org.apache.spark.sql.expressions.Window
        .orderBy(col("q_milli").desc).rowsBetween(Long.MinValue, 0)
      val cum = e.groupBy("q_milli").agg(sum("n_toks").as("bt"))
        .withColumn("cum", sum("bt").over(wq))
        .withColumn("prev", col("cum") - col("bt"))
        .select("q_milli", "prev")
      val wb = org.apache.spark.sql.expressions.Window
        .partitionBy("q_milli").orderBy("doc_id")
        .rowsBetween(Long.MinValue, 0)
      e.join(broadcast(cum), "q_milli")
        .filter(col("prev") < B)
        .withColumn("in_cum", sum("n_toks").over(wb))
        .filter(col("prev") + col("in_cum") <= B)
        .select("doc_id", "q_milli", "n_toks")
    }),

    // ---- q194: CCNet-style head/middle/tail quality buckets ----
    // (Wenzek et al. 2020.) Per-language tercile split by a quality
    // score (integer stopword-per-mille — q148's exact proxy for the
    // paper's LM perplexity). The SCALE move: thresholds come from
    // exact ranks over the deterministic md5 half-sample (q83's
    // trick), per language — so the sort is sample-sized, the tiny
    // (lang, t_head, t_mid) table broadcasts, and bucketing the full
    // corpus is one comparison per row. NEVER ntile over the corpus:
    // PARTITION BY lang puts the dominant language in one partition —
    // the single-sort scale-killer this formulation avoids. A rank-r
    // order statistic is a multiset property, so ties need no
    // tiebreaker and both engines agree bit-for-bit.
    "q194_ccnet_buckets" -> ((s, d) => {
      val e = docs(s, d)
        .withColumn("toks", expr(toksNat))
        .withColumn("n_toks", size(col("toks")))
        .filter(col("n_toks") > 0)
        .withColumn("n_stop", expr(
          graft.functions.TextExpr.hitCountSpark("toks",
            graft.functions.TextExpr.langWords.toMap.apply("en"))))
        .select(col("doc_id"), col("lang"),
          expr("(n_stop * 1000) DIV n_toks").as("q_milli"))
      val samp = graft.operators.Sampling.hashSample(e, "doc_id", 8)
      val wr = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy(col("q_milli").desc)
      val wn = org.apache.spark.sql.expressions.Window.partitionBy("lang")
      def pick(p: Int) =
        max(when(expr(s"rn = ((n - 1) * $p) DIV 100 + 1"), col("q_milli")))
      val th = samp
        .withColumn("rn", row_number().over(wr).cast("long"))
        .withColumn("n", count(lit(1)).over(wn))
        .groupBy("lang")
        .agg(pick(33).as("t_head"), pick(66).as("t_mid"))
      e.join(broadcast(th), "lang")
        .select(col("doc_id"), col("lang"), col("q_milli"),
          when(col("q_milli") >= col("t_head"), lit("head"))
            .when(col("q_milli") >= col("t_mid"), lit("middle"))
            .otherwise(lit("tail")).as("bucket"))
    }),

    // ---- q195: duplicated-substring spans (exact substring dedup) ----
    // The Lee et al. 2022 "Deduplicating Training Data" move at the
    // granularity MinHash can't see: find exact token spans repeated
    // ACROSS documents and, per doc, the longest such span. Positional
    // word 4-grams stream out narrow (doc_id, pos, gram); a gram
    // repeated in >= 2 distinct docs is "duplicated text"; consecutive
    // duplicated positions chain into spans via gaps-and-islands
    // (pos - row_number), so a k-position run = a k+3-token duplicated
    // substring. Plan shape at 100 TB: two map-side-combining hash
    // aggs find the duplicated grams (distinct pairs -> df >= 2 — the
    // same shape as q117's boilerplate scorer), one equi-join hands
    // positions back, and the island window partitions by doc_id over
    // ONLY the duplicated positions (a tiny fraction of the corpus) —
    // no all-pairs comparison and no global sort anywhere. At real
    // scale the gram join key would be an 8-byte xxhash64 fingerprint
    // instead of the string (collision odds ~n²/2⁶⁴); the string key
    // here keeps the DuckDB oracle bit-exact.
    "q195_dup_spans" -> ((s, d) => {
      val n = DupSpanN
      val doc = docs(s, d)
      // native fused tokenize+gram loop (graft_ngrams yields grams in
      // position order, so posexplode recovers the position for free)
      val p = doc
        .select(col("doc_id"),
          posexplode(expr(s"graft_ngrams(text, $n)")).as(Seq("i", "g")))
        .select(col("doc_id"), (col("i") + 1).cast("long").as("pos"),
          col("g"))
      val dg = p.select("doc_id", "g").distinct()
        .groupBy("g").agg(count(lit(1)).as("df"))
        .filter(col("df") >= 2).select("g")
      val dp = p.join(dg, "g").select("doc_id", "pos")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy("pos")
      // ONE consumer of dp: islands -> per-doc (max run, Σ run) in the
      // same aggregate — Σ of island sizes IS the duplicated-position
      // count, so the former separate n_dup branch (a second evaluation
      // of the p⋈dg join feeding its own shuffle) is free here
      val spans = dp.withColumn("grp", col("pos") - row_number().over(w))
        .groupBy("doc_id", "grp").agg(count(lit(1)).as("run"))
        .groupBy("doc_id").agg(max("run").as("mrun"),
          sum("run").as("n_dup"))
      // n_grams is size(grams) — a narrow per-row map on the doc scan,
      // not an explode + per-doc count-shuffle of the full gram stream
      doc.select(col("doc_id"),
          coalesce(size(expr(s"graft_ngrams(text, $n)")), lit(0))
            .cast("long").as("n_grams"))
        .join(spans, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_grams"),
          coalesce(col("n_dup"), lit(0L)).as("n_dup"),
          coalesce(col("mrun") + lit(n - 1), lit(0L)).as("max_run_toks"))
    }),

    // ---- q202: greedy max-coverage selection (submodular pick) ----
    // "Select the 5 documents that together cover the most distinct
    // 4-grams" — the submodular data-selection move (facility-location /
    // coreset family) used to build small high-coverage training
    // subsets. Classic greedy = (1-1/e)-approximation; the synchronous
    // deterministic schedule (ties -> min doc_id) makes all 5 rounds a
    // pure function of the (doc, gram) set, replayed by the oracle as
    // chained CTEs. Per round: one anti-join + one count agg + a k=1
    // TakeOrdered — see operators.Coverage for the 100 TB shape.
    "q202_greedy_cover" -> ((s, d) => {
      val n = DupSpanN
      val p = docs(s, d).select(col("doc_id"),
        explode(expr(s"graft_ngrams(text, $n)")).as("g"))
      graft.operators.Coverage.greedyCover(p, "doc_id", "g", k = 5)
        .withColumnRenamed("item", "doc_id")
    }),

    // ---- q121: within-document token co-occurrence ----
    // Pair counts (a, b sorted, a < b) over each doc's distinct token
    // set — the phrase/topic-mining primitive. The pairs are generated
    // INSIDE the row (sorted-distinct tokens, then index-slice pairs),
    // so there is no self-join: one narrow explode then one hash agg.
    // Pair fan-out is quadratic in per-doc DISTINCT tokens, which a
    // vocabulary bounds — the per-doc cost is local and independent of
    // corpus size.
    "q121_cooccurrence" -> ((s, d) =>
      docs(s, d)
        .select(expr(s"array_sort(array_distinct(${toksNat}))")
          .as("ts"))
        .select(posexplode(col("ts")).as(Seq("i", "a")), col("ts"))
        .select(col("a"),
          explode(expr("slice(ts, i + 2, size(ts))")).as("b"))
        .groupBy("a", "b")
        .agg(count(lit(1)).as("n_docs"))),

    // ---- q235: skip-gram (windowed) co-occurrence counts ----
    // q121 counts doc-level co-presence; this counts POSITIONAL
    // (center, context) pairs within a ±3-token window — the corpus
    // statistic word2vec/GloVe trains on. Pairs are generated IN-ROW
    // (posexplode + a 3-token slice per position): no self-join, one
    // narrow explode, fan-out a constant 3× the token stream, and the
    // final agg is vocabulary²-bounded. Directed left→right pairs so
    // each co-occurrence is counted once at its left endpoint, same in
    // both engines.
    "q235_skipgram_cooc" -> ((s, d) =>
      docs(s, d)
        .select(expr(toksNat).as("ts"))
        .select(posexplode(col("ts")).as(Seq("i", "a")), col("ts"))
        .select(col("a"),
          explode(expr(s"slice(ts, i + 2, $SkipW)")).as("b"))
        .groupBy("a", "b")
        .agg(count(lit(1)).as("n_pairs"))
        .filter(col("n_pairs") >= SkipMin)),

    // ---- q245: Zipf vocabulary-coverage curve ----
    // How few token TYPES cover how much of the corpus: vocab ranked
    // by frequency, cumulative token share in exact ppm, reported for
    // the top-50 ranks — the curve that sizes a tokenizer vocabulary
    // (q71 lists the heavy hitters; this gives the coverage each rank
    // buys). The ranking window is global but runs on the
    // VOCABULARY-bounded agg, never the token stream (the q147
    // bounded-global-window shape), and the 1-row token total is the
    // allow-listed q80 broadcast.
    "q245_zipf_coverage" -> ((s, d) => {
      val W = org.apache.spark.sql.expressions.Window
      val vocab = docs(s, d)
        .select(explode(expr(toksNat)).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("n"))
      val wOrd = W.orderBy(col("n").desc, col("tok"))
      val tot = vocab.agg(sum("n").as("tt"))
      vocab
        .withColumn("rank", row_number().over(wOrd).cast("long"))
        .withColumn("cum", sum("n").over(wOrd))
        .crossJoin(broadcast(tot))
        .filter(col("rank") <= 50)
        .select(col("rank"), col("tok"), col("n"),
          expr("cum * 1000000 DIV tt").as("cum_share_ppm"))
    }),

    // ---- q170: temperature-scaled source mixture weights ----
    // The training-mixture allocator: per-source sampling weights
    // proportional to (token share)^alpha with alpha = 0.5 — the
    // sqrt-temperature rebalance that upweights small sources (the
    // multilingual-sampling move). sqrt is the ONE fractional power
    // both engines round identically (IEEE-exact for BIGINTs under
    // 2^53), and the weights are floor(sqrt) BIGINTs normalized in
    // exact ppm — no float sums anywhere. One corpus scan -> one
    // source-cardinality agg -> broadcast total; the allocation each
    // downstream sampler (q89/q124/q137) consumes.
    "q170_mixture_weights" -> ((s, d) => {
      val per = docs(s, d)
        .select(col("source"), expr(s"size(${toksNat})").as("nt"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("nt").as("n_toks"))
        .withColumn("isq",
          expr("CAST(FLOOR(SQRT(CAST(n_toks AS DOUBLE))) AS BIGINT)"))
      per.crossJoin(broadcast(per.agg(sum("isq").as("isq_tot"))))
        .select(col("source"), col("n_docs"), col("n_toks"), col("isq"),
          expr("isq * 1000000 DIV isq_tot").as("w_ppm"))
    }),

    // ---- q217: mixture weights APPLIED (the resample job) ----
    // Closes the q170 loop: the sqrt-temperature allocation becomes an
    // actual subset. Per source, target tokens = (corpus_toks/2)·w_ppm
    // and a keep rate p_ppm = target/n_toks; each doc then survives a
    // DETERMINISTIC md5 draw (hash16·1e6 < p_ppm·65536 — q137's exact
    // integer Bernoulli), so the resampled corpus is a pure function
    // of doc ids: reruns, engines, and cluster sizes agree, and the
    // oracle replays every draw. Plan: one stats agg, a broadcast of
    // the source-cardinality allocation, then ONE narrow filter over
    // the corpus — the resample itself never shuffles. Output: the
    // per-source audit (targets vs what the draws actually kept).
    // ---- q223: DSIR-style hashed-feature importance scoring ----
    // Data Selection via Importance Resampling (Xie et al. 2023),
    // log-free so the replay is exact: tokens hash into 64 buckets
    // (md5 first byte % 64); the target distribution (here: lang='en'
    // docs, the "domain" proxy) and the raw corpus distribution become
    // Laplace-smoothed ppm tables (64 rows each, broadcast); a doc's
    // importance is the sum over its token INSTANCES of
    // (pt_ppm − pr_ppm) at the token's bucket — the linear contrast
    // that ranks docs by target-likeness — normalized per token.
    // keep = spt_ppm > 0 ("more target-like than corpus average").
    // Plan: two 64-row broadcast dists, one (doc, bucket) explode, one
    // doc-keyed sum — linear, no global sort, no driver state.
    "q223_dsir_score" -> ((s, d) => {
      val bkt = s"(${nibbleSpark("h", 0)} * 16 + ${nibbleSpark("h", 1)}) % 64"
      val tb = docs(s, d)
        .select(col("doc_id"), col("lang"), explode(expr(toksNat)).as("tok"))
        .withColumn("h", expr("md5(tok)"))
        .select(col("doc_id"), col("lang"),
          expr(bkt).cast("long").as("b"))
      // full 64-bucket frame so ABSENT buckets get the +1 smoothing
      // mass too (a dist built only from present buckets would silently
      // drop the Laplace prior exactly where it matters most)
      def dist(src: DataFrame, p: String) = {
        val cnt = src.groupBy("b").agg(count(lit(1)).as("c"))
        val tot = src.agg(count(lit(1)).as("t"))
        s.range(64).toDF("b")
          .join(cnt, Seq("b"), "left")
          .crossJoin(broadcast(tot))
          .select(col("b"),
            expr(s"(coalesce(c, 0) + 1) * 1000000 DIV (t + 64)")
              .as(s"${p}_ppm"))
      }
      val pt = dist(tb.filter(col("lang") === "en"), "pt")
      val pr = dist(tb, "pr")
      tb.join(broadcast(pt), Seq("b"))
        .join(broadcast(pr), Seq("b"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_toks"),
          sum(col("pt_ppm") - col("pr_ppm")).as("score"))
        .select(col("doc_id"), col("n_toks"), col("score"),
          expr("score DIV greatest(n_toks, 1)").as("spt_ppm"),
          (col("score") > 0).cast("int").as("keep"))
    }),

    "q217_mixture_apply" -> ((s, d) => {
      val per = docs(s, d).select(col("doc_id"), col("source"),
        expr(s"size($toksNat)").as("nt"))
      val stats = per.groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("nt").as("n_toks"))
        .withColumn("isq",
          expr("CAST(FLOOR(SQRT(CAST(n_toks AS DOUBLE))) AS BIGINT)"))
      val tot = stats.agg(sum("isq").as("isq_tot"),
        sum("n_toks").as("toks_tot"))
      val alloc = stats.crossJoin(broadcast(tot))
        .withColumn("w_ppm", expr("isq * 1000000 DIV isq_tot"))
        .withColumn("target_toks",
          expr("(toks_tot DIV 2) * w_ppm DIV 1000000"))
        // n_toks = 0 (an all-empty source) would make Spark's DIV yield
        // NULL while the oracle's // errors — pin the degenerate case
        .withColumn("p_ppm", expr(
          """CASE WHEN n_toks = 0 THEN CAST(0 AS BIGINT)
            | ELSE least(CAST(1000000 AS BIGINT),
            |   target_toks * 1000000 DIV n_toks) END""".stripMargin))
        .select("source", "n_docs", "n_toks", "target_toks", "p_ppm")
      val h = "md5(CAST(doc_id AS STRING))"
      val hash16 = (0 until 4).map(k =>
        s"${nibbleSpark(h, k)} * ${1L << (4 * (3 - k))}")
        .mkString("(", " + ", ")")
      val kept = per
        .join(broadcast(alloc.select("source", "p_ppm")), "source")
        .filter(expr(s"CAST($hash16 AS BIGINT) * 1000000 < p_ppm * 65536"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_kept"), sum("nt").as("kept_toks"))
      alloc.join(kept, Seq("source"), "left")
        .select(col("source"), col("n_docs"), col("n_toks"),
          col("target_toks"), col("p_ppm"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          coalesce(col("kept_toks"), lit(0L)).as("kept_toks"))
    }),

    // ---- q164: BM25 top-k retrieval ----
    // The retrieval scorer of every decontamination / near-dup-lookup
    // pipeline: per query term, the top-5 docs by BM25 (k1 = 1.2,
    // b = 0.75). The standard ln-idf is replaced by the rational
    // (N+1)/(df+1) (the q80 idf) so the WHOLE score reduces to one
    // BIGINT numerator / one BIGINT denominator with k1, b folded in as
    // exact fifths/quarters:
    //   score = 44·tf·Σdl·(N+1) / ((20·tf·Σdl + 6·Σdl + 18·dl·N)·(df+1))
    // — a single IEEE division both engines compute bit-identically.
    // Overflow bound: num needs 44·tf·Σdl·N < 2^63 (Σdl·N ~ 2e16 at
    // corpus Σdl 1e13 with tf ≤ 20 — beyond that, pre-divide Σdl by
    // 2^10 or move to DECIMAL(38); the ln-idf double spelling is the
    // conventional at-scale fallback). The bound is ENFORCED in-plan
    // by bm25Scored's DECIMAL(38,0) assert_true (OperatorSpec pins it
    // firing on synthetic over-bound stats). Plan shape: tf filters to the
    // query terms BEFORE any shuffle (one narrow explode + tiny hash
    // agg), df and the 1-row corpus stats broadcast, and the top-k
    // window partitions by term — per-term state only, never a global
    // sort.
    "q164_bm25" -> ((s, d) => bm25Ranks(s, d)),

    // ---- q268/q269: BPE merge APPLICATION (train → apply) ----
    // q203 scores the merge ranking; these two run the tokenizer it
    // implies, completing the train→apply story. Scale shape is the
    // textbook one: segmentation cost is VOCABULARY-bounded (graft_bpe
    // runs once per distinct word, with the 1-row rank-ordered merge
    // array cross-broadcast onto the vocab table), and the corpus pays
    // only tokenize scans + a broadcast join of per-word piece counts —
    // the reason industrial BPE tokenizers precompute a word→pieces
    // cache instead of re-segmenting every occurrence. Rank-order and
    // overlap edge semantics are pinned in TextNative.bpeApply; the
    // oracle replays them with a recursive CTE state machine.
    "q268_bpe_vocab" -> ((s, d) => {
      val tf = wordFreq(s, d)
      tf.crossJoin(broadcast(bpeMergeArr(tf)))
        .select(col("w"), col("f"),
          expr("graft_bpe(w, merges)").as("toks"))
        .select(col("w"), col("f"),
          array_join(col("toks"), "|").as("bpe"),
          size(col("toks")).cast("long").as("n_bpe"))
        .orderBy(col("f").desc, col("w")).limit(200)
    }),

    // Per-document BPE token counts through the vocab cache — the
    // "how many tokens is this corpus" budgeting pass, exact-integer
    // (pieces-per-word in ppm).
    "q269_bpe_doc_tokens" -> ((s, d) => {
      val toks = docs(s, d)
        .select(col("doc_id"), explode(expr(toksNat)).as("w"))
      val wc = toks.groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
      val tf = toks.groupBy("w").agg(count(lit(1)).as("f"))
      val nb = tf.crossJoin(broadcast(bpeMergeArr(tf)))
        .select(col("w"),
          size(expr("graft_bpe(w, merges)")).cast("long").as("n_bpe"))
      wc.join(broadcast(nb), "w")
        .groupBy("doc_id")
        .agg(sum("c").as("n_words"),
          sum(expr("c * n_bpe")).as("n_bpe"),
          expr("sum(c * n_bpe) * 1000000 DIV sum(c)").as("cpw_ppm"))
    }),

    // ---- q282: tokenizer fertility per language ----
    // The tokenizer-fairness audit: how many BPE pieces a word costs,
    // and how many characters one piece buys, BY LANGUAGE — a
    // tokenizer trained on an en-heavy corpus fragments the other
    // languages, and this table is the evidence (fertility_ppm = BPE
    // pieces per word; chars_per_tok_ppm = its compression-rate dual).
    // Same trained merges as q268/q269 (bpeMergeArr over the corpus
    // vocabulary, |merges| = 10 broadcast as one row), so the three
    // BPE views cannot drift. Scale: the per-(lang, word) count table
    // is vocabulary x |langs| under Heaps' law, so its join to the
    // per-word piece counts carries NO broadcast hint (the q274
    // posture — AQE decides); everything after is a |langs|-row
    // aggregate. Exact-integer ppm everywhere, no libm.
    "q282_tokenizer_fertility" -> ((s, d) => {
      val toks = docs(s, d)
        .select(col("lang"), explode(expr(toksNat)).as("w"))
      val wc = toks.groupBy("lang", "w").agg(count(lit(1)).as("c"))
      val tf = toks.groupBy("w").agg(count(lit(1)).as("f"))
      val nb = tf.crossJoin(broadcast(bpeMergeArr(tf)))
        .select(col("w"), length(col("w")).cast("long").as("n_chars"),
          size(expr("graft_bpe(w, merges)")).cast("long").as("n_bpe"))
      wc.join(nb, "w")
        .groupBy("lang")
        .agg(sum("c").as("n_words"),
          sum(expr("c * n_chars")).as("n_chars_tot"),
          sum(expr("c * n_bpe")).as("n_bpe"))
        .select(col("lang"), col("n_words"), col("n_bpe"),
          expr("n_bpe * 1000000 DIV n_words").as("fertility_ppm"),
          expr("n_chars_tot * 1000000 DIV n_bpe").as("chars_per_tok_ppm"))
    }),

    // ---- q270: ITERATIVE BPE merge training (the real greedy loop) ----
    // q203 scores ONE pair-count pass; this runs the actual Sennrich
    // et al. training loop — K rounds of count-argmax-merge-recount —
    // which is the only way multi-character merges arise (round r fuses
    // pieces produced by earlier rounds; at the driver corpus round 6
    // learns "mer" = "m"+"er"). Semantics, tie-breaks and the scale
    // argument (one corpus scan to the cached vocab table, then K
    // vocab-only rounds with 1-row argmax collects — the q202 bounded
    // driver-loop precedent) are pinned in TextAnalysis.bpeTrain; the
    // oracle replays all K rounds as chained MATERIALIZED CTE stages,
    // each one a per-merge recursive-CTE fuse pass (bpeCtes' state
    // machine specialized to a single stage).
    "q270_bpe_train" -> ((s, d) =>
      graft.operators.TextAnalysis.bpeTrain(wordFreq(s, d), BpeTrainK)),

    // ---- q271: interpolated Kneser-Ney bigram LM (d = 3/4) ----
    // The real LM estimator the q134 MLE counts feed: discounted bigram
    // mass redistributed by CONTINUATION probability (how many distinct
    // left-contexts a word follows, not how often it occurs) —
    // P_KN(b|a) = max(c_ab − d, 0)/c_a + d·N1+(a·)/c_a · N1+(·b)/N1+(··)
    // with d = 3/4 exact-rational so every term is pinned integer
    // arithmetic: term1 = (4·c_ab−3)·1e6 DIV (4·c_a), cont_ppm =
    // N1+(·b)·1e6 DIV types, term2 = 3·N1+(a·)·cont_ppm DIV (4·c_a) —
    // two truncating DIVs, identical in both engines. (Wide-arithmetic
    // note: 4·c_ab·1e6 crosses the BIGINT rail at c_ab ≈ 2.3e12; past
    // that the q231/q265 DECIMAL(38,0) recipe applies unchanged.)
    // Scale shape: one corpus gram scan collapses to the vocabulary²-
    // bounded bigram table; every other table derives from IT (vocab-
    // bounded) and broadcasts, so nothing after the first agg touches
    // corpus-scale rows. Support floor c_ab >= 3 bounds the output,
    // applied AFTER the aggregates so the distribution stays
    // corpus-true.
    "q271_kneser_ney" -> ((s, d) => {
      val g2 = docs(s, d).select(
        explode(expr("graft_ngrams(text, 2)")).as("g"))
        .select(split(col("g"), " ")(0).as("a"),
          split(col("g"), " ")(1).as("b"))
      val c = g2.groupBy("a", "b").agg(count(lit(1)).as("c_ab"))
      val tot = c.groupBy("a")
        .agg(sum("c_ab").as("c_a"), count(lit(1)).as("n1p_a"))
      val contb = c.groupBy("b").agg(count(lit(1)).as("n1p_b"))
      val types = c.agg(count(lit(1)).as("n_types"))
      c.filter(col("c_ab") >= 3)
        .join(broadcast(tot), "a")
        .join(broadcast(contb), "b")
        .crossJoin(broadcast(types))
        .withColumn("cont_ppm", expr("n1p_b * 1000000 DIV n_types"))
        .select(col("a"), col("b"), col("c_ab"),
          expr("(4 * c_ab - 3) * 1000000 DIV (4 * c_a) + " +
            "3 * n1p_a * cont_ppm DIV (4 * c_a)").as("pkn_ppm"))
    }),

    // ---- q274: multinomial Naive Bayes language classifier ----
    // The fastText/CCNet-style TRAINED text classifier the curation
    // tier was missing (q129 classifies embeddings by centroid, q157
    // by neighbors; nothing classified from token statistics): train
    // Laplace-smoothed token likelihoods per language on the 80% split
    // (doc_id % 5 != 0), score the held-out 20% by
    // argmax_L [ log2 P(L) + Σ_tok log2 P(tok|L) ], output the
    // confusion matrix. log2 is the q252 whole-bit CASE cascade on ppm
    // values, so no libm log exists in either engine and the argmax is
    // pinned (ties → lexicographically smaller language). Unseen
    // (lang, tok) pairs get the Laplace floor (0+1)/(tot+V) via the
    // left join's coalesce — the smoothing that makes NB usable at
    // all. Scale shape: the per-lang totals + priors are |langs|-row
    // and force-broadcast; the (lang, tok) count model is vocabulary-
    // bounded but GROWS under Heaps' law, so its join is left to AQE
    // (broadcast while small, shuffle on (lang, tok) at scale); the test
    // corpus streams through a constant |langs|-way fan-out (the tiny
    // (lang, tot, v) table cross-broadcast, q129's centroid move), a
    // two-level per-(doc, lang) sum that partially aggregates
    // map-side, and a windowless argmax — no corpus-side shuffle
    // anywhere except the per-doc aggregate, and the confusion matrix
    // is |langs|²-bounded. Docs whose text tokenizes to nothing score
    // no rows and fall out in BOTH engines (documented, not hidden).
    "q274_naive_bayes" -> ((s, d) =>
      nbScores(s, d)
        .groupBy("doc_id", "label")
        .agg(min(struct((-col("score")).as("ns"), col("lang"))).as("w"))
        .select(col("label"), col("w.lang").as("pred"))
        .groupBy("label", "pred").agg(count(lit(1)).as("n"))),

    // ---- q297: NB confidence-margin calibration curve ----
    // The audit a classifier-based quality/language filter needs
    // before its scores gate data at 100 TB: is the model's CONFIDENCE
    // meaningful? Confidence proxy = the bit margin between the best
    // and second-best class score per document (exact longs from
    // q274's chain — no new model); docs bucket by margin DIV 4
    // (capped at 10) and each bucket reports its accuracy in exact
    // ppm. A calibrated model shows accuracy rising with margin, and a
    // threshold picked off this curve has a known accept/reject error
    // rate. Scale shape: q274's scoring chain verbatim (no corpus-side
    // shuffle beyond the per-doc aggregate), one more
    // doc_id-partitioned rank-2 window over the |langs|-bounded score
    // rows, and an 11-row output.
    "q297_nb_calibration" -> ((s, d) => {
      val ranked = nbScores(s, d)
        .withColumn("r", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("doc_id")
            .orderBy(col("score").desc, col("lang"))))
        .filter(col("r") <= 2)
      ranked.groupBy("doc_id", "label")
        .agg(max(when(col("r") === 1, col("lang"))).as("pred"),
          max(when(col("r") === 1, col("score"))).as("s1"),
          max(when(col("r") === 2, col("score"))).as("s2"))
        .withColumn("bucket", least(expr("(s1 - s2) DIV 4"), lit(10L)))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_docs"),
          expr("SUM(CASE WHEN pred = label THEN 1 ELSE 0 END)" +
            " * 1000000 DIV COUNT(*)").as("acc_ppm"))
    })
  )

  /** q274's per-(doc, label, lang) score table — shared with q297 so
    * the classifier and its calibration audit cannot drift apart.
    * tokc is the full (lang, tok) count table — vocabulary × |langs|
    * sized, which grows with the corpus under Heaps' law, so it gets
    * NO broadcast hint: AQE broadcasts it while it is small and falls
    * back to a shuffle join on (lang, tok) when it is not. Only the
    * |langs|-row header (labt × vsz) and priors stay force-broadcast. */
  private def nbScores(s: SparkSession, d: String): DataFrame = {
    val dd = docs(s, d)
    val train = dd.filter(col("doc_id") % 5 =!= 0)
    val test = dd.filter(col("doc_id") % 5 === 0)
    val trTok = train.select(col("lang"), explode(expr(toksNat)).as("tok"))
    val tokc = trTok.groupBy("lang", "tok").agg(count(lit(1)).as("c"))
    val labt = tokc.groupBy("lang").agg(sum("c").as("tot"))
    val vsz = trTok.agg(countDistinct("tok").as("v"))
    val priorBits = train.groupBy("lang").agg(count(lit(1)).as("nd"))
      .crossJoin(train.agg(count(lit(1)).as("ndt")))
      .withColumn("prior_ppm", expr("nd * 1000000 DIV ndt"))
      .select(col("lang"),
        expr(log2CaseOn("prior_ppm")).cast("long").as("pl2"))
    val teTok = test.select(col("doc_id"), col("lang").as("label"),
      explode(expr(toksNat)).as("tok"))
    teTok
      .crossJoin(broadcast(labt.crossJoin(vsz)))
      .join(tokc, Seq("lang", "tok"), "left")
      .withColumn("p_ppm",
        expr("(coalesce(c, 0) + 1) * 1000000 DIV (tot + v)"))
      .withColumn("l2", expr(Log2Case))
      .groupBy("doc_id", "label", "lang")
      .agg(sum("l2").as("tok_bits"))
      .join(broadcast(priorBits), "lang")
      .withColumn("score", col("tok_bits") + col("pl2"))
  }

  /** q270's merge-count: rounds of training (small constant — the cost
    * model is K vocab-bounded rounds, so K scales freely). */
  private val BpeTrainK = 8

  /** (w, f): corpus word frequencies — q203's training input table. */
  private def wordFreq(s: SparkSession, d: String): DataFrame =
    docs(s, d).select(explode(expr(toksNat)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("f"))

  /** The 1-row rank-ordered merge array from q203's scoring: top-10
    * corpus-weighted adjacent char pairs, (cnt desc, pair asc).
    * array_sort over (−cnt, pair) structs re-derives the rank order
    * INSIDE the aggregate, so the array is deterministic without
    * depending on collect_list's input order. */
  private def bpeMergeArr(tf: DataFrame): DataFrame =
    tf.filter(length(col("w")) >= 2)
      .select(col("f"), explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
        .as("pair"))
      .groupBy("pair").agg(sum("f").as("cnt"))
      .orderBy(col("cnt").desc, col("pair")).limit(10)
      .agg(expr("transform(array_sort(collect_list(struct(-cnt AS nc, " +
        "pair))), x -> x.pair)").as("merges"))

  /** q164's BM25 top-k per query term — also the text leg of q264's
    * reciprocal-rank fusion (shared so the two cannot drift). */
  private[queries] def bm25Ranks(s: SparkSession, d: String): DataFrame = {
      val tk = docs(s, d).select(col("doc_id"), expr(toksNat).as("t"))
      val dl = tk.select(col("doc_id"), size(col("t")).cast("long").as("dl"))
      val corpus = dl.agg(count(lit(1)).as("n"), sum(col("dl")).as("sumdl"))
      val tf = tk.select(col("doc_id"), explode(col("t")).as("tok"))
        .filter(col("tok").isin(Bm25Terms: _*))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      val dfq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("tok").orderBy(col("score").desc, col("doc_id"))
      bm25Scored(tf.join(broadcast(dfq), "tok")
          .join(dl, "doc_id")
          .crossJoin(broadcast(corpus)))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= Bm25K)
        .select("tok", "doc_id", "rank", "score")
  }

  /** Append q164's exact-rational BM25 `score` to a frame carrying
    * (tf, dl, n, sumdl, df) — factored so the overflow guard is
    * spec-testable on synthetic over-bound stats without a 2e16-token
    * corpus. The BIGINT numerator/denominator each get an in-plan
    * `assert_true` re-computed in DECIMAL(38,0) (q265/q276's widening
    * discipline): the documented bound 44·tf·Σdl·(N+1) < 2^63 — and
    * the denominator's (20·tf·Σdl + 6·Σdl + 18·dl·N)·(df+1) twin — is
    * now ENFORCED per row instead of described, with zero extra jobs
    * (the check rides the already-joined row; codegen'd decimal
    * compare against a constant). Past the bound the query fails
    * loudly with the remediation (pre-scale Σdl by 2^10, or the
    * conventional ln-idf DOUBLE spelling) rather than wrapping
    * silently. DECIMAL(38,0) itself saturates near 1e38 — a corpus
    * ~1e15× past the guard, physically unreachable. */
  private[graft] def bm25Scored(joined: DataFrame): DataFrame = {
    val lim = Long.MaxValue.toString
    val guard =
      s"""assert_true(
         | CAST(44 AS DECIMAL(38,0)) * tf * sumdl * (n + 1) <= $lim
         | AND (CAST(20 AS DECIMAL(38,0)) * tf * sumdl
         |      + CAST(6 AS DECIMAL(38,0)) * sumdl
         |      + CAST(18 AS DECIMAL(38,0)) * dl * n) * (df + 1) <= $lim,
         | 'q164 BM25 BIGINT overflow: 44*tf*sumdl*(N+1) or its
         | denominator exceeds 2^63 — pre-scale sumdl (DIV 1024) or use
         | the ln-idf DOUBLE spelling')""".stripMargin.replace("\n", " ")
    joined.withColumn("score", when(expr(guard).isNull,
      (lit(44) * col("tf") * col("sumdl") * (col("n") + 1)).cast("double") /
        ((lit(20) * col("tf") * col("sumdl") + lit(6) * col("sumdl") +
          lit(18) * col("dl") * col("n")) * (col("df") + 1)).cast("double")))
  }

  private def gramsDuck(n: Int): String =
    s"""SELECT doc_id, unnest(${ngramsDuck(s"(${toksDuck("text")})", n)}) AS g
       | FROM documents""".stripMargin

  /** q116's oracle — shared verbatim with q288 (see that entry). */
  private lazy val decontOracle: String =
    s"""WITH pairs AS (SELECT DISTINCT * FROM (${gramsDuck(DecontN)})),
      | bench AS (SELECT DISTINCT g FROM pairs WHERE doc_id % 19 = 0),
      | hits AS (SELECT doc_id, count(*) AS n_hits FROM pairs
      |   JOIN bench USING (g) WHERE doc_id % 19 <> 0 GROUP BY 1)
      |SELECT d.doc_id, d.source,
      |  COALESCE(h.n_hits, 0) AS n_hits, h.doc_id IS NULL AS keep
      |FROM documents d LEFT JOIN hits h USING (doc_id)
      |WHERE d.doc_id % 19 <> 0""".stripMargin

  val oracles: Map[String, String] = Map(

    "q223_dsir_score" ->
      s"""WITH tk AS (SELECT doc_id, lang, md5(unnest(${toksDuck("text")}))
        |    AS h FROM documents),
        | tb AS (SELECT doc_id, lang,
        |   (${nibbleDuck("h", 0)} * 16 + ${nibbleDuck("h", 1)}) % 64 AS b
        |  FROM tk),
        | buckets AS (SELECT range AS b FROM range(0, 64)),
        | ptc AS (SELECT b, count(*) AS c FROM tb WHERE lang = 'en'
        |  GROUP BY 1),
        | ptt AS (SELECT count(*) AS t FROM tb WHERE lang = 'en'),
        | pt AS (SELECT bu.b, (COALESCE(ptc.c, 0) + 1) * 1000000
        |    // (ptt.t + 64) AS pt_ppm
        |  FROM buckets bu LEFT JOIN ptc USING (b), ptt),
        | prc AS (SELECT b, count(*) AS c FROM tb GROUP BY 1),
        | prt AS (SELECT count(*) AS t FROM tb),
        | pr AS (SELECT bu.b, (COALESCE(prc.c, 0) + 1) * 1000000
        |    // (prt.t + 64) AS pr_ppm
        |  FROM buckets bu LEFT JOIN prc USING (b), prt),
        | sc AS (SELECT tb.doc_id, count(*) AS n_toks,
        |   CAST(SUM(pt_ppm - pr_ppm) AS BIGINT) AS score
        |  FROM tb JOIN pt USING (b) JOIN pr USING (b) GROUP BY 1)
        |SELECT doc_id, n_toks, score,
        | score // greatest(n_toks, 1) AS spt_ppm,
        | CAST(score > 0 AS INT) AS keep
        |FROM sc""".stripMargin,

    "q116_decontaminate" -> decontOracle,

    // the frozen-index incremental gate lands on the identical row set
    // (disjoint batches x frozen index), so it shares q116's oracle —
    // the incremental == one-shot law, hash-proven by the gate
    "q288_incr_decontaminate" -> decontOracle,

    // streaming maintenance must land on the identical admission set
    "q289_stream_decontaminate" -> decontOracle,

    "q280_gram_contamination" ->
      s"""WITH g AS (SELECT doc_id,
        |   ${TextDedup.splitRkDuck("doc_id")} AS rk, g
        |  FROM (${gramsDuck(ContamN)})),
        | tg AS (SELECT DISTINCT g FROM g WHERE rk = 0),
        | eg AS (SELECT DISTINCT doc_id, rk, g FROM g WHERE rk > 0),
        | pd AS (SELECT doc_id, rk, CAST(count(*) AS BIGINT) AS n_grams
        |  FROM eg GROUP BY 1, 2),
        | ht AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits
        |  FROM eg JOIN tg USING (g) GROUP BY 1)
        |SELECT pd.doc_id, ${TextDedup.splitNameDuck("pd.rk")} AS split,
        | pd.n_grams, COALESCE(ht.n_hits, 0) AS n_hits,
        | COALESCE(ht.n_hits, 0) > 0 AS contaminated
        |FROM pd LEFT JOIN ht USING (doc_id)""".stripMargin,

    "q284_contam_spans" ->
      s"""WITH tk AS (SELECT doc_id,
        |   ${TextDedup.splitRkDuck("doc_id")} AS rk,
        |   ${toksDuck("text")} AS t FROM documents),
        | pu AS (SELECT doc_id, rk, unnest([struct_pack(pos := i,
        |     g := array_to_string(t[i:i+${ContamN - 1}], ' '))
        |   FOR i IN range(1, len(t) - $ContamN + 2)]) AS u FROM tk),
        | p AS (SELECT doc_id, rk, u.pos AS pos, u.g AS g FROM pu),
        | tg AS (SELECT DISTINCT g FROM p WHERE rk = 0),
        | ep AS (SELECT doc_id, rk, pos, g FROM p WHERE rk > 0),
        | hits AS (SELECT doc_id, pos FROM ep JOIN tg USING (g)),
        | runs AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS run FROM (
        |    SELECT doc_id, pos, pos - row_number()
        |      OVER (PARTITION BY doc_id ORDER BY pos) AS grp FROM hits)
        |   GROUP BY doc_id, grp),
        | rmax AS (SELECT doc_id, max(run) AS mrun FROM runs GROUP BY 1),
        | pd AS (SELECT doc_id, rk, CAST(count(*) AS BIGINT) AS n_grams
        |  FROM ep GROUP BY 1, 2)
        |SELECT pd.doc_id, ${TextDedup.splitNameDuck("pd.rk")} AS split,
        | pd.n_grams, COALESCE(rmax.mrun, 0) AS max_run,
        | COALESCE(rmax.mrun + ${ContamN - 1}, 0) AS max_span_toks
        |FROM pd LEFT JOIN rmax USING (doc_id)""".stripMargin,

    "q117_boilerplate_grams" ->
      s"""WITH pairs AS (SELECT DISTINCT * FROM (${gramsDuck(BoilN)})),
        | boiler AS (SELECT g FROM pairs GROUP BY g
        |   HAVING count(*) >= $BoilDf),
        | per_doc AS (SELECT doc_id, count(*) AS n_grams FROM pairs
        |   GROUP BY 1),
        | bd AS (SELECT doc_id, count(*) AS n_boiler FROM pairs
        |   JOIN boiler USING (g) GROUP BY 1)
        |SELECT p.doc_id, p.n_grams, COALESCE(bd.n_boiler, 0) AS n_boiler
        |FROM per_doc p LEFT JOIN bd USING (doc_id)""".stripMargin,

    "q118_inverted_index" ->
      s"""WITH p AS (SELECT DISTINCT doc_id,
        |   unnest(${toksDuck("text")}) AS term FROM documents)
        |SELECT term, count(*) AS df,
        | string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
        |   AS postings
        |FROM p GROUP BY 1""".stripMargin,

    "q208_boolean_retrieval" -> {
      val in = BoolTerms.map(t => s"'$t'").mkString(", ")
      s"""WITH f AS (SELECT doc_id, unnest(${toksDuck("text")}) AS term
        |   FROM documents),
        | h AS (SELECT doc_id, term, count(*) AS tf FROM f
        |   WHERE term IN ($in) GROUP BY 1, 2)
        |SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS tf_sum FROM h
        |GROUP BY 1 HAVING count(*) = ${BoolTerms.size}""".stripMargin
    },

    "q119_latest_order" ->
      """SELECT o_custkey, o_orderdate AS last_date,
        | o_orderkey AS last_key, o_totalprice AS last_price
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
        |   ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders)
        |WHERE rn = 1""".stripMargin,

    "q120_shard_assign" -> {
      val h = "md5(CAST(doc_id AS VARCHAR))"
      s"""WITH a AS (SELECT *,
        |   (${nibbleDuck(h, 0)} * 16 + ${nibbleDuck(h, 1)}) % $Shards
        |     AS shard FROM documents)
        |SELECT shard, count(*) AS n_docs,
        | MIN(doc_id) AS min_id, MAX(doc_id) AS max_id,
        | CAST(SUM(n_chars) AS BIGINT) AS char_sum
        |FROM a GROUP BY 1""".stripMargin
    },

    "q124_group_quota" ->
      s"""SELECT doc_id, lang, source, rk FROM (
        | SELECT doc_id, lang, source, row_number() OVER (
        |   PARTITION BY lang
        |   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        | FROM documents)
        |WHERE rk <= $QuotaK""".stripMargin,

    "q125_winsorize" ->
      """WITH base AS (SELECT l_returnflag AS g, l_orderkey,
        |   l_linenumber, l_extendedprice AS x FROM lineitem),
        | ranked AS (SELECT *,
        |   row_number() OVER (PARTITION BY g ORDER BY x) AS rn,
        |   count(*) OVER (PARTITION BY g) AS n FROM base),
        | bounds AS (SELECT g,
        |   MIN(CASE WHEN rn = (n * 5 + 99) // 100 THEN x END) AS lo,
        |   MIN(CASE WHEN rn = (n * 95 + 99) // 100 THEN x END) AS hi
        |  FROM ranked GROUP BY g)
        |SELECT b.g, b.l_orderkey, b.l_linenumber,
        | LEAST(GREATEST(b.x, bo.lo), bo.hi) AS x_clip
        |FROM base b JOIN bounds bo ON b.g = bo.g""".stripMargin,

    "q127_equidepth_bins" ->
      """SELECT g, bin, count(*) AS n, MIN(x) AS lo, MAX(x) AS hi
        |FROM (SELECT l_returnflag AS g, l_extendedprice AS x,
        |   ntile(4) OVER (PARTITION BY l_returnflag
        |     ORDER BY l_extendedprice) AS bin
        |  FROM lineitem)
        |GROUP BY 1, 2""".stripMargin,

    "q132_zorder_layout" -> {
      val z = graft.operators.Layout.zExprDuck("pa", "sb", 8)
      s"""WITH m AS (SELECT l_partkey % 256 AS pa, l_suppkey % 256 AS sb
        |   FROM lineitem),
        | z AS (SELECT pa, sb, $z // 1024 AS zbucket FROM m)
        |SELECT zbucket, count(*) AS n,
        | MIN(pa) AS pa_lo, MAX(pa) AS pa_hi,
        | MIN(sb) AS sb_lo, MAX(sb) AS sb_hi
        |FROM z GROUP BY 1""".stripMargin
    },

    "q134_bigram_lm" ->
      s"""WITH p AS (SELECT unnest(${ngramsDuck(s"(${toksDuck("text")})", 2)})
        |   AS g FROM documents),
        | ab AS (SELECT string_split(g, ' ')[1] AS a,
        |   string_split(g, ' ')[2] AS b FROM p),
        | c AS (SELECT a, b, count(*) AS c_ab FROM ab GROUP BY 1, 2),
        | t AS (SELECT a, CAST(SUM(c_ab) AS BIGINT) AS c_a FROM c GROUP BY 1)
        |SELECT c.a, c.b, c.c_ab, (c.c_ab * 1000000) // t.c_a AS p_ppm
        |FROM c JOIN t USING (a) WHERE c.c_ab >= 3""".stripMargin,

    "q203_bpe_merges" ->
      s"""WITH tf AS (SELECT w, count(*) AS f FROM (
        |   SELECT unnest(${toksDuck("text")}) AS w FROM documents)
        |  GROUP BY 1),
        | pr AS (SELECT f, unnest([substr(w, i, 2)
        |   FOR i IN range(1, len(w))]) AS pair
        |  FROM tf WHERE len(w) >= 2)
        |SELECT pair, CAST(SUM(f) AS BIGINT) AS cnt FROM pr
        |GROUP BY 1 ORDER BY cnt DESC, pair LIMIT 10""".stripMargin,

    "q204_lm_score" ->
      s"""WITH pr AS (SELECT doc_id,
        |   unnest(${ngramsDuck(s"(${toksDuck("text")})", 2)}) AS g
        |  FROM documents),
        | ab AS (SELECT doc_id, string_split(g, ' ')[1] AS a,
        |   string_split(g, ' ')[2] AS b FROM pr),
        | c AS (SELECT a, b, count(*) AS c_ab FROM ab GROUP BY 1, 2),
        | t AS (SELECT a, CAST(SUM(c_ab) AS BIGINT) AS c_a FROM c
        |   GROUP BY 1),
        | lm AS (SELECT c.a, c.b, (c.c_ab * 1000000) // t.c_a AS p_ppm
        |  FROM c JOIN t USING (a))
        |SELECT ab.doc_id, count(*) AS n_pairs,
        | CAST(CAST(SUM(lm.p_ppm) AS BIGINT) // count(*) AS BIGINT)
        |   AS score_ppm
        |FROM ab JOIN lm USING (a, b) GROUP BY 1""".stripMargin,

    "q252_surprisal" ->
      s"""WITH pr AS (SELECT doc_id,
        |   unnest(${ngramsDuck(s"(${toksDuck("text")})", 2)}) AS g
        |  FROM documents),
        | ab AS (SELECT doc_id, string_split(g, ' ')[1] AS a,
        |   string_split(g, ' ')[2] AS b FROM pr),
        | c AS (SELECT a, b, count(*) AS c_ab FROM ab GROUP BY 1, 2),
        | t AS (SELECT a, CAST(SUM(c_ab) AS BIGINT) AS c_a FROM c
        |   GROUP BY 1),
        | lm AS (SELECT c.a, c.b, (c.c_ab * 1000000) // t.c_a AS p_ppm
        |  FROM c JOIN t USING (a)),
        | sc AS (SELECT ab.doc_id, ($Log2Case) AS l2
        |  FROM ab JOIN lm USING (a, b))
        |SELECT doc_id, count(*) AS n_pairs,
        | CAST(SUM(20 - l2) AS BIGINT) AS bits,
        | CAST(CAST(SUM(20 - l2) AS BIGINT) * 100 // count(*) AS BIGINT)
        |   AS bits_cb_per_pair
        |FROM sc GROUP BY 1""".stripMargin,

    "q262_span_corruption" ->
      s"""WITH tk AS (SELECT doc_id, ${toksDuck("text")} AS t
        |   FROM documents),
        | base AS (SELECT doc_id, len(t) AS n FROM tk WHERE len(t) > 0),
        | pos AS (SELECT doc_id, n, unnest(range(1, n + 1)) AS i
        |  FROM base),
        | fl AS (SELECT doc_id, n, i,
        |   CASE WHEN (instr('0123456789abcdef',
        |     substr(md5(doc_id || ':' || i), 1, 1)) - 1) < 2
        |    THEN 1 ELSE 0 END AS f
        |  FROM pos),
        | sp AS (SELECT doc_id, n, i, f,
        |   lag(f, 1, 0) OVER (PARTITION BY doc_id ORDER BY i) AS pf
        |  FROM fl),
        | agg AS (SELECT doc_id, CAST(MAX(n) AS BIGINT) AS n_toks,
        |   CAST(SUM(f) AS BIGINT) AS n_masked,
        |   CAST(SUM(CASE WHEN f = 1 AND pf = 0 THEN 1 ELSE 0 END)
        |     AS BIGINT) AS n_spans
        |  FROM sp GROUP BY 1)
        |SELECT doc_id, n_toks, n_masked, n_spans,
        | n_masked * 1000000 // n_toks AS mask_ppm,
        | CASE WHEN n_spans > 0 THEN n_masked * 100 // n_spans END
        |   AS mean_span_cb
        |FROM agg""".stripMargin,

    "q253_tfidf_terms" ->
      s"""WITH tk AS (SELECT doc_id, unnest(${toksDuck("text")}) AS term
        |   FROM documents),
        | tf AS (SELECT doc_id, term, count(*) AS tf FROM tk GROUP BY 1, 2),
        | df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        | n AS (SELECT count(*) AS n_docs FROM documents),
        | sc AS (SELECT tf.doc_id, tf.term, tf.tf, df.df,
        |   tf.tf * ((n.n_docs * 1000000) // df.df) AS score
        |  FROM tf JOIN df USING (term) CROSS JOIN n),
        | rk AS (SELECT *, row_number() OVER (PARTITION BY doc_id
        |     ORDER BY score DESC, term) AS rk FROM sc)
        |SELECT doc_id, term, tf, df, score, rk FROM rk
        |WHERE rk <= 3""".stripMargin,

    "q139_source_overlap" ->
      s"""WITH st AS (SELECT DISTINCT source,
        |   unnest(${toksDuck("text")}) AS tok FROM documents),
        | sz AS (SELECT source, count(*) AS n FROM st GROUP BY 1),
        | iv AS (SELECT x.source AS src_a, y.source AS src_b,
        |   count(*) AS inter
        |  FROM st x JOIN st y ON x.tok = y.tok AND x.source < y.source
        |  GROUP BY 1, 2)
        |SELECT src_a, src_b, inter,
        | (inter * 1000000) // (na.n + nb.n - inter) AS jac_ppm
        |FROM iv JOIN sz na ON na.source = iv.src_a
        | JOIN sz nb ON nb.source = iv.src_b""".stripMargin,

    "q143_novelty" ->
      s"""WITH pairs AS (SELECT DISTINCT * FROM (${gramsDuck(DecontN)})),
        | fo AS (SELECT g, MIN(doc_id) AS first_id FROM pairs GROUP BY 1),
        | pd AS (SELECT doc_id, count(*) AS n_grams FROM pairs GROUP BY 1),
        | nv AS (SELECT doc_id, count(*) AS n_novel FROM pairs
        |  JOIN fo USING (g) WHERE doc_id = first_id GROUP BY 1)
        |SELECT pd.doc_id, pd.n_grams,
        | COALESCE(nv.n_novel, 0) AS n_novel,
        | (COALESCE(nv.n_novel, 0) * 1000000) // pd.n_grams AS novelty_ppm
        |FROM pd LEFT JOIN nv USING (doc_id)""".stripMargin,

    "q144_pair_lift" ->
      s"""WITH dt AS (SELECT unnest(list_distinct(${toksDuck("text")}))
        |   AS tok FROM documents),
        | cnt AS (SELECT tok, count(*) AS n_t FROM dt GROUP BY 1),
        | t AS (SELECT list_sort(list_distinct(${toksDuck("text")})) AS ts
        |   FROM documents),
        | p AS (SELECT ts, unnest(range(1, len(ts) + 1)) AS i FROM t),
        | pr AS (SELECT ts[i] AS a, unnest(ts[i+1:len(ts)]) AS b FROM p),
        | ab AS (SELECT a, b, count(*) AS n_ab FROM pr GROUP BY 1, 2
        |   HAVING count(*) >= 5),
        | nn AS (SELECT count(*) AS n FROM documents)
        |SELECT ab.a, ab.b, ab.n_ab,
        | (ab.n_ab * nn.n * 1000000) // (na.n_t * nb.n_t) AS lift_ppm
        |FROM ab JOIN cnt na ON na.tok = ab.a
        | JOIN cnt nb ON nb.tok = ab.b CROSS JOIN nn""".stripMargin,

    "q147_quality_sweep" ->
      s"""WITH e AS (SELECT len(${toksDuck("text")}) AS n_toks
        |   FROM documents),
        | b AS (SELECT n_toks // 10 AS bucket, count(*) AS n_docs,
        |   CAST(SUM(n_toks) AS BIGINT) AS toks FROM e GROUP BY 1)
        |SELECT bucket, n_docs, toks,
        | CAST(SUM(n_docs) OVER (ORDER BY bucket DESC
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |   AS cum_docs,
        | CAST(SUM(toks) OVER (ORDER BY bucket DESC
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |   AS cum_toks
        |FROM b""".stripMargin,

    "q148_token_budget" -> {
      val en = graft.functions.TextExpr.langWords.toMap.apply("en")
      s"""WITH tk AS (SELECT doc_id, ${toksDuck("text")} AS toks
        |   FROM documents),
        | e AS (SELECT doc_id, len(toks) AS n_toks,
        |   (${graft.functions.TextExpr.hitCountDuck("toks", en)} * 1000)
        |     // len(toks) AS q_milli
        |  FROM tk WHERE len(toks) > 0),
        | b AS (SELECT q_milli, CAST(SUM(n_toks) AS BIGINT) AS bt FROM e
        |   GROUP BY 1),
        | c AS (SELECT q_milli, bt, CAST(SUM(bt) OVER (ORDER BY q_milli DESC
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |   AS cum FROM b),
        | c2 AS (SELECT q_milli, cum - bt AS prev FROM c),
        | j AS (SELECT e.doc_id, e.q_milli, e.n_toks, c2.prev
        |  FROM e JOIN c2 USING (q_milli) WHERE c2.prev < $TokenBudget),
        | wdw AS (SELECT *, CAST(SUM(n_toks) OVER (PARTITION BY q_milli
        |   ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |   AS BIGINT) AS in_cum FROM j)
        |SELECT doc_id, q_milli, n_toks FROM wdw
        |WHERE prev + in_cum <= $TokenBudget""".stripMargin
    },

    "q194_ccnet_buckets" -> {
      val en = graft.functions.TextExpr.langWords.toMap.apply("en")
      val keep = graft.functions.TextExpr.nibbleDuck(
        "md5(CAST(doc_id AS VARCHAR))", 0)
      s"""WITH tk AS (SELECT doc_id, lang, ${toksDuck("text")} AS toks
        |   FROM documents),
        | e AS (SELECT doc_id, lang,
        |   (${graft.functions.TextExpr.hitCountDuck("toks", en)} * 1000)
        |     // len(toks) AS q_milli
        |  FROM tk WHERE len(toks) > 0),
        | samp AS (SELECT * FROM e WHERE $keep < 8),
        | r AS (SELECT lang, q_milli,
        |   row_number() OVER (PARTITION BY lang ORDER BY q_milli DESC) AS rn,
        |   count(*) OVER (PARTITION BY lang) AS n FROM samp),
        | th AS (SELECT lang,
        |   max(CASE WHEN rn = (n - 1) * 33 // 100 + 1 THEN q_milli END)
        |     AS t_head,
        |   max(CASE WHEN rn = (n - 1) * 66 // 100 + 1 THEN q_milli END)
        |     AS t_mid
        |  FROM r GROUP BY 1)
        |SELECT e.doc_id, e.lang, e.q_milli,
        | CASE WHEN e.q_milli >= th.t_head THEN 'head'
        |      WHEN e.q_milli >= th.t_mid THEN 'middle'
        |      ELSE 'tail' END AS bucket
        |FROM e JOIN th USING (lang)""".stripMargin
    },

    "q195_dup_spans" ->
      s"""WITH tk AS (SELECT doc_id, ${toksDuck("text")} AS t
        |   FROM documents),
        | pu AS (SELECT doc_id, unnest([struct_pack(pos := i,
        |     g := array_to_string(t[i:i+${DupSpanN - 1}], ' '))
        |   FOR i IN range(1, len(t) - $DupSpanN + 2)]) AS u FROM tk),
        | p AS (SELECT doc_id, u.pos AS pos, u.g AS g FROM pu),
        | dg AS (SELECT g FROM (SELECT DISTINCT doc_id, g FROM p)
        |   GROUP BY g HAVING count(*) >= 2),
        | dp AS (SELECT doc_id, pos FROM p JOIN dg USING (g)),
        | runs AS (SELECT doc_id, count(*) AS run FROM (
        |    SELECT doc_id, pos, pos - row_number()
        |      OVER (PARTITION BY doc_id ORDER BY pos) AS grp FROM dp)
        |   GROUP BY doc_id, grp),
        | perdoc AS (SELECT doc_id, count(*) AS n_grams FROM p GROUP BY 1),
        | ds AS (SELECT doc_id, count(*) AS n_dup FROM dp GROUP BY 1),
        | rmax AS (SELECT doc_id, max(run) AS mrun FROM runs GROUP BY 1)
        |SELECT d.doc_id, COALESCE(perdoc.n_grams, 0) AS n_grams,
        | COALESCE(ds.n_dup, 0) AS n_dup,
        | COALESCE(rmax.mrun + ${DupSpanN - 1}, 0) AS max_run_toks
        |FROM documents d LEFT JOIN perdoc USING (doc_id)
        |LEFT JOIN ds USING (doc_id)
        |LEFT JOIN rmax USING (doc_id)""".stripMargin,

    "q202_greedy_cover" -> {
      // 5 greedy rounds as chained CTEs; round r's gains exclude every
      // gram covered by rounds 1..r-1
      val rounds = (1 to 5).map { r =>
        val excl =
          if (r == 1) ""
          else s" WHERE g NOT IN (SELECT g FROM c${r - 1})"
        val cPrev = if (r == 1) "" else s"SELECT g FROM c${r - 1} UNION "
        s"""g$r AS (SELECT doc_id, count(*) AS gain FROM p$excl
          |   GROUP BY 1),
          | b$r AS (SELECT $r AS round, doc_id, gain FROM g$r
          |   ORDER BY gain DESC, doc_id LIMIT 1),
          | c$r AS (${cPrev}SELECT DISTINCT g FROM p
          |   WHERE doc_id = (SELECT doc_id FROM b$r))""".stripMargin
      }.mkString(",\n ")
      val picks = (1 to 5).map(r => s"SELECT * FROM b$r")
        .mkString(" UNION ALL ")
      s"""WITH tk AS (SELECT doc_id, ${toksDuck("text")} AS t
        |   FROM documents),
        | pu AS (SELECT doc_id, unnest([struct_pack(pos := i,
        |     g := array_to_string(t[i:i+${DupSpanN - 1}], ' '))
        |   FOR i IN range(1, len(t) - $DupSpanN + 2)]) AS u FROM tk),
        | p AS (SELECT DISTINCT doc_id, u.g AS g FROM pu),
        | $rounds,
        | all_picks AS ($picks)
        |SELECT round, doc_id, gain,
        | CAST(SUM(gain) OVER (ORDER BY round) AS BIGINT) AS covered_cum
        |FROM all_picks""".stripMargin
    },

    "q121_cooccurrence" ->
      s"""WITH t AS (SELECT
        |   list_sort(list_distinct(${toksDuck("text")})) AS ts
        |   FROM documents),
        | p AS (SELECT ts, unnest(range(1, len(ts) + 1)) AS i FROM t),
        | pr AS (SELECT ts[i] AS a, unnest(ts[i+1:len(ts)]) AS b FROM p)
        |SELECT a, b, count(*) AS n_docs FROM pr GROUP BY 1, 2""".stripMargin,

    "q235_skipgram_cooc" ->
      s"""WITH t AS (SELECT ${toksDuck("text")} AS ts FROM documents),
        | p AS (SELECT ts, unnest(range(1, len(ts) + 1)) AS i FROM t),
        | pr AS (SELECT ts[i] AS a,
        |   unnest(ts[i+1:i+$SkipW]) AS b FROM p)
        |SELECT a, b, count(*) AS n_pairs FROM pr
        |GROUP BY 1, 2 HAVING count(*) >= $SkipMin""".stripMargin,

    "q245_zipf_coverage" ->
      s"""WITH v AS (SELECT unnest(${toksDuck("text")}) AS tok
        |  FROM documents),
        | g AS (SELECT tok, count(*) AS n FROM v GROUP BY 1),
        | t AS (SELECT CAST(SUM(n) AS BIGINT) AS tt FROM g),
        | r AS (SELECT tok, n,
        |   ROW_NUMBER() OVER (ORDER BY n DESC, tok) AS rank,
        |   CAST(SUM(n) OVER (ORDER BY n DESC, tok) AS BIGINT) AS cum
        |  FROM g)
        |SELECT rank, tok, n,
        | CAST(cum * 1000000 // tt AS BIGINT) AS cum_share_ppm
        |FROM r CROSS JOIN t WHERE rank <= 50""".stripMargin,

    "q170_mixture_weights" ->
      s"""WITH per AS (SELECT source, count(*) AS n_docs,
        |   CAST(SUM(len(${toksDuck("text")})) AS BIGINT) AS n_toks
        |  FROM documents GROUP BY source),
        | w AS (SELECT *,
        |   CAST(FLOOR(SQRT(CAST(n_toks AS DOUBLE))) AS BIGINT) AS isq
        |  FROM per),
        | tot AS (SELECT CAST(SUM(isq) AS BIGINT) AS isq_tot FROM w)
        |SELECT source, n_docs, n_toks, isq,
        | (isq * 1000000) // isq_tot AS w_ppm
        |FROM w CROSS JOIN tot""".stripMargin,

    "q217_mixture_apply" -> {
      val h = "md5(CAST(doc_id AS VARCHAR))"
      val hash16 = (0 until 4).map(k =>
        s"${nibbleDuck(h, k)} * ${1L << (4 * (3 - k))}")
        .mkString("(", " + ", ")")
      s"""WITH per AS (SELECT doc_id, source,
        |   CAST(len(${toksDuck("text")}) AS BIGINT) AS nt
        |  FROM documents),
        | st AS (SELECT source, count(*) AS n_docs,
        |   CAST(SUM(nt) AS BIGINT) AS n_toks FROM per GROUP BY 1),
        | w AS (SELECT *,
        |   CAST(FLOOR(SQRT(CAST(n_toks AS DOUBLE))) AS BIGINT) AS isq
        |  FROM st),
        | tot AS (SELECT CAST(SUM(isq) AS BIGINT) AS isq_tot,
        |   CAST(SUM(n_toks) AS BIGINT) AS toks_tot FROM w),
        | alloc AS (SELECT source, n_docs, n_toks,
        |   ((toks_tot // 2) * ((isq * 1000000) // isq_tot)) // 1000000
        |     AS target_toks
        |  FROM w CROSS JOIN tot),
        | a2 AS (SELECT *, CASE WHEN n_toks = 0 THEN 0
        |   ELSE least(CAST(1000000 AS BIGINT),
        |     (target_toks * 1000000) // n_toks) END AS p_ppm FROM alloc),
        | kept AS (SELECT per.source, count(*) AS n_kept,
        |   CAST(SUM(per.nt) AS BIGINT) AS kept_toks
        |  FROM per JOIN a2 ON per.source = a2.source
        |  WHERE CAST($hash16 AS BIGINT) * 1000000 < a2.p_ppm * 65536
        |  GROUP BY 1)
        |SELECT a2.source, a2.n_docs, a2.n_toks, a2.target_toks, a2.p_ppm,
        | COALESCE(kept.n_kept, 0) AS n_kept,
        | COALESCE(kept.kept_toks, 0) AS kept_toks
        |FROM a2 LEFT JOIN kept ON a2.source = kept.source""".stripMargin
    },

    "q164_bm25" -> {
      val terms = Bm25Terms.map(t => s"'$t'").mkString(", ")
      s"""WITH tk AS (SELECT doc_id, ${toksDuck("text")} AS t
        |   FROM documents),
        | dl AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM tk),
        | corpus AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(dl) AS BIGINT) AS sumdl FROM dl),
        | tf AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf FROM
        |    (SELECT doc_id, unnest(t) AS tok FROM tk)
        |  WHERE tok IN ($terms) GROUP BY 1, 2),
        | dfq AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf
        |   GROUP BY tok),
        | scored AS (SELECT tf.tok, tf.doc_id,
        |    CAST(44 * tf.tf * c.sumdl * (c.n + 1) AS DOUBLE) /
        |    CAST((20 * tf.tf * c.sumdl + 6 * c.sumdl + 18 * dl.dl * c.n)
        |         * (dfq.df + 1) AS DOUBLE) AS score
        |  FROM tf JOIN dfq USING (tok) JOIN dl USING (doc_id)
        |  CROSS JOIN corpus c),
        | ranked AS (SELECT tok, doc_id, score,
        |    ROW_NUMBER() OVER (PARTITION BY tok
        |      ORDER BY score DESC, doc_id) AS rank FROM scored)
        |SELECT tok, doc_id, rank, score FROM ranked
        |WHERE rank <= $Bm25K""".stripMargin
    },

    "q268_bpe_vocab" ->
      s"""WITH RECURSIVE $bpeCtes
        |SELECT tf.w, CAST(tf.f AS BIGINT) AS f,
        | array_to_string(d.rest, '|') AS bpe,
        | CAST(len(d.rest) AS BIGINT) AS n_bpe
        |FROM done d JOIN tf USING (w)
        |ORDER BY f DESC, w LIMIT 200""".stripMargin,

    "q269_bpe_doc_tokens" ->
      s"""WITH RECURSIVE $bpeCtes,
        | nb AS (SELECT w, CAST(len(rest) AS BIGINT) AS n_bpe FROM done),
        | wc AS (SELECT doc_id, w, count(*) AS c FROM (
        |    SELECT doc_id, unnest(${toksDuck("text")}) AS w
        |    FROM documents)
        |  GROUP BY 1, 2)
        |SELECT wc.doc_id, CAST(SUM(wc.c) AS BIGINT) AS n_words,
        | CAST(SUM(wc.c * nb.n_bpe) AS BIGINT) AS n_bpe,
        | (CAST(SUM(wc.c * nb.n_bpe) AS BIGINT) * 1000000)
        |   // CAST(SUM(wc.c) AS BIGINT) AS cpw_ppm
        |FROM wc JOIN nb USING (w) GROUP BY 1""".stripMargin,

    "q282_tokenizer_fertility" ->
      s"""WITH RECURSIVE $bpeCtes,
        | nb AS (SELECT w, CAST(len(w) AS BIGINT) AS n_chars,
        |   CAST(len(rest) AS BIGINT) AS n_bpe FROM done),
        | wc AS (SELECT lang, w, count(*) AS c FROM (
        |    SELECT lang, unnest(${toksDuck("text")}) AS w
        |    FROM documents)
        |  GROUP BY 1, 2),
        | g AS (SELECT lang,
        |   CAST(SUM(c) AS BIGINT) AS n_words,
        |   CAST(SUM(c * nb.n_chars) AS BIGINT) AS n_chars_tot,
        |   CAST(SUM(c * nb.n_bpe) AS BIGINT) AS n_bpe
        |  FROM wc JOIN nb USING (w) GROUP BY 1)
        |SELECT lang, n_words, n_bpe,
        | n_bpe * 1000000 // n_words AS fertility_ppm,
        | n_chars_tot * 1000000 // n_bpe AS chars_per_tok_ppm
        |FROM g""".stripMargin,

    "q270_bpe_train" -> bpeTrainOracle,

    "q271_kneser_ney" ->
      s"""WITH p AS (SELECT unnest(${ngramsDuck(s"(${toksDuck("text")})", 2)})
        |   AS g FROM documents),
        | ab AS (SELECT string_split(g, ' ')[1] AS a,
        |   string_split(g, ' ')[2] AS b FROM p),
        | c AS (SELECT a, b, count(*) AS c_ab FROM ab GROUP BY 1, 2),
        | t AS (SELECT a, CAST(SUM(c_ab) AS BIGINT) AS c_a,
        |   CAST(COUNT(*) AS BIGINT) AS n1p_a FROM c GROUP BY 1),
        | cb AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS n1p_b FROM c
        |  GROUP BY 1),
        | ty AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_types FROM c)
        |SELECT c.a, c.b, c.c_ab,
        | (((4 * c.c_ab - 3) * 1000000) // (4 * t.c_a))
        | + ((3 * t.n1p_a * ((cb.n1p_b * 1000000) // ty.n_types))
        |     // (4 * t.c_a)) AS pkn_ppm
        |FROM c JOIN t USING (a) JOIN cb USING (b) CROSS JOIN ty
        |WHERE c.c_ab >= 3""".stripMargin,

    "q274_naive_bayes" ->
      s"""WITH $nbScoreCtes,
        | best AS (SELECT doc_id, label, lang AS pred,
        |   ROW_NUMBER() OVER (PARTITION BY doc_id
        |     ORDER BY score DESC, lang) AS rk FROM fin)
        |SELECT label, pred, CAST(COUNT(*) AS BIGINT) AS n
        |FROM best WHERE rk = 1 GROUP BY 1, 2""".stripMargin,

    // calibration curve replayed on the identical score chain: rank-2
    // margins, DIV-4 buckets capped at 10, accuracy in exact ppm
    "q297_nb_calibration" ->
      s"""WITH $nbScoreCtes,
        | rk AS (SELECT doc_id, label, lang, score,
        |   ROW_NUMBER() OVER (PARTITION BY doc_id
        |     ORDER BY score DESC, lang) AS r FROM fin),
        | b AS (SELECT doc_id, label,
        |   max(CASE WHEN r = 1 THEN lang END) AS pred,
        |   max(CASE WHEN r = 1 THEN score END) AS s1,
        |   max(CASE WHEN r = 2 THEN score END) AS s2
        |  FROM rk WHERE r <= 2 GROUP BY 1, 2)
        |SELECT LEAST((s1 - s2) // 4, 10) AS bucket,
        | CAST(COUNT(*) AS BIGINT) AS n_docs,
        | CAST(SUM(CASE WHEN pred = label THEN 1 ELSE 0 END)
        |   * 1000000 // COUNT(*) AS BIGINT) AS acc_ppm
        |FROM b GROUP BY 1""".stripMargin
  )

  /** q274's score chain as DuckDB CTEs, ending at `fin`(doc_id, label,
    * lang, score) — shared with q297's calibration replay. */
  private lazy val nbScoreCtes: String =
    s"""tr AS (SELECT lang, unnest(${toksDuck("text")}) AS tok
      |   FROM documents WHERE doc_id % 5 <> 0),
      | tokc AS (SELECT lang, tok, count(*) AS c FROM tr GROUP BY 1, 2),
      | labt AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS tot FROM tokc
      |  GROUP BY 1),
      | vs AS (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v FROM tr),
      | pri AS (SELECT lang, count(*) AS nd FROM documents
      |  WHERE doc_id % 5 <> 0 GROUP BY 1),
      | nt AS (SELECT count(*) AS ndt FROM documents
      |  WHERE doc_id % 5 <> 0),
      | prip AS (SELECT lang, (nd * 1000000) // ndt AS prior_ppm
      |  FROM pri CROSS JOIN nt),
      | prib AS (SELECT lang,
      |   CAST(${log2CaseOn("prior_ppm")} AS BIGINT) AS pl2 FROM prip),
      | te AS (SELECT doc_id, lang AS label,
      |   unnest(${toksDuck("text")}) AS tok
      |  FROM documents WHERE doc_id % 5 = 0),
      | lv AS (SELECT labt.lang, labt.tot, vs.v FROM labt CROSS JOIN vs),
      | cand AS (SELECT te.doc_id, te.label, l.lang,
      |   ((coalesce(tc.c, 0) + 1) * 1000000) // (l.tot + l.v) AS p_ppm
      |  FROM te CROSS JOIN lv l
      |  LEFT JOIN tokc tc ON tc.lang = l.lang AND tc.tok = te.tok),
      | sc AS (SELECT doc_id, label, lang,
      |   CAST(SUM(${log2CaseOn("p_ppm")}) AS BIGINT) AS tok_bits
      |  FROM cand GROUP BY 1, 2, 3),
      | fin AS (SELECT sc.doc_id, sc.label, sc.lang,
      |   sc.tok_bits + prib.pl2 AS score
      |  FROM sc JOIN prib USING (lang))""".stripMargin

  /** q270's oracle: the K training rounds as chained MATERIALIZED CTE
    * stages. Stage r counts adjacent-piece concatenations over the
    * round-(r-1) segmentation (weighted by word frequency), takes the
    * (cnt DESC, pair ASC) argmax as merge r, and fuses it with ONE
    * left-to-right recursive-CTE pass — the single-stage form of
    * bpeCtes' state machine; sequential per-merge passes are exactly
    * bpeApply's semantics, so seg_r == bpeApply(w, merges[1..r]).
    * MATERIALIZED is load-bearing: without it DuckDB re-inlines each
    * stage into every consumer and the chain blows up exponentially. */
  private lazy val bpeTrainOracle: String = {
    val ctes = scala.collection.mutable.ArrayBuffer[String](
      s"""tf AS MATERIALIZED (SELECT w, count(*) AS f FROM (
        |   SELECT unnest(${toksDuck("text")}) AS w FROM documents)
        |  GROUP BY 1)""".stripMargin,
      """seg0 AS MATERIALIZED (SELECT w, f,
        |   [substr(w, i, 1) FOR i IN range(1, len(w)+1)] AS s
        |  FROM tf WHERE len(w) >= 2)""".stripMargin)
    for (r <- 1 to BpeTrainK) {
      val p = r - 1
      ctes += s"""pr$r AS MATERIALIZED (SELECT f,
        |   unnest([s[i] || s[i+1] FOR i IN range(1, len(s))]) AS pair
        |  FROM seg$p WHERE len(s) >= 2)""".stripMargin
      ctes += s"""mg$r AS MATERIALIZED (SELECT pair,
        |   CAST(SUM(f) AS BIGINT) AS cnt
        |  FROM pr$r GROUP BY 1 ORDER BY cnt DESC, pair LIMIT 1)""".stripMargin
      ctes += s"""fz$r AS (
        |  SELECT w, f, s AS rest, CAST([] AS VARCHAR[]) AS acc FROM seg$p
        |  UNION ALL
        |  SELECT z.w, z.f,
        |   CASE WHEN len(z.rest) >= 2 AND z.rest[1] || z.rest[2] = m.pair
        |     THEN z.rest[3:] ELSE z.rest[2:] END,
        |   CASE WHEN len(z.rest) >= 2 AND z.rest[1] || z.rest[2] = m.pair
        |     THEN list_append(z.acc, z.rest[1] || z.rest[2])
        |     ELSE list_append(z.acc, z.rest[1]) END
        |  FROM fz$r z CROSS JOIN mg$r m
        |  WHERE len(z.rest) > 0)""".stripMargin
      ctes += s"""seg$r AS MATERIALIZED (
        |  SELECT w, f, acc AS s FROM fz$r WHERE len(rest) = 0)""".stripMargin
    }
    val sel = (1 to BpeTrainK)
      .map(r => s"SELECT CAST($r AS BIGINT) AS rk, pair AS merge, cnt FROM mg$r")
      .mkString(" UNION ALL ")
    "WITH RECURSIVE " + ctes.mkString(",\n ") +
      s"\nSELECT * FROM ($sel) ORDER BY rk"
  }

  /** The BPE apply oracle's shared scaffold: q203's merge scoring (tf →
    * mg, rank-ordered as mr) feeding a recursive-CTE state machine that
    * replays TextNative.bpeApply exactly — state = (stage, remaining
    * token list, emitted token list); an empty remainder advances the
    * stage and recycles the emitted list as the next pass's input; rows
    * reaching stage n_merges+1 carry the final segmentation in `rest`.
    * Validated against an independent imperative reference over the
    * full sf0.01 vocabulary before landing. */
  private lazy val bpeCtes: String =
    s"""tf AS (SELECT w, count(*) AS f FROM (
      |   SELECT unnest(${toksDuck("text")}) AS w FROM documents)
      |  GROUP BY 1),
      | pr AS (SELECT f, unnest([substr(w, i, 2)
      |   FOR i IN range(1, len(w))]) AS pair
      |  FROM tf WHERE len(w) >= 2),
      | mg AS (SELECT pair, CAST(SUM(f) AS BIGINT) AS cnt FROM pr
      |  GROUP BY 1 ORDER BY cnt DESC, pair LIMIT 10),
      | mr AS (SELECT pair,
      |   CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, pair) AS INT) AS rk
      |  FROM mg),
      | nm AS (SELECT CAST(count(*) AS INT) AS n FROM mr),
      | seg AS (
      |  SELECT w, 1 AS stage,
      |    [substr(w, i, 1) FOR i IN range(1, len(w)+1)] AS rest,
      |    CAST([] AS VARCHAR[]) AS acc
      |  FROM tf
      |  UNION ALL
      |  SELECT s.w,
      |   CASE WHEN len(s.rest) = 0 THEN s.stage + 1 ELSE s.stage END,
      |   CASE WHEN len(s.rest) = 0 THEN s.acc
      |        WHEN len(s.rest) >= 2 AND s.rest[1] || s.rest[2] = m.pair
      |          THEN s.rest[3:]
      |        ELSE s.rest[2:] END,
      |   CASE WHEN len(s.rest) = 0 THEN CAST([] AS VARCHAR[])
      |        WHEN len(s.rest) >= 2 AND s.rest[1] || s.rest[2] = m.pair
      |          THEN list_append(s.acc, s.rest[1] || s.rest[2])
      |        ELSE list_append(s.acc, s.rest[1]) END
      |  FROM seg s JOIN mr m ON m.rk = s.stage CROSS JOIN nm
      |  WHERE s.stage <= nm.n),
      | done AS (SELECT s.w, s.rest FROM seg s CROSS JOIN nm
      |  WHERE s.stage = nm.n + 1)""".stripMargin
}
