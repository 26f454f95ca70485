package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextExpr._
import graft.functions.DetMath._

/** Text-analysis operators for LLM data pipelines (SURVEY.md §2.11):
  * per-document statistics, quality scoring, language identification,
  * token counting. All are pure column expressions — narrow, no shuffle,
  * fully inside whole-stage codegen — so they stream over 100 TB at scan
  * speed and compose with any downstream filter/agg.
  */
object TextAnalysis {

  /** Append the normalized token array (fused native tokenizer,
    * spec-identical to TextExpr.toksSpark). */
  def withTokens(df: DataFrame, textCol: String, out: String = "toks"): DataFrame = {
    graft.functions.TextNative.register(df.sparkSession)
    df.withColumn(out, expr(s"graft_tokens($textCol)"))
  }

  /** Per-doc surface statistics: char length, token counts, type-token
    * ratio, mean token length. Ratios are exact-integer divisions →
    * deterministic doubles. */
  def stats(df: DataFrame, idCol: String, textCol: String): DataFrame =
    withTokens(df, textCol)
      .withColumn("n_toks", size(col("toks")))
      .withColumn("n_uniq", size(array_distinct(col("toks"))))
      .withColumn("tok_chars", expr(tokCharsSpark("toks")))
      .select(col(idCol),
        length(col(textCol)).as("len"),
        col("n_toks"), col("n_uniq"),
        rnd(col("n_uniq") / greatest(col("n_toks"), lit(1)), 4).as("ttr"),
        rnd(col("tok_chars") / greatest(col("n_toks"), lit(1)), 4).as("mean_tok_len"))

  /** Heuristic quality score: stopword ratio, digit ratio, length band. */
  def quality(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val en = langWords.toMap.apply("en")
    withTokens(df, textCol)
      .withColumn("n_toks", size(col("toks")))
      .withColumn("n_stop", expr(hitCountSpark("toks", en)))
      .withColumn("n_digit", size(expr("filter(toks, x -> x rlike '^[0-9]+$')")))
      .select(col(idCol), col("n_toks"), col("n_stop"), col("n_digit"),
        rnd(col("n_stop") / greatest(col("n_toks"), lit(1)), 4).as("stop_ratio"),
        rnd(col("n_digit") / greatest(col("n_toks"), lit(1)), 4).as("digit_ratio"),
        (col("n_toks") >= 20 && col("n_toks") <= 1000).cast("int").as("len_ok"))
  }

  /** Gopher-style repetition scoring: the fraction of the document's
    * word bigrams taken by its single most frequent bigram (boilerplate
    * and template spam repeat themselves; clean prose doesn't). One
    * explode + one two-level hash-agg — the shuffle key is (doc, gram)
    * then doc, so parallelism grows with the corpus. The ratio is one
    * exact-integer division → deterministic double both engines. */
  def repetition(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    graft.functions.TextNative.register(df.sparkSession)
    // graft_ngrams(text, 2) is the fused twin of the old declarative
    // bigram spelling (empty array below 2 tokens, identical join
    // separator) — one tight loop instead of interpreted per-element
    // lambda dispatch in the generator expression
    df.select(col(idCol),
        posexplode_outer(expr(s"graft_ngrams($textCol, 2)"))
          .as(Seq("_p", "gram")))
      .groupBy(col(idCol), col("gram"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg(
        // gram null (empty/1-token doc) → count that row as 0 grams
        sum(when(col("gram").isNotNull, col("c")).otherwise(0L)).as("n_grams"),
        max(when(col("gram").isNotNull, col("c")).otherwise(0L)).as("max_gram"))
      .select(col(idCol), col("n_grams"), col("max_gram"),
        rnd(col("max_gram") / greatest(col("n_grams"), lit(1)), 4)
          .as("rep_ratio"))
  }

  /** Stopword-list language ID with deterministic tie-break (first
    * language in TextExpr.langWords order wins). */
  def langId(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val withScores = langWords.foldLeft(withTokens(df, textCol)) {
      case (d, (lang, words)) =>
        d.withColumn(s"c_$lang", expr(hitCountSpark("toks", words)))
    }
    withScores.select(
      (col(idCol) +: langWords.map { case (l, _) => col(s"c_$l") }) :+
        expr(langPick).as("pred_lang"): _*)
  }

  /** ONE-PASS curation enrichment: quality metrics + language scores +
    * content fingerprint from a single tokenization of each row — the
    * fusion a corpus-curation pipeline wants (calling quality/langId/
    * fingerprint separately tokenizes the corpus once per operator;
    * at 100 TB tokenization IS the dominant cost). Emits every column
    * [[quality]] and [[langId]] emit, plus `fp`. */
  def enrich(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val en = langWords.toMap.apply("en")
    val withScores = langWords.foldLeft(withTokens(df, textCol)) {
      case (d, (lang, words)) =>
        d.withColumn(s"c_$lang", expr(hitCountSpark("toks", words)))
    }
    withScores
      .withColumn("n_toks", size(col("toks")))
      .withColumn("n_stop", expr(hitCountSpark("toks", en)))
      .withColumn("n_digit", size(expr("filter(toks, x -> x rlike '^[0-9]+$')")))
      .withColumn("stop_ratio",
        rnd(col("n_stop") / greatest(col("n_toks"), lit(1)), 4))
      .withColumn("digit_ratio",
        rnd(col("n_digit") / greatest(col("n_toks"), lit(1)), 4))
      .withColumn("len_ok",
        (col("n_toks") >= 20 && col("n_toks") <= 1000).cast("int"))
      .withColumn("pred_lang", expr(langPick))
      .withColumn("fp", expr(fingerprintSpark("toks")))
      .drop("toks")
  }

  /** Token-count estimators: whitespace tokens, BPE-ish regex tokens,
    * chars/4 heuristic. */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String): DataFrame =
    withTokens(df, textCol)
      .select(col(idCol),
        size(col("toks")).as("ws_toks"),
        expr(bpeCountSpark(textCol)).as("bpe_toks"),
        ceil(length(col(textCol)) / 4.0).cast("long").as("approx_toks"))

  /** Gopher-style composite quality gate (Rae et al. 2021 §A.1.1,
    * adapted to this corpus's scale): five independent pass flags plus
    * the conjunction, each spelled in pure integer arithmetic so the
    * oracle agrees bit-for-bit:
    *   - len_ok        20 <= n_toks <= 1000
    *   - mean_len_ok   mean token length in [3, 10] chars
    *                   (tok_chars*10 between n_toks*30 and n_toks*100)
    *   - alpha_ok      >= 80% of tokens contain a letter
    *   - stop_ok       >= 1 *distinct* stopword present (Gopher asks
    *                   for 2 of 8; this corpus's synthetic vocabulary
    *                   carries exactly one list word, so 1 is the
    *                   threshold that discriminates here)
    *   - rep_ok        top bigram takes <= 20% of all bigrams
    * Emitting per-rule flags (not just `keep`) is the point: a corpus
    * audit needs the reject-reason breakdown to see WHICH rule is
    * eating the data. The four narrow flags are scan-speed column
    * expressions; rep_ok reuses the (doc, gram) two-level hash-agg of
    * [[repetition]] and joins back on the id — one extra doc-keyed
    * shuffle of 3-column rows, which at 100 TB is noise next to the
    * gram explode itself. */
  def gopherRules(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val en = langWords.toMap.apply("en")
    val narrow = withTokens(df, textCol)
      .withColumn("n_toks", size(col("toks")))
      .withColumn("tok_chars", expr(tokCharsSpark("toks")))
      .withColumn("n_alpha",
        size(expr("filter(toks, x -> x rlike '[a-z]')")))
      .withColumn("n_stop_d",
        expr(hitCountSpark("array_distinct(toks)", en)))
      .select(col(idCol), col("n_toks"),
        (col("n_toks") >= 20 && col("n_toks") <= 1000)
          .cast("int").as("len_ok"),
        (col("n_toks") > 0 &&
          col("tok_chars") * 10 >= col("n_toks") * 30 &&
          col("tok_chars") * 10 <= col("n_toks") * 100)
          .cast("int").as("mean_len_ok"),
        (col("n_toks") > 0 && col("n_alpha") * 10 >= col("n_toks") * 8)
          .cast("int").as("alpha_ok"),
        (col("n_stop_d") >= 1).cast("int").as("stop_ok"))
    val rep = repetition(df, idCol, textCol)
      .select(col(idCol),
        (col("max_gram") * 5 <= greatest(col("n_grams"), lit(1)))
          .cast("int").as("rep_ok"))
    narrow.join(rep, idCol)
      .withColumn("keep",
        (col("len_ok") * col("mean_len_ok") * col("alpha_ok") *
          col("stop_ok") * col("rep_ok")).cast("int"))
  }
}
