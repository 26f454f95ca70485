package graft.functions

/** Dual-dialect expression fragments for the text/dedup operators.
  *
  * Each concept (tokenize, shingle, minhash, simhash nibble, …) is defined
  * ONCE as an algorithm and rendered twice: as Spark SQL (consumed via
  * `expr(...)` so it stays inside Catalyst codegen) and as DuckDB SQL (the
  * oracle). Primitives are chosen so both engines produce *bit-identical*
  * results:
  *   - md5() yields the same hex string everywhere;
  *   - element indexing uses the 1-based form in both dialects
  *     (`element_at` / `list[i]`);
  *   - all arithmetic on hashes is integer (nibble decode via
  *     strpos/instr on a hex alphabet), so no float divergence exists;
  *   - lexicographic MIN over md5 hex strings orders exactly like the
  *     128-bit integer it encodes, giving an engine-portable minhash.
  */
object TextExpr {

  /** Normalized tokens: lowercase, split on non-alphanumeric runs, drop
    * empties. */
  def toksSpark(c: String): String =
    s"filter(split(lower($c), '[^a-z0-9]+'), x -> x != '')"
  def toksDuck(c: String): String =
    s"list_filter(string_split_regex(lower($c), '[^a-z0-9]+'), x -> x <> '')"

  /** Word 3-gram shingles; docs shorter than 3 tokens shingle to their
    * tokens so they still participate in dedup. */
  def shinglesSpark(t: String): String =
    s"CASE WHEN size($t) >= 3 THEN transform(sequence(1, size($t)-2), " +
      s"i -> concat_ws(' ', element_at($t,i), element_at($t,i+1), element_at($t,i+2))) " +
      s"ELSE $t END"
  def shinglesDuck(t: String): String =
    s"CASE WHEN len($t) >= 3 THEN [($t)[i] || ' ' || ($t)[i+1] || ' ' || ($t)[i+2] " +
      s"FOR i IN range(1, len($t)-1)] ELSE $t END"

  /** Minhash component i: lexicographic min of seeded md5 over shingles. */
  def minhashSpark(sh: String, seed: Int): String =
    s"array_min(transform($sh, x -> md5(concat('$seed:', x))))"
  def minhashDuck(sh: String, seed: Int): String =
    s"list_aggregate(list_transform($sh, x -> md5('$seed:' || x)), 'min')"

  /** Word n-gram strings (space-joined runs of n consecutive tokens);
    * docs shorter than n tokens yield NO grams (unlike shingles, which
    * fall back to the tokens — a decontamination/boilerplate gram must
    * be a full-width phrase or nothing). */
  def ngramsSpark(t: String, n: Int): String =
    s"CASE WHEN size($t) >= $n THEN transform(sequence(1, size($t)-${n - 1}), " +
      s"i -> concat_ws(' ', slice($t, i, $n))) ELSE slice($t, 1, 0) END"
  def ngramsDuck(t: String, n: Int): String =
    s"CASE WHEN len($t) >= $n THEN [array_to_string(($t)[i:i+${n - 1}], ' ') " +
      s"FOR i IN range(1, len($t)-${n - 2})] ELSE ($t)[1:0] END"

  /** Nibble k (0-based, most-significant hex char first) of md5 hex `h`
    * as an int 0..15. */
  def nibbleSpark(h: String, k: Int): String =
    s"(instr('0123456789abcdef', substr($h, ${k + 1}, 1)) - 1)"
  def nibbleDuck(h: String, k: Int): String =
    s"(strpos('0123456789abcdef', substr($h, ${k + 1}, 1)) - 1)"

  /** First `n` hex chars of md5 hex `h` as a non-negative BIGINT, as a
    * nibble polynomial (DuckDB has no string→int base conversion). This
    * is the oracle twin of operators.Sketches.position, which spells
    * the same big-endian decode with Spark's conv() — both produce the
    * identical value, so `% m` derived hash positions agree
    * bit-for-bit across engines (the Bloom / count-min primitives).
    * n <= 15 keeps the value inside a positive BIGINT. */
  def hexIntDuck(h: String, n: Int): String = {
    require(n <= 15, "n > 15 would overflow positive BIGINT")
    (0 until n).map { k =>
      val scale = math.pow(16, n - 1 - k).toLong
      s"(${nibbleDuck(h, k)} * CAST($scale AS BIGINT))"
    }.mkString("(", " + ", ")")
  }

  /** ±1 contribution of bit j (from precomputed nibble columns n0..n7). */
  def bitSignSpark(j: Int): String =
    s"((shiftright(n${j / 4}, ${j % 4}) & 1) * 2 - 1)"
  def bitSignDuck(j: Int): String =
    s"(((n${j / 4} >> ${j % 4}) & 1) * 2 - 1)"

  /** `bits`-wide simhash from per-bit signed sums s_j (aggregate
    * context): bit j set iff SUM(bitSign_j) >= 0. bits <= 62 so the
    * BIGINT stays positive (shift/xor/bit_count then agree across
    * engines with no sign games). */
  def simhashBits(bits: Int)(sumExpr: Int => String): String = {
    require(bits <= 62, "bits > 62 would overflow positive BIGINT")
    (0 until bits).map { j =>
      s"(CASE WHEN ${sumExpr(j)} >= 0 THEN CAST(${1L << j} AS BIGINT) ELSE 0 END)"
    }.mkString("(", " + ", ")")
  }

  /** 32-bit simhash (the q40 shape). */
  def simhashFromSums(sumExpr: Int => String): String =
    simhashBits(32)(sumExpr)
  /** Same rendering works in both dialects. */
  def simhashFromSumsDuck(sumExpr: Int => String): String =
    simhashFromSums(sumExpr)

  /** Exact-dup fingerprint: md5 of the sorted distinct token set. */
  def fingerprintSpark(t: String): String =
    s"md5(array_join(array_sort(array_distinct($t)), ' '))"
  def fingerprintDuck(t: String): String =
    s"md5(array_to_string(list_sort(list_distinct($t)), ' '))"

  /** Count of tokens present in a fixed word list. */
  def hitCountSpark(t: String, words: Seq[String]): String = {
    val arr = words.map(w => s"'$w'").mkString("array(", ", ", ")")
    s"size(filter($t, x -> array_contains($arr, x)))"
  }
  def hitCountDuck(t: String, words: Seq[String]): String = {
    val arr = words.map(w => s"'$w'").mkString("[", ", ", "]")
    s"len(list_filter($t, x -> list_contains($arr, x)))"
  }

  /** Total character length of all tokens (integer, order-free). */
  def tokCharsSpark(t: String): String =
    s"aggregate(transform($t, x -> length(x)), 0, (a, x) -> a + x)"
  def tokCharsDuck(t: String): String =
    s"coalesce(list_aggregate(list_transform($t, x -> length(x)), 'sum'), 0)"

  /** BPE-ish token count: letter runs, digit runs, or single symbols. */
  val bpeRegex = "[a-z]+|[0-9]+|[^a-z0-9 ]"
  def bpeCountSpark(c: String): String =
    s"size(regexp_extract_all(lower($c), '$bpeRegex', 0))"
  def bpeCountDuck(c: String): String =
    s"len(regexp_extract_all(lower($c), '$bpeRegex'))"

  /** Small per-language stopword lists for the n-gram/stopword language
    * heuristic (deterministic, oracle-portable). */
  val langWords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "to", "in", "it"),
    "es" -> Seq("el", "la", "de", "y", "que", "los", "un"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein", "nicht"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "est"))

  /** Deterministic argmax over the language scores c_en..c_fr: first
    * language (in langWords order) achieving the running maximum. */
  def langPick: String =
    """CASE
      | WHEN c_en >= c_es AND c_en >= c_de AND c_en >= c_fr THEN 'en'
      | WHEN c_es >= c_de AND c_es >= c_fr THEN 'es'
      | WHEN c_de >= c_fr THEN 'de'
      | ELSE 'fr' END""".stripMargin
}
