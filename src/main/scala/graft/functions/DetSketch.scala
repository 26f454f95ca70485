package graft.functions

/** Deterministic HyperLogLog-style distinct sketch, dual-dialect.
  *
  * Spark's `approx_count_distinct` / `hll_sketch_agg` are engine-private
  * (DataSketches binaries a SQL oracle cannot replay), so — exactly like
  * the Bloom / count-min pair in `operators.Sketches` — the gated
  * spelling derives every register from md5 and INTEGER arithmetic only:
  *
  *   h        = md5('d:' || value)              (same hex in both engines)
  *   bucket   = first 2 nibbles                 (m = 256 registers)
  *   rank     = leading-zero count of nibbles 3..12 (40 bits) + 1,
  *              rendered as a pure CASE cascade (no log2 floats)
  *   register = MAX(rank) per (group, bucket)   (sketch union ≡ MAX,
  *              which is what makes the persisted incremental path exact)
  *   Z        = Σ 2^(41-rank) over all m registers in FIXED POINT
  *              (scale 2^41), so the harmonic mean is exact BIGINT math
  *   raw      = floor(α_m · m² · 2^41 / Z)      (one integer division)
  *   estimate = linear counting m·ln(m/V) when raw ≤ 2.5m and V > 0
  *              (V = empty registers), via a PRECOMPUTED 256-entry
  *              integer table — the ln lives in Scala at compile time,
  *              so no runtime float exists anywhere and Spark + DuckDB
  *              agree bit-for-bit while the estimator stays the textbook
  *              HLL-with-LC of Flajolet et al. 2007.
  *
  * The production spelling remains `approx_count_distinct` /
  * `hll_union_agg` (OperatorSpec pins both paths against exact counts);
  * this is the oracle-replayable artifact — the same split as
  * `graft_ngrams` vs its declarative twin.
  *
  * Standard error ≈ 1.04/√m ≈ 6.5% at m = 256; register state is ≤ m
  * rows per group regardless of corpus size, so the shuffle after the
  * map-side partial MAX is bounded at m rows per (partition, group).
  */
object DetSketch {

  import TextExpr.{nibbleSpark, nibbleDuck, hexIntDuck}

  /** Register count (power of 16² so two nibbles index it bias-free). */
  val M = 256
  /** Width of the rank field; rank ∈ 1..41. */
  val RankBits = 40
  private val Scale: Long = 1L << (RankBits + 1) // 2^41 fixed point

  private val alpha = 0.7213 / (1 + 1.079 / M)
  /** floor(α · m² · 2^41) — the harmonic-mean numerator constant. */
  val Num: Long = (alpha * M * M * Scale.toDouble).toLong
  /** Linear-counting switchover: raw estimate ≤ 2.5·m. */
  private val LcMax: Long = 5L * M / 2
  /** lc(V) = round(m · ln(m/V)) for V = 1..M empty registers —
    * evaluated HERE (Scala, compile-time) and embedded as literals so
    * neither engine computes a float. */
  private val lcTable: IndexedSeq[Long] =
    (1 to M).map(v => math.round(M * math.log(M.toDouble / v)))

  /** Seeded value hash (hex string) in each dialect. */
  def hSpark(v: String): String = s"md5(concat('d:', CAST($v AS STRING)))"
  def hDuck(v: String): String = s"md5('d:' || CAST($v AS VARCHAR))"

  /** Register index 0..255 from the first two nibbles of hex col `h`. */
  def bucketSpark(h: String): String =
    s"(${nibbleSpark(h, 0)} * 16 + ${nibbleSpark(h, 1)})"
  def bucketDuck(h: String): String =
    s"(${nibbleDuck(h, 0)} * 16 + ${nibbleDuck(h, 1)})"

  /** 40-bit rank field: nibbles 3..12 of `h` as a BIGINT. */
  def wSpark(h: String): String =
    s"CAST(conv(substr($h, 3, 10), 16, 10) AS BIGINT)"
  def wDuck(h: String): String = hexIntDuck(s"substr($h, 3, 10)", 10)

  /** rank = leading zeros of the 40-bit field `w` + 1 ∈ 1..41. A CASE
    * cascade of integer compares — renders identically in both
    * dialects and stays inside whole-stage codegen. */
  def rankCase(w: String): String = {
    val arms = (1 to RankBits)
      .map(k => s"WHEN $w >= ${1L << (RankBits - k)} THEN $k")
      .mkString(" ")
    s"(CASE $arms ELSE ${RankBits + 1} END)"
  }

  /** Aggregate estimate over register rows (col `rv` = max rank per
    * bucket, ≤ M rows in scope). Only the shift / integer-division /
    * array-index spellings differ per dialect. */
  def estimateSpark: String = estimate(
    shl = e => s"shiftleft(CAST(1 AS BIGINT), $e)",
    idiv = (a, b) => s"($a DIV $b)",
    at = (arr, i) =>
      s"element_at(array(${arr.mkString(", ")}), CAST($i AS INT))")

  def estimateDuck: String = estimate(
    shl = e => s"(CAST(1 AS BIGINT) << ($e))",
    idiv = (a, b) => s"CAST(($a) // ($b) AS BIGINT)",
    at = (arr, i) => s"([${arr.mkString(", ")}])[CAST($i AS INT)]")

  private def estimate(shl: String => String,
      idiv: (String, String) => String,
      at: (Seq[String], String) => String): String = {
    // empty registers contribute 2^41 each (rank 0) to the fixed-point Z
    val z = s"(sum(${shl(s"${RankBits + 1} - rv")})" +
      s" + (${M} - count(1)) * ${Scale})"
    val raw = idiv(Num.toString, z)
    val v = s"(${M} - count(1))"
    val lc = at(lcTable.map(_.toString), v)
    s"(CASE WHEN $v > 0 AND $raw <= ${LcMax} THEN CAST($lc AS BIGINT)" +
      s" ELSE $raw END)"
  }
}
