package graft.tools

import org.apache.spark.sql.functions._

/** Synthetic MARGINAL-COSINE embedding corpus for the recall
  * corpus-generality leg (VERDICT r16 #3).
  *
  * The ScaleUp corpora the recall probes have measured so far inherit
  * their neighbor structure from near-duplicate jitter: a truth
  * neighbor agrees with its query on almost every hyperplane, so a
  * very fine banding (the 12-bit clamp ceiling) keeps finding it —
  * which is exactly the regime where the r16 lever probes saw 48/12
  * dominate the adaptive banding on both recall and time. A NATURAL
  * retrieval corpus's neighbors sit at marginal cosine (~0.7–0.8),
  * where the per-hyperplane agreement probability is only
  * 1 − θ/π ≈ 0.77 and a 12-bit band match costs 0.77¹² ≈ 0.04 — so
  * the 48/12 ordering may invert. This generator builds that regime
  * deterministically so LshScaleProbe (pinned-v1) can measure it.
  *
  * Construction (pure integer-hash arithmetic — no RNG state, so any
  * run of any JVM regenerates the identical corpus):
  *   - even vec_id i: pseudo-gaussian base vector, each coordinate an
  *     Irwin–Hall(4) sum of per-(i,d) LCG uniforms;
  *   - odd vec_id i: c·v(i−1) + sqrt(1−c²)·r(i) with a fresh pseudo-
  *     gaussian r and a per-pair target cosine c drawn uniformly from
  *     [0.70, 0.80] — in dim 64 the realized pair cosine concentrates
  *     around c (random vectors are near-orthogonal), so every odd id
  *     has one planted neighbor at marginal cosine and its remaining
  *     brute-force top-k truth comes from the random background
  *     (max background cosine across 20k rows ≈ 0.5).
  * Schema matches the testdata embeddings table exactly
  * (vec_id bigint, embedding array<float>, label int — label = pair
  * id) so every probe and operator runs unchanged.
  *
  * Usage: tools/run.sh graft.tools.MarginalCorpus <outDir> [n] [dim]
  */
object MarginalCorpus {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: MarginalCorpus <outDir> [n] [dim]")
    val outDir = args(0)
    val n = if (args.length > 1) args(1).toLong else 20000L
    val dim = if (args.length > 2) args(2).toInt else 64

    val spark = graft.Graft.session(appName = "graft-marginal-corpus")

    // u(seed) in [0,1): splitmix-style integer mix, spelled in Spark SQL
    def u(seedExpr: String): String =
      s"""(CAST(pmod(hash($seedExpr, 1618033988), 100000) AS DOUBLE)
         | / 100000.0)""".stripMargin.replaceAll("\n", " ")
    // Irwin-Hall(4) centered: approx N(0, 1/3) — shape is irrelevant,
    // symmetry + determinism are what matter
    def gauss(tagged: String): String =
      (1 to 4).map(t => u(s"$tagged * 7 + $t")).mkString("(", " + ", ") - 2.0")

    // base(i, d): the pseudo-gaussian coordinate used by even rows and
    // by odd rows' partner reference; fresh(i, d): an independent draw
    // for the odd row's orthogonal component
    val base = gauss("(base_id * 131 + d)")
    val fresh = gauss("(id * 131 + d + 47)")

    val df = spark.range(n).toDF("id")
      .withColumn("base_id", expr("id - pmod(id, 2)")) // even anchor of the pair
      .withColumn("c", expr(
        "0.70 + 0.10 * (CAST(pmod(hash(base_id, 271828182), 1000) AS DOUBLE) / 1000.0)"))
      .withColumn("embedding", expr(
        s"""transform(sequence(1, $dim), d ->
           |  CAST(CASE WHEN pmod(id, 2) = 0 THEN $base
           |       ELSE c * ($base) + sqrt(1.0 - c * c) * ($fresh)
           |  END AS FLOAT))""".stripMargin))
      .select(col("id").as("vec_id"),
        col("embedding"),
        col("base_id").cast("int").as("label"))

    df.repartition(8).write.mode("overwrite")
      .parquet(s"$outDir/embeddings.parquet")
    println(s"""{"tool":"marginal_corpus","out":"$outDir","n":$n,"dim":$dim}""")
    try spark.stop() catch { case e: Throwable =>
      System.err.println(s"[marginal-corpus] spark.stop() failed: $e")
    }
  }
}
