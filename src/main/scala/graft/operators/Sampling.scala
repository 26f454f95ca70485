package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import graft.functions.TextExpr.nibbleSpark

/** Deterministic corpus splitting/sampling by content-stable hash —
  * the train/test machinery a data pipeline needs to be reproducible
  * across runs, engines, and cluster sizes. No `rand()`: a row's
  * assignment is a pure function of its id, so retries, re-partitions
  * and incremental reruns all agree (and a SQL oracle can replay it).
  */
object Sampling {

  /** First md5 nibble (0..15) of the stringified id — the 1/16-granular
    * hash bucket both split and sample key off. */
  private def bucket(idCol: String): Column =
    expr(nibbleSpark(s"md5(CAST($idCol AS STRING))", 0))

  /** Assign "train"/"test" per row: nibbles 0..trainNibbles-1 → train
    * (trainNibbles/16 of the corpus in expectation). */
  def hashSplit(df: DataFrame, idCol: String, trainNibbles: Int = 13)
      : DataFrame = {
    require(trainNibbles > 0 && trainNibbles < 16,
      "trainNibbles must be in 1..15")
    df.withColumn("split",
      when(bucket(idCol) < trainNibbles, "train").otherwise("test"))
  }

  /** Deterministic ~keepNibbles/16 sample: filter, fully pushdown-able
    * (a narrow predicate, no shuffle, no state). */
  def hashSample(df: DataFrame, idCol: String, keepNibbles: Int)
      : DataFrame = {
    require(keepNibbles > 0 && keepNibbles <= 16,
      "keepNibbles must be in 1..16")
    df.filter(bucket(idCol) < keepNibbles)
  }

  /** Deterministic shard id in 0..nShards-1 from the id's first md5
    * byte — the export partitioner for training-data writes: shard is a
    * pure function of the id, so re-runs, engines, and cluster sizes
    * all produce the identical layout, and
    * `df.write.partitionBy("shard")` yields one directory per shard
    * with no shuffle beyond the write itself. nShards ≤ 256 keeps the
    * single hash byte unbiased (256 % nShards == 0 for powers of two;
    * for other counts the residue bias is ≤ 1/256 per shard). */
  def assignShard(df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    require(nShards > 0 && nShards <= 256, "nShards must be in 1..256")
    val h = s"md5(CAST($idCol AS STRING))"
    df.withColumn("shard", expr(
      s"(${nibbleSpark(h, 0)} * 16 + ${nibbleSpark(h, 1)}) % $nShards"))
  }

  /** Deterministic WEIGHTED Bernoulli sample: row kept with probability
    * min(1, weight / wCap), decided by comparing a 16-bit id hash
    * against the scaled weight — `hash16 * wCap < weight * 65536` in
    * pure BIGINT arithmetic, so the draw is exact, engine-portable, and
    * (like every sampler here) a narrow pushdown-able filter with no
    * shuffle or state. The quality-weighted corpus downsample: a long
    * high-quality doc survives at weight/wCap, boilerplate at its
    * (lower) weight — expected sample size = sum(min(w, wCap))/wCap.
    * `weightCol` must be a non-negative integer column. */
  def weightedHashSample(df: DataFrame, idCol: String, weightCol: String,
      wCap: Long): DataFrame = {
    require(wCap > 0, "wCap must be positive")
    val h = s"md5(CAST($idCol AS STRING))"
    val hash16 = (0 until 4).map(k =>
      s"${nibbleSpark(h, k)} * ${1L << (4 * (3 - k))}").mkString("(", " + ", ")")
    df.filter(expr(
      s"CAST($hash16 AS BIGINT) * $wCap < CAST($weightCol AS BIGINT) * 65536"))
  }

  /** Deterministic STRATIFIED sample: a per-stratum keep rate (in
    * sixteenths), defaulting to `defaultNibbles` for unlisted strata —
    * the rebalancing move (downsample the dominant language, keep the
    * rare ones) every corpus-curation pipeline makes. Still a single
    * narrow filter: the stratum column routes the row to its
    * threshold, the id hash decides — no shuffle, no state, no
    * sampleBy seed drift across engines. */
  def stratifiedHashSample(df: DataFrame, idCol: String, stratumCol: String,
      nibblesByStratum: Map[String, Int], defaultNibbles: Int): DataFrame = {
    require((nibblesByStratum.values ++ Seq(defaultNibbles))
      .forall(n => n >= 0 && n <= 16), "keep nibbles must be in 0..16")
    val threshold = nibblesByStratum.foldLeft(lit(defaultNibbles)) {
      case (acc, (s, n)) => when(col(stratumCol) === s, n).otherwise(acc)
    }
    df.filter(bucket(idCol) < threshold)
  }
}
