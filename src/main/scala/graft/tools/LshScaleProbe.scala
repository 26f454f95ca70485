package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale instrument for the banded-LSH family (VERDICT r12 directive 1's
  * follow-through): at a given corpus, measure — for each (nBits,
  * bandBits) banding — the k-NN join's wall time, its candidate volume,
  * and its recall@k against exact brute-force ground truth on a
  * deterministic query sample. One JSON line per config.
  *
  * Why this exists: the production default (nBits=16, bandBits=4) keeps
  * only 4 bands × 16 buckets, so bucket fill grows linearly with the
  * corpus and the BucketCap rule caps candidate volume at
  * `nBands × N × cap` — runtime stays linear (measured at sf10), but
  * past the cap each bucket's ~cap survivors are a shrinking FRACTION
  * of the bucket, so recall decays. The 100 TB remedy is not a bigger
  * cap (that restores the quadratic) but a FINER banding — bandBits ≈
  * log2(N / cap) keeps expected bucket fill near the cap, with nBits =
  * nBands × bandBits hyperplanes re-supplying collision probability.
  * This probe turns that guidance into numbers: recall@k and seconds,
  * side by side, per banding, at any corpus the sandbox holds.
  *
  * Ground truth: [[graft.operators.Similarity.bruteForceTopK]] over a
  * `pmod(vec_id, stride) = 0` query sample (deterministic, corpus-size
  * independent per-query cost). Recall@k counts a truth neighbor as hit
  * when the banded join ranks it anywhere in ITS top-k for the same
  * query (standard ANN recall@k).
  *
  * Usage:
  *   tools/run.sh graft.tools.LshScaleProbe <sfDir> [k] [sampleStride] \
  *     [configs: nBits/bandBits,nBits/bandBits,...]
  * e.g.
  *   SPARK_DRIVER_MEM=64g tools/run.sh graft.tools.LshScaleProbe \
  *     /tmp/sf10 3 400 16/4,32/8,48/12
  */
object LshScaleProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: LshScaleProbe <sfDir> [k] [stride] [configs]")
    val sfDir = args(0)
    val k = if (args.length > 1) args(1).toInt else 3
    val stride = if (args.length > 2) args(2).toInt else 100

    val spark = graft.Graft.session(appName = "graft-lsh-scale-probe")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = emb.count()
    // "adaptive" = whatever the production DEFAULT resolves for this
    // corpus (bandBits = clamp(ceil(log2(n/cap)), 4, 12), nBits = 4bb)
    // — the config every r14+ banded consumer actually ships
    val configs: Seq[(String, Int, Int)] =
      (if (args.length > 3) args(3) else "16/4,adaptive")
        .split(",").toSeq.map(_.trim).map {
          case "adaptive" =>
            val bb = graft.operators.Similarity.adaptiveBandBits(n)
            ("adaptive", 4 * bb, bb)
          case s =>
            val Array(nb, b) = s.split("/")
            ("fixed", nb.trim.toInt, b.trim.toInt)
        }

    // exact ground truth on the sample — computed ONCE, reused by every
    // config; the cross join is bounded by the (broadcast) sample side
    val queries = emb.filter(pmod(col("vec_id"), lit(stride)) === 0)
    val nQueries = queries.count()
    val truth = graft.operators.Similarity
      .bruteForceTopK(emb, queries, "vec_id", "embedding", k)
      .select(col("qid"), col("vec_id")).cache()
    val truthRows = truth.count() // pairs where a neighbor exists at all

    for ((tag, nBits, bandBits) <- configs) {
      val t0 = System.nanoTime()
      val knn = graft.operators.Similarity
        .lshKnnJoin(emb, "vec_id", "embedding", k, nBits, bandBits)
        .cache()
      val outRows = knn.count() // materializes the full join once
      val secs = (System.nanoTime() - t0) / 1e9
      val hits = truth.join(
        knn.filter(pmod(col("qid"), lit(stride)) === 0)
          .select(col("qid"), col("vec_id")),
        Seq("qid", "vec_id")).count()
      knn.unpersist()
      val recall = if (truthRows == 0) 1.0 else hits.toDouble / truthRows
      println(s"""{"probe":"lsh_scale","sf":"$sfDir","n":$n,"tag":"$tag",""" +
        s""""nBits":$nBits,"bandBits":$bandBits,"k":$k,""" +
        s""""queries_sampled":$nQueries,"truth_pairs":$truthRows,""" +
        s""""hits":$hits,"recall_at_k":$recall,""" +
        s""""knn_rows":$outRows,"secs":${(secs * 1000).round / 1000.0}}""")
    }
    spark.stop()
  }
}
