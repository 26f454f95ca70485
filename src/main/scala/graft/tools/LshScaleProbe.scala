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
  * THE PINNED PROTOCOL (VERDICT r15 #1): recall estimates are only
  * comparable round-over-round if the query sample is the same rule at
  * the same size — r14 probed sf10 with 500 sampled queries and r15
  * with 2000, and the resulting 0.800 vs 0.6995 read as a regression
  * when it was a protocol change (~7σ apart under a binomial model:
  * different sample SETS, not noise). The pinned rule fixes the TARGET
  * query count (2000) and derives the stride from the corpus —
  * stride = max(1, n / 2000), sample = pmod(vec_id, stride) == 0 — so
  * every probe of a given corpus draws the identical query set and
  * probes of different corpora draw equally-sized ones. Every output
  * line carries the protocol fields (protocol/target_queries/stride/
  * sample_rule); certify.sh gates on lines whose protocol is pinned-v1
  * and refuses to compare anything else.
  *
  * Usage:
  *   tools/run.sh graft.tools.LshScaleProbe <sfDir> [k] [stride|pinned] \
  *     [configs: nBits/bandBits,nBits/bandBits,...]
  * e.g.
  *   SPARK_DRIVER_MEM=64g tools/run.sh graft.tools.LshScaleProbe \
  *     /tmp/sf10 3 pinned 16/4,32/8,48/12
  * An explicit integer stride is still accepted for ad-hoc exploration;
  * such runs are tagged protocol "adhoc-stride-N" and never gate.
  */
object LshScaleProbe {
  /** The pinned sample size: one recall estimate = 2000 query points
    * (the r15 sf10 configuration, adopted as THE protocol). */
  val PinnedTargetQueries = 2000L

  /** The pinned sample rule, derived from the corpus size only. */
  def pinnedStride(n: Long): Int =
    math.max(1L, n / PinnedTargetQueries).toInt

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: LshScaleProbe <sfDir> [k] [stride|pinned] [configs]")
    val sfDir = args(0)
    val k = if (args.length > 1) args(1).toInt else 3
    val strideArg = if (args.length > 2) args(2) else "pinned"

    val spark = graft.Graft.session(appName = "graft-lsh-scale-probe")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = emb.count()
    val (stride, protocol) =
      if (strideArg.equalsIgnoreCase("pinned"))
        (pinnedStride(n), "pinned-v1")
      else (strideArg.toInt, s"adhoc-stride-$strideArg")
    // "adaptive" = whatever the production DEFAULT resolves for this
    // corpus (bandBits = clamp(ceil(log2(n/cap)), 4, 12), nBits = 4bb)
    // — the config every r14+ banded consumer actually ships.
    // "nb/bb@off" = a SEEDED study config (VERDICT r16 #1): the same
    // banding under hyperplane-index offset `off` (disjoint LCG draws
    // for offsets that are multiples of 64) — tagged "study" so the
    // certify gate (which reads only adaptive/fixed pairs) never
    // mistakes a study line for a production number.
    // "multiprobe" = adaptive banding probed through the Hamming-1
    // multiprobe SELF-join (r17 — the per-query recall lever for
    // regimes where banding is flat); explicit configs compose via
    // suffixes: "+mp" (multiprobe self-join), "+qs" (query-set search
    // of the SAMPLED queries against the corpus index), "+mpq"
    // (query-set + multiprobe — the deployment shape whose candidate
    // volume scales with the query batch, not the corpus; the "+mp"
    // self-join at 36/9 × n=200k spills ~3.1B scored pairs, beyond a
    // single box). The recall estimand is IDENTICAL across modes (the
    // self-join is graded on the sampled qids anyway). New tags
    // ("multiprobe", "fixed-mp", "fixed-mpq", ...) are distinct keys,
    // so the certify gate (adaptive/fixed pairs only) never reads them.
    val configs: Seq[(String, Int, Int, Int, String)] =
      (if (args.length > 3) args(3) else "16/4,adaptive")
        .split(",").toSeq.map(_.trim).map {
          case "adaptive" =>
            val bb = graft.operators.Similarity.adaptiveBandBits(n)
            ("adaptive", 4 * bb, bb, 0, "join")
          case "multiprobe" =>
            val bb = graft.operators.Similarity.adaptiveBandBits(n)
            ("multiprobe", 4 * bb, bb, 0, "join-mp")
          case s =>
            val (raw, mode) =
              if (s.endsWith("+mpq")) (s.dropRight(4), "qs-mp")
              else if (s.endsWith("+qs")) (s.dropRight(3), "qs")
              else if (s.endsWith("+mp")) (s.dropRight(3), "join-mp")
              else (s, "join")
            val (cfg, off) = raw.split("@") match {
              case Array(c) => (c, 0)
              case Array(c, o) => (c, o.trim.toInt)
            }
            val Array(nb, b) = cfg.split("/")
            val tag = (if (off == 0) "fixed" else "study") + (mode match {
              case "join" => ""
              case "join-mp" => "-mp"
              case "qs" => "-qs"
              case "qs-mp" => "-mpq"
            })
            (tag, nb.trim.toInt, b.trim.toInt, off, mode)
        }

    // exact ground truth on the sample — computed ONCE, reused by every
    // config; the cross join is bounded by the (broadcast) sample side
    val queries = emb.filter(pmod(col("vec_id"), lit(stride)) === 0)
    val nQueries = queries.count()
    val truth = graft.operators.Similarity
      .bruteForceTopK(emb, queries, "vec_id", "embedding", k)
      .select(col("qid"), col("vec_id")).cache()
    val truthRows = truth.count() // pairs where a neighbor exists at all

    for ((tag, nBits, bandBits, hpOff, mode) <- configs) {
      val t0 = System.nanoTime()
      val knn = (mode match {
        case "join" =>
          graft.operators.Similarity.lshKnnJoinSeeded(
            emb, "vec_id", "embedding", k, nBits, bandBits,
            hpOffset = hpOff)
        case "join-mp" =>
          graft.operators.Similarity.lshKnnJoinMultiprobeSeeded(
            emb, "vec_id", "embedding", k, nBits, bandBits,
            hpOffset = hpOff)
        case qs =>
          graft.operators.Similarity.lshKnnSearchSeeded(
            emb, queries, "vec_id", "embedding", k, nBits, bandBits,
            multiprobe = qs == "qs-mp", hpOffset = hpOff)
      }).cache()
      val outRows = knn.count() // materializes the full join once
      val secs = (System.nanoTime() - t0) / 1e9
      val hits = truth.join(
        knn.filter(pmod(col("qid"), lit(stride)) === 0)
          .select(col("qid"), col("vec_id")),
        Seq("qid", "vec_id")).count()
      knn.unpersist()
      val recall = if (truthRows == 0) 1.0 else hits.toDouble / truthRows
      println(s"""{"probe":"lsh_scale","sf":"$sfDir","n":$n,"tag":"$tag",""" +
        s""""mode":"$mode","multiprobe":${mode.endsWith("-mp")},""" +
        s""""nBits":$nBits,"bandBits":$bandBits,"k":$k,"hp_offset":$hpOff,""" +
        s""""protocol":"$protocol","target_queries":$PinnedTargetQueries,""" +
        s""""stride":$stride,"sample_rule":"pmod(vec_id,stride)==0",""" +
        s""""queries_sampled":$nQueries,"truth_pairs":$truthRows,""" +
        s""""hits":$hits,"recall_at_k":$recall,""" +
        s""""knn_rows":$outRows,"secs":${(secs * 1000).round / 1000.0}}""")
    }
    spark.stop()
  }
}
