package graft.tools

import org.apache.spark.sql.functions._

/** Scale instrument for the MINHASH text-dedup family — the text twin
  * of [[LshScaleProbe]] (VERDICT r13 directive 3: text minhash recall
  * at sf10 had no number). At a given corpus, for each (k, rows)
  * banding, measure the one-shot pair pipeline's wall time, its pair
  * volume, and its recall against EXACT ground truth — one JSON line
  * per config.
  *
  * Ground truth: [[graft.operators.Dedup.prefixJaccardPairs]] (the
  * exact-RECALL prefix-filter join, threshold 1/2) over a
  * deterministic md5 doc sample — the q154/gen_sf1_overrides sampling
  * precedent. Exact-Jaccard pairs are pairwise-decomposable, so
  * truth(S × S) computed ON the sample equals the full corpus's truth
  * restricted to the sample, for any fixed sample S. The MEASURED side
  * is NOT sampled: minhashPairs runs over the FULL corpus per config —
  * bucket fill, BucketCap truncation and candidate volume are
  * corpus-wide effects, exactly what this probe exists to see — and
  * recall counts how many truth pairs with BOTH endpoints in S the
  * full run recovered.
  *
  * Expected shape of the numbers: minhash recall AT the 0.5 threshold
  * is probabilistic even uncapped — 1 − (1 − j^r)^b, which every
  * adaptive tier holds at the same S-curve midpoint (0.5) by
  * construction — so configs are compared to EACH OTHER at the same
  * corpus, and across corpora to the same config: the scale signal is
  * the default's recall FALLING between decades while the adaptive
  * tier holds its line.
  *
  * Usage:
  *   tools/run.sh graft.tools.TextScaleProbe <sfDir> [sampleNibbles] \
  *     [configs: k/rows,k/rows,... | "adaptive"]
  * e.g.
  *   SPARK_DRIVER_MEM=64g tools/run.sh graft.tools.TextScaleProbe \
  *     /tmp/sf10 1 8/2,24/3,adaptive
  */
object TextScaleProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: TextScaleProbe <sfDir> [sampleNibbles] [configs]")
    val sfDir = args(0)
    val nibbles = if (args.length > 1) args(1).toInt else 1
    val spark = graft.Graft.session(appName = "graft-text-scale-probe")
    graft.functions.TextNative.register(spark)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val n = docs.count()
    val configs: Seq[(String, Int, Int)] =
      (if (args.length > 2) args(2) else "8/2,adaptive")
        .split(",").toSeq.map(_.trim).map {
          case "adaptive" =>
            val (k, r) = graft.operators.Dedup.adaptiveMinhashParams(n)
            ("adaptive", k, r)
          case s =>
            val Array(k, r) = s.split("/"); ("fixed", k.trim.toInt, r.trim.toInt)
        }

    // deterministic md5 sample (id-structure-free), truth computed ONCE
    val sample = graft.operators.Sampling.hashSample(docs, "doc_id", nibbles)
    val nSample = sample.count()
    val truth = graft.operators.Dedup
      .prefixJaccardPairs(sample, "doc_id", "text", tNum = 1, tDen = 2)
      .select(col("ida"), col("idb")).cache()
    val truthRows = truth.count()
    val sampleIds = sample.select(col("doc_id")).cache()
    sampleIds.count()

    for ((tag, k, rows) <- configs) {
      val t0 = System.nanoTime()
      val pairs = graft.operators.Dedup
        .minhashPairs(docs, "doc_id", "text", k = k, rows = rows,
          threshold = 0.5)
        .cache()
      val outRows = pairs.count() // materializes the full corpus run
      val secs = (System.nanoTime() - t0) / 1e9
      // truth pairs the FULL run recovered, restricted to S x S
      val hits = truth.join(
        pairs.join(sampleIds.withColumnRenamed("doc_id", "ida"), "ida")
          .join(sampleIds.withColumnRenamed("doc_id", "idb"), "idb")
          .select("ida", "idb"),
        Seq("ida", "idb")).count()
      pairs.unpersist()
      val recall = if (truthRows == 0) 1.0 else hits.toDouble / truthRows
      // protocol fields (VERDICT r15 #1, the text twin): the md5-nibble
      // sample rule + width ride every line so round-over-round recall
      // numbers are comparable only when the protocol matches
      println(s"""{"probe":"text_scale","sf":"$sfDir","n":$n,""" +
        s""""tag":"$tag","k":$k,"rows":$rows,""" +
        s""""protocol":"md5-nibbles-$nibbles",""" +
        s""""sample_rule":"hashSample(doc_id,$nibbles)",""" +
        s""""sample_docs":$nSample,"truth_pairs":$truthRows,""" +
        s""""hits":$hits,"recall":$recall,""" +
        s""""pair_rows":$outRows,"secs":${(secs * 1000).round / 1000.0}}""")
    }
    spark.stop()
  }
}
