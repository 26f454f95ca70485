package graft.tools

import graft.Graft
import graft.operators.Similarity

/** Dump the q302/q303 operator outputs under an EXPLICIT banding — the
  * small-scale validation leg of the adaptive-banding adjudication
  * (VERDICT r14 #1 / tools/gen_adaptive_overrides.py).
  *
  * The override generator rewrites the adjudicated 16/4 pinned oracles
  * to a non-clamp banding by string surgery; before trusting that
  * surgery at sf1/sf10 (where only the adaptive default produces the
  * banding), this dumps the engine's explicit (nBits, bandBits) run at
  * a CHEAP scale so tools/check.py can gate surgery-oracle vs engine
  * where both sides are fast and independent of the adaptive count:
  *
  *   tools/run.sh graft.tools.BandedDump /root/testdata/sf0.1 /tmp/bd 24 6
  *   (echo '{}' > /tmp/bd/oracle_sql.json)
  *   GRAFT_CHECK_ONLY=q302_ann_adaptive,q303_hard_negatives_adaptive \
  *     python3 tools/check.py /root/testdata/sf0.1 /tmp/bd <overrides>
  */
object BandedDump {
  def main(args: Array[String]): Unit = {
    val usage = "usage: BandedDump <sfDir> <outDir> <nBits> <bandBits> | " +
      "BandedDump <sfDir> <outDir> text <k> <rows>"
    // the text branch reads args(4): a 4-arg text invocation must die
    // with the usage line, not an ArrayIndexOutOfBounds (ADVICE r15)
    require(args.length >= 4, usage)
    require(args(2) != "text" || args.length >= 5, usage)
    val (sfDir, outDir) = (args(0), args(1))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Graft.session(master = s"local[$cpus]",
      appName = "graft-banded-dump", shufflePartitions = cpus.toInt)
    if (args(2) == "text") {
      // text twin: q39 under an explicit (k, rows) minhash banding —
      // validates gen_text_adaptive_override.py's surgery cheaply
      val (k, rows) = (args(3).toInt, args(4).toInt)
      val d = graft.sources.Tables.read(spark, sfDir, "documents")
      graft.operators.Dedup.minhashPairs(d, "doc_id", "text",
          k = k, rows = rows, threshold = 0.5)
        .write.mode("overwrite").parquet(s"$outDir/q39_minhash_pairs")
      println(s"dumped q39 at ($k, $rows) from $sfDir to $outDir")
    } else {
      val (nBits, bandBits) = (args(2).toInt, args(3).toInt)
      val e = graft.sources.Tables.read(spark, sfDir, "embeddings")
      Similarity.lshKnnJoin(e, "vec_id", "embedding", k = 3,
          nBits = nBits, bandBits = bandBits)
        .write.mode("overwrite").parquet(s"$outDir/q302_ann_adaptive")
      Similarity.hardNegatives(e, "vec_id", "embedding", "label", k = 3,
          nBits = nBits, bandBits = bandBits)
        .write.mode("overwrite")
        .parquet(s"$outDir/q303_hard_negatives_adaptive")
      println(s"dumped q302/q303 at $nBits/$bandBits from $sfDir to $outDir")
    }
    spark.stop()
  }
}
