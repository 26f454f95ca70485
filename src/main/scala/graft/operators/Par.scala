package graft.operators

import org.apache.spark.sql.DataFrame

/** Parallelism repair for compute-dense operator heads.
  *
  * Spark sizes scan splits by BYTES (`spark.sql.files.maxPartitionBytes`
  * against file length, further floored by parquet row-group layout), a
  * good proxy for scan-bound work but wrong by orders of magnitude for
  * operators whose per-row cost dwarfs the scan: minhash/shingle
  * hashing, LSH signatures, embedding quantization. The r13 sf10 sweep
  * measured the failure concretely: a ~60 MB single-row-group
  * documents file plans ONE split, so graft_minhash over 500k docs —
  * and the LSH band explosion downstream of it — ran single-threaded
  * while 31 cores idled (q39 36x, q135 33x for 10x data; linear = 10x).
  *
  * [[widen]] repairs exactly that case and no other: when the input's
  * OPTIMIZED-PLAN size estimate is below `defaultParallelism ×
  * maxPartitionBytes` — i.e. when the scan underneath cannot have
  * planned at least one split per core — AND the plan's actual
  * partition count is below half the core count, round-robin
  * repartition to `defaultParallelism`. The rule is self-limiting by
  * construction:
  *  - small input (the broken regime): the added exchange moves fewer
  *    bytes than one scan split per core — negligible next to the
  *    per-row compute it parallelizes;
  *  - large input (true 100 TB width): the estimate exceeds the bound,
  *    nothing is repartitioned, no new shuffle of a huge corpus ever
  *    appears at scale;
  *  - small-but-already-split input (many files, a mid-plan exchange,
  *    or an explicit repartition upstream): the PARTITION-COUNT gate
  *    skips the exchange — bytes alone would have paid a full
  *    round-robin shuffle for no parallelism gain (ADVICE r13 /
  *    VERDICT r13 directive 6).
  * The size check is a driver-side read of Catalyst statistics and the
  * partition count a driver-side physical-plan read — no job runs.
  * Round-robin repartition is row-preserving and (per partition
  * index-seeded distribution) run-to-run deterministic; every
  * operator above it is partitioning-independent by spec
  * (OperatorSpec's "repartition-invariant" cases), so results are
  * bit-identical with or without the widen. */
object Par {

  /** Session-conf kill switch (`off` disables the repair): the
    * benchmark's A/B lever for attributing suite-total shifts to the
    * widen exchange vs everything else. Results are identical either
    * way — only parallelism changes — so flipping it is always safe. */
  val WidenConfKey = "spark.graft.widen"

  private[graft] def widen(df: DataFrame): DataFrame = {
    if (df.isStreaming) return df // micro-batch frames arrive pre-split
    val spark = df.sparkSession
    if (spark.conf.get(WidenConfKey, "on") == "off") return df
    val target = spark.sparkContext.defaultParallelism
    val maxPart = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      spark.conf.get("spark.sql.files.maxPartitionBytes", "128MB"))
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (est >= BigInt(maxPart) * target) return df
    // the plan may already be adequately split despite its byte size
    // (many small files, an upstream exchange): reading the physical
    // RDD's partition count is driver-side only — the scan's file
    // listing was already done for the stats read above.
    val planned =
      try df.queryExecution.toRdd.getNumPartitions
      catch { case _: Throwable => 0 } // unplannable edge: fall through
    if (planned >= math.max(1, target / 2)) df else df.repartition(target)
  }
}
