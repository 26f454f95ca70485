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
  * planned at least one split per core — round-robin repartition to
  * `defaultParallelism`. The rule is self-limiting by construction:
  *  - small input (the broken regime): the added exchange moves fewer
  *    bytes than one scan split per core — negligible next to the
  *    per-row compute it parallelizes;
  *  - large input (true 100 TB width): the estimate exceeds the bound,
  *    nothing is repartitioned, no new shuffle of a huge corpus ever
  *    appears at scale.
  * The size check is a driver-side read of Catalyst statistics — no
  * job runs. Round-robin repartition is row-preserving and (per
  * partition index-seeded distribution) run-to-run deterministic; every
  * operator above it is partitioning-independent by spec
  * (OperatorSpec's "repartition-invariant" cases), so results are
  * bit-identical with or without the widen. */
object Par {

  private[graft] def widen(df: DataFrame): DataFrame = {
    if (df.isStreaming) return df // micro-batch frames arrive pre-split
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    val maxPart = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      spark.conf.get("spark.sql.files.maxPartitionBytes", "128MB"))
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (est < BigInt(maxPart) * target) df.repartition(target) else df
  }
}
