package graft.operators

import org.apache.spark.sql.DataFrame

/** Parallelism repair for CPU-heavy per-row operators — OPT-IN.
  *
  * Parquet split planning is byte-based: a small-on-disk table (a few MB,
  * one row group) arrives as ONE partition, so compute-bound per-row work
  * (minhash over multi-KB documents, media decoding) can run one-core-wide
  * no matter the cluster size. `spread` round-robins such an input to the
  * scheduler's parallelism before the heavy map.
  *
  * It is deliberately NOT wired into the operators by default: benchmarks
  * on this corpus (5k docs × ~300 chars, sf0.1) showed the extra shuffle
  * + stage overhead costs more than the fan-out wins (q39 3.6s → 4.9s).
  * Reach for it when per-row cost is large relative to row size — e.g.
  * decoding media blobs or minhashing 100 KB documents — and the input
  * arrives in few partitions.
  */
object Par {
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 < target) df.repartition(target) else df
  }
}
