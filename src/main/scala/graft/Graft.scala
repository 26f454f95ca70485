package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * The reference (UIUC-PPL/charmpandas) tunes parallelism with an
  * overdecomposition factor (`charmpandas/interface.py:156` odf=4 chares/PE,
  * `src/partition.cpp:856` redist_odf=8 shuffle buckets/PE) and balances
  * shuffle skew with a global histogram + greedy bucket assignment
  * (`src/partition.cpp:1444-1482`). On Spark the same roles are played by
  * `spark.sql.shuffle.partitions` and AQE (coalescing + skew-join splitting),
  * so we turn AQE on everywhere and size shuffle partitions to the core
  * count rather than the 200 default.
  */
object Graft {

  /** Default local core count; the driver overrides via SPARK_GRAFT_CPUS. */
  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  /** Session conf key selecting the `approximate_median` agg spelling:
    * unset/"exact" → Spark's exact `median` (deterministic, at least
    * as accurate as the reference's t-digest — the gated default);
    * "approx" → `percentile_approx(c, 0.5)` (bounded-memory GK
    * sketch — the 100 TB path, where an exact per-group median's sort
    * is the costlier choice). Runtime-settable:
    * `spark.conf.set(Graft.ApproxMedianConf, "approx")`. */
  val ApproxMedianConf = "spark.graft.approximateMedian"

  /** Elasticity preset — the Spark spelling of the reference's
    * malleability/rescale surface (src/server.hpp:26-49 handles
    * shrink/expand requests; charmpandas/interface.py:415-540 drives
    * them). On Spark the cluster manager resizes instead of the
    * runtime: dynamic allocation grows/shrinks the executor set with
    * load, and decommissioning migrates shuffle/RDD blocks off
    * executors being reclaimed, so a "rescale" is a config, not an API
    * call. local[N] cannot demo this — pass the map to `session(extra =
    * Graft.elasticity)` on a real cluster manager (YARN/K8s). */
  val elasticity: Map[String, String] = Map(
    "spark.dynamicAllocation.enabled" -> "true",
    "spark.dynamicAllocation.minExecutors" -> "1",
    "spark.dynamicAllocation.maxExecutors" -> "1000",
    "spark.dynamicAllocation.executorAllocationRatio" -> "0.5",
    // shuffle tracking instead of an external shuffle service: lets
    // executors retire once their shuffle data is consumed or migrated
    "spark.dynamicAllocation.shuffleTracking.enabled" -> "true",
    "spark.decommission.enabled" -> "true",
    "spark.storage.decommission.shuffleBlocks.enabled" -> "true",
    "spark.storage.decommission.rddBlocks.enabled" -> "true",
    // iterative operators (Dedup.dupClusters, kmeansCentroids) write
    // reliable checkpoints when a checkpoint dir is set (see
    // [[elasticityWith]], which sets one) — GC-driven checkpoint file
    // cleanup keeps a long-lived session from leaking ~maxIter
    // snapshots per call
    "spark.cleaner.referenceTracking.cleanCheckpoints" -> "true")

  /** [[elasticity]] plus a RELIABLE checkpoint dir (HDFS/S3 path on a
    * real cluster). Without it, iterative operators fall back to
    * localCheckpoint, whose blocks die with a decommissioned executor —
    * the exact failure mode elasticity invites — so pass this variant
    * whenever dynamic allocation is on. */
  def elasticityWith(checkpointDir: String): Map[String, String] =
    elasticity + ("spark.checkpoint.dir" -> checkpointDir)

  /** At-scale streaming state preset. The default HDFS-backed state
    * store keeps every key's state in executor HEAP — at 100 TB-scale
    * session/dedup state (hundreds of millions of live keys) that is an
    * OOM. RocksDB spills state to local disk with bounded memory, and
    * changelog checkpointing uploads per-batch deltas instead of full
    * snapshots. Pass to `session(extra = Graft.streamingState)` (merge
    * with [[elasticity]] on a real cluster). */
  val streamingState: Map[String, String] = Map(
    "spark.sql.streaming.stateStore.providerClass" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" ->
      "true")

  /** Per-JVM managed-table warehouse. Concurrent graft processes (the
    * r12 closing sweep ran Verify beside the full test suite) otherwise
    * share `./spark-warehouse` and rewrite each other's persisted index
    * tables — the one red row of the r12 sweep was exactly that
    * collision. Each JVM gets its own tree (pid + random suffix, so a
    * recycled pid can't collide with a leftover), deleted on exit;
    * override with SPARK_GRAFT_WAREHOUSE or an explicit
    * extra("spark.sql.warehouse.dir") when cross-process sharing is
    * actually wanted. */
  private lazy val defaultWarehouse: String = {
    val dir = java.nio.file.Files.createTempDirectory(
      s"graft-wh-${ProcessHandle.current().pid()}-").toFile
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(); ()
      }
      rm(dir)
    }))
    dir.getAbsolutePath
  }

  def session(
      master: String = s"local[$cpus]",
      appName: String = "graft",
      shufflePartitions: Int = cpus.toInt,
      extra: Map[String, String] = Map.empty
  ): SparkSession = {
    val warehouse = extra.getOrElse("spark.sql.warehouse.dir",
      sys.env.getOrElse("SPARK_GRAFT_WAREHOUSE", defaultWarehouse))
    val spark = SparkSession
      .builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.warehouse.dir", warehouse)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // Shuffle width note (measured on the 20M-row string-join pipeline):
      // static width 4x cores + shuffled-hash join ran 2.5x faster than
      // cores-wide sort-merge (53s -> 21s), but the same width costs ~2x
      // at 2M rows, and AQE's initialPartitionNum route performed worse
      // than either static setting (76s) — so the default stays
      // cores-wide and callers size `shufflePartitions` to the data
      // (SPARK_GRAFT_SHUFFLE in Bench), exactly as a cluster operator
      // sizes spark.sql.shuffle.partitions to the input.
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // ObjectHashAggregate (collect_set/collect_list family — the LSH
      // rank tail, shingle-set assembly, PQ codebook collects) falls
      // back to SORT-BASED aggregation after 128 distinct groups per
      // task by default — tuned for unbounded per-group state, which
      // this engine never has: every collecting aggregate here is
      // bounded by construction (BucketCap'd candidate sets ≤ ~15 KB,
      // per-doc shingle sets, m·k-row codebooks). The sort fallback
      // re-serializes the whole pre-agg stream through spill files;
      // measured at sf1/32 cores the q302 rank-tail final aggregate
      // burned 162 s of task time sort-based vs 27.5 s hash-based
      // (r18, tools/receipts/r18/). 32768 keeps hash mode while worst
      // case map memory stays ~0.5 GB/task at the capped set sizes;
      // beyond it the sort fallback still engages (the safe behavior
      // for genuinely huge per-task group counts at 100 TB).
      .config("spark.sql.execution.objectHashAggregate.sortBased.fallbackThreshold",
        "32768")
      // Prefer shuffled-hash over sort-merge when the per-partition build
      // side fits (it does, given 4x overdecomposition): avoids sorting
      // both sides of large string-keyed joins — measured 2.5x on the
      // 20M-row baseline pipeline. Skew remains AQE's job.
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Parquet TIMESTAMP(NANOS) (events.ts) is otherwise an illegal type
      // for Spark's reader; read it as long ns-since-epoch and let
      // sources.Tables normalize to us TimestampType (SURVEY.md §7.3's
      // ns→us truncation rule).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Parquet timestamp[us] without a zone annotation would otherwise
      // infer as TIMESTAMP_NTZ; pin plain-TimestampType inference so every
      // corpus vintage lands the ONE canonical ts type (session zone is
      // UTC above, so NTZ wall-clock values are preserved bit-for-bit —
      // sources.Tables.canonicalTs covers sessions lacking this config).
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      // Bucketed scans report their sortBy ordering (safe: only applies
      // when a bucket is ONE file, which sources.Tables.writeBucketed
      // guarantees by pre-repartitioning on the bucket key) — merge
      // joins over co-bucketed tables then skip the per-partition Sort
      // as well as the Exchange. Off by default only because historical
      // multi-file buckets broke the assumption.
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config(extra)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // getOrCreate silently ignores every config above if a session already
    // exists; the ns-timestamp reader and the UTC-pinned oracle queries
    // both depend on them, so surface the mismatch instead of diverging
    // quietly.
    if (spark.conf.get("spark.sql.session.timeZone", "") != "UTC" ||
        spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true" ||
        spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled",
          "true") != "false")
      System.err.println("[graft] WARNING: existing SparkSession lacks " +
        "graft's required configs (spark.sql.session.timeZone=UTC, " +
        "spark.sql.legacy.parquet.nanosAsLong=true, " +
        "spark.sql.parquet.inferTimestampNTZ.enabled=false) — events " +
        "reads and datetime results may misbehave. Create the session " +
        "via Graft.session first.")
    spark
  }
}
