package graft.operators

import org.apache.spark.sql.DataFrame

/** Session-scoped memo for the ONE eager `count()` that adaptive
  * parameter resolution runs at plan-build time (Similarity's banding,
  * Dedup's minhash tiers, SemDeDup's cluster count). Each call used to
  * pay a fresh count job — metadata-only for parquet, but at 100 TB a
  * full footer/metadata scan per OPERATOR CALL over the same corpus is
  * a real cost multiplier (VERDICT r14 #3). The memo collapses that to
  * one count per corpus snapshot per session.
  *
  * Cache key = (session identity, plan semantic hash, input-file list
  * hash). The file-list component is what makes a same-path OVERWRITE
  * a cache miss: every supported writer (Spark parquet overwrite,
  * [[graft.sources.Tables.writeTable]]) emits fresh part-file names,
  * so the `inputFiles` set changes whenever the data does. The one
  * mutation this cannot see — bytes rewritten IN PLACE inside an
  * existing part file — is not a write path any Spark sink produces.
  * Both reads (semantic hash, file listing) are driver-side only: the
  * file index was already materialized when the plan was analyzed, so
  * no job runs on a cache hit OR for the key itself. */
private[graft] object AdaptiveCount {

  // value boxed explicitly: a scala.Long-valued CHM would unbox a
  // missing key's null to 0L and silently cache-hit every lookup
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), java.lang.Long]()

  /** Count jobs actually run (cache misses) — spec-pinned so the
    * one-count-per-corpus-per-session contract can't silently rot. */
  private[graft] val misses = new java.util.concurrent.atomic.AtomicLong(0)

  /** Backstop against unbounded growth in a session that churns
    * thousands of distinct corpora: the memo is an optimization, so
    * wholesale invalidation is always safe. */
  private val MaxEntries = 1024

  private[graft] def of(df: DataFrame): Long = {
    val key = (System.identityHashCode(df.sparkSession),
      df.semanticHash(), java.util.Arrays.hashCode(
        df.inputFiles.asInstanceOf[Array[AnyRef]]))
    val cached = cache.get(key)
    if (cached != null) return cached.longValue()
    val n = { misses.incrementAndGet(); df.count() }
    if (cache.size() >= MaxEntries) cache.clear()
    cache.put(key, java.lang.Long.valueOf(n))
    n
  }
}
