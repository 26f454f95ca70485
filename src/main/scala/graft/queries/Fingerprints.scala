package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.Multimodal

/** Rolling-hash document fingerprinting + multimodal frame sampling. */
object Fingerprints {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.read(s, dir, "documents")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Rabin-Karp polynomial fingerprint over raw text + over the
    // normalized token stream (content-defined identity, word-order
    // sensitive — complements the order-free md5 fingerprint of q36)
    // ---- q219: MOSS robust-winnowing overlap pairs ----
    // Shared-substring detection the way plagiarism checkers scale it:
    // winnowed min-hash fingerprints (any shared run of >= w+2 grams
    // is guaranteed a shared fingerprint), a posting-frequency cap on
    // boilerplate mins BEFORE the pair join, overlap in exact ppm of
    // the smaller fingerprint set. See Dedup.winnowingPairs.
    "q219_winnowing_pairs" -> ((s, d) =>
      graft.operators.Dedup.winnowingPairs(docs(s, d), "doc_id", "text")),

    "q55_rolling_fingerprint" -> ((s, d) => {
      graft.functions.TextNative.register(s)
      docs(s, d).select(col("doc_id"),
        expr("graft_rollhash(text)").as("fp_raw"),
        expr("graft_rollhash(array_join(graft_tokens(text), ' '))")
          .as("fp_norm"))
    }),

    // frame-sample boundaries + per-frame digests (expression twin of
    // the Dataset-path stub; ASCII payload ⇒ byte==char slicing)
    "q56_frame_sample" -> ((s, d) =>
      Multimodal.frameColumns(docs(s, d), "doc_id", "text", n = 4)),

    // ---- q207: dataset shard manifest (integrity fingerprints) ----
    // The data-versioning artifact a 100 TB pipeline publishes with
    // every snapshot: per shard, the row count plus ORDER-INDEPENDENT
    // content fingerprints (sum and xor of a 48-bit md5 row digest over
    // the full canonical row). Diffing two runs' manifests pinpoints
    // exactly which shards changed — corruption, partial rewrites, or
    // nondeterministic upstream jobs — without re-reading unchanged
    // data. Plan: pure per-row projection + one map-side-combining agg
    // to shard-count rows; no joins, no windows, scan-speed at any
    // size. 48-bit digests keep the 50-row-shard sum below 2^54 (and a
    // 1000-row production shard below 2^58); collisions cancel only if
    // two DIFFERENT row multisets tie on BOTH sum and xor — vanishing
    // at manifest granularity.
    "q207_shard_manifest" -> ((s, d) => manifest(docs(s, d))),

    // ---- q210: STREAMING shard-manifest maintenance ----
    // q207's manifest maintained from a document stream: history
    // partials seed once, each micro-batch OVERWRITES its own
    // batch_id=<bid> partition of per-shard partials (idempotent under
    // foreachBatch's at-least-once replay — chaos-spec-proven with a
    // kill between write and commit), and the sum/xor merge equals the
    // one-shot manifest no matter how the landed files were chopped
    // into micro-batches (boundary independence spec-proved). Same
    // oracle as q207 — the merge is exact, not approximate.
    "q210_stream_manifest" -> ((s, d) =>
      graft.streaming.EventStreams.manifestStream(s, d)),

    // ---- q296: INCREMENTAL shard-manifest maintenance ----
    // The batch-incremental face between q207 (one-shot) and q210
    // (streaming), closing the manifest row of the lattice table:
    // history partials (doc_id % 4 < 3) land once, the delta appends
    // only ITS per-shard partials, and the query-time merge (SUM of
    // counts and fp sums, XOR of fp xors — both associative) equals
    // the one-shot manifest EXACTLY, so q207's oracle gates this
    // verbatim. Shards span batches (shard = doc_id DIV 50 is
    // independent of the % 4 split), so the merge is genuinely
    // cross-batch, not a concatenation. 100 TB: the delta append
    // scans only itself; state is one partial row per (batch, shard).
    "q296_incr_manifest" -> ((s, d) => {
      val all = docs(s, d).withColumn("b", pmod(col("doc_id"), lit(4)))
      graft.sources.Tables.writeTable(
        manifest(all.filter(col("b") < 3)), "graft_q296_manifest")
      manifest(all.filter(col("b") === 3))
        .write.mode("append").format("parquet")
        .saveAsTable("graft_q296_manifest")
      s.table("graft_q296_manifest")
        .groupBy("shard")
        .agg(sum("n_rows").as("n_rows"), sum("fp_sum").as("fp_sum"),
          expr("bit_xor(fp_xor)").as("fp_xor"))
    })
  )

  /** Shard manifest of a documents frame — extracted so the spec can
    * prove a one-row mutation moves exactly its shard's fingerprints. */
  private[graft] def manifest(df: DataFrame): DataFrame =
    df.select(expr("doc_id DIV 50").as("shard"),
        conv(substring(md5(concat_ws("|",
          col("doc_id").cast("string"), col("text"), col("lang"),
          col("source"), col("n_chars").cast("string"))
          .cast("binary")), 1, 12), 16, 10)
          .cast("long").as("h"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_rows"), sum("h").as("fp_sum"),
        expr("bit_xor(h)").as("fp_xor"))

  private val rollDuck =
    "list_reduce(list_prepend(CAST(0 AS BIGINT), [ascii(c) FOR c IN split(%s, '')]), " +
      "(acc, x) -> (acc * 31 + x) %% 1000000007)"

  val oracles: Map[String, String] = Map(
    "q55_rolling_fingerprint" ->
      s"""WITH toks AS (SELECT doc_id, text,
        |  array_to_string(${graft.functions.TextExpr.toksDuck("text")}, ' ') AS norm
        | FROM documents)
        |SELECT doc_id,
        | ${rollDuck.format("text")} AS fp_raw,
        | ${rollDuck.format("norm")} AS fp_norm
        |FROM toks""".stripMargin,

    "q56_frame_sample" ->
      """WITH f AS (SELECT doc_id, LENGTH(text) AS len, text,
        |   unnest([0, 1, 2, 3]) AS frame_idx FROM documents),
        | s AS (SELECT doc_id, frame_idx,
        |   SUBSTR(text, CAST(FLOOR(frame_idx * len / 4) AS INT) + 1,
        |     CAST(FLOOR((frame_idx + 1) * len / 4) AS INT)
        |       - CAST(FLOOR(frame_idx * len / 4) AS INT)) AS frame
        |  FROM f)
        |SELECT doc_id, frame_idx, LENGTH(frame) AS frame_chars,
        | MD5(frame) AS frame_md5
        |FROM s""".stripMargin,

    "q207_shard_manifest" ->
      s"""WITH r AS (SELECT doc_id // 50 AS shard,
        |   MD5(concat_ws('|', CAST(doc_id AS VARCHAR), text, lang,
        |     source, CAST(n_chars AS VARCHAR))) AS h
        |  FROM documents),
        | v AS (SELECT shard,
        |   ${graft.functions.TextExpr.hexIntDuck("h", 12)} AS h FROM r)
        |SELECT shard, count(*) AS n_rows,
        | CAST(SUM(h) AS BIGINT) AS fp_sum, bit_xor(h) AS fp_xor
        |FROM v GROUP BY 1""".stripMargin,

    // the streamed partial-merge is exact, so the one-shot manifest
    // oracle gates it verbatim
    "q210_stream_manifest" ->
      s"""WITH r AS (SELECT doc_id // 50 AS shard,
        |   MD5(concat_ws('|', CAST(doc_id AS VARCHAR), text, lang,
        |     source, CAST(n_chars AS VARCHAR))) AS h
        |  FROM documents),
        | v AS (SELECT shard,
        |   ${graft.functions.TextExpr.hexIntDuck("h", 12)} AS h FROM r)
        |SELECT shard, count(*) AS n_rows,
        | CAST(SUM(h) AS BIGINT) AS fp_sum, bit_xor(h) AS fp_xor
        |FROM v GROUP BY 1""".stripMargin,

    // incremental == one-shot on the SUM/XOR manifest lattice, so
    // q207's oracle gates the persisted-partials path verbatim
    "q296_incr_manifest" ->
      s"""WITH r AS (SELECT doc_id // 50 AS shard,
        |   MD5(concat_ws('|', CAST(doc_id AS VARCHAR), text, lang,
        |     source, CAST(n_chars AS VARCHAR))) AS h
        |  FROM documents),
        | v AS (SELECT shard,
        |   ${graft.functions.TextExpr.hexIntDuck("h", 12)} AS h FROM r)
        |SELECT shard, count(*) AS n_rows,
        | CAST(SUM(h) AS BIGINT) AS fp_sum, bit_xor(h) AS fp_xor
        |FROM v GROUP BY 1""".stripMargin,

    "q219_winnowing_pairs" -> {
      import graft.functions.TextExpr.{toksDuck, shinglesDuck}
      val w = 4
      s"""WITH toks AS (SELECT doc_id,
        |   ${toksDuck("text")} AS t FROM documents),
        | gh AS (SELECT doc_id,
        |   list_transform(${shinglesDuck("t")}, x -> md5(x)) AS gh
        |  FROM toks),
        | wins AS (SELECT doc_id, CASE
        |   WHEN len(gh) >= $w THEN [list_aggregate(gh[i:i+${w - 1}], 'min')
        |     FOR i IN range(1, len(gh) - ${w - 2})]
        |   WHEN len(gh) > 0 THEN [list_aggregate(gh, 'min')]
        |   ELSE [] END AS wins FROM gh),
        | fp AS (SELECT doc_id, len(list_distinct(wins)) AS n_fp,
        |   unnest(list_distinct(wins)) AS fp FROM wins),
        | cold AS (SELECT fp FROM (SELECT fp, count(*) AS c FROM fp
        |   GROUP BY 1) WHERE c <= 50),
        | keep AS (SELECT f.* FROM fp f JOIN cold USING (fp)),
        | p AS (SELECT x.doc_id AS ida, y.doc_id AS idb,
        |   x.n_fp AS nfa, y.n_fp AS nfb, count(*) AS n_shared
        |  FROM keep x JOIN keep y
        |  ON x.fp = y.fp AND x.doc_id < y.doc_id
        |  GROUP BY 1, 2, 3, 4)
        |SELECT ida, idb, CAST(n_shared AS BIGINT) AS n_shared,
        | (n_shared * 1000000) // least(nfa, nfb) AS ov_ppm
        |FROM p WHERE n_shared >= 2""".stripMargin
    }
  )
}
