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
      Multimodal.frameColumns(docs(s, d), "doc_id", "text", n = 4))
  )

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
        |FROM s""".stripMargin
  )
}
