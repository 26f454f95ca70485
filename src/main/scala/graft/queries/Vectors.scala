package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.{Multimodal, Similarity}

/** Embedding similarity-search + multimodal operator inventory
  * (SURVEY.md §2.11), oracle-gated via the scaled-integer determinism of
  * [[graft.operators.Similarity]].
  */
object Vectors {

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.read(s, dir, "embeddings")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q42_embed_stats" -> ((s, d) =>
      Similarity.prepare(emb(s, d), "embedding")
        .select(col("vec_id"), col("label"),
          size(col("embedding")).as("dim"), col("n2"))),

    "q43_knn_brute" -> ((s, d) => {
      val e = emb(s, d)
      Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 5),
        "vec_id", "embedding", k = 10)
    }),

    "q44_embed_dup_pairs" -> ((s, d) =>
      Similarity.cosineDupPairs(emb(s, d), "vec_id", "embedding",
        "label", threshold = 0.35)),

    "q45_ivf_ann" -> ((s, d) => {
      val e = emb(s, d)
      Similarity.ivfTopK(e,
        e.select("vec_id").filter(col("vec_id").between(100, 109)),
        e.select("vec_id").filter(col("vec_id") < 8),
        "vec_id", "embedding", k = 5)
    }),

    "q46_multimodal_features" -> ((s, d) =>
      Multimodal.featureColumns(
        Tables.read(s, d, "documents"), "doc_id", "text")),

    // REAL image decode: synthesize one grayscale PNG per doc (dims +
    // pixels are pure functions of doc_id), then decode with
    // javax.imageio and checksum the recovered pixels — the oracle
    // replays the same arithmetic, so a hash match proves a true
    // lossless decode round-trip, not a stub.
    "q61_image_decode" -> ((s, d) =>
      Multimodal.decodeImages(
        Multimodal.synthesizePngs(Tables.read(s, d, "documents"), "doc_id"))
        .toDF)
  )

  // ---- DuckDB oracle: same scaled-integer algorithm ----

  private val prepCte =
    """p AS (SELECT vec_id, label, len(embedding) AS dim,
      |  [CAST(FLOOR(CAST(x AS DOUBLE) * 10000) AS BIGINT) FOR x IN embedding] AS q
      | FROM embeddings),
      |n AS (SELECT vec_id, label, dim, q,
      |  CAST(list_aggregate([q[i] * q[i] FOR i IN range(1, len(q)+1)], 'sum')
      |       AS BIGINT) AS n2
      | FROM p)""".stripMargin

  private def dotDuck(a: String, b: String): String =
    s"list_aggregate([($a)[i] * ($b)[i] FOR i IN range(1, len($a)+1)], 'sum')"

  private def cosDuck(dot: String, na: String, nb: String): String =
    s"CAST($dot AS DOUBLE) / SQRT(CAST($na AS DOUBLE) * CAST($nb AS DOUBLE))"

  val oracles: Map[String, String] = Map(
    "q42_embed_stats" ->
      s"""WITH $prepCte
        |SELECT vec_id, label, dim, n2 FROM n""".stripMargin,

    "q43_knn_brute" ->
      s"""WITH $prepCte,
        | qs AS (SELECT vec_id AS qid, q AS qq, n2 AS qn2 FROM n WHERE vec_id < 5),
        | scored AS (SELECT qs.qid, n.vec_id,
        |   ${cosDuck(dotDuck("n.q", "qs.qq"), "n.n2", "qs.qn2")} AS cos
        |  FROM n CROSS JOIN qs WHERE n.vec_id <> qs.qid),
        | ranked AS (SELECT qid, vec_id, cos,
        |   ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank
        |  FROM scored)
        |SELECT qid, vec_id, rank, cos FROM ranked WHERE rank <= 10""".stripMargin,

    "q44_embed_dup_pairs" ->
      s"""WITH $prepCte
        |SELECT a.vec_id AS ida, b.vec_id AS idb,
        | ${cosDuck(dotDuck("a.q", "b.q"), "a.n2", "b.n2")} AS cos
        |FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE ${cosDuck(dotDuck("a.q", "b.q"), "a.n2", "b.n2")} >= 0.35""".stripMargin,

    "q45_ivf_ann" ->
      s"""WITH $prepCte,
        | cent AS (SELECT vec_id AS cent_id, q AS centq, n2 AS centn2
        |  FROM n WHERE vec_id < 8),
        | assigned AS (SELECT vec_id, q, n2, cent_id,
        |   ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY
        |     ${cosDuck(dotDuck("q", "centq"), "n2", "centn2")} DESC, cent_id) AS crank
        |  FROM n CROSS JOIN cent),
        | cells AS (SELECT vec_id, q, n2, cent_id FROM assigned WHERE crank = 1),
        | qs AS (SELECT vec_id AS qid, q AS qq, n2 AS qn2, cent_id AS qcell
        |  FROM cells WHERE vec_id BETWEEN 100 AND 109),
        | scored AS (SELECT qs.qid, c.vec_id,
        |   ${cosDuck(dotDuck("c.q", "qs.qq"), "c.n2", "qs.qn2")} AS cos
        |  FROM cells c JOIN qs ON c.cent_id = qs.qcell AND c.vec_id <> qs.qid),
        | ranked AS (SELECT qid, vec_id, cos,
        |   ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank
        |  FROM scored)
        |SELECT qid, vec_id, rank, cos FROM ranked WHERE rank <= 5""".stripMargin,

    "q46_multimodal_features" ->
      Multimodal.featureSqlDuck("documents", "doc_id", "text"),

    "q61_image_decode" ->
      """WITH d AS (SELECT doc_id,
        |   CAST(8 + doc_id % 24 AS INT) AS width,
        |   CAST(8 + (doc_id // 7) % 24 AS INT) AS height
        | FROM documents)
        |SELECT doc_id, width, height, CAST(1 AS INT) AS channels,
        | CAST(list_aggregate(
        |   [(doc_id*31 + (i % width)*7 + (i // width)) % 256
        |    FOR i IN range(0, CAST(width AS BIGINT) * height)],
        |   'sum') AS BIGINT) AS px_sum
        |FROM d""".stripMargin
  )
}
