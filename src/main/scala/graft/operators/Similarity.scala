package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over embedding columns (SURVEY.md §2.11).
  *
  * Determinism strategy: float embeddings are quantized once to exact
  * scaled integers (`floor(double(x) * 10000)` — float→double is exact,
  * the product and floor are single IEEE ops), so dot products are
  * *integer* sums — order-independent and identical on every engine.
  * Cosine is then `dot / sqrt(n2a * n2b)` built only from
  * correctly-rounded IEEE ops on exact inputs → bit-identical doubles
  * in Spark and the DuckDB oracle. 64 dims × 10^8 per term stays far
  * below 2^63, no overflow.
  *
  * Scale discipline:
  *  - brute-force top-k: cross join is bounded by the (small) query set;
  *    ranking is a per-query window (shuffle on query id), top-k via
  *    filter — no global sort, no driver gather;
  *  - IVF: the corpus is assigned to coarse cells once (broadcast of the
  *    tiny centroid set), a query probes only its cell — the classic
  *    inverted-file layout where each cell is a partition-local scan.
  */
object Similarity {

  /** Exact scaled-integer quantization of a float-array embedding. */
  def quantized(embCol: String): Column =
    expr(s"transform($embCol, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 10000) AS BIGINT))")

  /** Integer dot product of two quantized vectors — the codegen'd native
    * expression (graft.functions.LongArrayDot); callers must have gone
    * through [[prepare]]/[[bruteForceTopK]]/… which register it. The
    * interpreted fallback spelling is kept for reference/testing. */
  def dotQ(a: String, b: String): Column = expr(s"graft_dot($a, $b)")

  def dotQInterpreted(a: String, b: String): Column =
    expr(s"aggregate(zip_with($a, $b, (x, y) -> x * y), CAST(0 AS BIGINT), (acc, v) -> acc + v)")

  /** Deterministic cosine from integer dot and squared norms. */
  def cosine(dot: Column, n2a: Column, n2b: Column): Column =
    dot.cast("double") / sqrt(n2a.cast("double") * n2b.cast("double"))

  /** vec table → (idCol, payload..., q: quantized, n2: squared norm). */
  def prepare(df: DataFrame, embCol: String): DataFrame = {
    graft.functions.LongArrayDot.register(df.sparkSession)
    df.withColumn("q", quantized(embCol))
      .withColumn("n2", dotQ("q", "q"))
  }

  /** Brute-force cosine top-k for each query vector. Output:
    * qid, vec_id, rank, cos — rank deterministic via (cos desc, id). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      embCol: String, k: Int): DataFrame = {
    val c = prepare(corpus, embCol)
      .select(col(idCol).as("vec_id"), col("q").as("cq"), col("n2").as("cn2"))
    val qs = prepare(queries, embCol)
      .select(col(idCol).as("qid"), col("q").as("qq"), col("n2").as("qn2"))
    val scored = c.crossJoin(broadcast(qs))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("dot", dotQ("cq", "qq"))
      .withColumn("cos", cosine(col("dot"), col("cn2"), col("qn2")))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "vec_id", "rank", "cos")
  }

  /** Assign every vector to its nearest centroid (max cosine, ties → min
    * centroid id). Centroids are broadcast — they are tiny by design. */
  def assignCells(corpus: DataFrame, centroids: DataFrame, idCol: String)
      : DataFrame = {
    val cent = centroids
      .select(col(idCol).as("cent_id"), col("q").as("centq"), col("n2").as("centn2"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("ccos").desc, col("cent_id"))
    corpus.crossJoin(broadcast(cent))
      .withColumn("cdot", dotQ("q", "centq"))
      .withColumn("ccos", cosine(col("cdot"), col("n2"), col("centn2")))
      .withColumn("crank", row_number().over(w))
      .filter(col("crank") === 1)
      .drop("centq", "centn2", "cdot", "crank")
  }

  /** IVF approximate top-k with nprobe=1: search only the query's cell. */
  def ivfTopK(corpus: DataFrame, queryIds: DataFrame, centroidIds: DataFrame,
      idCol: String, embCol: String, k: Int): DataFrame = {
    val prep = prepare(corpus, embCol).select(col(idCol), col("q"), col("n2"))
    val centroids = prep.join(centroidIds, idCol)
    val cells = assignCells(prep, centroids, idCol)
    val qs = cells.join(queryIds, idCol)
      .select(col(idCol).as("qid"), col("q").as("qq"),
        col("n2").as("qn2"), col("cent_id").as("qcell"))
    val cand = cells.select(col(idCol).as("vec_id"), col("q").as("cq"),
      col("n2").as("cn2"), col("cent_id").as("vcell"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("vec_id"))
    cand.join(broadcast(qs), col("vcell") === col("qcell") &&
        col("vec_id") =!= col("qid"))
      .withColumn("dot", dotQ("cq", "qq"))
      .withColumn("cos", cosine(col("dot"), col("cn2"), col("qn2")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "vec_id", "rank", "cos")
  }

  /** Embedding near-duplicate pairs within a blocking column (e.g.
    * label or an LSH bucket): cosine >= threshold. */
  def cosineDupPairs(df: DataFrame, idCol: String, embCol: String,
      blockCol: String, threshold: Double): DataFrame = {
    val p = prepare(df, embCol)
      .select(col(idCol), col(blockCol), col("q"), col("n2"))
    p.as("x").join(p.as("y"),
        col(s"x.$blockCol") === col(s"y.$blockCol") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .withColumn("dot", dotQ(s"x.q", s"y.q"))
      .withColumn("cos", cosine(col("dot"), col("x.n2"), col("y.n2")))
      .filter(col("cos") >= threshold)
      .select(col(s"x.$idCol").as("ida"), col(s"y.$idCol").as("idb"),
        col("cos"))
  }
}
