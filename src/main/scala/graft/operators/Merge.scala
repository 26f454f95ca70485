package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC-style merge (SCD type 1): apply a batch of upserts and deletes
  * to a keyed snapshot. The reference has no mutation surface at all
  * (tables are immutable partitions, `/root/reference/src/partition.cpp`);
  * this is the lakehouse-ingest extension a daily pipeline applies to
  * its curated corpus.
  *
  * Shape: one LEFT ANTI join (snapshot rows whose key appears in the
  * change batch drop out) + a UNION of the upsert rows — the classic
  * merge spelling that shuffles only on the merge key and needs no
  * full-outer join. At scale the anti join broadcasts when the change
  * batch is small (the common case), making the merge map-side.
  */
object Merge {

  /** Apply `changes` to `base`. `changes` must carry `opCol` with values
    * "upsert" or "delete"; upsert rows replace (or insert) their key,
    * delete rows remove it. Both frames must share the `key` column;
    * upsert rows must have base's schema plus `opCol`.
    *
    * Robustness contract: rows whose op is neither "upsert" nor
    * "delete" are IGNORED entirely (they neither delete their key nor
    * insert anything — an op typo must not silently drop data), and
    * duplicate upserts for one key collapse to a single winner:
    * highest `seqCol` if given (latest-wins), else the lexicographically
    * greatest payload (deterministic regardless of partitioning). */
  def applyChanges(base: DataFrame, changes: DataFrame, key: String,
      opCol: String = "op", seqCol: Option[String] = None): DataFrame = {
    val valid = changes.filter(col(opCol).isin("upsert", "delete"))
    val keys = valid.select(key).distinct()
    val survivors = base.join(keys, Seq(key), "left_anti")
    val ordering = seqCol match {
      case Some(c) => col(c).desc
      case None => struct(base.columns.filter(_ != key).map(col): _*).desc
    }
    // window over the CHANGE BATCH only (small by assumption), never
    // over the snapshot — the merge still shuffles base only on `key`
    val w = Window.partitionBy(col(key)).orderBy(ordering)
    val upserts = valid.filter(col(opCol) === "upsert")
      .withColumn("_graft_rn", row_number().over(w))
      .filter(col("_graft_rn") === 1)
      .select(base.columns.map(col): _*)
    survivors.unionAll(upserts)
  }
}
