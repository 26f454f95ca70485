package graft.operators

import org.apache.spark.sql.DataFrame
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
    * upsert rows must have base's schema plus `opCol`. */
  def applyChanges(base: DataFrame, changes: DataFrame, key: String,
      opCol: String = "op"): DataFrame = {
    val keys = changes.select(key).distinct()
    val survivors = base.join(keys, Seq(key), "left_anti")
    val upserts = changes.filter(col(opCol) === "upsert").drop(opCol)
      .select(base.columns.map(col): _*)
    survivors.unionAll(upserts)
  }
}
