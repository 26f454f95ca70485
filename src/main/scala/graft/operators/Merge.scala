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
    * change rows must have base's schema plus `opCol` (and `seqCol`).
    *
    * Robustness contract: rows whose op is neither "upsert" nor
    * "delete" are IGNORED entirely (they neither delete their key nor
    * insert anything — an op typo must not silently drop data). A key
    * with several valid rows in one batch collapses to ONE winner
    * across BOTH ops: with `seqCol`, the highest sequence wins, so an
    * upsert(seq=1) + delete(seq=5) pair really deletes the key instead
    * of resurrecting it via the upsert (CDC feeds commonly carry
    * upsert-then-delete for one key in a batch); sequence ties fall
    * back to the payload-struct descending so the winner never depends
    * on partitioning. Without `seqCol` there is no "latest": upserts
    * outrank deletes by contract (replace-wins), and duplicate upserts
    * collapse to the lexicographically greatest payload. */
  def applyChanges(base: DataFrame, changes: DataFrame, key: String,
      opCol: String = "op", seqCol: Option[String] = None): DataFrame = {
    val valid = changes.filter(col(opCol).isin("upsert", "delete"))
    val payload = struct(base.columns.filter(_ != key).map(col): _*)
    val ordering = seqCol match {
      case Some(c) => Seq(col(c).desc, payload.desc)
      case None =>
        Seq(when(col(opCol) === "upsert", 0).otherwise(1).asc, payload.desc)
    }
    // window over the CHANGE BATCH only (small by assumption), never
    // over the snapshot — the merge still shuffles base only on `key`
    val w = Window.partitionBy(col(key)).orderBy(ordering: _*)
    val winners = valid
      .withColumn("_graft_rn", row_number().over(w))
      .filter(col("_graft_rn") === 1)
    val survivors = base.join(winners.select(key), Seq(key), "left_anti")
    val upserts = winners.filter(col(opCol) === "upsert")
      .select(base.columns.map(col): _*)
    survivors.unionAll(upserts)
  }

  /** Inverse of [[applyChanges]]: diff two keyed snapshots into the
    * MINIMAL change batch that turns `old` into `neu` — upserts for
    * added/changed keys (carrying the new payload), deletes for
    * vanished keys (carrying the old payload, so the feed is
    * self-describing). Round-trip law, spec-enforced:
    * `applyChanges(old, diffSnapshots(old, neu), key) == neu`.
    * One full-outer join on the key plus a struct comparison — the
    * change-feed generator for publishing snapshot deltas downstream
    * (the reverse direction of CDC ingestion). */
  def diffSnapshots(old: DataFrame, neu: DataFrame, key: String,
      opCol: String = "op"): DataFrame = {
    val payloadCols = old.columns.filter(_ != key).toSeq
    val o = old.select(col(key),
      struct(payloadCols.map(col): _*).as("_old"))
    val n = neu.select(col(key),
      struct(payloadCols.map(col): _*).as("_new"))
    o.join(n, Seq(key), "full_outer")
      .filter(col("_old").isNull || col("_new").isNull ||
        col("_old") =!= col("_new"))
      .select(col(key),
        when(col("_new").isNull, "delete").otherwise("upsert").as(opCol),
        coalesce(col("_new"), col("_old")).as("_p"))
      .select(col(key) +: col(opCol) +:
        payloadCols.map(c => col(s"_p.$c").as(c)): _*)
  }

  /** SCD type 2: turn a keyed event log (initial snapshot rows + later
    * upserts/deletes, each stamped with `tsCol`) into a VERSIONED
    * history — every version carries [valid_from, valid_to) and the
    * open version per key has valid_to = NULL. A delete closes the
    * current version without opening a new one (the key then has no
    * current row); an upsert closes the previous version and opens its
    * own.
    *
    * Events per (key, ts) must be unique — CDC feeds with sub-ts
    * ordering should compose ts from (ts, seq) upstream. `opCol` values:
    * "base"/"upsert" rows are versions, "delete" rows are closing
    * events only. Everything is ONE window pass partitioned by the key
    * (shuffle on key only, no self-join): valid_to = lead(ts) over the
    * key's full event sequence — a delete participates as a boundary
    * and is then filtered from the output.
    */
  def scd2History(events: DataFrame, key: String, tsCol: String,
      opCol: String = "op"): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(tsCol))
    events
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .filter(col(opCol) =!= "delete")
      .withColumnRenamed(tsCol, "valid_from")
      .withColumn("is_current", col("valid_to").isNull)
      .drop(opCol)
  }
}
