package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.DetMath.{fixed, fixedSql}
import graft.operators.Merge

/** Ingest-surface inventory: CDC merge onto a snapshot and
  * CSV / JSON-lines sink+source round-trips (the reference reads
  * parquet only — SURVEY.md §2.1; these are the extension formats a
  * pipeline meets at its edges).
  */
object Ingest {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.read(s, dir, n)

  /** Round-trip staging dir, unique per Spark application: two
    * concurrent Verify/test JVMs on one machine must not overwrite each
    * other's staging mid-read. PipelineSpec derives the same path from
    * its own session. Every returned dir is registered for recursive
    * deletion at JVM exit (deleteOnExit can't cover the part files
    * Spark creates *after* registration), so repeated Verify/bench runs
    * don't accumulate unbounded tmp data. */
  def stagingDir(s: SparkSession, name: String): String = {
    val dir = sys.props("java.io.tmpdir") +
      s"/graft_${name}_${s.sparkContext.applicationId}"
    registerCleanup(dir)
    dir
  }

  private val stagedDirs =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private lazy val cleanupHook: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      stagedDirs.forEach(d => deleteTree(new java.io.File(d)))))

  private def registerCleanup(dir: String): Unit = {
    cleanupHook
    stagedDirs.add(dir)
    ()
  }

  /** Immediate recursive delete, for callers (tests) that shouldn't
    * wait for the exit hook. */
  def cleanupNow(dir: String): Unit = {
    deleteTree(new java.io.File(dir))
    stagedDirs.remove(dir)
    ()
  }

  private def deleteTree(f: java.io.File): Unit = {
    Option(f.listFiles).getOrElse(Array.empty).foreach(deleteTree)
    f.delete()
    ()
  }

  /** Deterministic change batch over orders: keys ≡ 1 (mod 7) are
    * upserts with a rewritten priority, keys ≡ 2 (mod 7) are deletes.
    * (No ≡ 0 inserts: the snapshot is the full table, so every change
    * key exists — updates and deletes are the interesting paths.) */
  private def changesOf(orders: DataFrame): DataFrame =
    orders.filter(col("o_orderkey") % 7 === 1)
      .withColumn("o_orderpriority", lit("9-CHANGED"))
      .withColumn("op", lit("upsert"))
      .unionAll(orders.filter(col("o_orderkey") % 7 === 2)
        .withColumn("op", lit("delete")))

  /** q131/q257's deterministic version event stream: the base snapshot
    * plus a change log — a re-priced upsert at +30 days and another at
    * +90 for keys ≡ 1 (mod 7), a delete at +60 for keys ≡ 2. */
  private def scd2Events(orders: DataFrame): DataFrame = {
    val base = orders.select(col("o_orderkey"), col("o_orderpriority"),
      col("o_totalprice"), col("o_orderdate").as("ts"), lit("base").as("op"))
    val k = col("o_orderkey") % 7
    def ch(filterK: Int, prio: Option[String], days: Int, op: String) = {
      val f = orders.filter(k === filterK)
      val p = prio.map(lit(_)).getOrElse(col("o_orderpriority"))
      f.select(col("o_orderkey"), p.as("o_orderpriority"),
        col("o_totalprice"),
        (col("o_orderdate") + expr(s"INTERVAL $days DAYS")).as("ts"),
        lit(op).as("op"))
    }
    base
      .unionByName(ch(1, Some("9-CHANGED"), 30, "upsert"))
      .unionByName(ch(1, Some("9-AGAIN"), 90, "upsert"))
      .unionByName(ch(2, None, 60, "delete"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- q112: CDC merge (SCD-1 upsert/delete batch) ----
    // Anti-join + union: updated keys carry the new priority, deleted
    // keys vanish, untouched rows pass through byte-identical.
    "q112_cdc_merge" -> ((s, d) => {
      val orders = t(s, d, "orders")
      Merge.applyChanges(orders, changesOf(orders), "o_orderkey")
        .select("o_orderkey", "o_orderpriority", "o_custkey")
    }),

    // ---- q115: CDC merge with a sequence column ----
    // One batch carries, for the same key, ops at different sequence
    // numbers; the NEWEST op wins across upsert/delete in both
    // directions: %7==1 gets upsert(seq1) then delete(seq2) → really
    // deleted (no resurrect via the stale upsert); %7==2 gets
    // delete(seq2) then upsert(seq3) → present with the late value.
    "q115_cdc_merge_seq" -> ((s, d) => {
      val orders = t(s, d, "orders")
      val k = col("o_orderkey") % 7
      val up1 = orders.filter(k === 1)
        .withColumn("o_orderpriority", lit("9-FIRST"))
        .withColumn("op", lit("upsert")).withColumn("seq", lit(1L))
      val del2 = orders.filter(k.isin(1, 2))
        .withColumn("op", lit("delete")).withColumn("seq", lit(2L))
      val up3 = orders.filter(k.isin(2, 3))
        .withColumn("o_orderpriority", lit("9-LATEST"))
        .withColumn("op", lit("upsert")).withColumn("seq", lit(3L))
      Merge.applyChanges(orders, up1.unionByName(del2).unionByName(up3),
          "o_orderkey", seqCol = Some("seq"))
        .select("o_orderkey", "o_orderpriority", "o_custkey")
    }),

    // ---- q131: SCD-2 versioned history ----
    // The time-travel companion to q112's SCD-1 merge: the base
    // snapshot plus a change log (a re-priced upsert at +30 days, a
    // delete at +60, a second upsert at +90) becomes a versioned
    // history where every version carries [valid_from, valid_to) and
    // deletes close without reopening. ONE window pass on the key —
    // valid_to = lead(ts) over the key's full event sequence — so the
    // only shuffle is on o_orderkey, and the oracle replays the exact
    // window.
    "q131_scd2_history" -> ((s, d) => {
      Merge.scd2History(scd2Events(t(s, d, "orders")), "o_orderkey", "ts")
        .select("o_orderkey", "o_orderpriority", "o_totalprice",
          "valid_from", "valid_to", "is_current")
    }),

    // ---- q257: SCD-2 point-in-time (time-travel) read ----
    // The read the q131 history exists FOR: each probe (a key at an
    // as-of instant — here the twice-changed keys at +45 days) joins
    // to exactly the version whose [valid_from, valid_to) interval
    // covers it. Equi-join on the key with the interval predicate as a
    // residual filter — per-key version counts are small by
    // construction (a dimension's change rate), so the fan-out is
    // bounded and the one shuffle keys on o_orderkey; no range-join
    // machinery needed. Every probe lands in exactly one version
    // (versions partition the timeline).
    "q257_scd2_pit" -> ((s, d) => {
      val orders = t(s, d, "orders")
      val hist = Merge.scd2History(scd2Events(orders), "o_orderkey", "ts")
      val probes = orders.filter(col("o_orderkey") % 7 === 1)
        .select(col("o_orderkey"),
          (col("o_orderdate") + expr("INTERVAL 45 DAYS")).as("pt"))
      probes.join(hist, Seq("o_orderkey"))
        .filter(col("valid_from") <= col("pt") &&
          (col("valid_to").isNull || col("pt") < col("valid_to")))
        .select(col("o_orderkey"), col("pt"), col("o_orderpriority"),
          col("valid_from"), col("valid_to"))
    }),

    // ---- q161: snapshot diff (change-feed generation) ----
    // The inverse of q112: diff the original snapshot against its
    // CDC-merged successor and recover EXACTLY the effective change
    // batch — upserts for the re-priced keys, deletes for the removed
    // ones. PipelineSpec also enforces the round-trip law
    // applyChanges(old, diff(old, new)) == new. One full-outer join on
    // the key; payloads compare as structs.
    "q161_snapshot_diff" -> ((s, d) => {
      val orders = t(s, d, "orders")
      val neu = Merge.applyChanges(orders, changesOf(orders), "o_orderkey")
      Merge.diffSnapshots(orders, neu, "o_orderkey")
        .select("o_orderkey", "op", "o_orderpriority", "o_custkey")
    }),

    // ---- q158: data-contract validation gate ----
    // The quality gate an ingest runs before admitting a batch: one
    // violations row per declared constraint — referential integrity
    // (orders.o_custkey must exist in customer, LEFT ANTI join), key
    // uniqueness, null checks, domain checks (non-negative price,
    // status enum). Each check is a scan-bounded aggregate; the report
    // is constraint-cardinality rows. A zero row proves the check RAN
    // and passed — absence of a check is not a pass.
    "q158_data_contract" -> ((s, d) => {
      val o = t(s, d, "orders")
      val fk = o.join(t(s, d, "customer"),
          o("o_custkey") === col("c_custkey"), "left_anti")
        .agg(count(lit(1)).as("n_violations"))
        .select(lit("fk_custkey_exists").as("check"), col("n_violations"))
      val uniq = o.agg(
          (count(lit(1)) - countDistinct(col("o_orderkey")))
            .as("n_violations"))
        .select(lit("unique_orderkey").as("check"), col("n_violations"))
      val nn = o.agg(sum(when(col("o_orderpriority").isNull, 1L)
          .otherwise(0L)).as("n_violations"))
        .select(lit("priority_not_null").as("check"), col("n_violations"))
      val pos = o.agg(sum(when(col("o_totalprice") < 0, 1L).otherwise(0L))
          .as("n_violations"))
        .select(lit("price_non_negative").as("check"), col("n_violations"))
      val dom = o.agg(sum(when(!col("o_orderstatus").isin("O", "F", "P"), 1L)
          .otherwise(0L)).as("n_violations"))
        .select(lit("status_in_domain").as("check"), col("n_violations"))
      fk.unionAll(uniq).unionAll(nn).unionAll(pos).unionAll(dom)
    }),

    // ---- q113: CSV sink + source round-trip ----
    // Write orders columns to CSV, read them back with an explicit
    // schema, aggregate — gated against the same aggregate straight
    // from parquet, so the gate proves LOSSLESS round-trip through the
    // text format (quoting, header, type re-parse). Strings and
    // integers only: CSV float formatting is not a contract worth
    // relying on at any scale.
    // ---- q177: dynamic partition overwrite (partition backfill) ----
    // The daily backfill move: a partitioned events table gets ONE
    // partition recomputed (click values re-priced x2) and rewritten
    // with partitionOverwriteMode=dynamic — only partitions present in
    // the incoming frame are replaced, the other four stay untouched
    // (static mode would truncate the whole table). Gated on the
    // post-overwrite per-partition aggregate: click rows carry doubled
    // cents, every other partition is byte-identical to the first
    // write.
    "q177_partition_overwrite" -> ((s, d) => {
      val dir = stagingDir(s, "q177_dpo")
      val ev = t(s, d, "events")
        .select(col("event_id"), col("event_type"), col("user_id"),
          col("value"))
      ev.write.mode("overwrite").partitionBy("event_type").parquet(dir)
      ev.filter(col("event_type") === "click")
        .withColumn("value", col("value") * 2)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("event_type").parquet(dir)
      s.read.parquet(dir)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(fixed(col("value"), 2)).as("cents"))
    }),

    // ---- q176: schema-evolution read (mergeSchema) ----
    // The lakehouse reality: a column added mid-corpus. Half the orders
    // land as a 3-column v1 file, half as a 4-column v2 file with
    // o_orderpriority; one mergeSchema read unifies them — v1 rows
    // surface the new column as NULL, types and values byte-exact. The
    // oracle replays the NULL pattern from the split predicate. (Footer
    // merge costs one extra listing pass at read time; production pins
    // the merged schema in a catalog instead — this gates the engine
    // capability the catalog path is built on.)
    "q176_schema_merge" -> ((s, d) => {
      val dir = stagingDir(s, "q176_merge")
      val o = t(s, d, "orders")
      o.filter(col("o_orderkey") % 2 === 0)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .write.mode("overwrite").parquet(s"$dir/v1")
      o.filter(col("o_orderkey") % 2 === 1)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
        .write.mode("overwrite").parquet(s"$dir/v2")
      s.read.option("mergeSchema", "true")
        .parquet(s"$dir/v1", s"$dir/v2")
        .select("o_orderkey", "o_custkey", "o_totalprice",
          "o_orderpriority")
    }),

    // ---- q198: co-located (bucketed) fact-fact join ----
    // The durable answer to "this join shuffles 100 TB every night":
    // both sides are written bucketed on the join key
    // (sources.Tables.writeBucketed — the write-once shuffle), then
    // joined with a merge hint. Catalyst recognizes the matching
    // bucketing AND the in-bucket sort, so the physical plan has NO
    // Exchange and NO Sort on either side — a pure per-bucket zip
    // (IngestSpec pins that plan). The aggregate after the join
    // re-keys on priority, which is a legitimate |priorities|-row
    // shuffle. At 1000 executors the bucketed layout also bounds task
    // inputs: bucket i of lineitem only ever meets bucket i of orders.
    "q198_bucketed_join" -> ((s, d) => {
      Tables.writeBucketed(
        t(s, d, "lineitem").select("l_orderkey", "l_quantity"),
        "graft_bkt_lineitem", Seq("l_orderkey"), 8)
      Tables.writeBucketed(
        t(s, d, "orders").select("o_orderkey", "o_orderpriority"),
        "graft_bkt_orders", Seq("o_orderkey"), 8)
      s.table("graft_bkt_orders").hint("merge")
        .join(s.table("graft_bkt_lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          sum(fixed(col("l_quantity"), 2)).as("qty_cents"))
    }),

    "q113_csv_roundtrip" -> ((s, d) => {
      val dir = stagingDir(s, "q113_csv")
      t(s, d, "orders")
        .select("o_orderkey", "o_orderpriority", "o_custkey")
        .write.mode("overwrite").option("header", "true").csv(dir)
      s.read.option("header", "true")
        .schema("o_orderkey BIGINT, o_orderpriority STRING, o_custkey BIGINT")
        .csv(dir)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), sum("o_orderkey").as("key_sum"),
          countDistinct("o_custkey").as("custs"))
    }),

    // ---- q122: ORC sink + source round-trip ----
    // Same lossless-round-trip contract through ORC, Spark's other
    // first-class columnar format (a lakehouse migration path meets it
    // constantly). Columnar→columnar, so unlike CSV the types survive
    // natively — the gate proves the reader/writer pair, not a re-parse.
    "q122_orc_roundtrip" -> ((s, d) => {
      val dir = stagingDir(s, "q122_orc")
      t(s, d, "lineitem")
        .select("l_orderkey", "l_partkey", "l_returnflag", "l_linestatus")
        .write.mode("overwrite").orc(dir)
      s.read.orc(dir)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), sum("l_orderkey").as("key_sum"),
          countDistinct("l_partkey").as("parts"))
    }),

    // ---- q114: JSON-lines sink + source round-trip ----
    // Same contract through newline-delimited JSON (the interchange
    // format of most crawl/annotation pipelines).
    "q114_json_roundtrip" -> ((s, d) => {
      val dir = stagingDir(s, "q114_json")
      t(s, d, "customer")
        .select("c_custkey", "c_name", "c_nationkey")
        .write.mode("overwrite").json(dir)
      s.read
        .schema("c_custkey BIGINT, c_name STRING, c_nationkey BIGINT")
        .json(dir)
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n"), sum("c_custkey").as("key_sum"),
          max("c_name").as("max_name"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q112_cdc_merge" ->
      """SELECT o_orderkey, o_orderpriority, o_custkey FROM orders
        | WHERE o_orderkey % 7 NOT IN (1, 2)
        |UNION ALL
        |SELECT o_orderkey, '9-CHANGED' AS o_orderpriority, o_custkey
        | FROM orders WHERE o_orderkey % 7 = 1""".stripMargin,

    "q115_cdc_merge_seq" ->
      """SELECT o_orderkey, o_orderpriority, o_custkey FROM orders
        | WHERE o_orderkey % 7 NOT IN (1, 2, 3)
        |UNION ALL
        |SELECT o_orderkey, '9-LATEST' AS o_orderpriority, o_custkey
        | FROM orders WHERE o_orderkey % 7 IN (2, 3)""".stripMargin,

    "q131_scd2_history" ->
      """WITH ev AS (
        | SELECT o_orderkey, o_orderpriority, o_totalprice,
        |   o_orderdate AS ts, 'base' AS op FROM orders
        | UNION ALL SELECT o_orderkey, '9-CHANGED', o_totalprice,
        |   o_orderdate + INTERVAL 30 DAY, 'upsert' FROM orders
        |   WHERE o_orderkey % 7 = 1
        | UNION ALL SELECT o_orderkey, '9-AGAIN', o_totalprice,
        |   o_orderdate + INTERVAL 90 DAY, 'upsert' FROM orders
        |   WHERE o_orderkey % 7 = 1
        | UNION ALL SELECT o_orderkey, o_orderpriority, o_totalprice,
        |   o_orderdate + INTERVAL 60 DAY, 'delete' FROM orders
        |   WHERE o_orderkey % 7 = 2),
        | v AS (SELECT *, lead(ts) OVER (PARTITION BY o_orderkey
        |   ORDER BY ts) AS valid_to FROM ev)
        |SELECT o_orderkey, o_orderpriority, o_totalprice,
        | ts AS valid_from, valid_to, valid_to IS NULL AS is_current
        |FROM v WHERE op <> 'delete'""".stripMargin,

    "q257_scd2_pit" ->
      """WITH ev AS (
        | SELECT o_orderkey, o_orderpriority, o_totalprice,
        |   o_orderdate AS ts, 'base' AS op FROM orders
        | UNION ALL SELECT o_orderkey, '9-CHANGED', o_totalprice,
        |   o_orderdate + INTERVAL 30 DAY, 'upsert' FROM orders
        |   WHERE o_orderkey % 7 = 1
        | UNION ALL SELECT o_orderkey, '9-AGAIN', o_totalprice,
        |   o_orderdate + INTERVAL 90 DAY, 'upsert' FROM orders
        |   WHERE o_orderkey % 7 = 1
        | UNION ALL SELECT o_orderkey, o_orderpriority, o_totalprice,
        |   o_orderdate + INTERVAL 60 DAY, 'delete' FROM orders
        |   WHERE o_orderkey % 7 = 2),
        | v AS (SELECT *, lead(ts) OVER (PARTITION BY o_orderkey
        |   ORDER BY ts) AS valid_to FROM ev),
        | h AS (SELECT o_orderkey, o_orderpriority, ts AS valid_from,
        |   valid_to FROM v WHERE op <> 'delete'),
        | pb AS (SELECT o_orderkey, o_orderdate + INTERVAL 45 DAY AS pt
        |  FROM orders WHERE o_orderkey % 7 = 1)
        |SELECT pb.o_orderkey, pb.pt, h.o_orderpriority, h.valid_from,
        | h.valid_to
        |FROM pb JOIN h USING (o_orderkey)
        |WHERE h.valid_from <= pb.pt
        |  AND (h.valid_to IS NULL OR pb.pt < h.valid_to)""".stripMargin,

    "q161_snapshot_diff" ->
      """SELECT o_orderkey, 'upsert' AS op,
        | '9-CHANGED' AS o_orderpriority, o_custkey
        |FROM orders WHERE o_orderkey % 7 = 1
        |UNION ALL
        |SELECT o_orderkey, 'delete', o_orderpriority, o_custkey
        |FROM orders WHERE o_orderkey % 7 = 2""".stripMargin,

    "q158_data_contract" ->
      """SELECT 'fk_custkey_exists' AS "check",
        |  (SELECT count(*) FROM orders o
        |   WHERE NOT EXISTS (SELECT 1 FROM customer c
        |     WHERE c.c_custkey = o.o_custkey)) AS n_violations
        |UNION ALL SELECT 'unique_orderkey',
        |  (SELECT count(*) - count(DISTINCT o_orderkey) FROM orders)
        |UNION ALL SELECT 'priority_not_null',
        |  (SELECT CAST(SUM(CASE WHEN o_orderpriority IS NULL
        |     THEN 1 ELSE 0 END) AS BIGINT) FROM orders)
        |UNION ALL SELECT 'price_non_negative',
        |  (SELECT CAST(SUM(CASE WHEN o_totalprice < 0
        |     THEN 1 ELSE 0 END) AS BIGINT) FROM orders)
        |UNION ALL SELECT 'status_in_domain',
        |  (SELECT CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
        |     THEN 1 ELSE 0 END) AS BIGINT) FROM orders)""".stripMargin,

    "q177_partition_overwrite" ->
      s"""SELECT event_type, count(*) AS n,
        | CAST(SUM(${fixedSql(
            "CASE WHEN event_type = 'click' THEN value * 2 ELSE value END",
            2)}) AS BIGINT) AS cents
        |FROM events GROUP BY event_type""".stripMargin,

    "q176_schema_merge" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
        | CASE WHEN o_orderkey % 2 = 1 THEN o_orderpriority END
        |   AS o_orderpriority
        |FROM orders""".stripMargin,

    "q198_bucketed_join" ->
      s"""SELECT o_orderpriority, count(*) AS n_items,
        | CAST(SUM(${fixedSql("l_quantity", 2)}) AS BIGINT) AS qty_cents
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY 1""".stripMargin,

    "q113_csv_roundtrip" ->
      """SELECT o_orderpriority, count(*) AS n,
        | CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
        | count(DISTINCT o_custkey) AS custs
        |FROM orders GROUP BY 1""".stripMargin,

    "q122_orc_roundtrip" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        | CAST(SUM(l_orderkey) AS BIGINT) AS key_sum,
        | count(DISTINCT l_partkey) AS parts
        |FROM lineitem GROUP BY 1, 2""".stripMargin,

    "q114_json_roundtrip" ->
      """SELECT c_nationkey, count(*) AS n,
        | CAST(SUM(c_custkey) AS BIGINT) AS key_sum,
        | MAX(c_name) AS max_name
        |FROM customer GROUP BY 1""".stripMargin
  )
}
