package graft

import org.apache.spark.sql.functions._
import graft.streaming.EventStreams

/** Structured Streaming over the events table: the streaming pipeline
  * must agree with its batch twin on the same data. */
class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  /** FileStreamSource requires a directory; stage the single events
    * parquet file into one (the production shape is a directory of files
    * anyway). */
  lazy val eventsDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-events")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    dir.toString
  }

  private def runToMemory(df: org.apache.spark.sql.DataFrame,
      name: String, mode: String): Unit = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(mode).start()
    q.processAllAvailable()
    q.stop()
  }

  test("streaming hourly counts equal the batch aggregation") {
    val stream = EventStreams.fromDirectory(spark, eventsDir)
    runToMemory(EventStreams.hourlyCounts(stream), "hourly", "append")
    val streamed = spark.table("hourly")
      .select("hr", "event_type", "cnt", "sum_val")

    val batch = sources.Tables.read(spark, sf, "events")
      .groupBy(date_trunc("hour", $"ts").as("hr"), $"event_type")
      .agg(count(lit(1)).as("cnt"),
        graft.functions.DetMath.sumFixed($"value", 2).as("sum_val"))

    // Everything the stream emitted must exactly match a batch group...
    assert(streamed.exceptAll(batch).count() == 0)
    // ...and only the tail windows (not yet past the watermark when the
    // input ended, at most one per event type) may be missing.
    val missing = batch.exceptAll(streamed)
    val nTypes = batch.select("event_type").distinct().count()
    assert(missing.count() <= nTypes)
    assert(streamed.count() >= batch.count() - nTypes)
  }

  test("session windows split on the inactivity gap") {
    val stream = EventStreams.fromDirectory(spark, eventsDir)
    runToMemory(EventStreams.sessions(stream), "sess", "append")
    val sess = spark.table("sess")
    assert(sess.count() > 0)
    assert(sess.filter($"sess_end" < $"sess_start").count() == 0)
    // no session may contain a gap: end-start <= n_events * gap bound
    assert(sess.filter(
      unix_timestamp($"sess_end") - unix_timestamp($"sess_start") >
        $"n_events" * 1800).count() == 0)
  }

  test("flatMapGroupsWithState running totals end at the batch totals") {
    val stream = EventStreams.fromDirectory(spark, eventsDir)
    runToMemory(EventStreams.runningUserTotals(stream), "running", "append")
    val finalCounts = spark.table("running")
      .groupBy("user_id").agg(max("n").as("n"))
    val batch = sources.Tables.read(spark, sf, "events")
      .groupBy("user_id").agg(count(lit(1)).as("n"))
    assert(finalCounts.exceptAll(batch).count() == 0)
    assert(batch.count() == finalCounts.count())
  }

  test("stream-stream interval join matches the batch twin on emitted rows") {
    val stream = EventStreams.fromDirectory(spark, eventsDir)
    runToMemory(EventStreams.purchasesAfterSignup(stream), "attrib", "append")
    val streamed = spark.table("attrib")
      .select("signup_id", "purchase_id")

    val ev = sources.Tables.read(spark, sf, "events")
    val sg = ev.filter($"event_type" === "signup")
      .select($"user_id".as("s_user"), $"event_id".as("signup_id"), $"ts".as("s_ts"))
    val batch = ev.filter($"event_type" === "purchase")
      .join(sg, $"user_id" === $"s_user" &&
        $"ts" >= $"s_ts" && $"ts" < $"s_ts" + expr("INTERVAL 1 HOUR"))
      .select($"signup_id", $"event_id".as("purchase_id"))

    // everything the stream emitted must be a real batch pair; tail-window
    // pairs (inside the final watermark horizon) may be withheld
    assert(streamed.exceptAll(batch).count() == 0)
    assert(streamed.count() > 0)
  }

  test("rate source feeds the same transforms: schema + flow") {
    val src = EventStreams.fromRate(spark, rowsPerBatch = 500)
    assert(src.schema.fieldNames.toSeq ==
      Seq("event_id", "ts", "user_id", "event_type", "value", "props"))
    val q = EventStreams.dedupedEvents(src)
      .writeStream.format("memory").queryName("rate_events")
      .outputMode("append").start()
    try q.awaitTermination(4000) finally q.stop()
    val got = spark.table("rate_events")
    assert(got.count() > 0, "rate source should have produced a batch")
    assert(got.select("event_type").distinct().count() <= 4)
  }

  test("RocksDB state store preset drives a stateful stream") {
    // The at-scale state backend (Graft.streamingState): session/dedup
    // state spills to local disk instead of executor heap. The provider
    // is a runtime SQL conf, so the preset can be exercised on the
    // shared test session and restored after.
    val saved = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    Graft.streamingState.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val stream = EventStreams.fromDirectory(spark, eventsDir)
      val q = EventStreams.hourlyCounts(stream)
        .writeStream.format("memory").queryName("rocks_hourly")
        .outputMode("append").start()
      q.processAllAvailable()
      // the provider actually in use surfaces through the state
      // operator's custom metrics — RocksDB-prefixed names appear only
      // when RocksDBStateStoreProvider backed the aggregation
      val metrics = q.lastProgress.stateOperators.head
        .customMetrics.keySet()
      q.stop()
      assert(metrics.stream().anyMatch(_.startsWith("rocksdb")),
        s"expected rocksdb state metrics, got $metrics")
      assert(spark.table("rocks_hourly").count() > 0)
    } finally {
      saved match {
        case Some(v) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
      spark.conf.unset(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled")
    }
  }

  test("foreachBatch parquet sink lands every event exactly once") {
    val out = java.nio.file.Files.createTempDirectory("graft-sink")
    val stream = EventStreams.fromDirectory(spark, eventsDir)
    val q = EventStreams.sinkToParquet(
      stream, out.resolve("data").toString, out.resolve("cp").toString)
    q.processAllAvailable(); q.stop()
    val landed = spark.read.parquet(out.resolve("data").toString + "/batch=*")
    val src = sources.Tables.read(spark, sf, "events")
    assert(landed.count() == src.count())
    assert(landed.select("event_id").exceptAll(src.select("event_id")).count() == 0)
  }
}
