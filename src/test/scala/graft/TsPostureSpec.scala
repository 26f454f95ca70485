package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus-vintage posture pin: the engine must land ONE canonical ts
  * type (session-zone TimestampType) no matter which physical storage
  * the events parquet holds — int64 ns-since-epoch (the reference's
  * Arrow TimeUnit::NANO shape, `/root/reference/src/partition.cpp:703-708`)
  * or native timestamp[us] (the current driver corpus). A corpus
  * regeneration that flips the storage again should fail HERE, in one
  * focused spec, instead of across a dozen downstream gates (the r7
  * lesson). */
class TsPostureSpec extends SparkTestBase {
  import spark.implicits._

  test("batch read lands canonical TimestampType on the shipped corpus") {
    val ev = sources.Tables.read(spark, sf, "events")
    assert(ev.schema("ts").dataType == TimestampType,
      s"events.ts must canonicalize to TimestampType, got ${ev.schema("ts").dataType}")
    // values must be sane event times, not 1970-epoch collapse (the
    // ns-vs-us misread divides real times by 1000)
    val yr = ev.agg(min(year(col("ts"))).as("y0"), max(year(col("ts"))).as("y1"))
      .head()
    assert(yr.getInt(0) >= 2000 && yr.getInt(1) <= 2100,
      s"events.ts years [${yr.getInt(0)}, ${yr.getInt(1)}] look misscaled")
  }

  /** Write the sf events slice in BOTH storage vintages and assert the
    * batch reader and the streaming reader agree with each other and
    * across vintages. */
  test("ns-long and timestamp[us] storages read identically, batch and stream") {
    val canon = sources.Tables.read(spark, sf, "events")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")

    val base = java.nio.file.Files.createTempDirectory("graft-vintage")
    val nsDir = s"$base/ns/events.parquet"
    val usDir = s"$base/us/events.parquet"
    // ns vintage: int64 ns-since-epoch (what nanosAsLong yields on read)
    canon.withColumn("ts",
        expr("unix_micros(CAST(ts AS TIMESTAMP)) * CAST(1000 AS BIGINT)"))
      .write.parquet(nsDir)
    // timestamp vintage: native TimestampType -> parquet timestamp[us]
    canon.write.parquet(usDir)

    for (dir <- Seq(s"$base/ns", s"$base/us")) {
      val b = sources.Tables.read(spark, dir, "events")
      assert(b.schema("ts").dataType == TimestampType, s"$dir batch type")
      assert(b.exceptAll(canon).isEmpty && canon.exceptAll(b).isEmpty,
        s"$dir batch read diverges from canonical")

      // the stream source reads a directory OF parquet files — the
      // Spark-written events.parquet dir itself, not its parent
      val stream = streaming.EventStreams.fromDirectory(spark,
        s"$dir/events.parquet")
      assert(stream.schema("ts").dataType == TimestampType, s"$dir stream type")
      val name = s"vintage_${dir.split('/').last}"
      val q = streaming.EventStreams.hourlyCounts(stream)
        .writeStream.format("memory").queryName(name)
        .outputMode("complete").start()
      try q.processAllAvailable() finally q.stop()
      val streamed = spark.table(name)
      val batchTwin = canon
        .groupBy(date_trunc("hour", $"ts").as("hr"), $"event_type")
        .agg(count(lit(1)).as("cnt"),
          functions.DetMath.sumFixed($"value", 2).as("sum_val"))
      assert(streamed.exceptAll(batchTwin).isEmpty &&
        batchTwin.exceptAll(streamed).isEmpty,
        s"$dir streamed hourly counts diverge from the batch twin")
    }
    graft.streaming.EventStreams.registerTreeCleanup(base.toFile)
  }
}
