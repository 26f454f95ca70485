package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev utility: scale the driver corpus by an integer factor for
  * overflow-rail sweeps (VERDICT r8 directive: "prove the rails one
  * decade up").
  *
  * Each fact/entity table is replicated `factor`× with ALL key columns
  * shifted by `replica * keyRange(table)` so referential integrity and
  * per-key fan-in are preserved exactly (replica r's orders reference
  * replica r's customers, etc.); the fixed dimensions (region, nation)
  * and every payload column are left untouched, so value MAGNITUDES
  * (prices, quantities) keep their distribution while counts and sums
  * grow ×factor — exactly the quantity the rails care about.
  * Timestamps are copied unchanged (same time span, ×factor density)
  * and written as zoneless timestamp[us], the corpus vintage, so the
  * DuckDB oracle reads plain TIMESTAMP like it does for the shipped
  * dirs. Each table lands as ONE file `{out}/{table}.parquet` to match
  * the corpus layout (tools/check.py's read_parquet path expects it).
  *
  * Usage: tools/run.sh graft.tools.ScaleUp <srcSfDir> <outDir> [factor]
  */
object ScaleUp {

  /** table -> (key columns to shift, dense key-range size at the source
    * scale is computed from the data: max(key)+1 of the FIRST listed
    * key's own table — every corpus key is 0-based dense). o_custkey /
    * l_* / user_id shift by the RANGE OF THE TABLE THEY REFERENCE. */
  private val shifts: Map[String, Seq[(String, String, String)]] = Map(
    // (column, referencedTable, referencedKey)
    "customer" -> Seq(("c_custkey", "customer", "c_custkey")),
    "supplier" -> Seq(("s_suppkey", "supplier", "s_suppkey")),
    "part" -> Seq(("p_partkey", "part", "p_partkey")),
    "orders" -> Seq(
      ("o_orderkey", "orders", "o_orderkey"),
      ("o_custkey", "customer", "c_custkey")),
    "lineitem" -> Seq(
      ("l_orderkey", "orders", "o_orderkey"),
      ("l_partkey", "part", "p_partkey"),
      ("l_suppkey", "supplier", "s_suppkey")),
    "events" -> Seq(
      ("event_id", "events", "event_id"),
      ("user_id", "customer", "c_custkey")),
    "documents" -> Seq(("doc_id", "documents", "doc_id")),
    "embeddings" -> Seq(("vec_id", "embeddings", "vec_id")))

  private val copyOnly = Seq("region", "nation")

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleUp <srcSfDir> <outDir> [factor]")
    val (src, out) = (args(0), args(1))
    val factor = if (args.length > 2) args(2).toInt else 10
    val spark = graft.Graft.session(appName = "graft-scaleup")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    new java.io.File(out).mkdirs()

    def table(name: String): DataFrame =
      spark.read.parquet(s"$src/$name.parquet")

    // dense 0-based keys: range size = max+1. ASSERTED, not assumed —
    // a future non-dense corpus (gaps, or a non-zero base) would make
    // replica key ranges overlap and silently alias replicas into
    // bogus duplicate keys; fail loudly instead.
    val ranges: Map[String, Long] = shifts.values.flatten
      .map { case (_, refTable, refKey) => (refTable, refKey) }.toSet
      .map { tk: (String, String) =>
        val row = table(tk._1)
          .agg(max(col(tk._2)), countDistinct(col(tk._2)), min(col(tk._2)))
          .head()
        val (mx, nd, mn) = (row.getLong(0), row.getLong(1), row.getLong(2))
        require(mn == 0L && mx + 1L == nd,
          s"${tk._1}.${tk._2} is not dense 0-based (min=$mn, max=$mx, " +
            s"distinct=$nd): replica shift by max+1 would alias keys")
        tk._1 -> (mx + 1L)
      }.toMap

    for (name <- copyOnly) writeOne(table(name), s"$out/$name.parquet")

    for ((name, cols) <- shifts.toSeq.sortBy(_._1)) {
      val base = table(name)
      val replicas = (0 until factor).map { r =>
        cols.foldLeft(base) { case (df, (c, refTable, _)) =>
          // key columns are BIGINT in every shifted table; the add is
          // column-typed so the result schema is unchanged
          df.withColumn(c, (col(c) + lit(r * ranges(refTable))).cast(
            base.schema(c).dataType))
        }
      }
      writeOne(replicas.reduce(_ unionAll _), s"$out/$name.parquet")
      println(s"[scaleup] $name x$factor done")
    }
    spark.stop()
  }

  /** Write `df` as exactly one parquet FILE at `dest` (corpus layout).
    * Timestamp columns go out as NTZ so footers say
    * isAdjustedToUTC=false like the pyarrow-written corpus. */
  private def writeOne(df: DataFrame, dest: String): Unit = {
    import org.apache.spark.sql.types._
    val ntz = df.schema.fields.foldLeft(df) { (d, f) =>
      if (f.dataType == TimestampType)
        d.withColumn(f.name, col(f.name).cast(TimestampNTZType))
      else d
    }
    val tmp = dest + "_tmp"
    ntz.repartition(1).write.mode("overwrite").parquet(tmp)
    val fs = new org.apache.hadoop.fs.Path(tmp)
      .getFileSystem(ntz.sparkSession.sparkContext.hadoopConfiguration)
    val part = fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
      .map(_.getPath).find(_.getName.startsWith("part-"))
      .getOrElse(sys.error(s"no part file under $tmp"))
    val destPath = new org.apache.hadoop.fs.Path(dest)
    fs.delete(destPath, false)
    fs.rename(part, destPath)
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
    ()
  }
}
