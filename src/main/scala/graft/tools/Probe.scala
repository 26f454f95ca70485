package graft.tools
import org.apache.spark.sql.SparkSession
/** Ad-hoc data/plan inspection main (dev utility). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Graft.session(master = "local[4]")
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val ev = graft.sources.Tables.read(spark, d, "events")
    ev.printSchema(); ev.show(5, false)
    val e = spark.read.parquet(s"$d/embeddings.parquet")
    e.printSchema()
    println(e.selectExpr("vec_id", "size(embedding) as dim", "label").take(3).mkString("\n"))
    val docs = spark.read.parquet(s"$d/documents.parquet")
    docs.show(4, 100)
    println("user_id range: " + ev.selectExpr("min(user_id)", "max(user_id)").first())
    spark.stop()
  }
}
