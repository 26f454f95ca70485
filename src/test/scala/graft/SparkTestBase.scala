package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session across all suites (sbt forks a single test
  * JVM; SparkSession.getOrCreate dedupes). */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession =
    Graft.session(master = "local[4]", appName = "graft-test",
      shufflePartitions = 4)
  val sf = "/root/testdata/sf0.001"
}
