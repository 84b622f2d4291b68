package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (Test/fork := true → one JVM). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = Tables.mkSession("local[4]", "4")
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val SF = "/root/testdata/sf0.001"
}
