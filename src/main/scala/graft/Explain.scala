package graft

import org.apache.spark.sql.execution.FormattedMode

/** Plan inspection tool: prints the formatted physical plan for the named
  * queries (all queries if none named). Usage:
  * `sbt "runMain graft.Explain [sfDir] [query...]"` — the perf-iteration
  * loop the build relies on: after a query is correct, read its plan and
  * tune until it is the plan you'd want at 100 TB (broadcasts where
  * expected, filters pushed, one shuffle per agg/join key).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Tables.mkSession(s"local[$cpus]", cpus)
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"===== $n =====")
      println(SparkEntry.queries(n)(spark, sfDir)
        .queryExecution.explainString(FormattedMode))
    }
    spark.stop()
  }
}
