package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Perf triage tool: runs the named queries (default: all) three times each
  * in one JVM and prints per-query min wall time plus Spark job / stage /
  * task counts for the LAST run — separates scheduling overhead (many tiny
  * stages) from compute. Usage:
  * `sbt "runMain graft.Profile [sfDir] [query...]"`.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.mkSession(s"local[$cpus]", cpus)
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger; val stages = new AtomicInteger
    val tasks = new AtomicInteger; val taskTimeMs = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks)
        taskTimeMs.addAndGet(
          s.stageInfo.completionTime.getOrElse(0L) - s.stageInfo.submissionTime.getOrElse(0L))
      }
    })
    println(f"${"query"}%-28s ${"min_s"}%7s ${"jobs"}%5s ${"stages"}%7s ${"tasks"}%6s ${"stage_ms"}%9s")
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      var best = Double.MaxValue
      var lastCounts = (0, 0, 0, 0L)
      for (_ <- 1 to 3) {
        jobs.set(0); stages.set(0); tasks.set(0); taskTimeMs.set(0)
        val t0 = System.nanoTime()
        try fn(spark, sfDir).count() catch { case e: Throwable => println(s"$n FAILED: $e") }
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(150) // let listener events drain (listenerBus is private[spark])
        if (dt < best) best = dt
        lastCounts = (jobs.get, stages.get, tasks.get, taskTimeMs.get)
      }
      val (j, st, tk, ms) = lastCounts
      println(f"$n%-28s $best%7.3f $j%5d $st%7d $tk%6d $ms%9d")
    }
    spark.stop()
  }
}
