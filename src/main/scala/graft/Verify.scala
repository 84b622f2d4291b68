package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Tables.mkSession(s"local[$cpus]", cpus)
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // ANN recall as a tracked per-round artifact: the oracle hash-checks
    // that each ANN pipeline computes ITS OWN definition exactly, but not
    // how well LSH/IVF approximate the exact knn truth — so a quality
    // regression (e.g. a bucket-width change) could hide behind green
    // hashes. recall@3 vs q_sim_knn lands in RECALL.json every round.
    try {
      import org.apache.spark.sql.functions.col
      val knn = SparkEntry.queries("q_sim_knn")(spark, sfDir)
        .where(col("rnk") <= 3).select("vec_id", "neighbor_id")
      val total = knn.count()
      def recall(name: String): Double = {
        val hits = SparkEntry.queries(name)(spark, sfDir)
          .select("vec_id", "neighbor_id")
          .join(knn, Seq("vec_id", "neighbor_id"), "left_semi").count()
        if (total == 0) 1.0 else hits.toDouble / total
      }
      val rec = f"""{"sf":"$sfDir","k":3,"knn_pairs":$total,""" +
        f""""recall_lsh":${recall("q_sim_ann_lsh")}%.4f,""" +
        f""""recall_ivf":${recall("q_sim_ann_ivf")}%.4f,""" +
        f""""recall_sq":${recall("q_sim_ann_sq")}%.4f}"""
      Files.writeString(Paths.get(s"$outDir/recall.json"), rec)
      Files.writeString(Paths.get("RECALL.json"), rec + "\n")
      println(s"[verify] ann recall: $rec")
    } catch { case e: Throwable =>
      System.err.println(s"[verify] recall computation failed: ${e.getMessage}")
    }
    spark.stop()
  }
}
