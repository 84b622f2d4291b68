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
    // optional dev-loop subset (comma-separated names or a regex); the
    // driver sets nothing and gets the full registry
    // comma-separated names become alternation, so both documented forms
    // (name list, regex) select as expected
    val only = sys.env.get("GRAFT_ONLY")
      .map(s => s.split(',').map(_.trim).filter(_.nonEmpty).mkString("|").r)
    // GRAFT_SQL_ONLY: dump the full oracle_sql.json without executing any
    // Spark query — the paired-bench protocol (tools/paired_bench.py)
    // needs the SQL at sf0.1 without paying a 178-query result dump
    val sqlOnly = sys.env.contains("GRAFT_SQL_ONLY")
    // GRAFT_RECALL_ONLY: skip the result dump entirely and compute just
    // the ANN recall artifact — the dev loop for recall-dial changes
    // (codebook iterations, probe widths) where the oracle hash is
    // unaffected but RECALL.json is the number being tuned
    val recallOnly = sys.env.contains("GRAFT_RECALL_ONLY")
    val skipRecall = !recallOnly &&
      (sys.env.contains("GRAFT_SKIP_RECALL") || only.isDefined || sqlOnly)
    val selected = SparkEntry.queries.filter { case (name, _) =>
      only.forall(_.pattern.matcher(name).matches()) }
    (if (sqlOnly || recallOnly) Map.empty[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] else selected)
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // error sentinel (VERDICT r12 #6): a thrown query must still
        // produce an output dir, or the driver's correctness report
        // silently OMITS it (r12: broken q_sim_ann_ivfpq showed as
        // "0 fails"). A one-row parquet whose only column is the error
        // message can never match any oracle schema/hash, so the break
        // surfaces as an explicit red entry instead of an absence.
        try {
          import spark.implicits._
          Seq(s"${e.getClass.getSimpleName}: ${e.getMessage}")
            .toDF("_graft_error").coalesce(1)
            .write.mode("overwrite").parquet(s"$outDir/$name")
        } catch { case e2: Throwable =>
          System.err.println(s"[verify] $name sentinel write failed: ${e2.getMessage}")
        }
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
      .filter { case (k, _) => sqlOnly || selected.contains(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // ANN recall as a tracked per-round artifact: the oracle hash-checks
    // that each ANN pipeline computes ITS OWN definition exactly, but not
    // how well LSH/IVF approximate the exact knn truth — so a quality
    // regression (e.g. a bucket-width change) could hide behind green
    // hashes. recall@3 vs q_sim_knn lands in RECALL.json every round.
    try {
      if (skipRecall) { spark.stop(); return }
      import org.apache.spark.sql.functions.col
      import org.apache.spark.sql.DataFrame
      val knn = SparkEntry.queries("q_sim_knn")(spark, sfDir)
        .where(col("rnk") <= 3).select("vec_id", "neighbor_id").persist()
      // TRUE exhaustive top-3 (no label block): on this fixture only ~10%
      // of true top-3 neighbors share the query's label, so recall vs the
      // label-blocked q_sim_knn measures definition-overlap, not index
      // quality — a multi-probe IVF can look WORSE there while finding
      // strictly more true neighbors. Both views are tracked: vs_exhaustive
      // is the honest quality number (monotone in candidate-set growth),
      // vs_blocked_knn keeps continuity with earlier rounds' artifact.
      val e = Tables.t(spark, sfDir, "embeddings").select(col("vec_id"), col("embedding"))
      val allPairs = e.as("a").crossJoin(e.as("b"))
        .where(col("a.vec_id") =!= col("b.vec_id"))
        .select(col("a.vec_id").as("vec_id"), col("b.vec_id").as("neighbor_id"),
          Tables.r4(org.apache.spark.sql.graftx.VectorExprs.cosineSim(
            col("a.embedding"), col("b.embedding"))).as("cos"))
      val truth = org.apache.spark.sql.graftx.TopK.topKPerKey(allPairs,
          keyNames = Seq("vec_id"), orderBy = Seq("cos" -> false, "neighbor_id" -> true),
          k = 3, rankName = "rnk")
        .select("vec_id", "neighbor_id").persist()
      val knnN = knn.count(); val truthN = truth.count()
      def recallVs(base: DataFrame, baseN: Long)(res: DataFrame): Double = {
        val hits = res.select("vec_id", "neighbor_id")
          .join(base, Seq("vec_id", "neighbor_id"), "left_semi").count()
        if (baseN == 0) 1.0 else hits.toDouble / baseN
      }
      // build + persist each ANN result ONCE: both recall bases read the
      // same materialized pairs, halving the candidate-join/rerank cost of
      // the artifact (the ANN plans are the most expensive in the registry)
      val anns = Seq("lsh" -> "q_baseline_ann_lsh", "lsh_probe" -> "q_baseline_ann_lsh_probe",
        "lsh_multi" -> "q_sim_ann_lsh_multi", "lsh_mp" -> "q_sim_ann_lsh_mp",
        "lshc" -> "q_sim_ann_lshc",
        "ivf" -> "q_baseline_ann_ivf", "ivf_mp" -> "q_sim_ann_ivf_mp",
        "ivf_k" -> "q_sim_ann_ivf_k", "ivfc" -> "q_sim_ann_ivfc",
        "ivfpq" -> "q_sim_ann_ivfpq", "ivfc_pq" -> "q_sim_ann_ivfc_pq",
        "sq" -> "q_baseline_ann_sq")
        .map { case (k, qn) =>
          k -> SparkEntry.queries(qn)(spark, sfDir)
            .select(col("vec_id"), col("neighbor_id")).persist()
        }
      def block(base: DataFrame, baseN: Long, extra: Seq[(String, DataFrame)]): String =
        (extra ++ anns)
          .map { case (k, df) => f""""$k":${recallVs(base, baseN)(df)}%.4f""" }
          .mkString("{", ",", "}")
      val rec = s"""{"sf":"$sfDir","k":3,"truth_pairs":$truthN,"knn_pairs":$knnN,""" +
        s""""vs_exhaustive":${block(truth, truthN, Seq("knn_blocked" -> knn))},""" +
        s""""vs_blocked_knn":${block(knn, knnN, Seq.empty)}}"""
      (Seq(knn, truth) ++ anns.map(_._2)).foreach(_.unpersist())
      Files.writeString(Paths.get(s"$outDir/recall.json"), rec)
      Files.writeString(Paths.get("RECALL.json"), rec + "\n")
      println(s"[verify] ann recall: $rec")
    } catch { case e: Throwable =>
      System.err.println(s"[verify] recall computation failed: ${e.getMessage}")
    }
    spark.stop()
  }
}
