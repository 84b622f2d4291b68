package graft

import org.apache.spark.sql.functions._

/** Micro-bench for the COMMIT half of the ingest lifecycle
  * ([[Ingest.commitDocs]] / [[Ingest.commitVectors]]): measures what a
  * commit of a fixture-shaped batch costs against a warm index store,
  * and that the cost is O(batch) — the corpus-side artifacts are probed
  * (hot-shingle cap, frozen centroids/codebooks), never rebuilt or
  * rescanned into the segments.
  *
  * Protocol: the dataset tables are SYMLINKED into a fresh temp dir, so
  * the run commits into its own index store (the real one, shared with
  * Verify/Bench, must never grow an overlay from a benchmark) after a
  * one-time artifact build there (reported separately, like Bench's
  * artifact_build_s). The batch is the registry's fixture slice
  * (id % 10 = 7) under shifted ids — genuinely novel to the standing
  * corpus, content-identical to stored rows (the worst case for the
  * dedup families' cap/verify paths). A half batch is timed after the
  * full batch, on the SAME store, for the linearity ratio.
  *
  * Run: `sbt "runMain graft.CommitBench /root/testdata/sf0.01"` →
  * one JSON line. NOT part of the driver Bench protocol (commits
  * mutate state; Bench times the frozen registry).
  */
object CommitBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.mkSession(s"local[$cpus]", cpus)
    spark.sparkContext.setLogLevel("WARN")

    val d = java.nio.file.Files.createTempDirectory("graft-commitbench").toString
    for (t <- Seq("documents", "embeddings"))
      java.nio.file.Files.createSymbolicLink(
        java.nio.file.Paths.get(s"$d/$t.parquet"),
        java.nio.file.Paths.get(s"$sfDir/$t.parquet"))

    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def rowsOf(rep: org.apache.spark.sql.DataFrame, fam: String): Long =
      rep.where(col("family") === fam).select("n_rows")
        .collect().headOption.map(_.getLong(0)).getOrElse(0L)

    // one-time index-artifact build on the temp store (warm everything a
    // commit probes: hot-shingle set, quantizers, codebooks) so the
    // timings below are steady-state commit cost, not first-build cost
    val (_, warmS) = timed {
      Ingest.minhashDedup(spark, d, Tables.t(spark, d, "documents")
        .where(col("doc_id") % 10 === 7).select("doc_id", "text")).count()
      Ingest.substringDedup(spark, d, Tables.t(spark, d, "documents")
        .where(col("doc_id") % 10 === 7).select("doc_id", "text")).count()
      Ingest.annIvfcPq(spark, d, Tables.t(spark, d, "embeddings")
        .where(col("vec_id") % 10 === 7).select("vec_id", "embedding")).count()
      Ingest.annLshc(spark, d, Tables.t(spark, d, "embeddings")
        .where(col("vec_id") % 10 === 7).select("vec_id", "embedding")).count()
      Ingest.exactDedup(spark, d, Tables.t(spark, d, "documents")
        .where(col("doc_id") % 10 === 7).select("doc_id", "text")).count()
    }

    def docBatch(shift: Long, mod: Long): org.apache.spark.sql.DataFrame =
      Tables.t(spark, d, "documents").where(col("doc_id") % 10 === 7)
        .where(col("doc_id") % 20 < mod)
        .select((col("doc_id") + shift).as("doc_id"), col("text"))
    def vecBatch(shift: Long, mod: Long): org.apache.spark.sql.DataFrame =
      Tables.t(spark, d, "embeddings").where(col("vec_id") % 10 === 7)
        .where(col("vec_id") % 20 < mod)
        .select((col("vec_id") + shift).as("vec_id"), col("embedding"))

    val (repD, fullDocS) = timed(Ingest.commitDocs(spark, d, docBatch(10000000L, 20)))
    val nDocsFull = rowsOf(repD, "docs_raw")
    val (repDh, halfDocS) = timed(Ingest.commitDocs(spark, d, docBatch(20000000L, 10)))
    val nDocsHalf = rowsOf(repDh, "docs_raw")
    val (repV, fullVecS) = timed(Ingest.commitVectors(spark, d, vecBatch(10000000L, 20)))
    val nVecsFull = rowsOf(repV, "vecs_raw")
    val (repVh, halfVecS) = timed(Ingest.commitVectors(spark, d, vecBatch(20000000L, 10)))
    val nVecsHalf = rowsOf(repVh, "vecs_raw")
    // and the probe-after-commit cost: the same ingest probes, now
    // reading base + overlay corpus-side
    val (_, probeS) = timed {
      Ingest.minhashDedup(spark, d, docBatch(30000000L, 20)).count()
      Ingest.annIvfcPq(spark, d, vecBatch(30000000L, 20)).count()
    }

    println(
      s"""{"metric":"commit","sf":"$sfDir","warm_s":${f"$warmS%.1f"},""" +
      s""""doc_full":{"rows":$nDocsFull,"sec":${f"$fullDocS%.2f"}},""" +
      s""""doc_half":{"rows":$nDocsHalf,"sec":${f"$halfDocS%.2f"}},""" +
      s""""vec_full":{"rows":$nVecsFull,"sec":${f"$fullVecS%.2f"}},""" +
      s""""vec_half":{"rows":$nVecsHalf,"sec":${f"$halfVecS%.2f"}},""" +
      s""""probe_with_overlay_s":${f"$probeS%.2f"}}""")
    spark.stop()
  }
}
