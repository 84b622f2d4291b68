package graft

import graft.streaming.Streams
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Genuine Structured Streaming runs (memory sink) vs the batch twins, and
  * the watermark late-drop semantics no batch oracle can express. */
class StreamingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.SF

  private def ckpt(): String =
    Files.createTempDirectory("graft-ckpt").toString

  /** FileStreamSource needs a DIRECTORY; the testdata table is a single
    * parquet file — expose it through a temp dir symlink. */
  private lazy val eventsDir: String = {
    val dir = Files.createTempDirectory("graft-events")
    Files.createSymbolicLink(dir.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$sf/events.parquet"))
    dir.toString
  }

  test("readEvents starts against an EMPTY source directory (schema fallback)") {
    // an empty dir has no parquet footer to probe — readEvents must fall
    // back to the current generation's schema so the stream can start
    // before the source produces its first file (ADVICE r09)
    val dir = Files.createTempDirectory("graft-empty-events").toString
    val stream = Streams.tumbling(Streams.readEvents(spark, dir))
    val qy = stream.writeStream.format("memory").queryName("empty_src")
      .outputMode("update").option("checkpointLocation", ckpt())
      .trigger(Trigger.AvailableNow()).start()
    qy.awaitTermination(60000)
    assert(spark.table("empty_src").count() == 0L)
    // and once data lands, a fresh start of the same pipeline reads it
    // (written NTZ to match the fallback schema, like the driver's files)
    Tables.t(spark, sf, "events").limit(5)
      .withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampNTZType))
      .coalesce(1).write.mode("append").parquet(dir)
    val qy2 = stream.writeStream.format("memory").queryName("empty_src2")
      .outputMode("update").option("checkpointLocation", ckpt())
      .trigger(Trigger.AvailableNow()).start()
    qy2.awaitTermination(60000)
    assert(spark.table("empty_src2").agg(sum("n")).head.getLong(0) == 5L)
  }

  test("streaming JDBC upsert sink: lands every row; replayed batch doesn't duplicate") {
    val url = s"jdbc:derby:/tmp/graft-derby/stream${System.nanoTime()};create=true"
    val stream = Streams.readEvents(spark, eventsDir)
      .select(col("event_id"), col("user_id"), col("value"))
    val qy = Streams.jdbcUpsertSink(stream, url, "events_store", "event_id", ckpt())
    qy.awaitTermination(120000)
    val want = Tables.t(spark, sf, "events").count()
    assert(graft.sources.Sinks.readJdbc(spark, url, "events_store").count() == want)
    // simulate an at-least-once replay of the whole range: the upsert's
    // delete-overlap makes it replace, not append
    graft.sources.Sinks.overwriteJdbcRange(
      Tables.t(spark, sf, "events").select("event_id", "user_id", "value"),
      url, "events_store", "event_id")
    assert(graft.sources.Sinks.readJdbc(spark, url, "events_store").count() == want)
  }

  test("streaming tumbling counts (AvailableNow, complete mode) == batch twin") {
    val stream = Streams.tumbling(Streams.readEvents(spark, eventsDir))
    val qy = stream.writeStream.format("memory").queryName("tumb")
      .outputMode("complete").option("checkpointLocation", ckpt())
      .trigger(Trigger.AvailableNow()).start()
    qy.awaitTermination(120000)
    val got = spark.table("tumb").select("win_start", "event_type", "n")
      .orderBy("win_start", "event_type").collect()
    val want = SparkEntry.queries("q_window_tumbling")(spark, sf)
      .select("win_start", "event_type", "n").collect()
    assert(got.length == want.length)
    assert(got.map(_.toString).sameElements(want.map(_.toString)))
  }

  test("streaming session_window matches gaps-and-islands twin on counts") {
    val stream = Streams.sessions(Streams.readEvents(spark, eventsDir))
    val qy = stream.writeStream.format("memory").queryName("sess")
      .outputMode("complete").option("checkpointLocation", ckpt())
      .trigger(Trigger.AvailableNow()).start()
    qy.awaitTermination(120000)
    val got = spark.table("sess")
      .select("user_id", "sess_start", "n_events")
      .orderBy("user_id", "sess_start").collect()
    val want = SparkEntry.queries("q_window_session")(spark, sf)
      .select("user_id", "sess_start", "n_events")
      .orderBy("user_id", "sess_start").collect()
    assert(got.length == want.length, s"${got.length} sessions vs ${want.length}")
    assert(got.map(_.toString).sameElements(want.map(_.toString)))
  }

  test("stream-static join enriches every event with the dim row") {
    val events = Streams.readEvents(spark, eventsDir)
    val userDim = Tables.t(spark, sf, "events")
      .groupBy("user_id").count().withColumnRenamed("count", "lifetime_n")
    val qy = Streams.enriched(events, userDim)
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").option("checkpointLocation", ckpt())
      .trigger(Trigger.AvailableNow()).start()
    qy.awaitTermination(120000)
    val n = spark.table("enriched").count()
    val expected = Tables.t(spark, sf, "events").count()
    assert(n == expected, s"$n enriched vs $expected events")
    assert(spark.table("enriched").where(col("lifetime_n").isNull).count() == 0)
  }

  test("stream-static dedup against the persisted corpus index flags novelty") {
    // publish (or reuse) the disk-backed corpus hash artifact
    SparkEntry.queries("q_dedup_incremental")(spark, sf).collect()
    val idxPath = s"${Tables.indexDir(sf)}/corpus_doc_hashes"
    assert(new java.io.File(idxPath, "_SUCCESS").exists(), s"no artifact at $idxPath")
    // full-corpus (doc_id, h) index; the standing-corpus view for this
    // probe excludes the batch slice, mirroring q_dedup_incremental
    val corpusIndex = spark.read.parquet(idxPath)
      .where(col("doc_id") % 10 =!= 7).select("h").distinct()
    // the incoming "crawl" = the batch slice, streamed from a temp dir,
    // plus ONE injected duplicate of a corpus doc under a fresh id (the
    // sf0.001 fixture has no natural cross-side exact duplicate)
    val batch = Tables.t(spark, sf, "documents").where(col("doc_id") % 10 === 7)
      .select("doc_id", "text")
    val dir = Files.createTempDirectory("graft-docstream").toString
    batch.write.mode("overwrite").parquet(dir)
    Tables.t(spark, sf, "documents").where(col("doc_id") % 10 =!= 7)
      .select(lit(999999L).as("doc_id"), col("text")).limit(1)
      .write.mode("append").parquet(dir)
    val stream = spark.readStream.schema(batch.schema).parquet(dir)
    val qy = Streams.dedupAgainstIndex(stream, corpusIndex)
      .writeStream.format("memory").queryName("deltadedup")
      .outputMode("append").option("checkpointLocation", ckpt())
      .trigger(Trigger.AvailableNow()).start()
    qy.awaitTermination(120000)
    val got = spark.table("deltadedup").select("doc_id", "is_novel").collect()
      .map(r => (r.getLong(0), r.getBoolean(1))).toMap
    assert(got.size == batch.count() + 1)
    assert(got(999999L) == false, "injected corpus duplicate not flagged")
    // truth for every streamed doc: novel iff hash absent from the index
    val want = spark.read.parquet(dir)
      .withColumn("h", sha2(lower(trim(col("text"))), 256))
      .join(corpusIndex.withColumn("dup", lit(true)), Seq("h"), "left_outer")
      .select(col("doc_id"), coalesce(col("dup"), lit(false)).as("dup")).collect()
      .map(r => (r.getLong(0), !r.getBoolean(1))).toMap
    assert(got == want)
  }

  test("stream-static substring probe: flags == the batch delta's dup_grams, stream == batch plan") {
    val corpusGrams = graft.operators.LlmPipeline.substrPostings(spark, sf)
      .where(col("doc_id") % 10 =!= 7)
    val batch = Tables.t(spark, sf, "documents").where(col("doc_id") % 10 === 7)
    val dir = Files.createTempDirectory("graft-substream").toString
    batch.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(batch.schema).parquet(dir)
    val qy = Streams.substrDupAgainstIndex(stream, corpusGrams)
      .writeStream.format("memory").queryName("subprobe")
      .outputMode("append").option("checkpointLocation", ckpt())
      .trigger(Trigger.AvailableNow()).start()
    qy.awaitTermination(120000)
    val got = spark.table("subprobe").collect()
      .map(r => (r.getLong(1), r.getInt(3).toLong, r.getString(0), r.getBoolean(4)))
    assert(got.nonEmpty && got.forall(_._1 % 10 == 7))
    // per-doc flagged-window counts == the oracle-checked batch twin
    val flagged = got.filter(_._4).groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val want = SparkEntry.queries("q_dedup_substring_delta")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap // doc_id -> dup_grams
    assert(flagged == want, s"stream flags $flagged vs batch twin $want")
    // row-identical to the same operator run as a plain batch plan
    val wantRows = Streams.substrDupAgainstIndex(spark.read.parquet(dir), corpusGrams)
      .collect().map(r => (r.getLong(1), r.getInt(3).toLong, r.getString(0), r.getBoolean(4)))
    assert(got.sorted.sameElements(wantRows.sorted))
  }

  test("stream-static ANN probe against the persisted LSH index matches the batch formulation") {
    // materialize (or reuse) the disk-backed multi-table LSH index
    val corpusIndex = graft.operators.LlmPipeline.lshMultiBuckets(spark, sf)
      .where(col("vec_id") % 10 =!= 7)
    val corpusVectors = Tables.t(spark, sf, "embeddings")
      .where(col("vec_id") % 10 =!= 7).select("vec_id", "embedding")
    val batch = Tables.t(spark, sf, "embeddings").where(col("vec_id") % 10 === 7)
      .select("vec_id", "embedding")
    val dir = Files.createTempDirectory("graft-vecstream").toString
    batch.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(batch.schema).parquet(dir)
    val qy = Streams.annAgainstIndex(stream, corpusIndex, corpusVectors)
      .writeStream.format("memory").queryName("annprobe")
      .outputMode("append").option("checkpointLocation", ckpt())
      .trigger(Trigger.AvailableNow()).start()
    qy.awaitTermination(120000)
    val got = spark.table("annprobe").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(got.nonEmpty)
    assert(got.forall { case (q, n, _, _) => q % 10 == 7 && n % 10 != 7 })
    // row-identical to the same operator run as a plain batch plan
    val want = Streams.annAgainstIndex(spark.read.parquet(dir), corpusIndex, corpusVectors)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(got.sorted.sameElements(want.sorted))
  }

  test("stream-static semantic dedup via foreachBatch: split-invariant, == batch twin") {
    val isBatch = col("vec_id") % 10 === 7
    val corpus = graft.operators.LlmPipeline.semanticCorpus(spark, sf, !isBatch)
    val batch = Tables.t(spark, sf, "embeddings").where(isBatch)
      .select("vec_id", "embedding")
    // two parquet files + maxFilesPerTrigger=1 ⇒ the ingest arrives in
    // (at least) two micro-batches — the split the invariance claim is about
    val dir = Files.createTempDirectory("graft-semstream").toString
    batch.where(col("vec_id") < 250).coalesce(1).write.mode("overwrite").parquet(dir)
    batch.where(col("vec_id") >= 250).coalesce(1).write.mode("append").parquet(dir)
    val stream = spark.readStream.schema(batch.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Boolean)]
    val batchIds = scala.collection.mutable.Set.empty[Long]
    val qy = Streams.semanticDedupAgainstIndex(spark, sf, stream, corpus) {
        (verdicts, id) =>
          got.synchronized {
            batchIds += id
            got ++= verdicts.collect().map(r =>
              (r.getLong(0), r.getLong(1), r.getBoolean(2)))
          }
      }
      .option("checkpointLocation", ckpt())
      .trigger(Trigger.AvailableNow()).start()
    qy.awaitTermination(120000)
    assert(batchIds.size >= 2, s"expected ≥2 micro-batches, saw $batchIds")
    // union of per-micro-batch verdicts == the oracle-checked batch twin
    val want = SparkEntry.queries("q_dedup_semantic_delta")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(got.sorted == want.sorted.toBuffer,
      s"stream ${got.size} verdicts vs batch twin ${want.length}")
  }

  test("streaming commit sink: micro-batch commits accumulate; replay appends nothing (exactly-once index state)") {
    import spark.implicits._
    // private temp corpus (never the shared sf dir, whose index store is
    // shared with every other spec and the driver's Verify)
    val corpus = Files.createTempDirectory("graft-commitstream").toString
    (0 until 40).map(i =>
        (i.toLong, (0 until 20).map(j => s"sw${i}x$j").mkString(" "), "en"))
      .toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$corpus/documents.parquet")
    // 10 novel docs arriving as two files -> >=2 micro-batches
    val novel = (0 until 10).map(i =>
      (1000L + i, (0 until 20).map(j => s"nv${i}x$j").mkString(" ")))
    val srcDir = Files.createTempDirectory("graft-commitsrc").toString
    novel.take(5).toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(srcDir)
    novel.drop(5).toDF("doc_id", "text").coalesce(1)
      .write.mode("append").parquet(srcDir)
    val schema = novel.take(1).toDF("doc_id", "text").schema
    def run(): Map[Long, Long] = { // batchId -> docs_raw rows committed
      val reports = scala.collection.mutable.Map.empty[Long, Long]
      val qy = Streams.commitDocsSink(spark, corpus,
          spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1").parquet(srcDir)) { (rep, id) =>
          reports.synchronized {
            reports(id) = rep.where(col("family") === "docs_raw")
              .select(sum(col("n_rows"))).collect().head.getAs[Any](0) match {
                case null => 0L
                case n: Long => n
              }
          }
        }
        .option("checkpointLocation", ckpt())
        .trigger(Trigger.AvailableNow()).start()
      qy.awaitTermination(120000)
      reports.toMap
    }
    val first = run()
    assert(first.size >= 2, s"expected >=2 micro-batches, saw $first")
    assert(first.values.sum == 10L, s"committed rows per micro-batch: $first")
    assert(IndexOverlay.read(spark, corpus, "docs_raw").get.count() == 10L)
    // REPLAY from a fresh checkpoint — at-least-once delivery of rows the
    // index already holds. Id-idempotent commit must append NOTHING.
    val replay = run()
    assert(replay.values.sum == 0L, s"replay committed rows: $replay")
    assert(IndexOverlay.read(spark, corpus, "docs_raw").get.count() == 10L,
      "replay grew the raw family")
    // and the committed docs are corpus-side for later ingest probes
    val probe = Seq((2000L, novel.head._2)).toDF("doc_id", "text")
    val v = Ingest.exactDedup(spark, corpus, probe).collect().head
    assert(v.getBoolean(1), s"streamed-committed content not flagged: $v")
  }

  test("streaming upsert sink: changelog applies in order; redelivery and full replay converge (exactly-once state)") {
    import spark.implicits._
    val corpus = Files.createTempDirectory("graft-upsertstream").toString
    (0 until 40).map(i =>
        (i.toLong, (0 until 20).map(j => s"up${i}x$j").mkString(" "), "en"))
      .toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$corpus/documents.parquet")
    val mkText = (tag: String) => (0 until 20).map(j => s"$tag$j").mkString(" ")
    // changelog: trigger 1 upserts corpus doc 5 and inserts 1000 (v1);
    // trigger 2 re-upserts 1000 (v2 — lexically smaller than v1, so the
    // final state is v2 whether the source splits the files into two
    // triggers or collapses them into one batch's min-text winner)
    val srcDir = Files.createTempDirectory("graft-upsertsrc").toString
    Seq((5L, mkText("uc5")), (1000L, mkText("ukb")))
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(srcDir)
    val lastBatch = Seq((1000L, mkText("uka")))
    lastBatch.toDF("doc_id", "text").coalesce(1)
      .write.mode("append").parquet(srcDir)
    val schema = lastBatch.toDF("doc_id", "text").schema
    def visible(): Map[Long, String] =
      graft.operators.LlmPipeline.visibleDocs(spark, corpus).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    def run(): Unit = {
      val qy = Streams.replaceDocsSink(spark, corpus,
          spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1").parquet(srcDir)) { (_, _) => () }
        .option("checkpointLocation", ckpt())
        .trigger(Trigger.AvailableNow()).start()
      qy.awaitTermination(120000)
    }
    run()
    val applied = visible()
    assert(applied(5L) == mkText("uc5") && applied(1000L) == mkText("uka"),
      s"changelog not applied: 5 -> ${applied(5L).take(8)}, 1000 -> ${applied(1000L).take(8)}")
    assert(applied.size == 41, s"40 corpus + 1 insert: ${applied.size}")
    // redelivery of the failed trigger's micro-batch (the actual
    // at-least-once failure mode) finds identical content -> publishes
    // NOTHING
    assert(Ingest.replaceDocs(spark, corpus,
        lastBatch.toDF("doc_id", "text")).isEmpty,
      "redelivered micro-batch must no-op")
    // and a FULL ordered replay from a fresh checkpoint converges to the
    // same final state (it may republish intermediate versions)
    run()
    assert(visible() == applied, "full replay did not converge")
    // old content retired, new served, for the index probes too
    val f = Ingest.exactDedup(spark, corpus, Seq(
        (9000L, mkText("uka")), (9001L, mkText("ukb")))
      .toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(f == Map(9000L -> true, 9001L -> false),
      s"probe view after upsert stream: $f")
  }

  test("changelog resync sink: full replay re-applies deletes in place and converges (no re-insert)", SlowTest) {
    import spark.implicits._
    val corpus = Files.createTempDirectory("graft-resyncstream").toString
    (0 until 40).map(i =>
        (i.toLong, (0 until 20).map(j => s"rs${i}x$j").mkString(" "), "en"))
      .toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$corpus/documents.parquet")
    val mkText = (tag: String) => (0 until 20).map(j => s"$tag$j").mkString(" ")
    // changelog in feed order: insert 1000, upsert corpus doc 5, then
    // DELETE 1000 — one file per entry so each replays as its own
    // micro-batch in order
    val srcDir = Files.createTempDirectory("graft-resyncsrc").toString
    val log = Seq(
      (1000L, mkText("rv1"), "upsert", 1L),
      (5L, mkText("rv5"), "upsert", 2L),
      (1000L, null.asInstanceOf[String], "delete", 3L))
    log.foreach { e =>
      Seq(e).toDF("doc_id", "text", "op", "ord").coalesce(1)
        .write.mode("append").parquet(srcDir)
    }
    val schema = log.take(1).toDF("doc_id", "text", "op", "ord").schema
    def visible(): Map[Long, String] =
      graft.operators.LlmPipeline.visibleDocs(spark, corpus).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    def run(): Unit = {
      val qy = Streams.applyDocsChangelogSink(spark, corpus,
          spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1").parquet(srcDir)) { (_, _) => () }
        .option("checkpointLocation", ckpt())
        .trigger(Trigger.AvailableNow()).start()
      qy.awaitTermination(120000)
    }
    run()
    val applied = visible()
    assert(!applied.contains(1000L) && applied(5L) == mkText("rv5") &&
      applied.size == 40, s"changelog apply: ${applied.size}")
    // FULL from-scratch replay (fresh checkpoint): the delete of 1000 is
    // re-applied in its changelog position, so the state CONVERGES —
    // through the plain commit/replace sinks this same replay would
    // re-insert 1000 (the documented CDC caveat this sink closes)
    run()
    assert(visible() == applied, "full resync replay did not converge")
    // and the whole changelog applied as ONE batch reduces to each id's
    // final op — same converged state on a fresh corpus
    val corpus2 = Files.createTempDirectory("graft-resyncbatch").toString
    (0 until 40).map(i =>
        (i.toLong, (0 until 20).map(j => s"rs${i}x$j").mkString(" "), "en"))
      .toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$corpus2/documents.parquet")
    Ingest.applyDocChangelog(spark, corpus2,
      log.toDF("doc_id", "text", "op", "ord"))
    val batched = graft.operators.LlmPipeline.visibleDocs(spark, corpus2).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(batched == applied, "one-batch apply must equal the streamed state")
    // idempotent: re-applying the same changelog publishes nothing
    assert(Ingest.applyDocChangelog(spark, corpus2,
      log.toDF("doc_id", "text", "op", "ord")).isEmpty)
  }

  test("mapGroupsWithState carries per-user totals across micro-batches") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-state").toString
    def write(rows: Seq[(Long, Long, Long, String, Double, String)]): Unit =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("append").parquet(dir)
    write(Seq((1L, 1000000000L, 7L, "view", 2.0, "{}"),
      (2L, 2000000000L, 7L, "view", 3.0, "{}"),
      (3L, 3000000000L, 8L, "view", 10.0, "{}")))
    val stream = Streams.runningTotals(spark, Streams.readEvents(spark, dir))
    val qy = stream.writeStream.format("memory").queryName("totals")
      .outputMode("update").option("checkpointLocation", ckpt())
      .start()
    qy.processAllAvailable()
    // second batch: user 7 gains one more event — state must accumulate
    write(Seq((4L, 4000000000L, 7L, "view", 5.0, "{}")))
    qy.processAllAvailable()
    qy.stop()
    // update-mode memory sink appends each update; latest row per user wins
    val last = spark.table("totals").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2))))
      .groupBy(_._1).map { case (u, rows) => u -> rows.map(_._2).maxBy(_._1) }
    assert(last(7L) == ((3L, 10.0)), last.toString)
    assert(last(8L) == ((1L, 10.0)), last.toString)
  }

  test("stream-stream interval join matches the batch join on finite input") {
    val qy = Streams.attributed(
        Streams.readEvents(spark, eventsDir), Streams.readEvents(spark, eventsDir))
      .writeStream.format("memory").queryName("attr")
      .outputMode("append").option("checkpointLocation", ckpt())
      .trigger(Trigger.AvailableNow()).start()
    qy.awaitTermination(180000)
    val streamed = spark.table("attr").count()
    val ev = Tables.t(spark, sf, "events")
    val p = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
    val v = ev.where(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
    val batch = p.join(v, col("p_user") === col("v_user") &&
      col("v_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
      col("v_ts") <= col("p_ts")).count()
    assert(batch > 0, "fixture produced no attributable pairs")
    assert(streamed == batch, s"stream $streamed vs batch $batch")
  }

  test("stream-stream interval join: late view dropped, state evicted by two-sided watermark") {
    import spark.implicits._
    // VERDICT r10 item 6: the finite-input test above proves result
    // equivalence; this proves the SCALE property — bounded state. Both
    // join sides carry 30-min watermarks and the condition bounds
    // event-time distance, so (a) input older than the watermark is
    // dropped, (b) buffered rows are EVICTED once the watermark passes
    // their match horizon — numRowsTotal must shrink back, not grow
    // monotonically with input.
    val dir = Files.createTempDirectory("graft-ssjoin").toString
    def write(rows: Seq[(Long, Long, Long, String, Double, String)]): Unit =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("append").parquet(dir)
    val S = 1000000000L // ns per second (events.ts is epoch-nano long)
    // batch 1: matching pair at t≈2000s
    write(Seq((1L, 1000L * S, 7L, "view", 1.0, "{}"),
      (2L, 2000L * S, 7L, "purchase", 1.0, "{}")))
    val qy = Streams.attributed(
        Streams.readEvents(spark, dir), Streams.readEvents(spark, dir))
      .writeStream.format("memory").queryName("ssjoin")
      .outputMode("append").option("checkpointLocation", ckpt())
      .start()
    qy.processAllAvailable()
    assert(spark.table("ssjoin").count() == 1L, "batch-1 pair must join eagerly")
    // batch 2: matching pair ~27h later — advances both watermarks to
    // ~98200s, far past every batch-1 row's match horizon
    write(Seq((3L, 100000L * S, 8L, "view", 1.0, "{}"),
      (4L, 100100L * S, 8L, "purchase", 1.0, "{}")))
    qy.processAllAvailable()
    assert(spark.table("ssjoin").count() == 2L)
    // batch 3: a LATE view inside batch-1's purchase window — watermark
    // says drop it; its potential match's state is gone either way
    write(Seq((5L, 1500L * S, 7L, "view", 1.0, "{}")))
    qy.processAllAvailable()
    assert(spark.table("ssjoin").count() == 2L,
      "late view below the watermark must not produce a join row")
    // batch 4: fresh on-time pair — lets eviction accounting surface
    write(Seq((6L, 110000L * S, 9L, "view", 1.0, "{}"),
      (7L, 110050L * S, 9L, "purchase", 1.0, "{}")))
    qy.processAllAvailable()
    assert(spark.table("ssjoin").count() == 3L)
    val progresses = qy.recentProgress.toSeq
    qy.stop()
    val removed = progresses.flatMap(_.stateOperators.toSeq).map(_.numRowsRemoved).sum
    val droppedLate = progresses.flatMap(_.stateOperators.toSeq)
      .map(_.numRowsDroppedByWatermark).sum
    val finalState = progresses.lastOption.toSeq
      .flatMap(_.stateOperators.toSeq).map(_.numRowsTotal).sum
    assert(removed > 0, "watermark never evicted join state")
    assert(droppedLate > 0, "late view was not dropped by the watermark filter")
    // 7 rows entered; state must have plateaued at the live horizon
    // (batches 2+4 = 4 rows), not accumulated the full history
    assert(finalState <= 4, s"join state grew to $finalState rows — not evicting")
  }

  test("streaming dropDuplicates dedups replayed input across micro-batches") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-dedup").toString
    val rows = Seq((1L, 1000000000L, 7L, "view", 2.0, "{}"),
      (2L, 2000000000L, 7L, "view", 3.0, "{}"),
      (3L, 3000000000L, 8L, "view", 10.0, "{}"))
    def write(): Unit =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("append").parquet(dir)
    write()
    val qy = Streams.dedupedByKey(Streams.readEvents(spark, dir))
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").option("checkpointLocation", ckpt())
      .start()
    qy.processAllAvailable()
    write() // replay the exact same rows: state store must swallow them
    qy.processAllAvailable()
    qy.stop()
    val ids = spark.table("dedup").select("event_id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L), s"got ${ids.toSeq}")
  }

  test("dropDuplicatesWithinWatermark collapses same key at different event times") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-dedup-wm").toString
    def write(rows: Seq[(Long, Long, Long, String, Double, String)]): Unit =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("append").parquet(dir)
    // id=1 arrives twice with ts 1s apart (a retry with a fresh ingest
    // time) — (key, ts) dedup would keep both; within-watermark keeps one
    write(Seq((1L, 1000000000L, 7L, "view", 2.0, "{}"),
      (2L, 5000000000L, 7L, "view", 3.0, "{}")))
    val qy = Streams.dedupedByContent(Streams.readEvents(spark, dir))
      .writeStream.format("memory").queryName("dedup_wm")
      .outputMode("append").option("checkpointLocation", ckpt())
      .start()
    qy.processAllAvailable()
    write(Seq((1L, 2000000000L, 7L, "view", 2.0, "{}"), // dup, ts += 1 s
      (3L, 6000000000L, 8L, "view", 10.0, "{}")))
    qy.processAllAvailable()
    qy.stop()
    val ids = spark.table("dedup_wm").select("event_id").collect()
      .map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L), s"got ${ids.toSeq}")
  }

  test("flatMapGroupsWithState sessionizer closes sessions by gap and by timeout") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-fmgs").toString
    def nanos(h: Int, m: Int): Long =
      (java.time.LocalDateTime.of(2024, 1, 1, h, m)
        .toEpochSecond(java.time.ZoneOffset.UTC)) * 1000000000L
    def write(rows: Seq[(Long, Long, Long, String, Double, String)]): Unit =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("append").parquet(dir)
    // user 7: burst at 10:00–10:10, then 11:30 (> 30-min gap → closes s1)
    write(Seq((1L, nanos(10, 0), 7L, "view", 1.0, "{}"),
      (2L, nanos(10, 10), 7L, "view", 1.0, "{}"),
      (3L, nanos(11, 30), 7L, "view", 1.0, "{}")))
    val qy = Streams.customSessions(spark, Streams.readEvents(spark, dir))
      .writeStream.format("memory").queryName("fmgs")
      .outputMode("append").option("checkpointLocation", ckpt()).start()
    qy.processAllAvailable()
    // far-future event advances the watermark past 12:00+gap → the open
    // 11:30 session must close via EventTimeTimeout, not by a new arrival
    write(Seq((4L, nanos(18, 0), 99L, "view", 1.0, "{}")))
    qy.processAllAvailable()
    qy.stop()
    val sessions = spark.table("fmgs").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .filter(_._1 == 7L).sortBy(_._3)
    def ms(h: Int, m: Int): Long = nanos(h, m) / 1000000L
    assert(sessions.toSeq == Seq(
      (7L, 2, ms(10, 0), ms(10, 10)), // closed by the 11:30 arrival
      (7L, 1, ms(11, 30), ms(11, 30)) // closed by event-time timeout
    ), sessions.toSeq.toString)
  }

  test("restart from checkpoint resumes offsets+state without re-emitting") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-restart").toString
    val sink = Files.createTempDirectory("graft-restart-sink").toString
    val ck = ckpt() // memory sinks can't recover; file sink + same ckpt can
    def nanos(h: Int, m: Int): Long =
      (java.time.LocalDateTime.of(2024, 1, 1, h, m)
        .toEpochSecond(java.time.ZoneOffset.UTC)) * 1000000000L
    def write(rows: Seq[(Long, Long, Long, String, Double, String)]): Unit =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("append").parquet(dir)
    def run(): Unit = {
      val q = Streams.watermarked(Streams.readEvents(spark, dir))
        .writeStream.format("parquet").option("path", sink)
        .outputMode("append").option("checkpointLocation", ck).start()
      q.processAllAvailable(); q.stop()
    }
    // run 1: 10:00 window (2 events) finalized once 12:30 advances the wm
    write(Seq((1L, nanos(10, 0), 1L, "view", 1.0, "{}"),
      (2L, nanos(10, 10), 1L, "view", 1.0, "{}"),
      (3L, nanos(12, 30), 1L, "view", 1.0, "{}")))
    run()
    // data lands while the query is DOWN; the restart must resume from the
    // checkpointed offsets+state: the already-emitted 10:00 window may not
    // be re-emitted, and 13:30 closes the 12:00 window
    write(Seq((4L, nanos(13, 30), 1L, "view", 1.0, "{}")))
    run()
    val out = spark.read.parquet(sink).collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(1))).sorted
    assert(out.count(_._1 == "2024-01-01 10:00:00.0") == 1, out.toSeq.toString)
    assert(out.toSeq.contains(("2024-01-01 12:00:00.0", 1L)), out.toSeq.toString)
  }

  test("transformWithState outlier alerts == batch twin across micro-batch splits") {
    // Genuine Spark-4 StatefulProcessor run on the RocksDB state store
    // (transformWithState requires it). Events are split into two
    // micro-batches at the median event time, so per-user Welford moments
    // MUST survive in state across batches to reproduce the batch twin's
    // prefix-frame scores.
    val dir = Files.createTempDirectory("graft-outlier").toString
    // raw storage form, as the streaming source reads it (ts encoding
    // varies across testdata generations — split on normalized seconds)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sf/events.parquet")
    val tsSec = (raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("timestamp_micros(ts div 1000)")
      case _ => col("ts").cast(org.apache.spark.sql.types.TimestampType)
    }).cast(org.apache.spark.sql.types.DoubleType)
    val cutSec = raw.select(tsSec.as("tsn"))
      .selectExpr("approx_percentile(tsn, 0.5)").head().getDouble(0)
    raw.where(tsSec <= cutSec).coalesce(1).write.mode("append").parquet(dir)
    val prior = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = Streams.outlierAlerts(spark, Streams.readEvents(spark, dir))
      val qy = stream.writeStream.format("memory").queryName("outliers")
        .outputMode("append").option("checkpointLocation", ckpt())
        .start()
      qy.processAllAvailable()
      raw.where(tsSec > cutSec).coalesce(1).write.mode("append").parquet(dir)
      qy.processAllAvailable()
      qy.stop()
      val got = spark.table("outliers").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet
      val want = SparkEntry.queries("q_stream_outliers")(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet
      assert(got == want,
        s"streaming-only: ${(got -- want).take(5)}; batch-only: ${(want -- got).take(5)}")
      assert(want.nonEmpty, "twin produced no alerts — threshold too high for fixture")
    } finally {
      prior match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("watermark drops late rows in append mode") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-late").toString
    def nanos(h: Int, m: Int): Long =
      (java.time.LocalDateTime.of(2024, 1, 1, h, m)
        .toEpochSecond(java.time.ZoneOffset.UTC)) * 1000000000L
    def write(rows: Seq[(Long, Long, Long, String, Double, String)]): Unit =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("append").parquet(dir)

    // batch 1: two 10:xx events + one 12:30 event (advances watermark to 12:20)
    write(Seq((1L, nanos(10, 0), 1L, "view", 1.0, "{}"),
      (2L, nanos(10, 10), 1L, "view", 1.0, "{}"),
      (3L, nanos(12, 30), 1L, "view", 1.0, "{}")))

    val stream = Streams.watermarked(Streams.readEvents(spark, dir))
    val qy = stream.writeStream.format("memory").queryName("wm")
      .outputMode("append").option("checkpointLocation", ckpt())
      .start()
    qy.processAllAvailable()

    // batch 2: a late 10:05 event (before wm 12:20 → dropped) and an
    // on-time 12:40; then one more batch to advance wm past 11:00.
    write(Seq((4L, nanos(10, 5), 1L, "view", 1.0, "{}"),
      (5L, nanos(12, 40), 1L, "view", 1.0, "{}")))
    qy.processAllAvailable()
    write(Seq((6L, nanos(13, 30), 1L, "view", 1.0, "{}")))
    qy.processAllAvailable()
    qy.stop()

    val out = spark.table("wm").collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(1))).toMap
    // the 10:00 window was finalized with 2 events — the late 10:05 row
    // must NOT have been counted
    assert(out.get("2024-01-01 10:00:00.0").contains(2L), s"got $out")
  }
}
