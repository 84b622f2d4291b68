package graft

import graft.sources.Sinks
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Sinks: partitioned layout, partition pruning, dynamic overwrite, CSV. */
class SinkSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.SF

  test("partitioned write prunes partitions on read (PartitionFilters)") {
    val dir = Files.createTempDirectory("graft-store").toString
    val li = Tables.t(spark, sf, "lineitem")
      .withColumn("rf", col("l_returnflag"))
    Sinks.writePartitioned(li, dir, Seq("rf"))
    val back = Sinks.readPartitioned(spark, dir).where(col("rf") === "A")
    back.collect()
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(rf"), plan)
    assert(back.count() ==
      Tables.t(spark, sf, "lineitem").where(col("l_returnflag") === "A").count())
  }

  test("dynamic partition overwrite replaces only incoming partitions") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-dyn").toString
    Sinks.writePartitioned(
      Seq((1, "a"), (2, "b"), (3, "c")).toDF("v", "k"), dir, Seq("k"))
    // new batch touches only partition k=b — a and c must survive
    Sinks.overwritePartitions(Seq((20, "b")).toDF("v", "k"), dir, Seq("k"))
    val rows = Sinks.readPartitioned(spark, dir).orderBy("k")
      .collect().map(r => (r.getAs[Int]("v"), r.getAs[String]("k"))).toList
    assert(rows == List((1, "a"), (20, "b"), (3, "c")), rows.toString)
  }

  test("publishAtomic: concurrent writers publish one complete store, no debris") {
    val base = Files.createTempDirectory("graft-atomic").toString + "/store"
    val nation = Tables.t(spark, sf, "nation")
    val expected = nation.count()
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 4).map { _ =>
      new Thread(() => {
        try Sinks.publishAtomic(base)(tmp => nation.write.parquet(tmp))
        catch { case t: Throwable => errors.add(t) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errors.isEmpty, s"concurrent publish threw: ${errors.peek()}")
    assert(new java.io.File(base, "_SUCCESS").exists(), "no _SUCCESS marker")
    assert(spark.read.parquet(base).count() == expected)
    // losers cleaned up their temp siblings (the publish lock file is the
    // one legitimate survivor)
    val siblings = new java.io.File(base).getParentFile.listFiles.map(_.getName)
      .filterNot(_ == "store.lock")
    assert(siblings.toSeq == Seq("store"), s"temp debris left behind: ${siblings.mkString(",")}")
    // a second call with a marker present must be a no-op (write not invoked)
    Sinks.publishAtomic(base)(_ => fail("write invoked despite _SUCCESS marker"))
  }

  test("index artifacts persist to parquet and survive memo eviction byte-identically") {
    // builds (or reuses) the minhash signature + corpus-hash artifacts
    val first = SparkEntry.queries("q_dedup_minhash")(spark, sf)
      .collect().map(_.toString).toSeq
    val inc1 = SparkEntry.queries("q_dedup_incremental")(spark, sf)
      .collect().map(_.toString).toSeq
    val idx = new java.io.File(Tables.indexDir(sf))
    assert(idx.isDirectory, s"no index dir at $idx")
    // publish lock files are legitimate non-store siblings
    val stages = idx.listFiles.filter(_.isDirectory).map(_.getName).toSeq
    assert(stages.exists(_.startsWith("minhash_sigs")), stages.mkString(","))
    assert(stages.exists(_.startsWith("corpus_doc_hashes")), stages.mkString(","))
    stages.foreach { st =>
      assert(new java.io.File(idx, s"$st/_SUCCESS").exists(),
        s"artifact $st published without _SUCCESS marker")
    }
    // cold session emulation: drop every in-JVM memo entry (and its cached
    // blocks); the queries must reload the parquet artifacts and reproduce
    // byte-identical results
    Tables.evictMemoized(spark)
    val again = SparkEntry.queries("q_dedup_minhash")(spark, sf)
      .collect().map(_.toString).toSeq
    assert(again == first, "minhash dedup diverged after artifact reload")
    val inc2 = SparkEntry.queries("q_dedup_incremental")(spark, sf)
      .collect().map(_.toString).toSeq
    assert(inc2 == inc1, "incremental dedup diverged after artifact reload")
  }

  test("memo stage keys are owned by one call site: cross-pack collision throws") {
    def owner() = Tables.memoized(spark, sf, "spec_guard_stage")(Tables.t(spark, sf, "nation"))
    assert(owner().count() == owner().count()) // same site twice: fine
    val ex = intercept[IllegalArgumentException] {
      // different call site reusing the stage name — would silently read
      // the owner's cached table without the guard
      Tables.memoized(spark, sf, "spec_guard_stage")(Tables.t(spark, sf, "region"))
    }
    assert(ex.getMessage.contains("owned by"), ex.getMessage)
  }

  test("csv export round-trips") {
    val dir = Files.createTempDirectory("graft-csv").toString
    val agg = SparkEntry.queries("q_agg_hash")(spark, sf)
    Sinks.writeCsv(agg, dir)
    val back = spark.read.option("header", "true").csv(dir)
    assert(back.count() == agg.count())
    assert(back.columns.sameElements(agg.columns))
  }

  test("json and orc sources round-trip with schema intact") {
    val docs = Tables.t(spark, sf, "documents")
      .select("doc_id", "lang", "source", "n_chars")
    val jsonDir = Files.createTempDirectory("graft-json").toString + "/d"
    val orcDir = Files.createTempDirectory("graft-orc").toString + "/d"
    docs.write.json(jsonDir)
    docs.write.orc(orcDir)
    // ORC is schema-full; JSON needs the schema supplied to avoid a
    // sampling pass and long-vs-double inference drift
    val backJson = spark.read.schema(docs.schema).json(jsonDir)
    val backOrc = spark.read.orc(orcDir)
    assert(backJson.schema == docs.schema)
    assert(backOrc.schema == docs.schema)
    val want = docs.orderBy("doc_id").collect().toSeq
    assert(backJson.orderBy("doc_id").collect().toSeq == want)
    assert(backOrc.orderBy("doc_id").collect().toSeq == want)
  }

  test("bucketed tables join with zero shuffle (co-located SMJ)") {
    import org.apache.spark.sql.functions.sum
    // the in-memory catalog is per-JVM: orphaned table dirs from a prior
    // run block CREATE TABLE AS at the same location
    Seq("b_lineitem", "b_orders").foreach { tbl =>
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      val dir = new java.io.File(s"/tmp/graft-warehouse/$tbl")
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(dir)
      }
    }
    Sinks.writeBucketed(Tables.t(spark, sf, "lineitem")
      .select("l_orderkey", "l_quantity"), "b_lineitem", "l_orderkey", 8)
    Sinks.writeBucketed(Tables.t(spark, sf, "orders")
      .select("o_orderkey", "o_orderstatus"), "b_orders", "o_orderkey", 8)
    // hint("merge") pins SMJ (the session's broadcast threshold would
    // otherwise grab this small test table); with matching bucket layouts
    // the SMJ needs no exchange on either side
    val j = spark.table("b_lineitem").hint("merge")
      .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(sum("l_quantity"))
    j.collect()
    val plan = j.queryExecution.executedPlan.toString
    // the join itself must not exchange either side (bucket layout serves
    // as the partitioning); only the final groupBy may shuffle
    val joinPart = plan.substring(plan.indexOf("SortMergeJoin"))
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!joinPart.contains("Exchange hashpartitioning(l_orderkey") &&
      !joinPart.contains("Exchange hashpartitioning(o_orderkey"), joinPart)
    assert(plan.contains("SelectedBucketsCount"), plan)
  }

  test("range-clustered layout: disjoint file ranges, scan skips row groups") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val li = Tables.t(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
    val clustered = Files.createTempDirectory("graft-clustered").toString
    val unclustered = Files.createTempDirectory("graft-unclustered").toString
    Sinks.writeClustered(li, clustered, "l_orderkey", 8)
    // same data, same file count, key order destroyed — the skipping foil
    li.repartition(8, col("l_quantity")).write
      .mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(unclustered)

    // footers: every file owns a disjoint l_orderkey interval
    val ranges = Sinks.clusteredRanges(spark, clustered, "l_orderkey")
      .map { case (a, b) =>
        (a.asInstanceOf[java.lang.Long].longValue, b.asInstanceOf[java.lang.Long].longValue) }
      .sortBy(_._1)
    assert(ranges.size == 8, ranges.toString)
    ranges.sliding(2).foreach {
      case Seq((_, hiA), (loB, _)) => assert(hiA < loB, ranges.toString)
      case _ => ()
    }

    // a narrow key-range scan must emit far fewer rows from the clustered
    // layout (row groups outside the range are skipped on footer stats;
    // the unclustered foil has every-file ranges spanning the whole key
    // space, so nothing skips and the filter does all the work post-scan)
    val (lo, hi) = (ranges(3)._1, ranges(3)._2)
    def scanRows(dir: String): Long = {
      val df = spark.read.parquet(dir)
        .where(col("l_orderkey").between(lo, (lo + hi) / 2))
      df.collect()
      val scan = df.queryExecution.executedPlan
        .collectFirst { case s: FileSourceScanExec => s }.get
      scan.metrics("numOutputRows").value
    }
    val (cRows, uRows) = (scanRows(clustered), scanRows(unclustered))
    assert(cRows * 4 <= uRows,
      s"clustered scan emitted $cRows rows vs unclustered $uRows — no skipping")
  }

  test("jdbc sink: round-trip, idempotent re-run, disjoint batches accumulate") {
    val url = s"jdbc:derby:/tmp/graft-derby/${System.nanoTime()};create=true"
    val orders = Tables.t(spark, sf, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val batch1 = orders.where(col("o_orderkey") <= 500)
    val batch2 = orders.where(col("o_orderkey") > 500 && col("o_orderkey") <= 1000)
    val n1 = batch1.count(); val n2 = batch2.count()
    assert(n1 > 0 && n2 > 0)
    Sinks.overwriteJdbcRange(batch1, url, "results", "o_orderkey")
    assert(Sinks.readJdbc(spark, url, "results").count() == n1)
    // overlap re-run: same batch again must replace, not duplicate
    Sinks.overwriteJdbcRange(batch1, url, "results", "o_orderkey")
    assert(Sinks.readJdbc(spark, url, "results").count() == n1)
    // disjoint batch accumulates
    Sinks.overwriteJdbcRange(batch2, url, "results", "o_orderkey")
    val back = Sinks.readJdbc(spark, url, "results")
    assert(back.count() == n1 + n2)
    // values survive the round trip
    val want = batch1.unionByName(batch2).orderBy("o_orderkey", "o_custkey")
      .collect().map(_.toString).toSeq
    assert(back.orderBy("o_orderkey", "o_custkey")
      .collect().map(_.toString).toSeq == want)
  }

  test("idempotent writeback pipeline: cdc_merge + scd2 through the upsert, re-run == no-op") {
    // VERDICT r10 item 8 — the SNOWAV delete-overlap analog at production
    // shape: a nightly load derives the CDC latest-state table and the
    // SCD2 dimension from the same event/order history and upserts both
    // into the store. The whole pipeline must be RE-RUNNABLE: a failed
    // orchestrator retry replays it end-to-end, and the store must land
    // byte-identical — no duplicates, no drift.
    val url = s"jdbc:derby:/tmp/graft-derby/pipe${System.nanoTime()};create=true"
    def snapshot(table: String): Seq[String] =
      Sinks.readJdbc(spark, url, table).collect().map(_.toString).toSeq.sorted
    def runPipeline(): Unit = {
      val state = SparkEntry.queries("q_cdc_merge")(spark, sf)
      Sinks.overwriteJdbcRange(state, url, "user_state", "user_id")
      val dim = SparkEntry.queries("q_scd2")(spark, sf)
        // Derby has no BOOLEAN-from-Spark mapping issue, but valid_to is
        // nullable DATE and is_current BOOLEAN — exercise both through
        // the store
        .select(col("o_custkey"), col("island"), col("o_orderstatus"),
          col("valid_from"), col("valid_to"), col("n_orders"), col("is_current"))
      Sinks.overwriteJdbcRange(dim, url, "customer_scd2", "o_custkey")
    }
    runPipeline()
    val state1 = snapshot("user_state"); val dim1 = snapshot("customer_scd2")
    assert(state1.nonEmpty && dim1.nonEmpty)
    runPipeline() // orchestrator retry: full replay
    assert(snapshot("user_state") == state1, "cdc state drifted on re-run")
    assert(snapshot("customer_scd2") == dim1, "scd2 dim drifted on re-run")
    // partial replay (one key sub-range) must also land identically —
    // the delete-overlap replaces exactly its own span
    val half = SparkEntry.queries("q_cdc_merge")(spark, sf)
      .where(col("user_id") <= 50)
    if (half.count() > 0) {
      Sinks.overwriteJdbcRange(half, url, "user_state", "user_id")
      assert(snapshot("user_state") == state1, "partial replay drifted the store")
    }
  }

  test("compaction shrinks file count, preserves rows (flat and partitioned)") {
    def parquetFiles(dir: String): Seq[java.io.File] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
        else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
      walk(new java.io.File(dir))
    }
    val li = Tables.t(spark, sf, "lineitem").select("l_orderkey", "l_quantity", "l_returnflag")
    val want = li.count()
    // flat store: 16-file debris → 1 file
    val flat = Files.createTempDirectory("graft-compact").toString + "/flat"
    li.repartition(16).write.parquet(flat)
    assert(parquetFiles(flat).size == 16)
    Sinks.compact(spark, flat)
    assert(parquetFiles(flat).size == 1)
    assert(spark.read.parquet(flat).count() == want)
    // partitioned store: 16 files per partition dir → 1 per dir
    val part = Files.createTempDirectory("graft-compact").toString + "/part"
    li.repartition(16).write.partitionBy("l_returnflag").parquet(part)
    assert(parquetFiles(part).size > 3)
    Sinks.compact(spark, part, Seq("l_returnflag"))
    val byDir = parquetFiles(part).groupBy(_.getParentFile.getName)
    assert(byDir.size == 3 && byDir.values.forall(_.size == 1), byDir.toString)
    assert(spark.read.parquet(part).count() == want)
  }

  test("cosine_sim is callable from SQL via GraftExtensions") {
    val r = spark.sql(
      "SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
        "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c").head().getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }

  test("cosine_sim: NULL on length mismatch and zero-norm, never a wrong value") {
    def one(sql: String) = spark.sql(s"SELECT $sql AS c").head()
    // mismatched lengths: must NOT silently truncate to the shorter prefix
    assert(one("cosine_sim(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
      "array(CAST(1.0 AS FLOAT)))").isNullAt(0))
    // zero-norm side: must NOT return NaN/Infinity
    assert(one("cosine_sim(array(CAST(0.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
      "array(CAST(1.0 AS FLOAT), CAST(1.0 AS FLOAT)))").isNullAt(0))
    // null input propagates
    assert(one("cosine_sim(CAST(NULL AS ARRAY<FLOAT>), " +
      "array(CAST(1.0 AS FLOAT)))").isNullAt(0))
    // interpreted path (no codegen) agrees with the codegen path
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types._
    val at = ArrayType(FloatType)
    def lit(xs: Float*) = Literal.create(ArrayData.toArrayData(xs.toArray), at)
    val e = org.apache.spark.sql.graftx.CosineSimilarityExpr(
      lit(1.0f, 2.0f), lit(1.0f))
    assert(e.eval(null) == null)
    val z = org.apache.spark.sql.graftx.CosineSimilarityExpr(
      lit(0.0f, 0.0f), lit(1.0f, 1.0f))
    assert(z.eval(null) == null)
  }

  test("cosine_sim / int_dot: a NULL array ELEMENT yields NULL, not a 0-term score") {
    def one(sql: String) = spark.sql(s"SELECT $sql AS c").head()
    // codegen path
    assert(one("cosine_sim(array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)), " +
      "array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)))").isNullAt(0))
    assert(one("int_dot(array(CAST(1 AS BIGINT), CAST(NULL AS BIGINT)), " +
      "array(CAST(5 AS BIGINT), CAST(7 AS BIGINT)))").isNullAt(0))
    // a clean pair still scores
    assert(one("int_dot(array(CAST(2 AS BIGINT), CAST(3 AS BIGINT)), " +
      "array(CAST(5 AS BIGINT), CAST(7 AS BIGINT)))").getLong(0) == 31L)
    // interpreted path agrees
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types._
    val withNullF = Literal.create(
      new GenericArrayData(Array[Any](1.0f, null)), ArrayType(FloatType))
    val cleanF = Literal.create(
      new GenericArrayData(Array[Any](1.0f, 2.0f)), ArrayType(FloatType))
    assert(org.apache.spark.sql.graftx.CosineSimilarityExpr(withNullF, cleanF)
      .eval(null) == null)
    val withNullL = Literal.create(
      new GenericArrayData(Array[Any](1L, null)), ArrayType(LongType))
    val cleanL = Literal.create(
      new GenericArrayData(Array[Any](5L, 7L)), ArrayType(LongType))
    assert(org.apache.spark.sql.graftx.IntDotProductExpr(withNullL, cleanL)
      .eval(null) == null)
  }

  test("z-ordered write bounds BOTH dims per file; single-key sort does not") {
    import org.apache.spark.sql.types.DoubleType
    // the one grid contract: the same normalization the layout query and
    // the writeZOrdered caller use
    val graded = graft.operators.Layout.gridNormalized(
      Tables.t(spark, sf, "orders"), "o_orderkey", "o_custkey", "o_totalprice")

    def spanSums(dir: String): (Double, Double) = {
      // per-file envelopes from the actual written files — what parquet
      // footer stats would give a skipping reader
      val perFile = spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg((max("xg") - min("xg")).as("xspan"), (max("yg") - min("yg")).as("yspan"))
        .agg(sum("xspan").cast(DoubleType), sum("yspan").cast(DoubleType))
        .head()
      (perFile.getDouble(0), perFile.getDouble(1))
    }

    val zDir = Files.createTempDirectory("graft-zorder").toString
    Sinks.writeZOrdered(graded, col("xg"), col("yg"), zDir, numFiles = 16)
    val linDir = Files.createTempDirectory("graft-linear").toString
    graded.repartitionByRange(16, col("xg")).sortWithinPartitions(col("xg"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(linDir)

    val (zx, zy) = spanSums(zDir)
    val (lx, ly) = spanSums(linDir)
    // linear: x tight, y spans ~the whole domain per file. z-order with 16
    // files gives 2 z-bits to each dim → each file ideally bounds y to 1/4
    // of the domain (observed ~1.2× ideal from ragged cell boundaries);
    // assert within 4/3 of that ideal, i.e. 3× tighter than linear.
    assert(zy < ly / 3, s"z-order y-envelopes not tighter: z=$zy linear=$ly")
    assert(zx + zy < lx + ly,
      s"z-order total envelope not tighter: z=${zx + zy} linear=${lx + ly}")
    // and the write round-trips the rows intact
    assert(spark.read.parquet(zDir).count() ==
      Tables.t(spark, sf, "orders").count())
  }

  // ---- non-local publish protocol (VERDICT r19 tasks 4+5): the same
  // publishAtomic races, on a FileSystem whose scheme disables the OS
  // file lock — rename-as-commit must carry them ----

  private def dfsBase(tag: String): String =
    s"testdfs:${Files.createTempDirectory(s"graft-$tag").toString}"

  test("publishAtomic on a non-local scheme: rename-as-commit publishes and replays are no-ops") {
    import graft.sources.Store
    val p = s"${dfsBase("dfs")}/art"
    assert(!Store.isLocal(p), "testdfs must be non-local")
    Sinks.publishAtomic(p) { tmp =>
      Store.mkdirs(tmp)
      Store.writeUtf8(s"$tmp/owner.txt", "first")
      Store.touch(s"$tmp/_SUCCESS")
    }
    assert(Store.readUtf8(s"$p/owner.txt").contains("first"))
    // replay: marker present, the write body must not run again
    var ran = false
    Sinks.publishAtomic(p) { _ => ran = true }
    assert(!ran && Store.readUtf8(s"$p/owner.txt").contains("first"))
  }

  test("non-local publish: crashed-writer debris is recovered (delete only after a failed rename)") {
    import graft.sources.Store
    val p = s"${dfsBase("dbr")}/art"
    Store.mkdirs(s"$p/partial") // marker-LESS target: a crashed writer
    Sinks.publishAtomic(p) { tmp =>
      Store.mkdirs(tmp)
      Store.writeUtf8(s"$tmp/owner.txt", "recovered")
      Store.touch(s"$tmp/_SUCCESS")
    }
    assert(Store.exists(s"$p/_SUCCESS") &&
      Store.readUtf8(s"$p/owner.txt").contains("recovered"))
    assert(!Store.exists(s"$p/partial"), "debris must be replaced, not merged")
  }

  test("non-local publish: a winner publishing between debris check and delete SURVIVES (marker re-check)") {
    import graft.sources.Store
    val p = s"${dfsBase("rce")}/art"
    // a marker-less target forces the loser down the debris branch...
    Store.mkdirs(s"$p/partial")
    // ...and the seam fakes the exact ADVICE r19 interleaving: the winner
    // publishes AFTER the loser's first marker check (absent → debris)
    // and BEFORE its delete. The pre-fix order (check → delete → rename)
    // deleted this winner's live store.
    var fired = false
    Sinks.nonLocalRaceHook = _ => if (!fired) {
      fired = true
      Store.delete(p)
      Store.mkdirs(p)
      Store.writeUtf8(s"$p/owner.txt", "winner")
      Store.touch(s"$p/_SUCCESS")
    }
    try Sinks.publishAtomic(p) { tmp =>
      Store.mkdirs(tmp)
      Store.writeUtf8(s"$tmp/owner.txt", "loser")
      Store.touch(s"$tmp/_SUCCESS")
    } finally Sinks.nonLocalRaceHook = _ => ()
    assert(fired, "the interleaving seam must have run")
    assert(Store.readUtf8(s"$p/owner.txt").contains("winner"),
      "the racing winner's published store was destroyed by the loser")
    assert(Store.exists(s"$p/_SUCCESS"))
  }

  test("non-local publish: concurrent racers to one path — exactly one wins, no store vanishes") {
    import graft.sources.Store
    val p = s"${dfsBase("ccr")}/art"
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val rs = (0 until 4).map { i =>
      Future {
        Sinks.publishAtomic(p) { tmp =>
          Store.mkdirs(tmp)
          Store.writeUtf8(s"$tmp/owner.txt", s"writer$i")
          Store.touch(s"$tmp/_SUCCESS")
        }
      }
    }
    Await.result(Future.sequence(rs), 2.minutes)
    assert(Store.exists(s"$p/_SUCCESS"), "a complete store must stand")
    val owner = Store.readUtf8(s"$p/owner.txt")
    assert(owner.exists(_.startsWith("writer")), s"owner: $owner")
    // no temp debris left behind
    val parent = new org.apache.hadoop.fs.Path(p).getParent.toString
    assert(!Store.list(parent).exists(_.name.contains(".tmp.")),
      Store.list(parent).map(_.name).mkString(","))
  }
}
