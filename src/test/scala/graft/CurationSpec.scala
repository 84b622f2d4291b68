package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cross-query invariants for the curation additions the oracle can't see:
  * canonical selection consistency with the cluster/quality queries, and
  * split determinism/totals. */
class CurationSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.SF
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_dedup_canonical picks the max-quality member of each cluster") {
    val clusters = q("q_dedup_cluster").collect()
      .map(r => (r.getLong(0), r.getLong(1))) // (doc_id, cluster_id)
    val byCluster = clusters.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val quality = q("q_text_quality").collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("quality")).toMap
    val canon = q("q_dedup_canonical").collect()
    assert(canon.map(_.getLong(0)).toSet == byCluster.keySet, "one row per cluster")
    canon.foreach { r =>
      val (cid, doc, qual, n) = (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))
      val members = byCluster(cid)
      assert(members.contains(doc), s"canonical $doc not in cluster $cid")
      assert(n == members.size)
      val best = members.map(quality).max
      assert(qual == best, s"cluster $cid: picked $qual, best member has $best")
      // deterministic tie-break: among max-quality members, min doc_id
      assert(doc == members.filter(m => quality(m) == best).min)
    }
  }

  test("connectedComponents labels a diameter-60 path graph correctly") {
    // A path 0–1–2–…–60 has diameter 60: the pre-round-9 min-label loop
    // (hard cap 25 iterations, silent exit) mislabeled it; star contraction
    // must converge in O(log n) rounds and label every node 0.
    import spark.implicits._
    val path = (0L until 60L).map(i => (i, i + 1)).toDF("src", "dst")
    val labels = graft.operators.Curation.connectedComponents(path)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == 61)
    assert(labels.values.forall(_ == 0L), s"non-zero labels: ${labels.filter(_._2 != 0L)}")
    // two components + an out-of-order orientation: labels stay per-component
    val two = Seq((5L, 3L), (3L, 1L), (10L, 12L), (12L, 14L), (14L, 10L))
      .toDF("src", "dst")
    val l2 = graft.operators.Curation.connectedComponents(two)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(l2 == Map(1L -> 1L, 3L -> 1L, 5L -> 1L,
      10L -> 10L, 12L -> 10L, 14L -> 10L))
  }

  test("q_dedup_canonical rank-1 filter is rewritten to the TopKPerKey plan") {
    val df = q("q_dedup_canonical")
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(p.contains("TopKPerKeyFinal"), p)
  }

  test("materializeCorpus: deduped, quality-floored, split-partitioned, clustered") {
    import java.nio.file.Files
    val out = Files.createTempDirectory("graft-corpus").toString + "/curated"
    graft.operators.Curation.materializeCorpus(spark, sf, out, minQuality = 0.3)
    val curated = spark.read.parquet(out)
    // no duplicate content survives, and the keeper is the min doc_id
    val dupGroups = curated
      .groupBy(sha2(lower(trim(col("text"))), 256)).count().where(col("count") > 1)
    assert(dupGroups.count() == 0, "curated corpus must be exact-dup free")
    assert(curated.where(col("quality") < 0.3).count() == 0)
    // split labels are the deterministic md5 buckets (byte-identical rerun);
    // snapshot rows BEFORE the overwrite replaces the files under the scan
    val firstRows = curated.orderBy("doc_id").collect().map(_.toString).toSeq
    graft.operators.Curation.materializeCorpus(spark, sf, out, minQuality = 0.3)
    val again = spark.read.parquet(out)
    assert(firstRows == again.orderBy("doc_id").collect().map(_.toString).toSeq)
    // reading one split prunes partitions at the scan
    val train = spark.read.parquet(out).where(col("split") === "train")
    train.collect()
    val scan = train.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(split"), scan)
    // doc_id footer ranges are disjoint within the train split (clustered)
    val ranges = graft.sources.Sinks
      .clusteredRanges(spark, s"$out/split=train", "doc_id")
      .map { case (lo, hi) => (lo.toString.toLong, hi.toString.toLong) }
      .sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi1), (lo2, _)) => assert(hi1 < lo2, s"overlap: $ranges")
      case _ =>
    }
  }

  test("q_corpus_report totals agree with the per-query families") {
    val report = q("q_corpus_report").collect()
    val total = Tables.t(spark, sf, "documents").count()
    assert(report.map(_.getLong(2)).sum == total)
    // per-stratum dup counts can never exceed the global dup count (a
    // group spanning strata loses one dup per extra stratum)
    val dupTotal = q("q_dedup_exact").collect().map(_.getLong(2) - 1).sum
    assert(report.map(_.getLong(4)).sum <= dupTotal)
    report.foreach { r =>
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0)
      assert(r.getLong(4) >= 0 && r.getLong(4) < r.getLong(2))
    }
  }

  test("q_split_train partitions every doc exactly once, deterministically") {
    val total = Tables.t(spark, sf, "documents").count()
    val rows = q("q_split_train").collect()
    assert(rows.map(_.getLong(2)).sum == total, "splits must cover all docs")
    assert(rows.map(_.getString(0)).toSet.subsetOf(Set("train", "val", "test")))
    // determinism: a second independent evaluation is byte-identical
    val again = q("q_split_train").collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
    // the hash split should land near 90/5/5 at corpus scale (loose at sf0.001)
    val frac = rows.filter(_.getString(0) == "train").map(_.getLong(2)).sum.toDouble / total
    assert(frac > 0.75 && frac < 1.0, s"train fraction $frac")
  }

  test("q_quality_budget: bins cover the corpus, cumulatives are top-down running totals") {
    val rows = q("q_quality_budget").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty && rows.map(_._1).distinct.length == rows.length)
    assert(rows.map(_._2).sum == Tables.t(spark, sf, "documents").count())
    // the lowest bin's cumulative sees everything; each cumulative equals
    // the suffix sum of the bins at-or-above it (rows come back bin-ASC)
    val sorted = rows.sortBy(_._1)
    sorted.zipWithIndex.foreach { case ((_, _, _, cd, ct), i) =>
      assert(cd == sorted.drop(i).map(_._2).sum)
      assert(ct == sorted.drop(i).map(_._3).sum)
    }
  }

  test("q_sample_weighted: exact top-K by the ES key (plain-Scala reference), zero shuffles") {
    val df = q("q_sample_weighted")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange"), s"weighted sampling must not shuffle:\n$p")

    // independent reference: same formula from raw bytes up (MessageDigest
    // md5 ↔ Spark md5; BigDecimal two-step half-up ↔ Tables.r4)
    def esKey(docId: Long, nChars: Long): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(docId.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      val b = java.lang.Long.parseLong(hex, 16) % 1000000
      val raw = math.log((b + 0.5) / 1000000.0) * 1000000.0 / nChars
      BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val corpus = Tables.t(spark, sf, "documents")
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1))).filter(_._2 > 0)
    val expect = corpus.map { case (id, n) => (id, esKey(id, n)) }
      .sortBy { case (id, k) => (-k, id) }.take(200).toSeq
    val got = df.collect().map(r => (r.getLong(0), r.getDouble(3))).toSeq
    assert(got == expect)
    // weighting works: long docs are overrepresented vs a uniform draw
    val meanAll = corpus.map(_._2).sum.toDouble / corpus.length
    val meanSampled = got.map(x => corpus.toMap.apply(x._1)).sum.toDouble / got.length
    assert(meanSampled > meanAll,
      s"length-weighted sample mean $meanSampled !> corpus mean $meanAll")
  }
}
