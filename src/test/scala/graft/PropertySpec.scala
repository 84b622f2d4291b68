package graft

import graft.operators.Scalars
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Algebraic properties (SURVEY.md §6.3). Raw scalacheck generators with a
  * fixed seed (no scalatestplus bridge in the offline cache) feed
  * whole-query invariants and expression-vs-reference checks. */
class PropertySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.SF
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  /** Deterministic sample stream from a Gen. */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("chunking reconstructs random ASCII docs of any length (incl. edge sizes)") {
    import spark.implicits._
    import java.nio.file.Files
    val gen = for {
      // edge sizes around the 150-stride/200-window boundaries
      n <- Gen.oneOf(Gen.choose(1, 500), Gen.oneOf(1, 149, 150, 151, 199, 200, 201, 300, 350))
      s <- Gen.listOfN(n, Gen.choose(32.toChar, 126.toChar)).map(_.mkString)
    } yield s
    val texts = samples(gen, 60).zipWithIndex
      .map { case (s, i) => (i.toLong, s, "en", "s", s.length.toLong) }
    val dir = Files.createTempDirectory("graft-chunk-prop").toString
    texts.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val byDoc = SparkEntry.queries("q_text_chunk")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(3)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
    texts.foreach { case (id, text, _, _, _) =>
      val chunks = byDoc(id)
      assert(chunks.length == math.max(math.ceil(text.length / 150.0).toInt, 1), s"doc $id")
      // stride-prefix concatenation + last chunk == original text
      val rebuilt = chunks.init.map(_.take(150)).mkString + chunks.last
      assert(rebuilt == text, s"doc $id not reconstructed")
      // consecutive chunks agree on their 50-char overlap
      chunks.toSeq.sliding(2).zipWithIndex.foreach {
        case (Seq(a, b), i) =>
          val overlap = math.min(a.length - 150, b.length)
          if (overlap > 0) assert(a.drop(150).take(overlap) == b.take(overlap), s"doc $id chunk $i overlap")
        case _ =>
      }
    }
  }

  test("binnedRangeJoin == BNLJ interval join on randomized intervals and widths") {
    import spark.implicits._
    val igen = for {
      lo <- Gen.choose(-50.0, 50.0)
      len <- Gen.choose(0.0, 30.0)
    } yield (lo, lo + len)
    val intervals = samples(igen, 40).zipWithIndex
      .map { case ((lo, hi), i) => (i, lo, hi) }.toDF("band_id", "lo", "hi")
    val facts = samples(Gen.choose(-60.0, 60.0), 500).toDF("v")
    val plain = facts.join(intervals, col("lo") <= col("v") && col("v") < col("hi"))
      .select("band_id", "v").collect().map(_.toString).sorted
    for (w <- Seq(0.7, 5.0, 33.3)) {
      val binned = graft.operators.Skew
        .binnedRangeJoin(facts, col("v"), intervals, col("lo"), col("hi"), w)
        .select("band_id", "v").collect().map(_.toString).sorted
      assert(binned.sameElements(plain), s"width $w: ${binned.length} vs ${plain.length}")
    }
  }

  test("approx histogram: bounds interleave exact bounds (≤1-bin-shift) and depths stay equi") {
    // the GK sketch's rank guarantee (error ≤ N/accuracy per bound)
    // implies approx bound i must lie within [exact_{i-1}, exact_{i+1}]
    // — i.e. any row lands at most one bin from its exact assignment
    val li = Tables.t(spark, sf, "lineitem")
    val qsArr = array((1 to 9).map(q => lit(q / 10.0)): _*)
    val exact = li.agg(percentile(col("l_extendedprice"), qsArr))
      .head.getSeq[Double](0)
    val approx = li.agg(percentile_approx(col("l_extendedprice"), qsArr,
        lit(graft.operators.Profiling.HIST_ACCURACY)))
      .head.getSeq[Double](0)
    approx.zipWithIndex.foreach { case (b, i) =>
      val lo = if (i == 0) Double.NegativeInfinity else exact(i - 1)
      val hi = if (i == 8) Double.PositiveInfinity else exact(i + 1)
      assert(b >= lo && b <= hi, s"approx bound $i=$b outside [$lo,$hi]")
    }
    // and the query itself: 10 bins, each within ±2pp of a true decile
    val bins = q("q_profile_histogram_approx").collect()
    assert(bins.length == 10)
    bins.foreach { r =>
      val frac = r.getAs[Double]("frac")
      assert(math.abs(frac - 0.1) <= 0.02, s"bin ${r.getLong(0)} frac $frac")
    }
  }

  test("rollup: grand total equals sum of leaf rows") {
    val rows = q("q_rollup").collect()
    val leaves = rows.filter(r => r.getInt(2) == 0 && r.getInt(3) == 0)
    val total = rows.filter(r => r.getInt(2) == 1 && r.getInt(3) == 1)
    assert(total.length == 1)
    val leafSum = leaves.map(_.getAs[Double]("sum_qty")).sum
    assert(math.abs(leafSum - total.head.getAs[Double]("sum_qty")) < 1e-6)
    val leafN = leaves.map(_.getAs[Long]("n")).sum
    assert(leafN == total.head.getAs[Long]("n"))
  }

  test("empty inputs: TopKPerKey, Collect, and dedup all return empty, not error") {
    import spark.implicits._
    val emptyOrders = Tables.t(spark, sf, "orders").where(lit(false))
      .select("o_custkey", "o_orderkey", "o_totalprice")
    assert(org.apache.spark.sql.graftx.TopK.topKPerKey(
      emptyOrders, Seq("o_custkey"), Seq("o_totalprice" -> false, "o_orderkey" -> true), 3)
      .count() == 0)
    val emptyEav = Seq.empty[(String, String, String, String, Double)]
      .toDF("basin", "date", "variable", "elevation", "value")
      .withColumn("date", col("date").cast("timestamp"))
    for (m <- graft.api.Collect.Methods)
      assert(graft.api.Collect.collect(emptyEav, Seq("b1"),
        "2024-01-01", "2024-01-02", "v", m).count() == 0, s"method $m")
    // dedup over a corpus with no duplicates emits nothing
    val q = SparkEntry.queries("q_dedup_exact")
    assert(q(spark, sf).where(lit(false)).count() == 0)
  }

  test("TopKPerKey == window row_number on randomized data (keys, ties, ks)") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val gen = for {
      key <- Gen.choose(0, 20)
      v <- Gen.choose(0, 50) // small domain → plenty of ties
      id <- Gen.choose(0L, 1000000L)
    } yield (key, v, id)
    val rows = samples(gen, 2000).distinct
    val df = rows.toDF("k", "v", "id")
    for (k <- Seq(1, 3, 7)) {
      val custom = org.apache.spark.sql.graftx.TopK
        .topKPerKey(df, Seq("k"), Seq("v" -> false, "id" -> true), k)
        .orderBy("k", "rnk").collect()
      val w = Window.partitionBy("k").orderBy(col("v").desc, col("id").asc)
      val ref = df.withColumn("rnk", row_number().over(w))
        .where(col("rnk") <= k).orderBy("k", "rnk").collect()
      assert(custom.toSeq == ref.toSeq, s"mismatch at k=$k")
    }
  }

  test("q_agg_stats decimal recomposition matches built-in stddev/var/corr/covar") {
    val recomposed = q("q_agg_stats").collect()
      .map(r => r.getString(0) -> r).toMap
    val builtin = Tables.t(spark, sf, "lineitem")
      .groupBy("l_returnflag")
      .agg(var_samp(col("l_quantity")).as("v"),
        stddev_samp(col("l_quantity")).as("s"),
        covar_samp(col("l_quantity"), col("l_extendedprice")).as("cv"),
        corr(col("l_quantity"), col("l_extendedprice")).as("cr"))
      .collect()
    assert(builtin.nonEmpty)
    builtin.foreach { r =>
      val m = recomposed(r.getString(0))
      assert(math.abs(r.getDouble(1) - m.getAs[Double]("var_qty")) < 1e-4)
      assert(math.abs(r.getDouble(2) - m.getAs[Double]("std_qty")) < 1e-4)
      assert(math.abs(r.getDouble(3) - m.getAs[Double]("covar_qp")) < 1e-2)
      assert(math.abs(r.getDouble(4) - m.getAs[Double]("corr_qp")) < 1e-4)
    }
  }

  test("q_sample_hash is a ~10% unbiased slice and deterministic") {
    val once = q("q_sample_hash").collect()
    val again = q("q_sample_hash").collect()
    assert(once.toSeq == again.toSeq)
    val sampled = once.map(_.getAs[Long]("n_sampled")).sum.toDouble
    val total = Tables.t(spark, sf, "orders").count().toDouble
    val rate = sampled / total
    assert(rate > 0.05 && rate < 0.15, s"sample rate $rate outside [0.05, 0.15]")
  }

  test("cube row count: leaves + rf margins + ls margins + 1") {
    val rows = q("q_cube").collect()
    val leaves = rows.count(r => r.getInt(2) == 0 && r.getInt(3) == 0)
    val rfm = rows.count(r => r.getInt(2) == 0 && r.getInt(3) == 1)
    val lsm = rows.count(r => r.getInt(2) == 1 && r.getInt(3) == 0)
    val tot = rows.count(r => r.getInt(2) == 1 && r.getInt(3) == 1)
    assert(tot == 1 && rows.length == leaves + rfm + lsm + 1)
  }

  test("union/except algebra: (A ∪ B) \\ B ⊆ A on nation keys") {
    val a = Tables.t(spark, sf, "customer").select(col("c_nationkey").cast("int").as("k"))
    val b = Tables.t(spark, sf, "supplier").select(col("s_nationkey").cast("int").as("k"))
    val lhs = a.union(b).except(b).collect().map(_.getInt(0)).toSet
    val aSet = a.collect().map(_.getInt(0)).toSet
    assert(lhs.subsetOf(aSet))
  }

  test("knn symmetry: cosine(a,b) == cosine(b,a) (query-level spot check)") {
    val knn = q("q_sim_knn").select("vec_id", "neighbor_id", "cos").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val sym = knn.flatMap { case ((a, b), c) => knn.get((b, a)).map(c2 => (c, c2)) }
    assert(sym.nonEmpty)
    sym.foreach { case (c1, c2) => assert(math.abs(c1 - c2) < 1e-9) }
  }

  test("water-year expression matches reference logic on generated dates") {
    import spark.implicits._
    val gen = for {
      y <- Gen.choose(1990, 2030); m <- Gen.choose(1, 12); d <- Gen.choose(1, 28)
    } yield (y, m, d)
    val cases = samples(gen, 40)
    assert(cases.size >= 30)
    val df = cases.map { case (y, m, d) =>
      (f"$y-$m%02d-$d%02d 12:00:00", y + (if (m >= 10) 1 else 0))
    }.toDF("s", "want")
      .withColumn("got", Scalars.waterYearExpr(col("s").cast("timestamp")))
    assert(df.where(col("got") =!= col("want")).count() == 0)
  }

  test("dedup idempotence on generated string multisets") {
    import spark.implicits._
    samples(Gen.listOfN(30, Gen.oneOf("a", "b", "c", "aa", "bb")), 10)
      .filter(_.nonEmpty).foreach { xs =>
        val once = xs.toDF("text").dropDuplicates("text")
        assert(once.dropDuplicates("text").count() == once.count())
      }
  }

  test("BPE merge fold == plain-Scala greedy non-overlapping reference on random symbols") {
    import spark.implicits._
    // reference: left-to-right, merge (a,b) when last kept symbol is `a`
    // and the next is `b`, never re-matching a freshly merged symbol
    def ref(sym: Seq[String], a: String, b: String): Seq[String] =
      sym.foldLeft(Vector.empty[String]) { (acc, x) =>
        if (acc.nonEmpty && acc.last == a && x == b)
          acc.init :+ (a + b)
        else acc :+ x
      }
    // adversarial alphabet: runs like a,a,a and pairs straddling merges
    val gen = for {
      n <- Gen.choose(0, 12)
      s <- Gen.listOfN(n, Gen.oneOf("a", "b", "ab", "ba"))
      p <- Gen.oneOf(("a", "a"), ("a", "b"), ("b", "a"), ("ab", "a"), ("a", "ab"))
    } yield (s, p)
    val cases = samples(gen, 120)
    cases.groupBy(_._2).foreach { case ((a, b), group) =>
      val df = group.map(_._1).zipWithIndex.map { case (s, i) => (i, s) }.toDF("i", "sym")
      val got = df.select(col("i"), graft.operators.Bpe.mergeAdjacent(col("sym"), a, b).as("m"))
        .collect().map(r => r.getInt(0) -> r.getSeq[String](1)).toMap
      group.map(_._1).zipWithIndex.foreach { case (s, i) =>
        assert(got(i) == ref(s, a, b), s"$s merge ($a,$b): got ${got(i)}")
      }
    }
  }

  test("Morton interleave matches the bitwise reference and is a bijection") {
    import spark.implicits._
    // plain-Scala reference: bit i of x → bit 2i, bit i of y → bit 2i+1
    def ref(x: Long, y: Long): Long =
      (0 until 16).foldLeft(0L) { (acc, i) =>
        acc | ((x >> i & 1L) << (2 * i)) | ((y >> i & 1L) << (2 * i + 1))
      }
    val gen = for {
      x <- Gen.oneOf(Gen.choose(0L, 65535L), Gen.oneOf(0L, 1L, 65534L, 65535L))
      y <- Gen.oneOf(Gen.choose(0L, 65535L), Gen.oneOf(0L, 1L, 65534L, 65535L))
    } yield (x, y)
    val pts = samples(gen, 300).distinct
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"),
        graft.operators.Layout.morton(col("x"), col("y")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pts.foreach { case (x, y) =>
      assert(got((x, y)) == ref(x, y), s"morton($x,$y)")
    }
    // bijectivity on the sample (and trivially: ref is invertible)
    assert(got.values.toSeq.distinct.size == pts.size, "z collision")
    // locality sanity: quadrant = top bit pair
    pts.foreach { case (x, y) =>
      val quad = ((y >> 15 & 1L) << 1) | (x >> 15 & 1L)
      assert((got((x, y)) >> 30) == quad, s"quadrant of ($x,$y)")
    }
  }

  test("q_scd2 intervals == a plain-Scala run-length fold of each customer's history") {
    val got = SparkEntry.queries("q_scd2")(spark, sf).collect()
      .groupBy(_.getLong(0))
    import java.time.{LocalDateTime, ZoneOffset}
    val hist = graft.Tables.t(spark, sf, "orders")
      .select("o_custkey", "o_orderkey", "o_orderdate", "o_orderstatus").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[LocalDateTime](2), r.getString(3)))
      .groupBy(_._1)
    assert(got.keySet == hist.keySet)
    hist.foreach { case (ck, os) =>
      // reference: sort by (date, orderkey), fold consecutive same-status
      // runs into (status, firstDate, n)
      val sorted = os.sortBy(o =>
        (o._3.toEpochSecond(ZoneOffset.UTC), o._3.getNano, o._2)).toList
      val runs = sorted.foldLeft(List.empty[(String, LocalDateTime, Long)]) {
        case ((st, from, n) :: tl, o) if st == o._4 => (st, from, n + 1) :: tl
        case (acc, o) => (o._4, o._3, 1L) :: acc
      }.reverse
      val rows = got(ck).sortBy(_.getLong(1))
      assert(rows.map(_.getLong(1)).toSeq == (1L to runs.length), s"cust $ck island ids")
      rows.zip(runs).foreach { case (r, (st, from, n)) =>
        assert(r.getString(2) == st && r.getAs[LocalDateTime](3) == from && r.getLong(5) == n,
          s"cust $ck run mismatch")
      }
      // intervals tile: valid_to(i) = valid_from(i+1); exactly one current
      rows.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[LocalDateTime](4) == b.getAs[LocalDateTime](3), s"cust $ck gap")
          assert(a.getString(2) != b.getString(2), s"cust $ck unmerged run")
        case _ =>
      }
      assert(rows.init.forall(!_.getBoolean(6)) && rows.last.getBoolean(6))
      assert(rows.last.isNullAt(4))
    }
  }

  test("q_agg_incremental merge == direct recompute; refresh scans only the delta") {
    val merged = q("q_agg_incremental").collect()
    val direct = Tables.t(spark, sf, "orders")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(Tables.DEC)).as("sp"),
        min(col("o_orderdate")).as("f"), max(col("o_orderdate")).as("l"))
      .orderBy("o_orderpriority").collect()
    assert(merged.length == direct.length && merged.nonEmpty)
    merged.zip(direct).foreach { case (m, r) =>
      assert(m.getString(0) == r.getString(0))
      assert(m.getLong(1) == r.getLong(1), s"${m.getString(0)} count")
      assert(math.abs(m.getDouble(2) - r.getDecimal(2).doubleValue()) < 1e-6)
      assert(m.getAs[Any](4) == r.getAs[Any](3) && m.getAs[Any](5) == r.getAs[Any](4))
    }
    // deterministic across reruns (the artifact is reread, not rebuilt)
    assert(q("q_agg_incremental").collect().toSeq == merged.toSeq)
    // the non-artifact side of the plan pushes the delta date filter into
    // the orders scan — a refresh is O(delta), not O(corpus)
    val p = q("q_agg_incremental").queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate"),
      s"delta filter not pushed:\n$p")
  }

  test("q_event_paths: a path string fully determines session length") {
    val rows = SparkEntry.queries("q_event_paths")(spark, sf).collect()
    assert(rows.length == 20)
    val ns = rows.map(_.getLong(1))
    assert(ns.sameElements(ns.sorted.reverse), "not ranked by frequency")
    rows.foreach { r =>
      val (path, avgLen) = (r.getString(0), r.getDouble(2))
      assert(avgLen == path.split(">").length.toDouble,
        s"path '$path' avg_len $avgLen != component count")
    }
  }

  test("q_dq_kanon: class sizes partition the table; k_anonymity is the floor") {
    val rows = SparkEntry.queries("q_dq_kanon")(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getBoolean(3), r.getLong(4)))
    val total = graft.Tables.t(spark, sf, "customer").count()
    assert(rows.map(_._3).sum == total, "classes must partition the table")
    val kmin = rows.map(_._3).min
    rows.foreach { case (seg, nat, n, risky, k) =>
      assert(k == kmin, s"($seg,$nat) k_anonymity $k != floor $kmin")
      assert(risky == (n < 8), s"($seg,$nat) verdict")
    }
  }

  test("q_feature_hash: bucket counts conserve tokens; buckets stay in range") {
    val rows = SparkEntry.queries("q_feature_hash")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val tokCounts = graft.Tables.t(spark, sf, "documents")
      .selectExpr("doc_id", "size(split(text, ' ')) AS n").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    assert(rows.length == tokCounts.size)
    rows.foreach { case (id, feat, nDims) =>
      val kv = feat.split(" ").map { f =>
        val Array(b, c) = f.split(":"); (b.toLong, c.toLong)
      }
      assert(kv.length.toLong == nDims)
      assert(kv.map(_._1).distinct.length == kv.length, s"doc $id dup buckets")
      assert(kv.forall(p => p._1 >= 0 && p._1 < 64), s"doc $id bucket range")
      assert(kv.sameElements(kv.sortBy(_._1)), s"doc $id not sorted")
      assert(kv.map(_._2).sum == tokCounts(id), s"doc $id token conservation")
    }
  }

  test("q_assoc_rules matches a brute-force basket recount (support/conf/lift)") {
    val baskets = graft.Tables.t(spark, sf, "lineitem")
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nBaskets = baskets.map(_._1).distinct.length
    val itemN = baskets.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val pairN = baskets.groupBy(_._1).values.flatMap { items =>
      val ps = items.map(_._2).sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expected = pairN.filter { case ((a, b), n) =>
      n >= 3 && itemN(a) >= 3 && itemN(b) >= 3
    }
    val rows = q("q_assoc_rules").collect()
    assert(rows.length == expected.size, "frequent-pair set size")
    def r4d(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP)
    rows.foreach { r =>
      val (a, b, nab) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(expected((a, b)) == nab, s"pair ($a,$b) count")
      assert(r.getLong(3) == itemN(a) && r.getLong(4) == itemN(b), s"item counts ($a,$b)")
      assert(r4d(r.getDouble(5)) == r4d(nab.toDouble / nBaskets), s"support ($a,$b)")
      assert(r4d(r.getDouble(6)) == r4d(nab.toDouble / itemN(a)), s"conf ($a,$b)")
      assert(r4d(r.getDouble(8)) == r4d(nab.toDouble * nBaskets / (itemN(a) * itemN(b))),
        s"lift ($a,$b)")
    }
  }

  test("q_stats_ttest agrees with a plain-Scala Welch computation per nation") {
    val raw = graft.Tables.t(spark, sf, "orders")
      .join(graft.Tables.t(spark, sf, "customer"),
        col("o_custkey") === col("c_custkey"))
      .where(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .select("c_nationkey", "c_mktsegment", "o_totalprice").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getDouble(2)))
    def stats(xs: Seq[Double]) = {
      // mirror the query: exact decimal Σx, Σx² then double arithmetic
      val sx = xs.map(BigDecimal(_).setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
      val sxx = xs.map(x => BigDecimal(x * x).setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
      val n = xs.length
      (n, sx / n, (n * sxx - sx * sx) / (n.toLong * (n - 1)) / n)
    }
    val rows = q("q_stats_ttest").collect()
    val byNation = raw.groupBy(_._1)
    val eligible = byNation.filter { case (_, g) =>
      g.count(_._2 == "BUILDING") > 1 && g.count(_._2 == "MACHINERY") > 1
    }
    assert(rows.length == eligible.size, "eligible nation count")
    rows.foreach { r =>
      val g = byNation(r.getInt(0))
      val (na, ma, vna) = stats(g.filter(_._2 == "BUILDING").map(_._3).toSeq)
      val (nb, mb, vnb) = stats(g.filter(_._2 == "MACHINERY").map(_._3).toSeq)
      val t = (ma - mb) / math.sqrt(vna + vnb)
      val df = (vna + vnb) * (vna + vnb) / (vna * vna / (na - 1) + vnb * vnb / (nb - 1))
      assert(r.getLong(1) == na && r.getLong(2) == nb, s"nation ${r.getInt(0)} sizes")
      assert(math.abs(r.getDouble(5) - t) < 1e-3, s"nation ${r.getInt(0)} t: ${r.getDouble(5)} vs $t")
      assert(math.abs(r.getDouble(6) - df) < 1e-3, s"nation ${r.getInt(0)} df: ${r.getDouble(6)} vs $df")
    }
  }

  test("q_table_diff statuses match a plain-Scala bucket recount (all three present)") {
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val orders = graft.Tables.t(spark, sf, "orders")
      .select("o_orderkey").collect().map(_.getLong(0))
    val expected = orders.flatMap { k =>
      java.lang.Long.parseLong(md5hex(k.toString).take(15), 16) % 10 match {
        case 0 => Some(k -> "removed")
        case 1 => Some(k -> "changed") // repriced in B; fp must differ
        case 2 => Some(k -> "added")
        case _ => None                 // identical fingerprint both sides
      }
    }.toMap
    val rows = q("q_table_diff").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows == expected)
    assert(Set("added", "removed", "changed").subsetOf(rows.values.toSet))
  }

  test("q_graph_pagerank matches a plain-Scala power iteration; mass is conserved") {
    val rows = q("q_graph_pagerank").collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    // mirror the edge build from raw tables
    def kv(tn: String, a: String, b: String) = graft.Tables.t(spark, sf, tn)
      .select(a, b).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val custNation = graft.Tables.t(spark, sf, "customer")
      .select("c_custkey", "c_nationkey").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val suppNation = graft.Tables.t(spark, sf, "supplier")
      .select("s_suppkey", "s_nationkey").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val orderCust = kv("orders", "o_orderkey", "o_custkey")
    val edges = graft.Tables.t(spark, sf, "lineitem")
      .select("l_orderkey", "l_suppkey").collect()
      .map(r => (custNation(orderCust(r.getLong(0))), suppNation(r.getLong(1))))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val wout = edges.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val nodes = graft.Tables.t(spark, sf, "nation")
      .select("n_nationkey").collect().map(_.getInt(0)).sorted
    val n = nodes.length
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to 3) {
      val contrib = edges.toSeq
        .map { case ((s0, d0), w) => d0 -> BigDecimal(r(s0) * w / wout(s0))
          .setScale(18, BigDecimal.RoundingMode.HALF_UP) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum.toDouble).toMap
      r = nodes.map(nd => nd -> ((1.0 - 0.85) / n + 0.85 * contrib.getOrElse(nd, 0.0))).toMap
    }
    assert(rows.keySet == nodes.toSet)
    nodes.foreach { nd =>
      assert(math.abs(rows(nd) - r(nd)) < 1e-3, s"node $nd: ${rows(nd)} vs ${r(nd)}")
    }
    // every fixture nation has out-edges, so no dangling leak: Σr = 1
    assert(math.abs(rows.values.sum - 1.0) < 1e-2)
  }

  test("q_cdc_merge equals a plain-Scala full-history latest-wins fold") {
    val ev = graft.Tables.t(spark, sf, "events")
      .select("user_id", "ts", "event_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime * 1000 +
        r.getTimestamp(1).getNanos / 1000 % 1000, r.getLong(2), r.getString(3), r.getDouble(4)))
    val expected = ev.groupBy(_._1).view.mapValues(_.maxBy(e => (e._2, e._3))).toMap
      .filter(_._2._4 != "error")
    val rows = q("q_cdc_merge").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(rows.keySet == expected.keySet, "surviving key set")
    expected.foreach { case (u, e) =>
      assert(rows(u) == (e._3, e._4), s"user $u latest record")
    }
    // at least one tombstoned user must exist for the test to bite
    assert(ev.groupBy(_._1).exists(_._2.maxBy(e => (e._2, e._3))._4 == "error"))
  }

  test("q_stats_chi2 matches a plain-Scala contingency computation") {
    val raw = graft.Tables.t(spark, sf, "orders")
      .join(graft.Tables.t(spark, sf, "customer"), col("o_custkey") === col("c_custkey"))
      .select("c_mktsegment", "o_orderpriority").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val cells = raw.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rt = raw.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val ct = raw.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val n = raw.length
    val contribs = cells.map { case ((s0, p0), o) =>
      val e = (rt(s0) * ct(p0)).toDouble / n
      (s0, p0) -> (o, e, (o - e) * (o - e) / e)
    }
    val chi2 = contribs.values.map(c => BigDecimal(c._3)
      .setScale(18, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
    val dfExp = (rt.size - 1) * (ct.size - 1)
    val rows = q("q_stats_chi2").collect()
    assert(rows.length == cells.size)
    rows.foreach { r =>
      val key = (r.getString(0), r.getString(1))
      val (o, e, c) = contribs(key)
      assert(r.getLong(2) == o, s"$key observed")
      assert(math.abs(r.getDouble(3) - e) < 1e-3, s"$key expected")
      assert(math.abs(r.getDouble(4) - c) < 1e-3, s"$key contrib")
      assert(math.abs(r.getDouble(5) - chi2) < 1e-3, s"$key chi2")
      assert(r.getLong(6) == dfExp, s"$key df")
    }
  }

  test("q_skew_report stats match a plain-Scala histogram recount") {
    val rows = q("q_skew_report").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("l_orderkey", "l_partkey", "l_suppkey"))
    rows.foreach { r =>
      val keys = graft.Tables.t(spark, sf, "lineitem")
        .select(r.getString(0)).collect().map(_.getLong(0))
      val hist = keys.groupBy(identity).view.mapValues(_.length.toLong).toMap
      val n = keys.length.toLong
      val maxF = hist.values.max
      val entropy = hist.values.map { f =>
        val p = f.toDouble / n
        BigDecimal(-p * math.log(p)).setScale(18, BigDecimal.RoundingMode.HALF_UP)
      }.sum.toDouble
      assert(r.getLong(1) == n && r.getLong(2) == hist.size && r.getLong(3) == maxF)
      assert(math.abs(r.getDouble(4) - maxF * hist.size.toDouble / n) < 1e-3, "skew_ratio")
      assert(math.abs(r.getDouble(5) - maxF.toDouble / n) < 1e-3, "top1_share")
      assert(math.abs(r.getDouble(6) - entropy) < 1e-3, "entropy")
    }
  }

  test("q_join_cardinality_est: estimates equal the true join sizes") {
    val est = q("q_join_cardinality_est").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val li = graft.Tables.t(spark, sf, "lineitem")
    val o = graft.Tables.t(spark, sf, "orders")
    val c = graft.Tables.t(spark, sf, "customer")
    // the histogram estimator is exact by definition: Σ fA(k)·fB(k) IS the
    // join size — confirm against the actually-executed joins
    def sz(a: org.apache.spark.sql.DataFrame, ka: String,
           b: org.apache.spark.sql.DataFrame, kb: String) =
      a.select(col(ka).as("k")).join(b.select(col(kb).as("k2")), col("k") === col("k2")).count()
    assert(est("lineitem_orders_orderkey")._1 == sz(li, "l_orderkey", o, "o_orderkey"))
    assert(est("lineitem_self_partkey")._1 == sz(li, "l_partkey", li, "l_partkey"))
    assert(est("orders_customer_custkey")._1 == sz(o, "o_custkey", c, "c_custkey"))
    est.values.foreach { case (rows, keys) => assert(rows >= keys && keys > 0) }
  }

  test("q_agg_kmv: merge(parts) ≡ sketch(whole); estimate within 15% of exact") {
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def h60(s: String) = java.lang.Long.parseLong(md5hex(s).take(15), 16)
    val keys = graft.Tables.t(spark, sf, "orders")
      .select("o_orderpriority", "o_orderkey").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val k = 256
    def estimate(hs: Seq[Long]): Double = {
      val kth = hs.distinct.sorted.apply(k - 1)
      (k - 1).toDouble * math.pow(2, 60) / kth
    }
    val byGrp = keys.groupBy(_._1).view.mapValues(_.map(p => h60(p._2.toString)).toSeq).toMap
    val rows = q("q_agg_kmv").collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rows.keySet == byGrp.keySet)
    byGrp.foreach { case (g, hs) =>
      val whole = estimate(hs)
      assert(math.abs(rows(g) - whole) < 1e-2, s"group $g query-vs-scala")
      // mergeability: per-part sketches (k smallest each), merged by
      // keeping the k smallest of the union, estimate identically
      val parts = hs.groupBy(h => h % 4).values
        .map(_.distinct.sorted.take(k)).toSeq
      val merged = estimate(parts.flatten.distinct.sorted.take(k))
      assert(merged == whole, s"group $g merge != whole")
      val exact = hs.distinct.size.toDouble
      assert(math.abs(whole - exact) / exact < 0.15, s"group $g accuracy: $whole vs $exact")
    }
  }

  test("q_anomaly_seasonal flags exactly the plain-Scala seasonal z recomputation") {
    val ev = graft.Tables.t(spark, sf, "events")
      .select(col("event_id"), col("event_type"), hour(col("ts")).as("hod"), col("value"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getDouble(3)))
    def dec6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val base = ev.groupBy(e => (e._2, e._3)).collect {
      case (key, g) if g.length > 1 =>
        val n = g.length
        val sx = g.map(e => dec6(e._4)).sum.toDouble
        val sxx = g.map(e => dec6(e._4 * e._4)).sum.toDouble
        key -> (sx / n, math.sqrt((n * sxx - sx * sx) / (n.toLong * (n - 1))))
    }
    def r4d(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = ev.flatMap { case (id, ty, hod, v) =>
      base.get((ty, hod)).map { case (m, s0) => id -> r4d((v - m) / s0) }
    }.filter(p => math.abs(p._2) > 1.6).toMap
    val rows = q("q_anomaly_seasonal").collect()
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(rows.keySet == expected.keySet, "flagged event set")
    expected.foreach { case (id, z) =>
      assert(math.abs(rows(id) - z) < 1e-9, s"event $id z") }
    assert(rows.nonEmpty, "threshold must bite on the fixture")
  }

  test("q_agg_mad flags exactly the rows the plain-Scala modified z-score flags") {
    def median(xs: Seq[Double]): Double = { // interpolated, = percentile(0.5)
      val s = xs.sorted; val p = (s.length - 1) * 0.5
      val (lo, hi) = (s(p.toInt), s(math.ceil(p).toInt))
      val m = lo + (hi - lo) * (p - p.toInt)
      BigDecimal(m).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val ev = graft.Tables.t(spark, sf, "events")
      .select("event_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val stats = ev.groupBy(_._2).map { case (ty, rs) =>
      val med = median(rs.map(_._3).toSeq)
      ty -> (med, median(rs.map(r => math.abs(r._3 - med)).toSeq))
    }
    val expect = ev.filter { case (_, ty, v) =>
      val (med, mad) = stats(ty)
      math.abs(0.6745 * (v - med) / mad) > 1.2
    }.map(_._1).toSet
    val got = SparkEntry.queries("q_agg_mad")(spark, sf).collect()
      .map(_.getLong(0)).toSet
    assert(got.nonEmpty && got.size < ev.length, "flagging is non-trivial")
    assert(got == expect, s"missing=${expect -- got} extra=${got -- expect}")
  }

  test("q_window_rolling_distinct == brute-force trailing-window recount") {
    val act = graft.Tables.t(spark, sf, "events")
      .selectExpr("user_id", "CAST(ts AS LONG) div 86400 AS day").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val (minD, maxD) = (act.map(_._2).min, act.map(_._2).max)
    val expect = (minD to maxD).map { d =>
      d -> act.filter(a => a._2 >= d - 6 && a._2 <= d).map(_._1).distinct.length.toLong
    }.toMap
    val got = SparkEntry.queries("q_window_rolling_distinct")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the query reports every day that has a contributing window, min..max
    assert(got == expect.filter(_._2 > 0))
  }

  test("q_window_ewma == the sequential recursion it rewrites (plain-Scala fold)") {
    val got = SparkEntry.queries("q_window_ewma")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(4)).toMap
    val ev = graft.Tables.t(spark, sf, "events")
      .select("user_id", "ts", "event_id", "value").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)
    var checked = 0
    ev.foreach { case (uid, rows) =>
      val xs = rows.sortBy(r => (r._2.getTime, r._2.getNanos, r._3)).map(_._4)
      xs.tail.scanLeft(xs.head)((e, x) => 0.3 * x + 0.7 * e)
        .zipWithIndex.foreach { case (e, i0) =>
          val g = got((uid, i0 + 1L))
          assert(math.abs(g - e) < 5e-4, s"user $uid step ${i0 + 1}: $g vs $e")
          checked += 1
        }
    }
    assert(checked == got.size)
  }

  test("q_window_resample: complete hourly grid, observed cells kept, interpolation bounded") {
    val rows = SparkEntry.queries("q_window_resample")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    rows.groupBy(_._1).foreach { case (uid, rs) =>
      val hs = rs.map(_._2).sorted
      // grid completeness: every hour between the user's first and last
      assert(hs.sameElements(hs.head to hs.last by 3600L), s"user $uid grid gaps")
      // interpolated values lie within their non-interpolated neighbors
      val sortedRs = rs.sortBy(_._2)
      sortedRs.zipWithIndex.filter(_._1._4).foreach { case ((_, h, v, _), i) =>
        val prev = sortedRs.take(i).filter(!_._4).lastOption.map(_._3)
        val next = sortedRs.drop(i + 1).filter(!_._4).headOption.map(_._3)
        (prev, next) match {
          case (Some(p), Some(n)) =>
            assert(v >= math.min(p, n) - 5e-4 && v <= math.max(p, n) + 5e-4,
              s"user $uid h=$h: $v outside [$p, $n]")
          case (Some(p), None) => assert(math.abs(v - p) < 5e-4)
          case (None, Some(n)) => assert(math.abs(v - n) < 5e-4)
          case _ => fail(s"user $uid has no observed cells")
        }
      }
    }
    // observed cells keep their (rounded) per-hour mean
    assert(rows.exists(_._4) && rows.exists(!_._4))
  }

  test("q_skyline == quadratic dominance filter on random points (ties + duplicates)") {
    import spark.implicits._
    import java.nio.file.Files
    // small domains → price ties, size ties, duplicate frontier points
    val pts = samples(for {
      price <- Gen.choose(0, 30).map(_ / 2.0)
      size <- Gen.choose(0, 30)
    } yield (price, size), 400).zipWithIndex
      .map { case ((p, sz), i) => (i.toLong * 5, s"part$i", p, sz) } // %5 keeps all
    val dir = Files.createTempDirectory("graft-skyline").toString
    pts.toDF("p_partkey", "p_name", "p_retailprice", "p_size")
      .write.parquet(s"$dir/part.parquet")
    val got = SparkEntry.queries("q_skyline")(spark, dir).collect()
      .map(_.getLong(0)).toSet
    val ref = pts.filter { case (_, _, p, sz) =>
      !pts.exists { case (_, _, p2, sz2) =>
        p2 <= p && sz2 <= sz && (p2 < p || sz2 < sz)
      }
    }.map(_._1).toSet
    assert(ref.nonEmpty && got == ref,
      s"missing=${ref -- got} extra=${got -- ref}")
  }

  test("q_dq_checks verdicts: the planted violation fails, clean constraints pass") {
    val rows = SparkEntry.queries("q_dq_checks")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getBoolean(3))).toMap
    assert(rows.size == 6)
    rows.foreach { case (name, (metric, pass)) =>
      assert(pass == (metric >= 1.0), s"$name verdict inconsistent with metric")
      assert(metric >= 0.0 && metric <= 1.0, s"$name metric $metric out of [0,1]")
    }
    // lineitem has multiple lines per order — planted failure
    assert(!rows("unique_l_orderkey")._2)
    // the synthetic tables are clean on everything else
    Seq("complete_l_shipdate", "unique_o_orderkey", "ri_orders_customer",
      "domain_l_returnflag", "range_l_discount")
      .foreach(n => assert(rows(n)._2, s"$n should pass on the fixture"))
  }

  test("q_event_transitions conserves hops and normalizes per-state probabilities") {
    val m = SparkEntry.queries("q_event_transitions")(spark, sf).collect()
    val ev = graft.Tables.t(spark, sf, "events")
    val total = ev.count()
    val users = ev.select("user_id").distinct().count()
    // each user's k events contribute exactly k-1 hops
    assert(m.map(_.getLong(2)).sum == total - users,
      s"hops ${m.map(_.getLong(2)).sum} != $total - $users")
    m.groupBy(_.getString(0)).foreach { case (from, rs) =>
      val psum = rs.map(_.getDouble(3)).sum
      // each p is 4dp-rounded → tolerance half-ulp per row
      assert(math.abs(psum - 1.0) <= 0.5e-4 * rs.length + 1e-9,
        s"P(·|$from) sums to $psum")
    }
  }

  test("q_interval_merge == plain-Scala sweep merge; islands disjoint, orders conserved") {
    val got = SparkEntry.queries("q_interval_merge")(spark, sf).collect()
      .map(r => (r.getAs[Number](0).longValue, java.time.LocalDate.parse(r.getString(1)),
        java.time.LocalDate.parse(r.getString(2)), r.getLong(3), r.getInt(4)))
    // reference: sort each customer's [d, d+30) intervals, sweep-merge
    val raw = graft.Tables.t(spark, sf, "orders")
      .select(col("o_custkey").cast("long"), col("o_orderdate").cast("date"))
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val want = raw.groupBy(_._1).flatMap { case (cust, os) =>
      val ivs = os.map(_._2).sorted.map(d => (d, d.plusDays(30)))
      val merged = ivs.foldLeft(List.empty[(java.time.LocalDate, java.time.LocalDate, Long)]) {
        case (acc @ ((s0, e0, n) :: rest), (s1, e1)) if !s1.isAfter(e0) =>
          (s0, Seq(e0, e1).max, n + 1) :: rest
        case (acc, (s1, e1)) => (s1, e1, 1L) :: acc
      }.reverse
      merged.map { case (s1, e1, n) => (cust, s1, e1, n,
        java.time.temporal.ChronoUnit.DAYS.between(s1, e1).toInt) }
    }.toSet
    assert(got.toSet == want, "merged islands differ from the sweep reference")
    // islands per customer are disjoint and strictly ordered
    got.groupBy(_._1).foreach { case (cust, is) =>
      is.sortBy(_._2).sliding(2).foreach {
        case Array((_, _, e0, _, _), (_, s1, _, _, _)) =>
          assert(s1.isAfter(e0), s"customer $cust islands overlap")
        case _ => ()
      }
    }
    assert(got.map(_._4).sum == raw.length, "order count not conserved")
  }

  test("q_stats_ols == plain-Scala least squares per return flag") {
    val got = SparkEntry.queries("q_stats_ols")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    val rows = graft.Tables.t(spark, sf, "lineitem")
      .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    rows.groupBy(_._1).foreach { case (rf, xs) =>
      val n = xs.length.toDouble
      val mx = xs.map(_._2).sum / n; val my = xs.map(_._3).sum / n
      val cov = xs.map(t => (t._2 - mx) * (t._3 - my)).sum
      val vx = xs.map(t => (t._2 - mx) * (t._2 - mx)).sum
      val vy = xs.map(t => (t._3 - my) * (t._3 - my)).sum
      val (gn, gs, gi, gr2) = got(rf)
      assert(gn == xs.length)
      assert(math.abs(gs - cov / vx) < 1e-3, s"$rf slope $gs vs ${cov / vx}")
      assert(math.abs(gi - (my - cov / vx * mx)) < 1e-2, s"$rf intercept")
      assert(math.abs(gr2 - cov * cov / (vx * vy)) < 1e-3, s"$rf r2")
      assert(gr2 >= 0.0 && gr2 <= 1.0)
    }
  }

  test("q_stats_mannwhitney == brute-force pairwise U on the raw rows") {
    val row = q("q_stats_mannwhitney").collect()(0)
    val (nA, nB, u, z) =
      (row.getLong(2), row.getLong(3), row.getDouble(4), row.getDouble(5))
    val vals = graft.Tables.t(spark, sf, "lineitem")
      .where(col("l_returnflag").isin("A", "R"))
      .select(col("l_returnflag"), col("l_discount"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val as = vals.filter(_._1 == "A").map(_._2)
    val bs = vals.filter(_._1 == "R").map(_._2)
    assert(nA == as.length && nB == bs.length)
    // U_A by definition: #(b < a) + #(a == b)/2 over all pairs (the
    // rank-sum orientation: U_A = R_A − nA(nA+1)/2)
    var wins = 0L; var ties = 0L
    for (a <- as; b <- bs) { if (b < a) wins += 1 else if (a == b) ties += 1 }
    val uRef = wins + ties / 2.0
    assert(math.abs(u - uRef) <= 0.5, s"U $u vs pairwise $uRef")
    // U is symmetric-bounded and z must be finite on this fixture
    assert(u >= 0 && u <= nA.toDouble * nB, s"U out of range: $u")
    assert(!z.isNaN && !z.isInfinite)
  }

  test("q_stats_bootstrap: SE positive, bootstrap mean near full mean, reruns identical") {
    val rows = q("q_stats_bootstrap").collect()
    assert(rows.length == 5) // one per order priority
    rows.foreach { r =>
      val (mf, bm, se) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(se > 0, s"${r.getString(0)}: degenerate bootstrap SE")
      // Poisson-bootstrap replicate means concentrate around the sample
      // mean: |bm - mf| should be well within a few SEs
      assert(math.abs(bm - mf) < 5 * se, s"${r.getString(0)}: $bm vs $mf (se $se)")
    }
    val again = q("q_stats_bootstrap").collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq,
      "md5-driven bootstrap must be rerun-deterministic")
  }

  test("q_drift_psi: PSI nonnegative, zero on identical distributions, bands consistent") {
    val rows = q("q_drift_psi").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val psi = r.getDouble(3); val verdict = r.getString(4)
      assert(psi >= 0, s"PSI negative for ${r.getString(0)}")
      val want = if (psi < 0.1) "stable" else if (psi < 0.25) "moderate" else "shifted"
      // r4 rounding can flip a verdict only within 5e-5 of a band edge
      if (math.abs(psi - 0.1) > 1e-3 && math.abs(psi - 0.25) > 1e-3)
        assert(verdict == want, s"${r.getString(0)}: $psi -> $verdict")
    }
    // identical ref/cur histograms => PSI exactly 0 after smoothing
    import spark.implicits._
    val same = Seq.tabulate(100)(i => ("P", i % 7)).toDF("prio", "bin")
      .groupBy("prio", "bin")
      .agg(count(lit(1)).as("n_ref"), count(lit(1)).as("n_cur"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("prio")
    val psi0 = same
      .withColumn("p_ref", (col("n_ref") + 0.5) / (sum("n_ref").over(w) + 5.0))
      .withColumn("p_cur", (col("n_cur") + 0.5) / (sum("n_cur").over(w) + 5.0))
      .agg(sum((col("p_cur") - col("p_ref")) * log(col("p_cur") / col("p_ref"))))
      .head().getDouble(0)
    assert(psi0 == 0.0)
  }

  test("q_dq_benford: digits 1-9 complete, observed fractions sum to 1, chi2 constant") {
    val rows = q("q_dq_benford").collect()
    assert(rows.map(_.getString(0)).toSeq == (1 to 9).map(_.toString))
    val fracSum = rows.map(_.getDouble(2)).sum
    assert(math.abs(fracSum - 1.0) < 1e-3, s"frac_obs sums to $fracSum")
    val expSum = rows.map(_.getDouble(3)).sum
    assert(math.abs(expSum - 1.0) < 1e-3, s"frac_exp sums to $expSum (log10 law)")
    assert(rows.map(_.getDouble(4)).distinct.length == 1, "chi2 must be a broadcast constant")
    assert(rows.head.getDouble(4) >= 0)
  }

  test("q_sample_per_key: exactly K per stratum, deterministic, and rank-rewritten to TopKPerKey") {
    val df = q("q_sample_per_key")
    val rows = df.collect()
    val perLang = rows.groupBy(_.getString(0))
    perLang.foreach { case (lang, rs) =>
      assert(rs.length == 3, s"$lang: ${rs.length} rows")
      assert(rs.map(_.getInt(3)).sorted.toSeq == Seq(1, 2, 3))
      // the sample is the true 3 lowest (pri, doc_id) keys of the stratum
      val all = graft.Tables.t(spark, sf, "documents")
        .where(col("lang") === lang)
        .select(col("doc_id"),
          (graft.Tables.h60(col("doc_id").cast("string")) % 1000000).as("pri"))
        .collect().map(r => (r.getLong(1), r.getLong(0))).sorted.take(3)
      assert(rs.sortBy(_.getInt(3)).map(r => (r.getLong(2), r.getLong(1))).toSeq == all.toSeq)
    }
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKeyFinal"),
      s"per-key sample should ride the map-side-heap rewrite:\n$p")
  }

  test("q_features_pit: no leakage — features equal brute-force strictly-prior recompute") {
    // all five features must collapse into ONE Window operator (a
    // withColumn chain would leave five, each a full pass per partition)
    val plan = q("q_features_pit").queryExecution.executedPlan.toString
    val nWindows = "\\bWindow\\b".r.findAllIn(plan).length
    assert(nWindows == 1, s"expected one collapsed Window node, got $nWindows:\n$plan")
    val got = q("q_features_pit").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (Option(r.get(3)), Option(r.get(4)), r.getLong(5), r.getLong(6), r.getLong(7)))
      .toMap
    val ev = graft.Tables.t(spark, sf, "events")
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"),
        graft.Tables.tsec(col("ts")).as("et"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3), r.getLong(4)))
    val byUser = ev.groupBy(_._1).view.mapValues(_.sortBy(e => (e._5, e._2))).toMap
    var checked = 0
    for ((user, rows) <- byUser; (p, i) <- rows.zipWithIndex if p._3 == "purchase") {
      val prior = rows.take(i)
      def lastOf(tp: String) = prior.reverse.find(_._3 == tp).map(e => math.rint(e._4 * 1e4) / 1e4)
      def nOf(tp: String) = prior.count(_._3 == tp).toLong
      val (fv, fc, nv, nc, ne) = got((user, p._2))
      assert(fv.map(_.asInstanceOf[Double]) == lastOf("view"), s"user $user event ${p._2} f_view")
      assert(fc.map(_.asInstanceOf[Double]) == lastOf("click"), s"user $user event ${p._2} f_click")
      assert((nv, nc, ne) == (nOf("view"), nOf("click"), nOf("error")), s"user $user counts")
      checked += 1
    }
    assert(checked > 50, s"fixture too thin: only $checked purchases checked")
    assert(got.size == checked, "every purchase must emit exactly one feature row")
  }

  test("q_profile_histogram: deciles cover the table, near-equal depth, ordered envelopes") {
    val rows = q("q_profile_histogram").collect()
    assert(rows.map(_.getLong(0)).toSeq == (0L to 9L))
    val n = graft.Tables.t(spark, sf, "lineitem").count()
    assert(rows.map(_.getLong(1)).sum == n, "bins must cover every row")
    rows.foreach { r =>
      assert(math.abs(r.getLong(1) - n / 10.0) < n * 0.02,
        s"bin ${r.getLong(0)} depth ${r.getLong(1)} vs equi-depth ${n / 10}")
      assert(r.getDouble(2) <= r.getDouble(3), "lo <= hi inside a bin")
    }
    // envelopes must be disjoint and ordered across bins
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getDouble(3) <= b.getDouble(2) + 1e-9,
        s"bin ${a.getLong(0)} hi ${a.getDouble(3)} overlaps bin ${b.getLong(0)} lo ${b.getDouble(2)}")
    }
  }

  test("q_text_boilerplate: counts consistent, both verdicts present, flag matches fraction") {
    val rows = q("q_text_boilerplate").collect()
    assert(rows.length == graft.Tables.t(spark, sf, "documents").count())
    rows.foreach { r =>
      val (nSh, nB, frac, flag) =
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))
      assert(nB <= nSh)
      // r4 is decimal half-up: the published frac sits within a half-step
      // of the true ratio
      assert(math.abs(frac - nB.toDouble / nSh) <= 5.0001e-5)
      if (frac > 0.21) assert(flag, s"doc ${r.getLong(0)}: frac $frac but not flagged")
      if (frac < 0.19) assert(!flag, s"doc ${r.getLong(0)}: frac $frac but flagged")
    }
    assert(rows.exists(_.getBoolean(4)) && rows.exists(!_.getBoolean(4)),
      "fixture must exercise both verdicts")
  }

  /** The (flag, day, rev) daily series both time-series queries reduce to. */
  private def dailySeries(): Map[String, Seq[(String, Double)]] =
    graft.Tables.t(spark, sf, "lineitem")
      .groupBy(col("l_returnflag").as("flag"), to_date(col("l_shipdate")).as("day"))
      .agg(graft.Tables.dsum(col("l_extendedprice")).as("rev"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getDouble(2)))
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).sortBy(_._1).toSeq).toMap

  test("q_stats_autocorr == plain-Scala Pearson on the lagged daily series") {
    val got = q("q_stats_autocorr").collect()
      .map(r => (r.getString(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val series = dailySeries()
    for ((flag, days) <- series; k <- Seq(1, 7)) {
      val xs = days.map(_._2)
      val pairs = xs.drop(k).zip(xs.dropRight(k)) // (x_t, x_{t-k})
      val n = pairs.length.toDouble
      val mx = pairs.map(_._1).sum / n; val my = pairs.map(_._2).sum / n
      val cov = pairs.map(p => (p._1 - mx) * (p._2 - my)).sum
      val vx = pairs.map(p => (p._1 - mx) * (p._1 - mx)).sum
      val vy = pairs.map(p => (p._2 - my) * (p._2 - my)).sum
      val (gn, gr) = got((flag, k))
      assert(gn == pairs.length, s"$flag lag $k pair count")
      assert(math.abs(gr - cov / math.sqrt(vx * vy)) < 1e-3, s"$flag lag $k autocorr $gr")
      assert(gr >= -1.0001 && gr <= 1.0001)
    }
  }

  test("q_window_drawdown == plain-Scala running-peak scan of the daily series") {
    val got = q("q_window_drawdown").collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getDouble(4))).toMap
    for ((flag, days) <- dailySeries()) {
      var peak = Double.MinValue; var best = (days.head._1, -1.0)
      for ((day, rev) <- days) {
        peak = math.max(peak, rev)
        val dd = (peak - rev) / peak
        if (dd > best._2) best = (day, dd)
      }
      val (gDay, gDd) = got(flag)
      assert(gDay == best._1, s"$flag worst day $gDay vs ${best._1}")
      assert(math.abs(gDd - best._2) < 1e-3, s"$flag drawdown")
      assert(gDd >= 0 && gDd < 1)
    }
  }

  test("q_graph_degree_dist: both sides conserve the distinct edge count") {
    val rows = q("q_graph_degree_dist").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val edges = graft.Tables.t(spark, sf, "lineitem")
      .select("l_partkey", "l_suppkey").distinct().count()
    for (side <- Seq("part", "supplier")) {
      val h = rows.filter(_._1 == side)
      assert(h.map(t => t._2 * t._3).sum == edges,
        s"$side: sum(degree*n_nodes) must equal the distinct (part,supp) pair count")
      assert(h.forall(_._2 >= 1))
    }
    val nParts = graft.Tables.t(spark, sf, "lineitem").select("l_partkey").distinct().count()
    assert(rows.filter(_._1 == "part").map(_._3).sum == nParts)
  }

  test("q_stats_moments == plain-Scala central moments per return flag") {
    val got = q("q_stats_moments").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    val rows = graft.Tables.t(spark, sf, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    rows.groupBy(_._1).foreach { case (rf, xs) =>
      val n = xs.length.toDouble
      val mean = xs.map(_._2).sum / n
      def cm(k: Int) = xs.map(t => math.pow(t._2 - mean, k)).sum / n
      val (gn, gm, gv, gs, gk) = got(rf)
      assert(gn == xs.length)
      assert(math.abs(gm - mean) < 1e-2, s"$rf mean")
      assert(math.abs(gv - cm(2) * n / (n - 1)) < math.abs(gv) * 1e-4, s"$rf variance")
      assert(math.abs(gs - cm(3) / math.pow(cm(2), 1.5)) < 1e-3, s"$rf skewness $gs")
      assert(math.abs(gk - (cm(4) / (cm(2) * cm(2)) - 3)) < 1e-3, s"$rf kurtosis $gk")
    }
  }

  test("q_text_zipf == plain-Scala log-log OLS over the top token counts") {
    val row = q("q_text_zipf").collect()(0)
    val (n, slope, r2) = (row.getLong(0), row.getDouble(1), row.getDouble(3))
    val counts = graft.Tables.t(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy(t => (-t._2, t._1)).take(200)
    assert(n == counts.length)
    val pts = counts.zipWithIndex.map { case ((_, c), i) =>
      (math.log(i + 1.0), math.log(c.toDouble)) }
    val nn = pts.length.toDouble
    val mx = pts.map(_._1).sum / nn; val my = pts.map(_._2).sum / nn
    val cov = pts.map(p => (p._1 - mx) * (p._2 - my)).sum
    val vx = pts.map(p => (p._1 - mx) * (p._1 - mx)).sum
    assert(math.abs(slope - cov / vx) < 1e-3, s"slope $slope vs ${cov / vx}")
    // monotone non-increasing counts vs increasing rank force cov <= 0
    assert(slope <= 0, s"rank-frequency slope must be non-positive: $slope")
    assert(r2 >= 0 && r2 <= 1)
  }

  test("q_dq_freshness: freshest stream lags zero, verdicts match the bound, counts cover") {
    val rows = q("q_dq_freshness").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getBoolean(4)))
    assert(rows.count(_._3 == 0L) >= 1, "some stream must define the high-water mark")
    rows.foreach { case (tp, _, lagS, stale) =>
      assert(lagS >= 0)
      assert(stale == (lagS > 1800L), s"$tp: lag $lagS vs verdict $stale")
    }
    assert(rows.exists(_._4) && rows.exists(!_._4), "fixture must exercise both verdicts")
    assert(rows.map(_._2).sum == graft.Tables.t(spark, sf, "events").count())
  }

  test("q_window_rank_change: per-month ranks are a permutation; movement is consistent") {
    val rows = q("q_window_rank_change").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(3),
        Option(r.get(4)).map(_.asInstanceOf[Int]), Option(r.get(5)).map(_.asInstanceOf[Int])))
    rows.groupBy(_._2).foreach { case (month, ms) =>
      assert(ms.map(_._3).sorted.toSeq == (1 to ms.length),
        s"$month: ranks must be a 1..n permutation")
    }
    rows.foreach { case (supp, month, rnk, prev, moved) =>
      assert(moved == prev.map(_ - rnk), s"$supp $month movement mismatch")
    }
    // exactly one null-prev row per supplier: its first active month
    val bySupp = rows.groupBy(_._1)
    bySupp.foreach { case (supp, ms) =>
      val firstMonth = ms.map(_._2).min
      assert(ms.count(_._4.isEmpty) == 1, s"$supp: one first month expected")
      assert(ms.find(_._4.isEmpty).get._2 == firstMonth, s"$supp: null prev must be first month")
    }
  }

  /** events.parquet fixture dir for the KS test: (type, value) pairs. */
  private def ksEventsDir(rows: Seq[(String, Double)]): String = {
    import spark.implicits._
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft-ks").toString
    rows.zipWithIndex.map { case ((ty, v), i) =>
      (i.toLong, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), i.toLong % 7, ty, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    dir
  }

  test("q_stats_ks == brute-force ECDF sup-distance on the raw rows") {
    val row = q("q_stats_ks").collect()(0)
    val (nA, nB, ks, crit, rej) = (row.getLong(2), row.getLong(3),
      row.getDouble(4), row.getDouble(5), row.getBoolean(6))
    val vals = graft.Tables.t(spark, sf, "events")
      .where(col("event_type").isin("click", "purchase"))
      .select(col("event_type"), col("value"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val as = vals.filter(_._1 == "click").map(_._2).sorted
    val bs = vals.filter(_._1 == "purchase").map(_._2).sorted
    assert(nA == as.length && nB == bs.length)
    val dRef = (as ++ bs).distinct.map { x =>
      math.abs(as.count(_ <= x).toDouble / as.length -
        bs.count(_ <= x).toDouble / bs.length)
    }.max
    assert(math.abs(ks - dRef) <= 5e-4, s"D $ks vs brute-force $dRef")
    assert(ks >= 0.0 && ks <= 1.0)
    assert(rej == (ks > crit), "verdict must follow the emitted rounded values")
  }

  test("q_ml_logreg == plain-Scala IRLS at the same iteration/rounding schedule") {
    val row = q("q_ml_logreg").collect()(0)
    val (w0, w1, ll, nCorrect) =
      (row.getDouble(4), row.getDouble(5), row.getDouble(6), row.getLong(7))
    val pts = graft.Tables.t(spark, sf, "events")
      .where(col("event_type").isin("click", "purchase"))
      .select((col("event_type") === "purchase").cast("double"), col("value"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    def r(x: Double, dp: Int) =
      BigDecimal(x).setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble
    var (a, b) = (0.0, 0.0)
    for (_ <- 1 to 3) {
      val rows = pts.map { case (y, x) =>
        val eta = a + b * x
        val mu = r(1.0 / (1.0 + math.exp(-eta)), 10)
        val wt = mu * (1.0 - mu)
        (x, wt, eta + (y - mu) / wt)
      }
      val sw = rows.map(_._2).sum
      val swx = rows.map(t => t._2 * t._1).sum
      val swxx = rows.map(t => t._2 * t._1 * t._1).sum
      val swz = rows.map(t => t._2 * t._3).sum
      val swxz = rows.map(t => t._2 * t._1 * t._3).sum
      val b1 = (sw * swxz - swx * swz) / (sw * swxx - swx * swx)
      a = r((swz - b1 * swx) / sw, 8); b = r(b1, 8)
    }
    // plain double sums vs the query's decimal partials: agree to ~1e-6
    assert(math.abs(w0 - a) < 1e-5, s"w0 $w0 vs reference $a")
    assert(math.abs(w1 - b) < 1e-5, s"w1 $w1 vs reference $b")
    val llRef = pts.map { case (y, x) =>
      val mu = r(1.0 / (1.0 + math.exp(-(a + b * x))), 10)
      if (y == 1.0) math.log(mu) else math.log(1.0 - mu)
    }.sum
    assert(math.abs(ll - llRef) < 1e-2, s"ll $ll vs reference $llRef")
    assert(nCorrect >= 0 && nCorrect <= pts.length)
  }

  test("q_ml_logreg learns a separable fixture: positive slope, high accuracy") {
    // clicks cluster at low values, purchases at high — w1 must come out
    // positive and the 0.5-threshold classifier nearly perfect
    val dir = ksEventsDir(
      (1 to 50).map(i => ("click", 10.0 + (i % 10))) ++
      (1 to 50).map(i => ("purchase", 40.0 + (i % 10))))
    val row = SparkEntry.queries("q_ml_logreg")(spark, dir).collect()(0)
    assert((row.getLong(2), row.getLong(3)) == ((50L, 50L)))
    assert(row.getDouble(5) > 0.0, s"slope ${row.getDouble(5)} must be positive")
    assert(row.getLong(7) >= 95L, s"accuracy ${row.getLong(7)}/100 too low")
    assert(row.getDouble(6) <= 0.0, "log-likelihood must be non-positive")
  }

  test("q_stats_ks closed forms: disjoint samples reject, identical samples give D=0") {
    // 100 clicks at 1.0 vs 100 purchases at 2.0: D = 1, crit ≈ 0.1921
    val disjoint = SparkEntry.queries("q_stats_ks")(spark, ksEventsDir(
      Seq.fill(100)(("click", 1.0)) ++ Seq.fill(100)(("purchase", 2.0)))).collect()(0)
    assert((disjoint.getLong(2), disjoint.getLong(3)) == ((100L, 100L)))
    assert(disjoint.getDouble(4) == 1.0, s"D=${disjoint.getDouble(4)}")
    assert(disjoint.getDouble(5) == 0.1921)
    assert(disjoint.getBoolean(6), "disjoint samples must reject H0")
    // identical samples: D = 0, never rejected
    val same = SparkEntry.queries("q_stats_ks")(spark, ksEventsDir(
      (1 to 4).flatMap(v => Seq(("click", v.toDouble), ("purchase", v.toDouble))))).collect()(0)
    assert(same.getDouble(4) == 0.0)
    assert(!same.getBoolean(6))
  }
}
