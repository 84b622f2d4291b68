package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics + plan shape of the TextMining pack (chunking, entropy, PMI)
  * and the containment dedup op — the properties the row-hash oracle can't
  * express: exact reconstruction, closed-form values on fixtures, and the
  * quote-inclusion case Jaccard provably misses. */
class TextMiningSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.SF
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  /** documents.parquet fixture dir the registered queries can read. */
  private def docsDir(rows: Seq[(Long, String, String, String, Long)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-textmine").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("q_text_chunk reconstructs every document exactly (offsets + overlap)") {
    val texts = Tables.t(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val chunks = q("q_text_chunk").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3)))
      .groupBy(_._1)
    assert(chunks.keySet == texts.keySet)
    chunks.foreach { case (id, cs) =>
      val text = texts(id)
      val sorted = cs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == sorted.indices.toSeq, s"doc $id chunk_ids not dense")
      assert(sorted.length == math.max(math.ceil(text.length / 150.0).toInt, 1))
      sorted.foreach { case (_, i, start, chunk) =>
        assert(start == i * 150L)
        val expected = text.substring(i * 150, math.min(i * 150 + 200, text.length))
        assert(chunk == expected, s"doc $id chunk $i mismatch")
      }
      // full coverage: last chunk reaches the end of the doc
      val last = sorted.last
      assert(last._3 + last._4.length == text.length, s"doc $id tail not covered")
    }
  }

  test("q_text_chunk is a narrow op: only the presentation sort exchanges") {
    val df = q("q_text_chunk")
    df.collect()
    // AdaptiveSparkPlan.toString prints final AND initial plan — slice
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    // exactly one hash exchange (the single-row-group fixture repartition);
    // chunking itself is Generate+Project — it never shuffles or joins
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 1, p)
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"), p)
    assert(p.contains("Generate explode"), p)
  }

  test("q_text_entropy matches closed forms on a fixture corpus") {
    val dir = docsDir(Seq(
      (1L, "a a b b", "en", "s", 7L),   // uniform over 2 types: H = ln 2
      (2L, "z", "en", "s", 1L),         // single token: H = 0
      (3L, "a a a b", "en", "s", 7L)))  // H = ln4 - (3 ln3)/4
    val rows = SparkEntry.queries("q_text_entropy")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(rows(1L) == ((4L, 2L, BigDecimal(math.log(2)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(rows(2L)._3 == 0.0)
    val h3 = math.log(4) - 3 * math.log(3) / 4
    assert(math.abs(rows(3L)._3 - h3) < 1e-4)
  }

  test("q_text_entropy is a narrow op: run-length fold, no aggregation shuffle") {
    val df = q("q_text_entropy")
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    // a per-doc statistic must not shuffle the corpus: the only hash
    // exchange is the single-row-group fixture repartition, and there is
    // no HashAggregate at all (counts come from the per-row sorted fold)
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 1, p)
    assert(!p.contains("HashAggregate") && !p.contains("SortAggregate"), p)
  }

  test("q_text_entropy bounds: 0 <= H <= ln(n_types)") {
    q("q_text_entropy").collect().foreach { r =>
      val (types, h) = (r.getLong(2), r.getDouble(3))
      // 5e-5 slack: values are rounded to 4dp, which can land just above ln(types)
      assert(h >= -1e-9 && h <= math.log(types.toDouble) + 5e-5,
        s"doc ${r.getLong(0)}: H=$h types=$types")
    }
  }

  test("q_text_pmi matches the closed form on an always-co-occurring fixture") {
    // 25 two-token docs "p q": c_xy=25, c_p=c_q=25, N_uni=50, N_big=25
    // PMI = ln25 + 2 ln50 - ln25 - ln25 - ln25 = 2 ln 2
    val dir = docsDir((1 to 25).map(i => (i.toLong, "p q", "en", "s", 3L)))
    val rows = SparkEntry.queries("q_text_pmi")(spark, dir).collect()
    assert(rows.length == 1)
    assert(rows.head.getString(0) == "p q" && rows.head.getLong(1) == 25L)
    assert(math.abs(rows.head.getDouble(2) - 2 * math.log(2)) < 1e-4)
  }

  test("q_text_pmi output is support-filtered and PMI-sorted") {
    val rows = q("q_text_pmi").collect()
    assert(rows.length <= 30)
    rows.foreach(r => assert(r.getLong(1) >= 20))
    val pmis = rows.map(_.getDouble(2)).toSeq
    assert(pmis == pmis.sorted(Ordering[Double].reverse))
  }

  test("q_text_ppl matches the closed form on a uniform fixture corpus") {
    // 25 docs "p q": V=2, c_pq=25, c_p=25 -> every doc's single bigram has
    // nll = ln(25+2) - ln(25+1) = ln(27/26)
    val dir = docsDir((1 to 25).map(i => (i.toLong, "p q", "en", "s", 3L)))
    val rows = SparkEntry.queries("q_text_ppl")(spark, dir).collect()
    assert(rows.length == 25)
    val expected = BigDecimal(math.log(27.0 / 26.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    rows.foreach { r =>
      assert(r.getLong(1) == 1L)
      assert(r.getDouble(2) == expected, s"doc ${r.getLong(0)}")
    }
  }

  test("q_text_ppl scores an out-of-distribution doc worse than in-corpus docs") {
    // 30 identical in-distribution docs + 1 doc of never-repeated tokens:
    // the model assigns the unseen bigrams only smoothing mass, so the
    // outlier's avg_nll must exceed every in-distribution doc's
    val docs = (1 to 30).map(i => (i.toLong, "the quick brown fox jumps", "en", "s", 25L)) :+
      ((31L, "zq xw vv uy tt", "en", "s", 14L))
    val dir = docsDir(docs)
    val rows = SparkEntry.queries("q_text_ppl")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val inDist = (1 to 30).map(i => rows(i.toLong)).max
    assert(rows(31L) > inDist, s"outlier ${rows(31L)} vs in-dist max $inDist")
  }

  test("containment catches quote inclusion that Jaccard misses") {
    // doc 2 = 200 unique tokens; doc 1 = a verbatim 30-token excerpt.
    // Shingles: |A|=28, |B|=198, all of A's inside B ->
    // jac = 28/(28+198-28) = 0.141 (invisible at tau=0.8); cont = 1.0.
    val big = (1 to 200).map(i => s"w$i").mkString(" ")
    val excerpt = (50 until 80).map(i => s"w$i").mkString(" ")
    val dir = docsDir(Seq(
      (1L, excerpt, "en", "s", excerpt.length.toLong),
      (2L, big, "en", "s", big.length.toLong)))
    val cont = SparkEntry.queries("q_dedup_containment")(spark, dir).collect()
    assert(cont.length == 1)
    assert((cont.head.getLong(0), cont.head.getLong(1)) == ((1L, 2L)))
    assert(cont.head.getDouble(2) == 1.0)
    val near = SparkEntry.queries("q_dedup_near")(spark, dir).collect()
    assert(near.isEmpty, "Jaccard at 0.8 should NOT flag the excerpt pair")
  }

  test("q_multimodal_phash collides same-first-frame media and nothing else") {
    // docs 1,2: identical first 32 chars, different tails -> same phash.
    // doc 3: no spaces in the first frame -> every bit set (uniform bytes),
    // a different bit pattern from frameA's space-zeroed bits. doc 4:
    // different lang blocks the group even with an identical payload.
    val frameA = "aa bb cc dd ee ff gg hh iii jjj "
    assert(frameA.length == 32)
    val dir = docsDir(Seq(
      (1L, frameA + "tail one xx", "en", "s", 43L),
      (2L, frameA + "different tail yy zz", "en", "s", 52L),
      (3L, "z" * 32 + " tail one xx", "en", "s", 44L),
      (4L, frameA + "tail one xx", "de", "s", 43L)))
    val rows = SparkEntry.queries("q_multimodal_phash")(spark, dir).collect()
    assert(rows.map(_.getLong(0)).toSet == Set(1L, 2L), rows.mkString(";"))
    assert(rows.map(_.getLong(2)).distinct.length == 1, "same phash")
    rows.foreach(r => assert(r.getLong(3) == 2L))
  }

  test("containment dominates Jaccard on every shared pair") {
    val jac = q("q_dedup_near").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val cont = q("q_dedup_containment").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // |∩|/min <= 1 and >= |∩|/union: containment >= jaccard wherever both fire
    jac.keys.filter(cont.contains).foreach { k =>
      assert(cont(k) >= jac(k) - 1e-9, s"pair $k cont ${cont(k)} < jac ${jac(k)}")
    }
    cont.values.foreach(c => assert(c >= 0.9 && c <= 1.0))
  }

  test("fuzzySelfJoin == naive all-pairs levenshtein on random variable-length strings") {
    import spark.implicits._
    // small alphabet + short lengths → dense distance-1 neighborhoods,
    // INCLUDING insert/delete pairs (different lengths), which the
    // fixed-length customer fixture cannot produce
    val rnd = new scala.util.Random(7)
    val names = (0L until 120L)
      .map(i => (i, (1 to (1 + rnd.nextInt(4))).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString))
      .toDF("k", "nm")
    val blocked = graft.operators.TextMining.fuzzySelfJoin(names)
      .select("k_a", "k_b", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    val naive = names.as("a").crossJoin(names.as("b"))
      .where(col("a.k") < col("b.k") &&
        levenshtein(col("a.nm"), col("b.nm")) <= 1)
      .select(col("a.k"), col("b.k"), levenshtein(col("a.nm"), col("b.nm")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    assert(naive.nonEmpty && naive.exists(_._3 == 1), "fixture produced no fuzzy pairs")
    assert(blocked == naive)
    // and the production plan blocks on an equi-key — no quadratic operator
    val p = SparkEntry.queries("q_join_fuzzy")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
  }

  test("q_ml_naive_bayes == plain-Scala multinomial NB with add-1 smoothing") {
    val docs = graft.Tables.t(spark, sf, "documents")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).split(" ").toSeq))
    val classTok = docs.flatMap { case (_, l, ts) => ts.map((l, _)) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val classTot = classTok.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val vocabN = classTok.keySet.map(_._2).size
    val priors = docs.groupBy(_._2).view.mapValues(_.length).toMap
    val langs = priors.keys.toSeq.sorted
    val predicted = docs.map { case (_, actual, ts) =>
      // mirror the query's decimal-exact accumulation: BigDecimal sums of
      // per-term doubles; ties break toward the SMALLER lang (maxBy keeps
      // the first max, langs sorted ascending — the query's model_lang asc)
      def score(c: String): BigDecimal = {
        val tfs = ts.groupBy(identity).view.mapValues(_.size).toMap
        val s1 = tfs.map { case (t, tf) =>
          BigDecimal(tf * math.log(classTok.getOrElse((c, t), 0L) + 1.0)) }.sum
        s1 + BigDecimal(-ts.length * math.log(classTot(c) + vocabN.toDouble)) +
          BigDecimal(math.log(priors(c).toDouble / docs.length))
      }
      (actual, langs.maxBy(score))
    }
    val want = predicted.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = SparkEntry.queries("q_ml_naive_bayes")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == want, s"confusion matrix differs\n got: $got\nwant: $want")
    assert(got.values.sum == docs.length, "docs not conserved")
    langs.foreach(l => assert(got.getOrElse((l, l), 0L) >= 0L))
  }

  private def substrRows(name: String, dir: String) =
    SparkEntry.queries(name)(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))).toMap

  test("q_dedup_substring matches closed forms: span union, disjoint islands, overlap merge") {
    def d(id: Long, text: String) =
      (id, text, "en", "s", text.length.toLong)
    val r1 = "a b c d e f g h"                     // 8-token run shared 1↔2
    val r2 = "p q r s t u v w"                     // run shared 4↔5
    val r3 = "k l m n o k2 l2 m2"                  // run shared 4↔6
    val c9 = "c1 c2 c3 c4 c5 c6 c7 c8 c9"          // 9-token run shared 7↔8
    val dir = docsDir(Seq(
      d(1L, s"$r1 x1 x2 x3 x4"),                   // run at [0,7] of 12
      d(2L, s"z1 z2 $r1 z3"),                      // run at [2,9] of 11
      d(3L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10"),     // unique: absent
      d(4L, s"$r2 g1 g2 $r3"),                     // TWO disjoint islands
      d(5L, s"$r2 h1 h2 h3 h4 h5 h6 h7 h8 h9"),
      d(6L, s"$r3 i1 i2 i3 i4 i5 i6 i7 i8 i9"),
      d(7L, s"$c9 j1"),                            // 2 overlapping windows → 1 island
      d(8L, s"k1 $c9")))
    val got = substrRows("q_dedup_substring", dir)
    // (n_toks, n_grams, dup_grams, n_spans, dup_tokens, dup_ratio)
    assert(got.keySet == Set(1L, 2L, 4L, 5L, 6L, 7L, 8L))
    assert(got(1L) == ((12L, 5L, 1L, 1L, 8L, 0.6667)))
    assert(got(2L) == ((11L, 4L, 1L, 1L, 8L, 0.7273)))
    assert(got(4L) == ((18L, 11L, 2L, 2L, 16L, 0.8889)), s"doc 4: ${got(4L)}")
    assert(got(5L) == ((17L, 10L, 1L, 1L, 8L, 0.4706)))
    assert(got(6L) == ((17L, 10L, 1L, 1L, 8L, 0.4706)))
    assert(got(7L) == ((10L, 3L, 2L, 1L, 9L, 0.9)), s"doc 7: ${got(7L)}")
    assert(got(8L) == ((10L, 3L, 2L, 1L, 9L, 0.9)))
  }

  test("q_dedup_substring_delta marks batch-vs-corpus windows only, never within-batch") {
    def d(id: Long, text: String) =
      (id, text, "en", "s", text.length.toLong)
    val r1 = "a b c d e f g h"
    val rb = "b1 b2 b3 b4 b5 b6 b7 b8"
    val dir = docsDir(Seq(
      d(1L, s"$r1 c1 c2"),                          // corpus holds r1
      d(2L, "d1 d2 d3 d4 d5 d6 d7 d8"),             // corpus, unique
      d(7L, s"$r1 $rb"),                            // batch: r1 hits corpus
      d(17L, s"$rb e1 e2 e3 e4 e5 e6 e7 e8")))      // batch: rb only in batch
    val got = substrRows("q_dedup_substring_delta", dir)
    // only doc 7's r1 window [0,7] is corpus-duplicated; rb (shared with
    // batch-mate 17 only) is out of the delta's cross-side contract
    assert(got.keySet == Set(7L), s"got $got")
    assert(got(7L) == ((16L, 9L, 1L, 1L, 8L, 0.5)), s"doc 7: ${got(7L)}")
  }

  test("q_dedup_substring invariants hold on the corpus: 8·n_spans <= dup_tokens <= min(n_toks, 8·dup_grams)") {
    val rows = substrRows("q_dedup_substring", sf)
    assert(rows.nonEmpty, "sf corpus has no duplicated spans — fixture drifted")
    rows.foreach { case (id, (nToks, nGrams, dupGrams, nSpans, dupToks, ratio)) =>
      assert(nGrams == nToks - 7, s"doc $id")
      assert(dupGrams >= 1L && dupGrams <= nGrams, s"doc $id")
      assert(nSpans >= 1L && nSpans <= dupGrams, s"doc $id")
      assert(dupToks >= 8L * nSpans, s"doc $id: islands shorter than the window")
      assert(dupToks <= math.min(nToks, 8L * dupGrams), s"doc $id: union overcounts")
      assert(math.abs(ratio - dupToks.toDouble / nToks) < 1e-3, s"doc $id ratio")
    }
  }
}
