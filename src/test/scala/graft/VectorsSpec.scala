package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics the oracle can't fully pin down for the Vectors pack:
  * quantization error bounds, SQ-ANN recall vs exact knn, and the
  * map-side-heap plan shape of both top-k stages. */
class VectorsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.SF
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("int8 quantization: codes bounded, max dim saturates, MSE small") {
    val rows = q("q_emb_quantize").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val l1 = r.getLong(r.fieldIndex("l1_q"))
      val nnz = r.getLong(r.fieldIndex("nnz"))
      val mse = r.getDouble(r.fieldIndex("mse_e6"))
      assert(l1 <= 64L * 127, s"vec ${r.get(0)}: l1_q $l1 exceeds 64*127")
      assert(l1 >= 127, s"vec ${r.get(0)}: some dim must saturate at ±127, l1=$l1")
      assert(nnz >= 1 && nnz <= 64, s"vec ${r.get(0)}: nnz $nnz out of range")
      // per-dim |err| <= maxabs/254; embeddings are unit-ish (maxabs < 1),
      // so MSE*1e6 < (1/254)^2*1e6 ≈ 15.5 — generous factor-10 headroom
      assert(mse >= 0 && mse <= 155.0, s"vec ${r.get(0)}: mse_e6 $mse too large")
    }
  }

  test("quantized codes round-trip: reconstructed cosine vs original >= 0.999") {
    // direct check that int8 reconstruction preserves direction — the
    // property the SQ-ANN coarse ranking relies on
    val e = Tables.t(spark, sf, "embeddings")
      .withColumn("maxabs", array_max(transform(col("embedding"), x => abs(x.cast("double")))))
      .withColumn("recon", transform(col("embedding"), x =>
        (round(x.cast("double") * 127.0 / col("maxabs"), 0) * col("maxabs") / 127.0)
          .cast("float")))
    val cos = org.apache.spark.sql.graftx.VectorExprs.cosineSim(
      col("embedding"), col("recon"))
    val minCos = e.select(min(cos)).head().getDouble(0)
    assert(minCos >= 0.999, s"reconstruction distorts direction: min cos $minCos")
  }

  test("SQ-ANN recall vs exact knn top-3 >= 0.9") {
    val exact = q("q_sim_knn").where(col("rnk") <= 3)
      .select("vec_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sq = q("q_baseline_ann_sq")
      .select("vec_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    val recall = exact.intersect(sq).size.toDouble / exact.size
    assert(recall >= 0.9, s"SQ recall $recall < 0.9 (${sq.size} vs ${exact.size})")
  }

  test("int_dot native expression: == HOF form, SQL-callable, NULL on mismatch") {
    import spark.implicits._
    val qvecs = Tables.t(spark, sf, "embeddings")
      .withColumn("maxabs", array_max(transform(col("embedding"), x => abs(x.cast("double")))))
      .withColumn("qvec", transform(col("embedding"), x =>
        round(x.cast("double") * 127.0 / col("maxabs"), 0).cast("long")))
      .select("vec_id", "qvec").limit(50)
    val pairs = qvecs.as("a").crossJoin(qvecs.as("b"))
    val native = org.apache.spark.sql.graftx.VectorExprs.intDot(col("a.qvec"), col("b.qvec"))
    val hof = aggregate(zip_with(col("a.qvec"), col("b.qvec"), (x, y) => x * y),
      lit(0L), (acc, x) => acc + x)
    assert(pairs.where(native =!= hof || native.isNull).count() == 0)
    // SQL registration via GraftExtensions
    val viaSql = spark.sql("SELECT int_dot(array(1L,2L,3L), array(4L,5L,6L))").head().getLong(0)
    assert(viaSql == 32L)
    // length mismatch must be NULL, never a wrong value
    assert(spark.sql("SELECT int_dot(array(1L), array(1L,2L))").head().isNullAt(0))
  }

  test("q_baseline_ann_sq runs both top-k stages through map-side TopKPerKey heaps") {
    val df = q("q_baseline_ann_sq")
    df.collect() // finalize AQE on THIS plan
    val p = df.queryExecution.executedPlan.toString
    assert("TopKPerKeyPartial".r.findAllIn(p).size >= 2, p)
    assert("TopKPerKeyFinal".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("WindowExec"), p)
  }

  test("q_ml_pca_power == plain-Scala power iteration at the same schedule") {
    val rows = q("q_ml_pca_power").collect()
      .map(r => r.getLong(0) -> (r.getDouble(2), r.getDouble(3), r.getDouble(5)))
      .toMap
    assert(rows.size == 64)
    // unit-norm loading (to the emitted 4dp)
    val norm2 = rows.values.map(t => t._1 * t._1).sum
    assert(math.abs(norm2 - 1.0) < 1e-2, s"loading norm² $norm2")
    // plain-Scala reference: same centering, T=3, same rounding schedule
    def r(x: Double, dp: Int) =
      BigDecimal(x).setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble
    val xs = Tables.t(spark, sf, "embeddings").select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val n = xs.length
    val mu = Array.tabulate(64)(j => r(xs.map(_(j)).sum / n, 10))
    val c = xs.map(x => Array.tabulate(64)(j => x(j) - mu(j)))
    var v = Array.fill(64)(0.125)
    for (_ <- 1 to 3) {
      val s = c.map(ci => r(ci.zip(v).map { case (a, b) => a * b }.sum, 8))
      val w = Array.tabulate(64)(j => c.zip(s).map { case (ci, si) => ci(j) * si }.sum)
      val nrm = math.sqrt(w.map(x => x * x).sum)
      v = w.map(x => r(x / nrm, 10))
    }
    val s = c.map(ci => r(ci.zip(v).map { case (a, b) => a * b }.sum, 8))
    val lam = s.map(x => x * x).sum / (n - 1)
    val tv = c.flatten.map(x => x * x).sum / (n - 1)
    rows.foreach { case (dim, (loading, eig, evr)) =>
      // plain double sums vs the query's decimal partials: ~1e-6 agreement
      assert(math.abs(loading - v(dim.toInt - 1)) < 1e-3,
        s"dim $dim loading $loading vs reference ${v(dim.toInt - 1)}")
      assert(math.abs(eig - lam) < 1e-3, s"eigval $eig vs reference $lam")
      assert(math.abs(evr - lam / tv) < 1e-3, s"evr $evr vs reference ${lam / tv}")
    }
  }

  test("q_ml_kmeans == plain-Scala Lloyd at the same seed/rounding schedule") {
    val got = q("q_ml_kmeans").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val xs = Tables.t(spark, sf, "embeddings").select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    assert(got.map(_._1).toSet == xs.keySet, "one verdict per vector")
    val used = got.map(_._2).toSet
    assert(used.size >= 2 && used.size <= 8, s"clusters used: $used")
    // plain-Scala reference: md5-ranked seeds, 3 Lloyd steps, the same
    // 4dp-distance / 6dp-mean rounding schedule as the oracle pair
    def r(x: Double, dp: Int) =
      BigDecimal(x).setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    var cents: Map[Int, Array[Double]] = xs.keys.toSeq
      .sortBy(id => md5hex(s"km:$id")).take(8).zipWithIndex
      .map { case (id, i) => (i + 1) -> xs(id) }.toMap
    def sqd(x: Array[Double], c: Array[Double]): Double =
      // r4 = round(cast(· AS DECIMAL(38,6)), 4): TWO-stage rounding — a
      // raw 0.9442499̄ lands on the .94425 boundary at 6dp and HALF_UPs
      // to 0.9443, where a single 4dp round gives 0.9442
      r(r(x.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum, 6), 4)
    def assign(): Map[Long, (Int, Double)] = xs.map { case (id, x) =>
      id -> cents.toSeq.map { case (c, cent) => (sqd(x, cent), c) }.minBy(identity)
        .swap
    }
    for (_ <- 1 to 3) {
      val a = assign()
      cents = a.groupBy(_._2._1).map { case (c, members) =>
        val vs = members.keys.map(xs).toSeq
        // stay in decimal until the final double division — rounding the
        // 6dp values back to binary doubles before summing loses the
        // exactness the engine's DECIMAL(38,6) partials have
        c -> Array.tabulate(64)(j =>
          vs.map(v => BigDecimal(v(j))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble / vs.size)
      }
    }
    val ref = assign()
    got.foreach { case (id, cl, sd) =>
      assert(cl == ref(id)._1, s"vec $id cluster $cl vs reference ${ref(id)._1}")
      assert(math.abs(sd - ref(id)._2) < 1e-9, s"vec $id sd $sd vs ${ref(id)._2}")
    }
  }

  test("q_ml_kmeans_cells: memberships sum to N, inertia == member sd sums") {
    val assign = q("q_ml_kmeans").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val cells = q("q_ml_kmeans_cells").collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(cells.values.map(_._1).sum == assign.length, "memberships != corpus")
    def r(x: Double, dp: Int) =
      BigDecimal(x).setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble
    assign.groupBy(_._2).foreach { case (cl, members) =>
      assert(cells(cl)._1 == members.length, s"cluster $cl size")
      // member sds are exact 4dp values — a decimal sum reproduces inertia
      val want = members.map(m => BigDecimal(m._3).setScale(4,
        BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
      assert(math.abs(cells(cl)._2 - r(want, 4)) < 1e-9,
        s"cluster $cl inertia ${cells(cl)._2} vs $want")
    }
  }

  test("q_ml_kmeans_assign: batch verdicts == corpus assignment restricted to batch ids") {
    val batch = q("q_ml_kmeans_assign").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(batch.nonEmpty && batch.forall(_._1 % 10 == 7),
      "batch contract: vec_id%10=7 only")
    val full = q("q_ml_kmeans").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
      .filter(_._1 % 10 == 7)
    assert(batch.sorted.sameElements(full.sorted),
      "shared scoring chain must make the ingest face a restriction")
  }

  test("q_ml_pca_project scores the batch against the frozen component (Pythagoras + reference)") {
    val comp = q("q_ml_pca_power").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap // dim -> (mu, loading)
    val got = q("q_ml_pca_project").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(got.nonEmpty && got.forall(_._1 % 10 == 7), "batch contract: vec_id%10=7 only")
    val xs = Tables.t(spark, sf, "embeddings").where(col("vec_id") % 10 === 7)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    assert(got.map(_._1).toSet == xs.keySet)
    got.foreach { case (id, score, resid) =>
      val c = Array.tabulate(64)(j => xs(id)(j) - comp(j + 1L)._1)
      val scoreRef = c.zipWithIndex.map { case (cj, j) => cj * comp(j + 1L)._2 }.sum
      // emitted 4dp component vs the artifact's 10dp: tolerance covers it
      assert(math.abs(score - scoreRef) < 5e-3, s"vec $id score $score vs ref $scoreRef")
      assert(resid >= 0.0, s"vec $id resid $resid")
      val ss = c.map(x => x * x).sum
      assert(math.abs(score * score + resid * resid - ss) < 1e-2,
        s"vec $id Pythagoras: $score² + $resid² ≠ $ss")
    }
  }

  test("q_ml_pca_power recovers a planted dominant direction") {
    import spark.implicits._
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft-pca").toString
    // large deterministic spread along e1, small INDEPENDENT spread along
    // e2, zero elsewhere → PC1 must align with e1 and explain almost all
    // variance; dims 3..64 are constant, so their loadings must be 0
    val rows = (1 to 100).map { i =>
      val t = (i % 10 + 1) * 0.2 * (if (i % 2 == 0) 1.0 else -1.0)
      val u = 0.1 * (if ((i / 2) % 2 == 0) 1.0 else -1.0)
      val vec = Array.fill(64)(0.0f)
      vec(0) = (t * 2.0).toFloat
      vec(1) = u.toFloat
      (i.toLong, vec.toSeq, i % 3)
    }
    rows.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val got = SparkEntry.queries("q_ml_pca_power")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getDouble(2), r.getDouble(5))).toMap
    assert(got.size == 64)
    assert(math.abs(got(1L)._1) > 0.99,
      s"PC1 must align with e1, loading ${got(1L)._1}")
    assert(math.abs(got(2L)._1) < 0.15, s"e2 loading ${got(2L)._1} too large")
    (3L to 64L).foreach(d => assert(got(d)._1 == 0.0, s"dim $d leaked ${got(d)._1}"))
    assert(got(1L)._2 > 0.95, s"evr ${got(1L)._2} must be dominated by e1")
  }
}
