package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Salted join: identical results to the plain join, salt spreads the hot
  * key across buckets. */
class SkewSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("saltedJoin == plain join on a skewed key distribution") {
    import spark.implicits._
    // 10k rows of hot key 1 + a uniform tail — the skew shape AQE/salting target
    val facts = spark.range(10000).select(lit(1L).as("k"), col("id").as("v"))
      .union(spark.range(500).select((col("id") % 50 + 2).as("k"), col("id").as("v")))
    val dims = spark.range(60).select(col("id").as("k"),
      concat(lit("d"), col("id")).as("name"))
    val plain = facts.join(dims, "k")
      .select("k", "v", "name").orderBy("k", "v").collect()
    val salted = Skew.saltedJoin(facts, dims, "k", col("v"), 8)
      .select("k", "v", "name").orderBy("k", "v").collect()
    assert(salted.length == plain.length)
    assert(salted.map(_.toString).sameElements(plain.map(_.toString)))
  }

  test("salt values are deterministic and span the bucket range") {
    import spark.implicits._
    val df = spark.range(1000).select(col("id"))
      .withColumn("salt", pmod(hash(col("id")), lit(8)))
    val salts = df.select("salt").distinct().collect().map(_.getInt(0)).sorted
    assert(salts.sameElements(0 until 8))
    val again = spark.range(1000).select(col("id"))
      .withColumn("salt", pmod(hash(col("id")), lit(8)))
    assert(df.collect().map(_.toString).sameElements(again.collect().map(_.toString)))
  }
}
