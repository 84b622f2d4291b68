package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (DESIGN.md §3). AQE's runtime skew-join split
  * handles sort-merge skew automatically; explicit salting remains the tool
  * when one join key dominates AND the build side must replicate — e.g. a
  * hot user/document id at 100 TB. Upstream analog: none (SNOWAV is
  * single-process); this is pure scale engineering.
  */
object Skew {

  /** Salted equi-join of a skewed `facts` side against a smaller `dims`
    * side on `key`:
    *
    *   - facts get a DETERMINISTIC salt in [0, buckets) hashed from
    *     `saltSource` (a unique-ish column — never `rand()`, which breaks
    *     retry/replay determinism);
    *   - dims replicate `buckets`× (explode over the salt range);
    *   - the join key becomes (key, salt), so one hot key spreads across
    *     `buckets` reducers instead of one.
    *
    * Result rows are identical to `facts.join(dims, key)` — asserted in
    * SkewSpec — with shuffle volume dims×buckets larger on the small side,
    * the standard trade.
    */
  def saltedJoin(facts: DataFrame, dims: DataFrame, key: String,
      saltSource: Column, buckets: Int): DataFrame = {
    val salted = facts.withColumn("__salt", pmod(hash(saltSource), lit(buckets)))
    val replicated = dims.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
