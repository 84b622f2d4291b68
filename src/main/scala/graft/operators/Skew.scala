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

  /** Bin-bucketed rewrite of an interval join (`lo <= v < hi`).
    *
    * Spark plans a pure range predicate as a nested-loop join — O(n·m)
    * comparisons, fine for a 6-row broadcast band table, fatal when the
    * interval side grows. The standard fix: quantize the value domain into
    * fixed-width bins, explode each interval into every bin it overlaps,
    * map each fact row to its single bin, equi-join on the bin id, and
    * re-check the exact predicate as a residual filter. The plan becomes a
    * hash join on `__bin` — partitionable, shuffle-bounded, AQE-visible —
    * at the cost of ceil((hi−lo)/w)+1 copies of each interval row.
    *
    * Row-identical to `facts.join(intervals, lo <= v && v < hi)` for any
    * `binWidth > 0` (asserted in SkewSpec): bins only over-approximate the
    * candidate set and the residual filter removes the excess. Pick `w` ≈
    * the median interval width so most intervals land in 1–2 bins.
    */
  def binnedRangeJoin(facts: DataFrame, v: Column, intervals: DataFrame,
      lo: Column, hi: Column, binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    // internal join-key name must not collide with (and silently destroy) a
    // caller column — this is public API, not query-local plumbing
    val bin = "__graft_range_bin"
    require(!facts.columns.contains(bin) && !intervals.columns.contains(bin),
      s"inputs must not already carry a '$bin' column")
    // hi is exclusive but floor(hi/w) is still included: an interval ending
    // exactly on a bin edge contributes a no-match bin the residual filter
    // clears — cheaper than special-casing the edge on both engines
    val binned = intervals.withColumn(bin,
      explode(sequence(floor(lo / binWidth).cast("long"),
        floor(hi / binWidth).cast("long"))))
    facts.withColumn(bin, floor(v / binWidth).cast("long"))
      .join(binned, Seq(bin))
      .where(lo <= v && v < hi)
      .drop(bin)
  }
}
