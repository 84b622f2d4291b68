package org.apache.spark.sql.graftx

import org.apache.spark.sql.{DataFrame, Row}

/** Plan-statistics access for size-gated physical hints (needs the
  * `org.apache.spark.sql` package for `sessionState`/`queryExecution`).
  *
  * Motivation (VERDICT r3/r4): a forced `broadcast(df)` hint bypasses
  * `spark.sql.autoBroadcastJoinThreshold` entirely — correct and fast when
  * `df` is a low-cardinality derived table on testdata, an OOM on a
  * 1000-executor cluster when the same derived table scales O(#documents).
  * The scale-safe form is to consult Catalyst's own size estimate and only
  * hint when the estimate fits the session's broadcast budget; above it the
  * plan falls back to a shuffled join (and AQE may still convert it back to
  * a broadcast at runtime from observed sizes — the right mechanism).
  */
object Sizing {

  private def classic(df: DataFrame): org.apache.spark.sql.classic.Dataset[Row] =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]

  /** Catalyst's estimated size in bytes of the optimized plan (for cached
    * inputs this reflects the materialized InMemoryRelation statistics). */
  def estimatedBytes(df: DataFrame): BigInt =
    classic(df).queryExecution.optimizedPlan.stats.sizeInBytes

  /** The session's `spark.sql.autoBroadcastJoinThreshold` in bytes
    * (negative = broadcasting disabled). */
  def broadcastThreshold(df: DataFrame): Long =
    classic(df).sparkSession.sessionState.conf.autoBroadcastJoinThreshold

  /** The session's resolved `spark.sql.shuffle.partitions` as an Int.
    * Reading the raw conf string and parsing it throws on runtimes where
    * the conf is non-numeric (e.g. "auto" on some managed platforms);
    * the session state holds the already-resolved value (ADVICE r21). */
  def numShufflePartitions(df: DataFrame): Int =
    classic(df).sparkSession.sessionState.conf.numShufflePartitions
}
