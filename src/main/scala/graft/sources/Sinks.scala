package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Sinks + partition-layout utilities. Upstream analogs: SNOWAV's SQL
  * store insert with overlap-delete semantics and the per-band CSV export
  * ([U] SURVEY.md §3A `database.py` delete/add_rows, `write_properties`;
  * /root/reference was empty at survey time, §0).
  *
  * Scale notes (100 TB): the fact store is hive-partitioned parquet —
  * partition columns carry the predicate pruning (a reader filtering on
  * `part_key` never lists, opens, or scans other directories; verified via
  * PartitionFilters in SinkSpec), and idempotent re-runs use dynamic
  * partition overwrite (replace exactly the partitions present in the new
  * batch — SNOWAV's delete-overlap, without a delete). */
object Sinks {

  /** Write hive-partitioned parquet. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Idempotent incremental load: replaces ONLY the partitions present in
    * `batch` (dynamic partition overwrite), leaving others intact — the
    * overlap-delete/upsert pattern with no read-modify-write cycle. */
  def overwritePartitions(batch: DataFrame, path: String, partitionCols: Seq[String]): Unit = {
    val spark = batch.sparkSession
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try batch.write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*).parquet(path)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  /** CSV export with header (SNOWAV write_properties analog). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  /** Read back a partitioned store. */
  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Persist a table bucketed on a join key. Two tables bucketed the same
    * way join with ZERO shuffle (co-located sort-merge — asserted in
    * SinkSpec): at 100 TB this turns the nightly fact⋈fact join from a
    * full two-sided shuffle into a local merge per bucket. Requires the
    * catalog (saveAsTable) — bucket metadata lives there, not in parquet. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
}
