package graft.operators

import graft.functions.{TextFunctions => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** The materialized increment state [[HistoryDedup]]'s scaladoc promises: a
  * compact on-disk fingerprint index the continuous-crawl pipeline reads
  * INSTEAD of rescanning raw history text every batch. Each ingest batch
  * appends one parquet increment of its distinct normalized-text
  * fingerprints (8 B/doc compressed order — vs re-reading the full text
  * corpus, the difference between scanning ~10 B/doc and ~5 KB/doc at
  * 100 TB); the next batch's dedup scans ONLY this index.
  *
  * Idempotence: increments are keyed by `batch=<id>` directory and written
  * with overwrite — replaying a batch rewrites the same path with the same
  * deterministic content, so retries never duplicate state. Fingerprints
  * are [[T.fingerprint]] (the d02 xxhash64-of-normalized-text contract with
  * its collision caveat), so index equality == normalized-text equality and
  * a plain-SQL oracle applies.
  *
  * The reference rebuilds every dataset from scratch per scheduled run
  * (`/root/reference/src/Core/Services/IngestionPipeline.cs:31-75`); this is
  * the state that turns that batch pipeline into an incremental one. */
object FingerprintIndex {

  private val schema = StructType(Seq(StructField("_fp", LongType)))

  /** Append `batch`'s distinct fingerprints as increment `batchId`
    * (overwrite — replay-idempotent). */
  def append(batch: DataFrame, textCol: String, indexDir: String,
             batchId: Long): Unit =
    batch.select(T.fingerprint(col(textCol)).as("_fp")).distinct()
      .write.mode("overwrite").parquet(s"$indexDir/batch=$batchId")

  /** The index as one fingerprint relation; an absent/empty directory reads
    * as an empty index (the first batch of a fresh pipeline). */
  def read(spark: SparkSession, indexDir: String): DataFrame = {
    if (!isEmpty(spark, indexDir))
      spark.read.parquet(indexDir).select(col("_fp"))
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      schema)
  }

  /** Plan-construction-time emptiness check (directory listing only) — the
    * seam that lets a first-batch caller skip history dedup outright:
    * dedup against an EMPTY index is the identity, but still pays a bloom
    * build + confirm plan per batch if composed blindly. */
  def isEmpty(spark: SparkSession, indexDir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(indexDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    !(fs.exists(p) && fs.listStatus(p).nonEmpty)
  }

  /** One pipeline step: dedup `batch` against the index, THEN append the
    * batch's fingerprints as increment `batchId`. Returns the survivors
    * (rows whose fingerprint was absent from the index). Note the whole
    * batch's fingerprints are appended — a recrawl of a dropped doc in a
    * later batch still dedups against the first sighting.
    *
    * `expectedBatchRows ≥ 0` is the ingest manifest's row count (the CTL
    * contract carries one per batch): it bounds [[HistoryDedup]]'s confirm
    * broadcast for free, so NO eager HLL scan of the batch runs at plan
    * construction — the step stays a pure transformation until its
    * checkpoint (job-count spec-pinned). */
  def step(batch: DataFrame, textCol: String, indexDir: String,
           batchId: Long, expectedHistoryRows: Long,
           expectedBatchRows: Long = -1L): DataFrame = {
    val survivors = HistoryDedup.newAgainstFingerprints(batch,
      read(batch.sparkSession, indexDir), textCol, expectedHistoryRows,
      expectedBatchRows = expectedBatchRows)
      .localCheckpoint()
    append(batch, textCol, indexDir, batchId)
    survivors
  }
}
