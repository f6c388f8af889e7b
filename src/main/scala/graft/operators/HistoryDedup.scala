package graft.operators

import graft.functions.{TextFunctions => T}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental dedup of a NEW ingest batch against an already-ingested
  * HISTORY corpus: keep only the new documents whose normalized-text
  * fingerprint does not already exist in history. The reference re-extracts
  * full datasets per run (`/root/reference/src/Core/Services/
  * IngestionPipeline.cs:31-75` rebuilds every batch from scratch); this is
  * the continuous-crawl extension — each increment lands only genuinely-new
  * documents, the step a recrawl-heavy 100 TB lake runs on every batch.
  *
  * Semantics are EXACTLY the plain anti-join
  * `new ⟕̸ history ON fingerprint` (same normalized-text fingerprint as
  * [[Dedup.byFingerprint]], same xxhash64-collision caveat). The Bloom
  * filter is a pure cost optimization:
  *
  *  1. build a Bloom filter over history fingerprints — one
  *     map-side-combined aggregate ([[BloomJoin.prune]]'s
  *     `BloomFilterAggregate`), a few MB regardless of history size, shipped
  *     as a scalar subquery;
  *  2. probe every new-batch fingerprint against it AT THE SCAN. A Bloom
  *     filter has NO false negatives, so every true duplicate survives to
  *     step 3; only ~fpp of the genuinely-new rows tag along;
  *  3. confirm exactly: semi-join history fingerprints against the small
  *     maybe-set (broadcast — the maybe-set is |true dups| + fpp·|new|,
  *     batch-sized at worst, never history-sized), then anti-join the new
  *     batch against the CONFIRMED set. False positives die here, so the
  *     output equals the plain anti-join and a plain-SQL oracle applies.
  *
  * Scale shape: history is never shuffled — it is scanned (fingerprints
  * only, ~8 B/row after the scan projection) once for the filter build and
  * once for the confirm semi-join, both ending in broadcast-sized results;
  * in a production increment pipeline both reads come from a materialized
  * compact fingerprint index, not the text corpus, and the filter itself
  * persists as increment state so step 1 amortizes across batches. The new
  * batch is never shuffled either: the Bloom probe is a scan-level filter
  * and the confirm/anti joins are against broadcast sets. Compare a naive
  * `new ANTI JOIN history`: at 100 TB that shuffles the ENTIRE history
  * fingerprint relation every batch.
  */
object HistoryDedup {

  /** New-batch rows (all columns preserved) whose normalized-text
    * fingerprint is absent from `history`. `expectedHistoryRows` sizes the
    * Bloom filter (8 bits/row ≈ 2% fpp; sizing affects cost only, never
    * correctness). */
  def newAgainstHistory(newBatch: DataFrame, history: DataFrame,
                        textCol: String,
                        expectedHistoryRows: Long): DataFrame = {
    val newFp = newBatch.withColumn("_fp", T.fingerprint(col(textCol)))
    val histFp = history.select(T.fingerprint(col(textCol)).as("_fp"))
    // bloom-maybe fingerprints from the new batch: every true dup is here
    val maybe = BloomJoin.prune(newFp.select(col("_fp")), histFp,
      "_fp", "_fp", expectedHistoryRows).distinct()
    // exact confirm: the maybe-fps that REALLY occur in history. maybe is
    // batch-bounded, so it broadcasts; history streams through the semi-join.
    val confirmed = histFp.join(broadcast(maybe), Seq("_fp"), "left_semi")
      .distinct()
    newFp.join(broadcast(confirmed), Seq("_fp"), "left_anti").drop("_fp")
  }
}
