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
    * correctness).
    *
    * `maxBroadcastRows` guards the confirm path: the maybe-set is only
    * batch-bounded, so a giant ingest batch with high dup mass (or an
    * undersized filter raising fpp) could push an unconditional broadcast
    * past the executor/driver broadcast limits and FAIL the job instead of
    * degrading. Both broadcast sets are subsets of the batch's DISTINCT
    * fingerprints (maybe ⊆ batch fps, confirmed ⊆ maybe), so any upper
    * bound on the batch bounds them. `expectedBatchRows ≥ 0` supplies that
    * bound for free (ingest batches carry manifest counts — the CTL
    * contract — and row count ≥ distinct fingerprints), keeping the API a
    * pure transformation; when absent (< 0) the bound comes from one
    * map-side `approx_count_distinct` over the batch — an eager
    * plan-construction-time scan (the kmeansStep bounded-seam trade), no
    * history scan, no second Bloom build. The HLL-backed guard is
    * PROBABILISTIC: 2% rsd with 25% slack means tripping the cap from an
    * underestimate needs a ~12σ HLL error — and the failure mode if it
    * ever did is an over-cap broadcast attempt (a resource error), never a
    * wrong result. Above the cap the confirm and anti joins fall back to
    * shuffle joins on the 8-byte fingerprint key — slower, never fatal,
    * output-identical (pinned in HistoryDedupSpec). */
  def newAgainstHistory(newBatch: DataFrame, history: DataFrame,
                        textCol: String,
                        expectedHistoryRows: Long,
                        maxBroadcastRows: Long = 50L * 1000 * 1000,
                        expectedBatchRows: Long = -1L): DataFrame =
    newAgainstFingerprints(newBatch,
      history.select(T.fingerprint(col(textCol)).as("_fp")), textCol,
      expectedHistoryRows, maxBroadcastRows, expectedBatchRows)

  /** Same contract with history given as its FINGERPRINT relation (one
    * `_fp: long` column) — the production path: both history reads hit a
    * materialized compact index ([[FingerprintIndex]]), never the text
    * corpus. */
  def newAgainstFingerprints(newBatch: DataFrame, histFp: DataFrame,
                             textCol: String,
                             expectedHistoryRows: Long,
                             maxBroadcastRows: Long = 50L * 1000 * 1000,
                             expectedBatchRows: Long = -1L): DataFrame = {
    val newFp = newBatch.withColumn("_fp", T.fingerprint(col(textCol)))
    // bloom-maybe fingerprints from the new batch: every true dup is here
    val maybe = BloomJoin.prune(newFp.select(col("_fp")), histFp,
      "_fp", "_fp", expectedHistoryRows).distinct()
    // upper bound on BOTH broadcast sets from the batch side only: the
    // caller's manifest count when given (free, keeps this a pure
    // transformation), else one eager map-side HLL over the batch (2% rsd,
    // 25% slack — see scaladoc on the probabilistic guard)
    val small =
      if (expectedBatchRows >= 0) expectedBatchRows <= maxBroadcastRows
      else newFp.agg(approx_count_distinct(col("_fp"), 0.02))
        .head().getLong(0) * 1.25 <= maxBroadcastRows
    def hint(df: DataFrame): DataFrame = if (small) broadcast(df) else df
    // exact confirm: the maybe-fps that REALLY occur in history. maybe is
    // batch-bounded, so it normally broadcasts and history streams through
    // the semi-join; past the cap both confirm joins shuffle instead.
    val confirmed = histFp.join(hint(maybe), Seq("_fp"), "left_semi")
      .distinct()
    newFp.join(hint(confirmed), Seq("_fp"), "left_anti").drop("_fp")
  }
}
