package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Domain-level curation — the per-SOURCE quality gate modern web-corpus
  * pipelines run alongside per-document rules (FineWeb's per-dump dedup-rate
  * filtering, Penedo et al. 2024; Dolma's per-domain statistics, Soldaini et
  * al. 2024): a site whose pages are mostly near-identical boilerplate or
  * mostly stub-length fragments is dropped as a WHOLE, because its individual
  * pages each look fine to document-level rules. The reference's validation
  * surface stops at per-row checks
  * (`/root/reference/src/Infrastructure/Transformation/Common/DataValidationStep.cs:20-58`);
  * this is that surface lifted one level, to the source.
  *
  * Scale shape: the corpus crosses ONE wide exchange, carrying only
  * `(source, fingerprint, short-flag)` — ~25 B/row, partial-aggregated
  * map-side so each (source, fingerprint) group reaches the shuffle once per
  * partition. The source table that falls out is S rows (domains, not docs);
  * the gating join back to documents BROADCASTS it, so the doc side never
  * shuffles — at 100 TB the gate is a scan-side hash probe, same plan as at
  * sf0.01 (plan-pinned in SourceCurationSpec: BroadcastHashJoin, zero
  * SortMergeJoin).
  *
  * Determinism: every signal is a single IEEE division of two exact integer
  * counts, so the plain-SQL oracle reproduces each double bit-for-bit; the
  * keep verdict is those doubles compared to literal thresholds — identical
  * in both engines because the inputs are identical doubles. Fingerprints
  * are [[TextFunctions.fingerprint]] (xxhash64 of whitespace-normalized
  * lowercase), the d02 contract: the oracle counts distinct normalized
  * TEXTS, identical up to hash collisions. */
object SourceCuration {

  /** Per-source aggregate signals: `(source, n_docs, n_dup, dup_rate,
    * short_frac)`, where `n_dup = n_docs - distinct fingerprints` and
    * `short_frac` is the fraction of docs under `minChars` characters.
    * Two-level aggregation — (source, fingerprint) then source — instead of
    * a count_distinct, so Catalyst never plans the Expand that a
    * distinct-aggregate alongside plain aggregates costs, and the first
    * exchange is pre-deduplicated map-side. */
  def sourceStats(df: DataFrame, textCol: String, sourceCol: String,
                  minChars: Int = 120): DataFrame = {
    val perFp = df
      .select(col(sourceCol).as("source"),
        TextFunctions.fingerprint(col(textCol)).as("_fp"),
        (length(col(textCol)) < minChars).cast("long").as("_short"))
      .groupBy(col("source"), col("_fp"))
      .agg(count(lit(1)).as("n"), sum(col("_short")).as("n_short"))
    perFp.groupBy(col("source"))
      .agg(sum(col("n")).as("_nd"), count(lit(1)).as("_distinct"),
        sum(col("n_short")).as("_ns"))
      .select(col("source"),
        col("_nd").cast("long").as("n_docs"),
        (col("_nd") - col("_distinct")).cast("long").as("n_dup"),
        ((col("_nd") - col("_distinct")).cast("double") / col("_nd"))
          .as("dup_rate"),
        (col("_ns").cast("double") / col("_nd")).as("short_frac"))
  }

  /** The gate: every document annotated with its source's signals and the
    * verdict — kept iff the SOURCE passes (`dup_rate <= maxDupRate` and
    * `short_frac <= maxShortFrac`) and the document itself clears the length
    * floor. Output `(id, source, src_dup_rate, src_short_frac, kept)` keeps
    * the audit trail ("why did this doc go") without carrying text. */
  def curate(df: DataFrame, idCol: String, textCol: String, sourceCol: String,
             maxDupRate: Double = 0.02, maxShortFrac: Double = 0.15,
             minChars: Int = 120): DataFrame = {
    val stats = sourceStats(df, textCol, sourceCol, minChars)
    df.select(col(idCol), col(sourceCol).as("source"),
        length(col(textCol)).cast("long").as("_len"))
      .join(broadcast(stats), Seq("source"))
      .select(col(idCol), col("source"),
        col("dup_rate").as("src_dup_rate"),
        col("short_frac").as("src_short_frac"),
        (col("dup_rate") <= maxDupRate &&
          col("short_frac") <= maxShortFrac &&
          col("_len") >= minChars).as("kept"))
  }
}
