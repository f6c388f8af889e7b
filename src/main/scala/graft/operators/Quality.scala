package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document quality filtering — the Gopher-style rule battery a training-data
  * pipeline runs between PII redaction and dedup. The reference's transform
  * chain stops at trim/empty→null cleansing
  * (`/root/reference/src/Infrastructure/Transformation/Common/DataCleansingStep.cs:24-63`);
  * this is the corpus-curation extension of that surface.
  *
  * Every rule is a deterministic Catalyst expression over integer counts
  * (token counts, regexp counts) whose ratios are exact IEEE doubles, so the
  * whole filter is reproducible bit-for-bit in ANSI SQL. One projection
  * computes all rule flags; the filter itself is a single `where` over the
  * conjunction — no UDFs, no extra scans, fuses into the document scan at any
  * scale. */
object Quality {

  /** Tunable rule thresholds. Defaults follow the published Gopher ranges
    * (Rae et al. 2021, §A1.1) adapted to word-level stats. */
  final case class Rules(
      minTokens: Int = 5,
      maxTokens: Int = 100000,
      minMeanTokenLen: Double = 2.0,
      maxMeanTokenLen: Double = 12.0,
      maxSymbolRatio: Double = 0.20,
      minStopwordRatio: Double = 0.02,
      maxDupBigramFrac: Double = 0.60)

  /** Per-document rule flags plus the verdict, keeping the audit trail a
    * curation run needs ("why was this doc dropped"). Columns:
    * `(doc cols..., n_tokens, mean_token_len, symbol_ratio, stopword_ratio,
    * dup_bigram_frac, keep)`. */
  def flags(df: DataFrame, textCol: String, rules: Rules = Rules()): DataFrame = {
    val text = col(textCol)
    val flagged = df
      .withColumn("n_tokens", TextFunctions.tokenCount(text).cast("long"))
      .withColumn("mean_token_len", TextFunctions.meanTokenLen(text))
      .withColumn("symbol_ratio", TextFunctions.punctRatio(text))
      .withColumn("stopword_ratio", TextFunctions.stopwordRatio(text))
      .withColumn("dup_bigram_frac", TextFunctions.dupBigramFrac(text))
    flagged.withColumn("keep",
      col("n_tokens").between(rules.minTokens, rules.maxTokens) &&
        col("mean_token_len").between(rules.minMeanTokenLen, rules.maxMeanTokenLen) &&
        (col("symbol_ratio") <= rules.maxSymbolRatio) &&
        (col("stopword_ratio") >= rules.minStopwordRatio) &&
        (col("dup_bigram_frac") <= rules.maxDupBigramFrac))
  }

  /** The filter: documents passing every rule. */
  def filterDocs(df: DataFrame, textCol: String, rules: Rules = Rules()): DataFrame =
    flags(df, textCol, rules).where(col("keep")).drop("keep")
}
