package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution-drift detection between two snapshots of a corpus — the
  * monitoring step a continuously-recrawled training-data lake runs on every
  * increment: "does this week's crawl still look like the corpus the model
  * was tuned on?" The reference re-extracts datasets on a schedule with no
  * cross-run comparison (`/root/reference/src/Core/Services/
  * IngestionPipeline.cs:31-75` rebuilds each batch independently); this is
  * the between-runs guardrail, the same role its DataValidation transform
  * plays within one run (`/root/reference/src/Core/Transforms/
  * DataValidationTransform.cs`).
  *
  * The statistic is the Population Stability Index over a caller-supplied
  * bin column (categorical values directly, numerics pre-binned by the
  * caller, e.g. `floor(n_chars / 50)`):
  *
  * {{{ PSI = sum_b (p_b - q_b) * ln(p_b / q_b) }}}
  *
  * with add-one (Laplace) smoothing `p_b = (n_b + 1) / (N + B)` over the
  * UNION bin set, so bins present in only one snapshot contribute a finite
  * term instead of an infinite log — the standard industry convention
  * (PSI > 0.25 is the usual "major shift" alarm).
  *
  * Scale shape: each snapshot collapses to its B-row bin histogram in ONE
  * map-side-combined aggregation — the corpus is never shuffled, only
  * B-row partials move (the [[LanguageMix]] model-bounded pattern; B is the
  * bin vocabulary, hundreds at most for any sane binning). Everything
  * downstream — the full-outer bin align, totals, the PSI terms — runs
  * relationally on those B rows with broadcast totals.
  *
  * Determinism: counts and the smoothed denominators are integers, so the
  * probability divisions are single correctly-rounded IEEE ops any engine
  * reproduces. `ln` is the one transcendental: its output is rounded once
  * at 9 decimals per bin (B rounding sites, model-bounded — the
  * [[Quality.lmScore]] pattern), each PSI term is one more exact multiply
  * rounded at 9, and the total is an EXACT decimal sum of those quantized
  * terms. A plain-SQL oracle replays every step bit-for-bit.
  */
object Drift {

  /** Per-bin drift report between snapshots `ref` and `cur`:
    * `(bin, ref_n, cur_n, ref_p, cur_p, psi_term, psi_total)` — one row per
    * bin in either snapshot, `psi_total` (the headline PSI) repeated on each
    * row for self-contained consumption. `binCol` must exist in both inputs;
    * null bins count as a regular category. */
  def psi(ref: DataFrame, cur: DataFrame, binCol: String): DataFrame = {
    def hist(df: DataFrame) =
      df.groupBy(col(binCol).as("bin")).agg(count(lit(1)).as("n"))
    // full-outer align on the union bin set; a bin absent from one side
    // keeps count 0 and lives on through the smoothing
    val bins = hist(ref).withColumnRenamed("n", "ref_n")
      .join(hist(cur).withColumnRenamed("n", "cur_n"), Seq("bin"), "full_outer")
      .select(col("bin"),
        coalesce(col("ref_n"), lit(0L)).as("ref_n"),
        coalesce(col("cur_n"), lit(0L)).as("cur_n"))
    val tot = bins.agg(sum(col("ref_n")).as("nr"), sum(col("cur_n")).as("nc"),
      count(lit(1)).as("b"))
    // integer-derived smoothed probabilities: one exact IEEE division each
    val p = bins.crossJoin(broadcast(tot))
      .withColumn("ref_p",
        (col("ref_n") + lit(1L)).cast("double") / (col("nr") + col("b")))
      .withColumn("cur_p",
        (col("cur_n") + lit(1L)).cast("double") / (col("nc") + col("b")))
    // ln quantized once per bin; the term is exact-multiply then one round
    val t = p.withColumn("psi_term",
      round((col("ref_p") - col("cur_p")) *
        round(log(col("ref_p") / col("cur_p")), 9), 9))
    val total = t.agg(
      sum(col("psi_term").cast("decimal(20,9)")).as("psi_dec"))
    t.crossJoin(broadcast(total))
      .select(col("bin"), col("ref_n"), col("cur_n"),
        col("ref_p"), col("cur_p"), col("psi_term"),
        col("psi_dec").cast("double").as("psi_total"))
  }
}
