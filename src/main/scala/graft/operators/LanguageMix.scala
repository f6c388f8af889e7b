package graft.operators

import graft.functions.{HashExpressions => H}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Language-mixing allocation for multilingual pretraining corpora: given the
  * per-language document histogram, compute how many documents each language
  * contributes to a fixed training budget, then draw exactly that many
  * deterministically. Two published allocation rules:
  *
  *  - [[unimaxQuotas]] — UniMax (Chung et al., "UniMax: Fairer and More
  *    Effective Language Sampling for Large-Scale Multilingual Pretraining",
  *    ICLR 2023): distribute the budget as uniformly as possible over
  *    languages, capping each language at `epochCap` epochs of its own corpus
  *    so low-resource languages are never over-repeated.
  *  - [[temperatureQuotas]] — exponent-scaled sampling (the mC4/mT5 recipe,
  *    Xue et al. 2021): sample language l with probability proportional to
  *    `p_l^alpha` (alpha < 1 flattens the head), `p_l` the language's corpus
  *    share.
  *
  * The reference ingests per-dataset rows with no corpus-level allocation
  * (`/root/reference/src/Core/Models/DatasetConfig.cs` carries only
  * per-dataset schedules); this is the corpus-composition stage a pretraining
  * pipeline inserts before sampling.
  *
  * Scale shape: every allocation computes on the LANGUAGE HISTOGRAM — L rows
  * for a corpus of any size (ISO 639 gives L ≲ 8000; real lakes carry
  * hundreds). The histogram is one map-side-combined aggregation of the
  * corpus; the closed-form allocation then runs relationally on those L rows
  * (a single-partition window over L rows, NOT a driver collect), and quotas
  * re-join the corpus as an L-row broadcast. The corpus itself is never
  * shuffled for allocation. For the draw, [[drawByQuota]] pays one exchange
  * (rank-per-language window — the honest cost of exact-count selection;
  * the dominant language lands in one window partition, so at 100 TB prefer
  * [[drawByShare]]); [[drawByShare]] is shuffle-free: a content-keyed
  * hash-threshold per language whose selected COUNT is binomial around the
  * quota (exactly the [[Sampling.byHashThreshold]] trade) while membership
  * stays deterministic and idempotent under retry/repartition/append.
  *
  * Determinism: UniMax is INTEGER arithmetic end to end (counts, prefix sums,
  * `div`) — bit-exact in any engine. The temperature rule needs `pow`, the
  * one transcendental: its output is rounded once at 9 decimals per language
  * (L rounding sites, model-bounded — the [[Quality.lmScore]] pattern), and
  * everything downstream is IEEE-exact +,*,/ on those quantized values.
  */
object LanguageMix {

  /** Per-language document counts: `(lang, n)`, one map-side-combined agg. */
  private def histogram(df: DataFrame, langCol: String): DataFrame =
    df.groupBy(col(langCol).as("lang")).agg(count(lit(1)).as("n"))

  /** UniMax quotas: `(lang, n, quota)`. Budget `B` documents are spread as
    * evenly as possible across languages, except no language repeats beyond
    * `epochCap` epochs — i.e. contributes more than `epochCap * n_l` docs
    * (here: draws WITHOUT replacement from a doc corpus, so `epochCap`
    * bounds quota at `epochCap * n_l` and a quota above `n_l` means the
    * caller up-samples epochs downstream, e.g. via [[Sampling.weightedMix]]).
    *
    * Closed form (all integer, exact): sort languages ascending by `n` (ties
    * by name). A language is budget-capped iff
    * `epochCap * n_i * (L - i + 1) <= B - epochCap * S_{i-1}` with `S` the
    * running count sum — once a language is uncapped every larger one is too
    * (its fair share stays constant while its cap grows), so the capped set
    * is a prefix. Capped languages get `epochCap * n_i`; the rest split the
    * remaining budget evenly (`div`, remainder undistributed — at most L - 1
    * docs of budget go unused, documented rather than smeared). */
  def unimaxQuotas(df: DataFrame, langCol: String, budget: Long,
                   epochCap: Int = 4): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(epochCap > 0, "epochCap must be positive")
    val counts = histogram(df, langCol)
    val tot = counts.agg(count(lit(1)).as("langs"))
    // ascending-by-size window over L rows; single partition by design —
    // the relation is the language histogram, not the corpus
    val w = Window.orderBy(col("n"), col("lang"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ord = counts
      .withColumn("i", row_number().over(Window.orderBy(col("n"), col("lang"))))
      .withColumn("s", sum(col("n")).over(w))
      .crossJoin(broadcast(tot))
    val flag = ord.withColumn("capped",
      lit(epochCap.toLong) * col("n") * (col("langs") - col("i") + 1) <=
        lit(budget) - lit(epochCap.toLong) * (col("s") - col("n")))
    val k = flag.agg(
      coalesce(max(when(col("capped"), col("i").cast("long"))), lit(0L)).as("ki"),
      coalesce(max(when(col("capped"), col("s").cast("long"))), lit(0L)).as("ks"))
    flag.crossJoin(broadcast(k))
      .select(col("lang"), col("n"),
        when(col("capped"), lit(epochCap.toLong) * col("n"))
          .otherwise(expr(s"(${budget}L - ${epochCap}L * ks) div " +
            "greatest(langs - ki, 1L)")).as("quota"))
  }

  /** Exponent-scaled quotas (mC4 recipe): `(lang, n, quota)` with
    * `quota_l = floor(B * w_l / W)`, `w_l = round((n_l / N)^alpha, 9)`,
    * `W = sum(w)` as an exact decimal. `alpha = 0.3` is the published mC4
    * setting; `alpha = 1` recovers proportional sampling. A quota above
    * `n_l` (flattening up-samples small languages) means epoch repetition
    * downstream; [[drawByShare]] caps membership at the language's own docs. */
  def temperatureQuotas(df: DataFrame, langCol: String, budget: Long,
                        alpha: Double = 0.3): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(alpha > 0 && alpha <= 1, "alpha must be in (0, 1]")
    val counts = histogram(df, langCol)
    val tot = counts.agg(sum(col("n")).as("nTotal"))
    // the single transcendental, quantized once per language
    val weighted = counts.crossJoin(broadcast(tot)).withColumn("w",
      round(pow(col("n").cast("double") / col("nTotal").cast("double"),
        alpha), 9).cast("decimal(20,9)"))
    val totW = weighted.agg(sum(col("w")).as("wTotal"))
    weighted.crossJoin(broadcast(totW))
      .select(col("lang"), col("n"),
        floor(lit(budget).cast("double") *
          (col("w").cast("double") / col("wTotal").cast("double")))
          .cast("long").as("quota"))
  }

  /** Exact draw: for each language, the `quota` lowest docs by
    * `(md5-hash, id)` rank — deterministic, total order. One exchange (the
    * per-language rank window); quotas join as an L-row broadcast. */
  def drawByQuota(df: DataFrame, langCol: String, idCol: String,
                  quotas: DataFrame): DataFrame = {
    val ranked = df.withColumn("_r", row_number().over(
      Window.partitionBy(col(langCol))
        .orderBy(H.md5Hash60(col(idCol).cast("string")), col(idCol))))
    ranked.join(
        broadcast(quotas.select(col("lang").as("_qlang"),
          col("quota").as("_quota"))),
        ranked(langCol) === col("_qlang"))
      .where(col("_r") <= col("_quota"))
      .drop("_r", "_qlang", "_quota")
  }

  /** Shuffle-free draw: keep a doc iff its content-keyed uniform
    * `u = (md5_60 mod 2^52 + 0.5) / 2^52` (exact IEEE, the [[Dsir.gumbelTopK]]
    * construction) falls below the language's sampling share
    * `quota_l / n_l`. Selected counts are binomial around the quota;
    * membership is exact, deterministic, and append-stable. Shares above 1
    * select the whole language. */
  def drawByShare(df: DataFrame, langCol: String, idCol: String,
                  quotas: DataFrame): DataFrame = {
    val twoTo52 = 4503599627370496L // 2^52
    val u = (pmod(H.md5Hash60(col(idCol).cast("string")), lit(twoTo52))
      .cast("double") + lit(0.5)) / lit(twoTo52.toDouble)
    df.join(
        broadcast(quotas.select(col("lang").as("_qlang"), col("n").as("_qn"),
          col("quota").as("_quota"))),
        df(langCol) === col("_qlang"))
      .where(u < col("_quota").cast("double") / col("_qn").cast("double"))
      .drop("_qlang", "_qn", "_quota")
  }
}
