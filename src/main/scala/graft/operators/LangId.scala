package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Language identification — the missing PRODUCER for the language-mix
  * family (t08/t11/t18/t19 all consume a `language` column that a real crawl
  * does not arrive with). Char n-grams are the classic language signal
  * (Cavnar & Trenkle, "N-Gram-Based Text Categorization", SDAIR 1994 — their
  * rank-order profiles; the multinomial Naive Bayes scoring used here is the
  * textbook linear-pass alternative over the same features): train per-lang
  * char-3-gram counts on a labeled seed, score unlabeled docs with add-one
  * smoothing, pick the argmax language.
  *
  * Per (doc, lang): `score = ln P(lang) + Σ_grams ln P(gram | lang)` with
  * `P(gram | lang) = (c(lang, gram) + 1) / (total_lang + V)`; unseen grams
  * take the lang's smoothed floor `1 / (total_lang + V)`. Ties break to the
  * lexicographically smallest language.
  *
  * Scale shape: the model is an aggregation — (lang, gram) counts whose
  * exchange is vocabulary-bounded (V is Heaps-bounded, the measured t15
  * argument), never corpus-bounded, and the L-row language stats plus the
  * L×V-row model BROADCAST to the scoring side. Scoring is a narrow gram
  * explode × L joined against those broadcasts; the only corpus-sized
  * exchange is the per-(doc, lang) partial-sum reduce — docs×L rows of
  * `(id, lang, decimal)` after map-side combine, no text payload. The corpus
  * itself is never shuffled.
  *
  * Determinism (the t15 pattern): every log-probability is `ln` rounded
  * once at 9 decimals — per MODEL row, so last-ulp libm disagreement between
  * engines is confined to L×V+2L values independent of corpus size — then
  * per-doc sums run as exact decimals (order-independent) and the winning
  * score rounds at 6. A DuckDB oracle reproduces the output bit-for-bit. */
object LangId {

  private def norm(c: Column): Column =
    regexp_replace(lower(trim(c)), "\\s+", " ")

  private def explodeGrams(df: DataFrame, keep: Column, text: Column,
                           n: Int): DataFrame = df
    .select(keep.as("_id"), norm(text).as("_t"))
    .where(length(col("_t")) >= n)
    .select(col("_id"), explode(transform(
      sequence(lit(1), length(col("_t")) - (n - 1)),
      i => col("_t").substr(i, lit(n)))).as("_g"))

  /** Classify `docs` with a model trained on `labeled`. Output:
    * `(idCol, lang_pred, score)` — one row per doc with ≥ n normalized
    * chars (shorter docs have no gram evidence and are not scored). */
  def classify(labeled: DataFrame, docs: DataFrame, idCol: String,
               textCol: String, langCol: String, n: Int = 3): DataFrame = {
    require(n >= 1, s"langid: gram size n=$n")
    val lt = labeled.select(col(langCol).as("_lang"), norm(col(textCol)).as("_t"))
      .where(length(col("_t")) >= n)
    val lg = lt.select(col("_lang"), explode(transform(
        sequence(lit(1), length(col("_t")) - (n - 1)),
        i => col("_t").substr(i, lit(n)))).as("_g"))
    val counts = lg.groupBy(col("_lang"), col("_g")).agg(count(lit(1)).as("_c"))
    val totals = lg.groupBy(col("_lang")).agg(count(lit(1)).as("_tot"))
    val vocab = lg.agg(countDistinct(col("_g")).as("_v"))        // 1 row
    val docsPerLang = lt.groupBy(col("_lang")).agg(count(lit(1)).as("_nl"))
    val nDocs = lt.agg(count(lit(1)).as("_n"))                   // 1 row
    // L rows: prior and the unseen-gram floor, each quantized once
    val langStats = totals.join(docsPerLang, Seq("_lang"))
      .crossJoin(broadcast(vocab)).crossJoin(broadcast(nDocs))
      .select(col("_lang"),
        round(log(col("_nl").cast("double") / col("_n")), 9)
          .cast("decimal(20,9)").as("_prior"),
        round(log(lit(1.0) / (col("_tot") + col("_v")).cast("double")), 9)
          .cast("decimal(20,9)").as("_miss"))
    // L×V rows: smoothed per-(lang, gram) log-probability, quantized once
    val model = counts.join(totals, Seq("_lang")).crossJoin(broadcast(vocab))
      .select(col("_lang"), col("_g"),
        round(log((col("_c") + 1).cast("double") /
          (col("_tot") + col("_v")).cast("double")), 9)
          .cast("decimal(20,9)").as("_lp"))

    val dg = explodeGrams(docs, col(idCol), col(textCol), n)
    val scored = dg
      .crossJoin(broadcast(langStats.select(col("_lang"), col("_miss"))))
      .join(broadcast(model), Seq("_lang", "_g"), "left")
      .select(col("_id"), col("_lang"),
        coalesce(col("_lp"), col("_miss")).as("_term"))
      .groupBy(col("_id"), col("_lang"))
      .agg(sum(col("_term")).as("_gsum"))
      .join(broadcast(langStats.select(col("_lang"), col("_prior"))),
        Seq("_lang"))
      .select(col("_id"), col("_lang"),
        (col("_prior") + col("_gsum")).as("_s"))
    // argmax by (score desc, lang asc): min of (-score, lang) structs — the
    // decimal negation is exact, so the tie rule is bit-deterministic
    scored.groupBy(col("_id"))
      .agg(min(struct((-col("_s")).as("ns"), col("_lang").as("l"))).as("_b"))
      .select(col("_id").as(idCol), col("_b.l").as("lang_pred"),
        round((-col("_b.ns")).cast("double"), 6).as("score"))
  }
}
