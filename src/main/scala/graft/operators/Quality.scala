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
    require(!df.columns.contains("_ts"),
      "Quality.flags: input already has a '_ts' column (claimed internally) — rename it first")
    // ONE compiled tokenization pass (TextFunctions.tokenStats) feeds every
    // token-derived column — the per-primitive formulation re-lowered and
    // re-split the document four times per row; the ratios below are the
    // same integer quotients, so every column is bit-identical
    // (TextStatsSpec). symbol_ratio stays a regex count over the RAW text.
    val flagged = df
      .withColumn("_ts", TextFunctions.tokenStats(text))
      .withColumn("n_tokens", col("_ts.n_tokens").cast("long"))
      .withColumn("mean_token_len",
        when(col("_ts.n_tokens") === 0, 0.0)
          .otherwise(col("_ts.sum_len").cast("double") / col("_ts.n_tokens")))
      .withColumn("symbol_ratio", TextFunctions.punctRatio(text))
      .withColumn("stopword_ratio",
        when(col("_ts.n_tokens") === 0, 0.0)
          .otherwise(col("_ts.stop_hits").cast("double") / col("_ts.n_tokens")))
      .withColumn("dup_bigram_frac",
        when(col("_ts.n_bigrams") === 0, 0.0)
          .otherwise(lit(1.0) - col("_ts.distinct_bigrams").cast("double")
            / col("_ts.n_bigrams").cast("double")))
      .drop("_ts")
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

  /** Statistical-LM quality scoring — the CCNet filtering step (Wenzek et al.
    * 2020, §4.3: a KenLM 5-gram model's perplexity buckets documents into
    * head/middle/tail): here a bigram model with add-one smoothing, trained on
    * the corpus itself in the same pass that scores it. Per document:
    * `avg_logprob = mean over its bigrams of ln((C(w1,w2)+1) / (C(w1)+V))`
    * and `ppl = exp(-avg_logprob)` — low perplexity = the doc looks like the
    * corpus, high = outlier (the tail CCNet trims or down-samples).
    *
    * Scale shape: the model IS an aggregation — `C(w1,w2)` and `C(w1)` are
    * partial-aggregated counts whose exchanges are vocabulary-bounded, not
    * corpus-bounded, and `V` rides along as a 1-row broadcast. Scoring joins
    * each doc's bigrams back to the model (vocabulary²-bounded relation —
    * AQE broadcasts it while it fits, hash-partitions both sides when a real
    * corpus's model outgrows that), and the per-doc reduce carries
    * `(id, decimal)` only. No vector, no text payload crosses any exchange
    * after the bigram explode.
    *
    * Determinism (the [[Clustering.kmeansStep]] exact-decimal pattern): each
    * DISTINCT bigram's log-probability is rounded once at 9 decimals — a
    * per-model-row quantization, so any last-ulp `ln` disagreement between
    * engines is confined to vocabulary²-many values, independent of corpus
    * size — then the per-doc mean sums those as exact decimals
    * (order-independent) and rounds at 6. `ppl` re-exponentiates the already-
    * rounded mean and rounds at 3, so it inherits the same stability.
    *
    * Output: `(id, n_bigrams, avg_logprob, ppl)`, docs with ≥ 2 tokens. */
  def lmScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
        filter(split(col(textCol), " "), t => t =!= "").as("ws"))
      .where(size(col("ws")) >= 2)
    val bigrams = toks.select(col("id"),
        explode(transform(sequence(lit(1), size(col("ws")) - 1), i =>
          struct(element_at(col("ws"), i).as("w1"),
            element_at(col("ws"), i + 1).as("w2")))).as("bg"))
      .select(col("id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val bigramCounts = bigrams.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))
    val headCounts = bigrams.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val vocab = toks.select(explode(col("ws")).as("w"))
      .agg(countDistinct(col("w")).as("v"))
    val model = bigramCounts.join(headCounts, Seq("w1")).crossJoin(broadcast(vocab))
      .select(col("w1"), col("w2"),
        round(log((col("c12") + lit(1)).cast("double") /
          (col("c1") + col("v")).cast("double")), 9).as("lp"))
    bigrams.join(model, Seq("w1", "w2"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("lp").cast("decimal(20,9)")).as("_lpsum"))
      .select(col("id").as(idCol), col("n_bigrams"),
        round(col("_lpsum").cast("double") / col("n_bigrams"), 6).as("avg_logprob"))
      .withColumn("ppl", round(exp(-col("avg_logprob")), 3))
  }

  /** Interpolated Kneser-Ney trigram LM quality scoring (Kneser & Ney,
    * ICASSP 1995; the interpolated formulation of Chen & Goodman, 1999 §2.7)
    * — the production version of [[lmScore]]'s add-one bigram toy: CCNet's
    * actual filter is a 5-gram KenLM, which is KN smoothing at heart.
    * Trained on the corpus in the same pass that scores it (the t15
    * contract), so every scored trigram has a model row.
    *
    *   P(w3|w1w2) = [max(c(w1w2w3) − D, 0) + D·N1+(w1w2•)·P(w3|w2)] / c(w1w2)
    *   P(w3|w2)   = [max(N1+(•w2w3) − D, 0) + D·N1+(w2•)·P(w3)] / N1+(•w2•)
    *   P(w3)      = N1+(•w3) / N1+(••)          (continuation counts)
    *
    * where N1+ are TYPE counts over the distinct-trigram relation — the
    * Kneser-Ney insight that lower-order models should measure how many
    * contexts a word continues, not how often it occurs — and `D` is the
    * fixed discount (default 0.75 = 3/4, exactly representable).
    *
    * Scale shape: every model relation is an aggregation of the distinct-
    * trigram relation, so all model exchanges are TYPE-bounded (Heaps'
    * law, the t15 argument, one power higher); the corpus-sized exchanges
    * are the trigram-count partial aggregation (map-side combined to
    * distinct types per partition) and the per-doc `(id, decimal)` reduce.
    * No document text crosses any exchange — trigram keys are three words.
    *
    * Determinism: all N1+/count inputs are exact integers and D is binary-
    * exact, so P evaluates identically in any IEEE engine when the
    * expression tree matches; each distinct trigram's ln P is rounded once
    * at 9 (type-bounded sites), per-doc sums are exact decimals, the mean
    * rounds at 6, ppl at 3 — [[lmScore]]'s contract, verbatim.
    *
    * Output: `(id, n_trigrams, avg_logprob, ppl)` for docs with ≥ 3
    * tokens. */
  def knTrigramScore(df: DataFrame, idCol: String, textCol: String,
                     discount: Double = 0.75): DataFrame = {
    require(discount > 0 && discount < 1, s"kn discount out of (0,1): $discount")
    // trigram emission in one compiled pass (TextStatsExpr.WordTriples) —
    // value-identical to the split + transform(sequence, element_at) tree,
    // which interpreted a 3-field struct build per gram; <3-token docs
    // yield an empty array, which explode drops exactly like the old
    // where(size(ws) >= 3)
    val tris = df.select(col(idCol).as("id"),
        explode(graft.functions.TextStatsExpr.word_triples(col(textCol))).as("t"))
      .select(col("id"), col("t.w1").as("w1"), col("t.w2").as("w2"),
        col("t.w3").as("w3"))
    // NOTE (r13 opt round): the distinct-trigram relation feeds six model
    // rollups whose differing column pruning defeats exchange/stage reuse
    // (static plan: 16 scans, 0 ReusedExchange) — but a MEMORY_AND_DISK
    // persist barrier here measured 2.2× SLOWER at sf0.1 (t24 1.83 → 4.00 s
    // isolated): the columnar cache encode/decode of the (w1,w2,w3) string
    // relation costs more than re-running the compiled trigram explode.
    // Recompute wins at this scale; left as-is, recorded in
    // OPTIMIZATION_r13.md.
    val c3 = tris.groupBy(col("w1"), col("w2"), col("w3"))
      .agg(count(lit(1)).as("c3"))
    // context totals + distinct-continuation counts, all from the
    // distinct-trigram relation (c3 rows are unique by construction)
    val ctx = c3.groupBy(col("w1"), col("w2"))
      .agg(sum(col("c3")).as("c2"), count(lit(1)).as("n3"))
    val t2 = c3.groupBy(col("w2"), col("w3")).agg(count(lit(1)).as("t23"))
    val mid = c3.groupBy(col("w2")).agg(count(lit(1)).as("midc"))
    val ty2 = t2.groupBy(col("w2")).agg(count(lit(1)).as("ty2"))
    val uni = t2.groupBy(col("w3")).agg(count(lit(1)).as("u"))
    val tot = t2.agg(count(lit(1)).as("tt"))                    // 1 row
    val d = lit(discount)
    val p1 = col("u").cast("double") / col("tt")
    val p2 = (greatest(col("t23").cast("double") - d, lit(0.0)) +
      d * col("ty2") * p1) / col("midc")
    val p3 = (greatest(col("c3").cast("double") - d, lit(0.0)) +
      d * col("n3") * p2) / col("c2")
    val model = c3
      .join(ctx, Seq("w1", "w2"))
      .join(t2, Seq("w2", "w3"))
      .join(mid, Seq("w2")).join(ty2, Seq("w2")).join(uni, Seq("w3"))
      .crossJoin(broadcast(tot))
      .select(col("w1"), col("w2"), col("w3"),
        round(log(p3), 9).cast("decimal(20,9)").as("lp"))
    tris.join(model, Seq("w1", "w2", "w3"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_trigrams"),
        sum(col("lp")).as("_lpsum"))
      .select(col("id").as(idCol), col("n_trigrams"),
        round(col("_lpsum").cast("double") / col("n_trigrams"), 6)
          .as("avg_logprob"))
      .withColumn("ppl", round(exp(-col("avg_logprob")), 3))
  }
}
