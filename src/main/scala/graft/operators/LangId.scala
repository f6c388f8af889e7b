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
  * argument), never corpus-bounded. The model then pivots to a GRAM-KEYED
  * relation of V rows whose payload is the L-length array of quantized
  * log-probs (miss-floor where the lang never saw the gram), and that single
  * relation BROADCASTS to the scoring side: each doc gram picks up its
  * L-array in the map-side broadcast join, and the per-doc reduce sums the
  * arrays element-wise as L bounded decimal aggregation columns. The only
  * corpus-sized exchange is therefore docs rows of (id, L decimals) after
  * map-side combine — NOT docs×L rows: at a production 100–200-language
  * model the row multiplier that a per-(doc, lang) formulation pays on the
  * biggest narrow stage simply never exists. The corpus itself is never
  * shuffled. The one driver seam is the L-ROW language stats relation
  * (lang, prior, miss — the kmeansStep bounded-collect precedent), needed
  * so the L aggregation columns exist at plan time; collecting the
  * already-quantized decimals makes every prior/miss-floor a literal, so
  * scoring branches never re-derive the labeled-corpus aggregations (at
  * composition depth each re-derivation recomputes the whole upstream
  * pipeline).
  *
  * Determinism (the t15 pattern): every log-probability is `ln` rounded
  * once at 9 decimals — per MODEL row, so last-ulp libm disagreement between
  * engines is confined to L×V+2L values independent of corpus size — then
  * per-doc sums run as exact decimals (order-independent) and the winning
  * score rounds at 6. A DuckDB oracle reproduces the output bit-for-bit
  * (and bit-identical to the pre-pivot per-(doc, lang) formulation this
  * replaced: same quantized terms, same exact-decimal sums, same tie rule). */
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
    // one gram pass builds counts; totals and vocab ROLL UP from the counts
    // relation (Σ of per-(lang, gram) counts ≡ per-lang gram totals;
    // distinct grams of counts ≡ distinct grams of the stream — exactly),
    // and nDocs rolls up from docsPerLang: the labeled corpus is derived
    // twice (grams + doc counts), not five times — at composition depth
    // (c02: extraction feeding this relation) each avoided derivation is a
    // full upstream recompute, and the shared counts exchange is reused
    // across its three consumers
    val counts = lg.groupBy(col("_lang"), col("_g")).agg(count(lit(1)).as("_c"))
    val totals = counts.groupBy(col("_lang")).agg(sum(col("_c")).as("_tot"))
    val vocab = counts.agg(countDistinct(col("_g")).as("_v"))    // 1 row
    val docsPerLang = lt.groupBy(col("_lang")).agg(count(lit(1)).as("_nl"))
    val nDocs = docsPerLang.agg(sum(col("_nl")).as("_n"))        // 1 row
    // L rows: prior and the unseen-gram floor, each quantized once
    val langStats = totals.join(docsPerLang, Seq("_lang"))
      .crossJoin(broadcast(vocab)).crossJoin(broadcast(nDocs))
      .select(col("_lang"),
        round(log(col("_nl").cast("double") / col("_n")), 9)
          .cast("decimal(20,9)").as("_prior"),
        round(log(lit(1.0) / (col("_tot") + col("_v")).cast("double")), 9)
          .cast("decimal(20,9)").as("_miss"))

    // the one bounded driver seam (the kmeansStep precedent): the L-ROW
    // stats relation — langs in Spark's own sort order plus their
    // already-quantized prior/miss decimals. Collecting all L rows (not
    // just the language list) turns every downstream use of a prior or a
    // miss-floor into a LITERAL, so no scoring branch ever re-derives the
    // labeled-corpus aggregations — at composition depth (c02) each such
    // branch would recompute the upstream pipeline.
    val statsRows = langStats.orderBy(col("_lang")).collect()
    val langs: Array[String] = statsRows.map(_.getString(0))
    val L = langs.length
    if (L == 0)
      // no labeled doc has gram evidence — nothing is scorable
      return docs.select(col(idCol), lit("").as("lang_pred"),
        lit(0.0).as("score")).where(lit(false))
    def decLit(b: java.math.BigDecimal): Column = lit(b).cast("decimal(20,9)")
    val priors: Array[Column] = statsRows.map(r => decLit(r.getDecimal(1)))
    val misses: Array[Column] = statsRows.map(r => decLit(r.getDecimal(2)))
    val missArr = array(misses: _*)

    // V rows: gram -> L-array of quantized log-probs, miss-floor where the
    // lang never saw the gram. THE broadcast model relation.
    val model = counts.join(totals, Seq("_lang")).crossJoin(broadcast(vocab))
      .select(col("_g"), col("_lang"),
        round(log((col("_c") + 1).cast("double") /
          (col("_tot") + col("_v")).cast("double")), 9)
          .cast("decimal(20,9)").as("_lp"))
      .groupBy(col("_g"))
      .agg(map_from_entries(collect_list(struct(col("_lang"), col("_lp"))))
        .as("_m"))
      .select(col("_g"), array((0 until L).map(i =>
        coalesce(element_at(col("_m"), lit(langs(i))), misses(i))): _*)
        .as("_terms"))

    val dg = explodeGrams(docs, col(idCol), col(textCol), n)
    // per-doc element-wise sum: L bounded decimal columns — the exchange
    // carries docs rows (map-side combined), never docs×L
    val sums = dg.join(broadcast(model), Seq("_g"), "left")
      .select(col("_id"), coalesce(col("_terms"), missArr).as("_t"))
      .groupBy(col("_id"))
      .agg(sum(element_at(col("_t"), 1)).as("_s0"),
        (1 until L).map(i =>
          sum(element_at(col("_t"), i + 1)).as(s"_s$i")): _*)
    // argmax by (score desc, lang asc): min over (-score, idx) structs — the
    // decimal negation is exact and langs index order IS lex order, so the
    // tie rule is bit-deterministic
    val scoredStructs = array((0 until L).map(i =>
      struct((-(priors(i) + col(s"_s$i"))).as("ns"), lit(i).as("idx"))): _*)
    sums
      .select(col("_id"), array_min(scoredStructs).as("_b"))
      .select(col("_id").as(idCol),
        element_at(lit(langs), col("_b.idx") + 1).as("lang_pred"),
        round((-col("_b.ns")).cast("double"), 6).as("score"))
  }
}
