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
  * per-doc sums run as exact SCALED LONGS (the quantized value × 1e9:
  * order-independent integer sums, primitive in the hash aggregate where
  * wide-decimal sums box per gram) and the winning score re-expands through
  * one exact decimal multiply before the single round-at-6. A DuckDB oracle
  * summing decimals reproduces the output bit-for-bit (and bit-identical to
  * the pre-pivot per-(doc, lang) formulation this replaced: same quantized
  * terms, same exact sums, same tie rule). */
object LangId {

  private def norm(c: Column): Column =
    regexp_replace(lower(trim(c)), "\\s+", " ")

  /** Classify `docs` with a model trained on `labeled`. Output:
    * `(idCol, lang_pred, score)` — one row per doc with ≥ n normalized
    * chars (shorter docs have no gram evidence and are not scored). */
  def classify(labeled: DataFrame, docs: DataFrame, idCol: String,
               textCol: String, langCol: String, n: Int = 3): DataFrame = {
    require(n >= 1, s"langid: gram size n=$n")
    val lt = labeled.select(col(langCol).as("_lang"), norm(col(textCol)).as("_t"))
      .where(length(col("_t")) >= n)
    val lg = lt.select(col("_lang"),
      explode(graft.functions.HashExpressions.char_grams(col("_t"), n)).as("_g"))
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
    // all per-gram/per-doc arithmetic runs on SCALED LONGS (the quantized
    // log-prob × 1e9, an exact integer because every model value is
    // round(·, 9)): long sums are primitive codegen arithmetic in the hash
    // aggregate where decimal(20,9) sums (precision > 18) box to BigDecimal
    // per gram. Exactness is unchanged: Σ scaled-longs ≡ 1e9 × the
    // exact-decimal sum, the argmax compares exact integers, and the final
    // score re-expands the integer through ONE exact decimal multiply per
    // doc, so the double is the same correctly-rounded value the decimal
    // path produced (bit-identical to the NB reference, spec-pinned).
    // Overflow bound: |Σ| < 2^63 needs per-doc gram mass × max|lp| <
    // 9.2e18, i.e. a single document of ~10^8+ grams — far past any real
    // row.
    val toScaledLong: Column => Column = d =>
      (d.cast("decimal(20,9)") *
        lit(java.math.BigDecimal.valueOf(1000000000L)).cast("decimal(10,0)"))
        .cast("long")
    // ONE training job (the kmeansStep bounded-collect precedent, widened
    // to the whole model): the per-(lang, gram) scaled log-probs plus each
    // lang's prior/miss stats collect together, so the labeled corpus is
    // gram-exploded EXACTLY ONCE per classify() call. Collecting the model
    // is not a new scale concession — the scoring side broadcasts it, and
    // anything broadcast must fit the driver by definition (V is
    // Heaps-bounded, L fixed). The L-row-only collect this replaces ran
    // the same counts subtree at plan time and then AGAIN inside the
    // scoring action, because exchange reuse never crosses separate jobs —
    // the measured r12→r13 t22 constant-factor regression.
    val trained = counts.join(totals, Seq("_lang"))
      .join(docsPerLang, Seq("_lang"))
      .crossJoin(broadcast(vocab)).crossJoin(broadcast(nDocs))
      .select(col("_lang"), col("_g"),
        toScaledLong(round(log((col("_c") + 1).cast("double") /
          (col("_tot") + col("_v")).cast("double")), 9)).as("_lp"),
        toScaledLong(round(log(col("_nl").cast("double") / col("_n")), 9))
          .as("_prior"),
        toScaledLong(round(log(lit(1.0) /
          (col("_tot") + col("_v")).cast("double")), 9)).as("_miss"))
      .collect()
    // langs in UTF-8 byte (= code point) order — the same lex order the
    // engine-side sort and the oracle's VARCHAR comparison use, so the
    // argmax tie rule stays bit-deterministic across engines
    val langs: Array[String] = trained.map(_.getString(0)).distinct
      .sortWith((a, b) => java.util.Arrays.compareUnsigned(
        a.getBytes("UTF-8"), b.getBytes("UTF-8")) < 0)
    val L = langs.length
    if (L == 0)
      // no labeled doc has gram evidence — nothing is scorable
      return docs.select(col(idCol), lit("").as("lang_pred"),
        lit(0.0).as("score")).where(lit(false))
    val idx: Map[String, Int] = langs.zipWithIndex.toMap
    val priorsScaled = new Array[Long](L)
    val missScaled = new Array[Long](L)
    trained.foreach { r =>
      val i = idx(r.getString(0))
      priorsScaled(i) = r.getLong(3)
      missScaled(i) = r.getLong(4)
    }
    // gram -> L-array of scaled-long log-probs (miss-floor where the lang
    // never saw the gram) — the broadcast MODEL. The model is in driver
    // memory by definition here (it was just collected), so scoring is a
    // NARROW MAP: one broadcast handle + one compiled pass per doc
    // ([[LangGramScore]]) summing the L scaled longs over the doc's grams.
    // The r12 formulation shipped the model as a broadcast-joined relation
    // and reduced per-doc partial sums through one docs-row exchange; this
    // removes the gram explode (docs×len rows), the join probe per gram,
    // and the scoring exchange ENTIRELY — zero corpus-sized exchanges on
    // the scoring side (LangIdSpec pins the plan and the zero per-doc
    // shuffle delta). Long sums are order-independent integer adds, so the
    // result is bit-identical (NB-reference- and oracle-pinned).
    val termsByGram = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Array[Long]]
    trained.foreach { r =>
      val g = org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(1))
      var arr = termsByGram.get(g)
      if (arr == null) { arr = missScaled.clone(); termsByGram.put(g, arr) }
      arr(idx(r.getString(0))) = r.getLong(2)
    }
    val spark = docs.sparkSession
    val modelBc = spark.sparkContext.broadcast(termsByGram)

    val sums = docs
      .select(col(idCol).as("_id"), norm(col(textCol)).as("_t"))
      .where(length(col("_t")) >= n)
      .select(col("_id"), langGramScore(col("_t"), modelBc, missScaled, n).as("_s"))
    // argmax by (score desc, lang asc): min over (-score, idx) structs — the
    // long negation is exact and langs index order IS lex order, so the
    // tie rule is bit-deterministic
    val scoredStructs = array((0 until L).map(i =>
      struct((-(lit(priorsScaled(i)) + col("_s").getItem(i))).as("ns"),
        lit(i).as("idx"))): _*)
    sums
      .select(col("_id"), array_min(scoredStructs).as("_b"))
      .select(col("_id").as(idCol),
        element_at(lit(langs), col("_b.idx") + 1).as("lang_pred"),
        // one exact decimal multiply per doc re-expands the scaled integer:
        // (20,0) × (10,9) -> (31,9) exact, then ONE correctly-rounded cast
        round((col("_b.ns").cast("decimal(20,0)") *
          lit(new java.math.BigDecimal("-0.000000001")).cast("decimal(10,9)"))
          .cast("double"), 6).as("score"))
  }

  /** Compiled per-doc scorer: Σ over the doc's code-point n-grams of the
    * model's L scaled-long log-probs (miss-floor vector for unseen grams) —
    * the narrow-map replacement for explode → broadcast join → per-doc
    * reduce. The model rides an ordinary Spark broadcast (a handle in the
    * task binary, one copy per executor — same shipping story as the
    * relation it replaces). */
  private case class LangGramScore(
      child: org.apache.spark.sql.catalyst.expressions.Expression,
      model: org.apache.spark.broadcast.Broadcast[
        java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Array[Long]]],
      miss: Array[Long], n: Int)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
    import org.apache.spark.sql.types._
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      val bytes = s.getBytes
      val L = miss.length
      val sums = new Array[Long](L)
      val m = model.value
      // code point offsets (one pass), then one map lookup per gram slice
      var nChars = 0
      var i = 0
      while (i < bytes.length) {
        i += org.apache.spark.unsafe.types.UTF8String.numBytesForFirstByte(bytes(i))
        nChars += 1
      }
      val offs = new Array[Int](nChars + 1)
      var c = 0
      i = 0
      while (i < bytes.length) {
        offs(c) = i
        i += org.apache.spark.unsafe.types.UTF8String.numBytesForFirstByte(bytes(i))
        c += 1
      }
      offs(nChars) = bytes.length
      var g = 0
      val grams = nChars - n + 1
      while (g < grams) {
        val slice = org.apache.spark.unsafe.types.UTF8String.fromBytes(
          bytes, offs(g), offs(g + n) - offs(g))
        val terms = m.get(slice)
        val src = if (terms == null) miss else terms
        var l = 0
        while (l < L) { sums(l) += src(l); l += 1 }
        g += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(sums)
    }
    override protected def withNewChildInternal(
        c: org.apache.spark.sql.catalyst.expressions.Expression): LangGramScore =
      copy(child = c)
    override def prettyName: String = "lang_gram_score"
  }

  private def langGramScore(text: Column,
      model: org.apache.spark.broadcast.Broadcast[
        java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Array[Long]]],
      miss: Array[Long], n: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
    column(LangGramScore(expression(text), model, miss, n))
  }
}
