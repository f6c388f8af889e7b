package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The crawl-curation pipeline composed END TO END in one DataFrame chain —
  * the operating mode a real user runs, where every stage below exists as an
  * individually oracle-gated operator:
  *
  *   raw HTML → [[Boilerplate.extract]] (t23) → [[LangId.classify]] (t22)
  *   language gate → [[Quality.flags]] (t06) quality gate → exact
  *   normalized-fingerprint dedup (d02) → [[Dsir]] importance-weight +
  *   Gumbel-top-k resample (t16/t17) → sequence packing (t09).
  *
  * Composition is the point: each stage consumes the previous stage's
  * columns directly (extraction carries metadata via its `carry` seam), no
  * materialization barrier separates them, and the whole chain is ONE lazy
  * plan — Catalyst fuses the narrow stages (extraction, quality flags,
  * fingerprinting, token counts) into the scan pipelines around the
  * stage-inherent exchanges.
  *
  * Scale shape (the exchanges, in order — everything else is narrow or
  * broadcast):
  *   - langid model aggregations: vocabulary-bounded (t22's shape);
  *   - gram partial-sum reduce: docs rows of (id, L decimals);
  *   - the prediction join: pred (id, lang_pred ~16 B/row) joins the
  *     extracted relation on id — text crossing #1;
  *   - dedup: one min_by-struct aggregation keyed on the 8-byte
  *     fingerprint — text crossing #2, map-side combined so duplicate
  *     copies collapse BEFORE the exchange (~÷duplication-factor volume).
  *     Two crossings is the floor for this chain: the argmax gate and the
  *     dedup group are keyed differently (id vs fp), so the text payload
  *     must co-locate twice — spec-pinned: EXACTLY two text-bearing
  *     shuffles in the whole plan, everything else narrow;
  *   - DSIR: the SINGLE-PASS overload — target membership is a flag on the
  *     gram stream and one bucket rollup computes both models, so the
  *     survivors subtree is derived once, not once per model side; the
  *     exchanges carry (id, meta, bucket, c) integer rows against a B-row
  *     broadcast model;
  *   - resample + packing: the Gumbel-top-k CARRIES the packing metadata
  *     (source, token counts) through its per-partition heaps
  *     (TakeOrderedAndProject — never a corpus sort, never a join back),
  *     and the pack window runs over the k winners.
  *
  * Determinism: every stage is the already-oracle-gated formulation —
  * integer-exact extraction and quality rules, 1e-9-quantized model
  * log-probs with exact-decimal sums, content-keyed Gumbel draws — so the
  * COMPOSITION is oracle-able end to end (bit-exact in DuckDB at all
  * measured scales). The one driver seam is langid's L-string language
  * list over the labeled seed. */
object CrawlPipeline {

  /** Run the full curation chain over `pages`.
    *
    * @param pages       raw crawl: `(idCol, htmlCol, langCol, sourceCol)` —
    *                    `langCol` is the (partially trusted) label used only
    *                    on the `labeledPred` training split
    * @param labeledPred rows whose `langCol` label trains the langid model
    * @param targetLangs keep docs whose PREDICTED language is in this set
    * @param dsirTargetPred rows of the post-dedup survivors forming the
    *                    DSIR target distribution
    * @param sampleK     resample size (Gumbel-top-k without replacement)
    * @param packBudget  token budget per training sequence
    * @return `(idCol, sourceCol, lang_pred, log_w, n_tokens, pack_id,
    *         pack_offset)` — the `sampleK` selected docs, packed */
  def curate(pages: DataFrame, idCol: String, htmlCol: String,
             langCol: String, sourceCol: String,
             labeledPred: Column, targetLangs: Seq[String],
             dsirTargetPred: Column, sampleK: Int = 100,
             packBudget: Long = 512L,
             rules: Quality.Rules = Quality.Rules(),
             persistExtracted: Boolean = false,
             knHeadFrac: Option[Double] = None): DataFrame = {
    require(targetLangs.nonEmpty, "crawl pipeline: empty target language set")
    require(sampleK > 0 && packBudget > 0,
      s"crawl pipeline: sampleK=$sampleK packBudget=$packBudget")
    // 1. boilerplate extraction — narrow map, metadata carried through.
    //    `persistExtracted` is the single-materialization seam: the static
    //    plan derives the extracted relation in every text-bearing scan
    //    pipeline (runtime exchange reuse dedups the identical subtrees,
    //    but extraction itself re-runs in each remaining pipeline);
    //    persisting trades one cached copy of the EXTRACTED relation
    //    (~5-20× smaller than the raw HTML) for those recomputes. At
    //    100 TB of raw crawl this is the standard materialize-once point —
    //    extraction is the most expensive narrow stage and everything
    //    downstream consumes only its output. The caller owns the
    //    lifecycle (unpersist after the terminal action); output is
    //    bit-identical either way.
    val ext0 = Boilerplate.extract(pages, idCol, htmlCol,
        carry = Seq(langCol, sourceCol))
      .select(col(idCol), col(langCol), col(sourceCol), col("extracted_text"))
    val ext = if (persistExtracted)
      ext0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else ext0
    chainFromExtracted(ext, idCol, langCol, sourceCol, labeledPred,
      targetLangs, dsirTargetPred, sampleK, packBudget, rules,
      knHeadFrac = knHeadFrac, postDedup = identity)
  }

  /** The curation chain from an already-extracted relation
    * `(idCol, langCol, sourceCol, extracted_text)` — the shared core of
    * [[curate]] (batch) and [[curateIncrement]] (continuous): langid gate →
    * quality gate → in-batch fingerprint dedup → `postDedup` seam →
    * DSIR resample → packing. */
  private[operators] def chainFromExtracted(
      ext: DataFrame, idCol: String, langCol: String, sourceCol: String,
      labeledPred: Column, targetLangs: Seq[String],
      dsirTargetPred: Column, sampleK: Int, packBudget: Long,
      rules: Quality.Rules,
      knHeadFrac: Option[Double] = None,
      postDedup: DataFrame => DataFrame): DataFrame = {
    // 2. language ID over the EXTRACTED text: model from the labeled seed,
    //    every doc scored, gate on the predicted language
    val pred = LangId.classify(ext.where(labeledPred), ext,
      idCol, "extracted_text", langCol)
    val langGated = ext.drop(langCol)
      .join(pred.select(col(idCol), col("lang_pred")), Seq(idCol))
      .where(col("lang_pred").isin(targetLangs: _*))
    // 2b. optional KN-perplexity HEAD gate (CCNet's production filter,
    //     Wenzek et al. 2020 §4.3: perplexity-bucket the corpus and keep
    //     the head) with t24's self-trained interpolated KN trigram LM:
    //     keep the lowest-ppl `frac` of scored docs. A fixed absolute
    //     cutoff is NOT scale-robust (self-trained ppl grows with corpus
    //     diversity — measured: lake median 20.6 at sf0.01 → 28.5 at
    //     sf0.1); the head-fraction contract is. The discrete cutoff (the
    //     smallest ppl whose cumulative count reaches ⌊frac·n⌋) comes from
    //     a (quantized-ppl, count) histogram — value-bounded, the
    //     kmeansStep driver-seam precedent — so the gate is pure integer
    //     rank arithmetic on 3-decimal-quantized values: bit-exact in any
    //     engine, no interpolation. Ties at the cutoff are kept (both
    //     engines identically). The (id, ppl) relation then joins on the
    //     SAME id key as the language gate, so the extracted text
    //     co-locates once for both gates — no third text crossing
    //     (spec-pinned). Docs too short to score (< 3 tokens) have no
    //     certificate and are dropped — t06's minTokens would drop them
    //     anyway.
    val gated = knHeadFrac match {
      case Some(frac) =>
        require(frac > 0 && frac <= 1, s"knHeadFrac out of (0,1]: $frac")
        // persist the (id, ppl) relation — docs rows of 16 bytes: the
        // histogram collect below is a PLAN-TIME job, and exchange reuse
        // never crosses jobs, so without the persist the terminal action
        // re-runs the whole KN scoring pass (trigram explode + model
        // build + scoring join) a second time — measured 2× t24's wall
        // inside c04. Same lifecycle as the `persistExtracted` seam (the
        // caller/bench owns the cache); output bit-identical.
        val kn = Quality.knTrigramScore(ext, idCol, "extracted_text")
          .select(col(idCol), col("ppl"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val hist = kn.groupBy(col("ppl")).agg(count(lit(1)).as("c"))
          .orderBy(col("ppl")).collect()
        val n = hist.iterator.map(_.getLong(1)).sum
        // IEEE frac*n then floor — the oracle evaluates the identical
        // double expression, so the rank is the same integer
        val need = math.max(1L, math.floor(frac * n).toLong)
        var cum = 0L
        val cut = hist.iterator
          .map { r => cum += r.getLong(1); (r.getDouble(0), cum) }
          .collectFirst { case (p, c) if c >= need => p }
          .getOrElse(Double.NegativeInfinity) // no scored docs -> empty gate
        langGated.join(kn, Seq(idCol))
          .where(col("ppl") <= cut).drop("ppl")
      case None => langGated
    }
    // 3. quality gate — narrow flags over the gated relation; n_tokens is
    //    already t09's token count, so carry it to the packer for free
    val q = Quality.flags(gated, "extracted_text", rules)
      .where(col("keep"))
      .select(col(idCol), col(sourceCol), col("lang_pred"),
        col("extracted_text"), col("n_tokens"))
    // 4. exact normalized dedup, d02's key: min-id survivor per fingerprint
    //    as ONE min_by aggregation — the gated relation is consumed once
    //    (a keep-id + confirm-join formulation derives the upstream join
    //    twice under column pruning), and the map-side combine collapses
    //    duplicate copies BEFORE the exchange, so at crawl-typical 10×
    //    duplication the fp shuffle carries ~a tenth of the gated rows.
    val cols = Seq(idCol, sourceCol, "lang_pred", "extracted_text", "n_tokens")
    val survivors = postDedup(q
      .withColumn("_fp", TextFunctions.fingerprint(col("extracted_text")))
      .groupBy(col("_fp"))
      .agg(min_by(struct(cols.map(col): _*), col(idCol)).as("_row"))
      .select(cols.map(c => col(s"_row.$c").as(c)): _*))
    // 5. DSIR: single-pass importance weights (target membership rides the
    //    gram stream as a flag — survivors is consumed ONCE, not three
    //    times), metadata carried through the narrow aggregations, then the
    //    payload-carrying Gumbel-top-k — no join back to the corpus
    val weights = Dsir.importanceWeights(survivors, dsirTargetPred,
      idCol, "extracted_text", buckets = 1024,
      carry = Seq(sourceCol, "lang_pred", "n_tokens"))
    val sel = Dsir.gumbelTopK(weights, idCol, "log_w", sampleK)
    // 6. t09's per-source cumulative-token window over the k winners
    val pw = Window.partitionBy(col(sourceCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sel
      .select(col(idCol), col(sourceCol), col("lang_pred"), col("log_w"),
        col("n_tokens").cast("long").as("n_tokens"))
      .withColumn("_cum", sum(col("n_tokens")).over(pw) - col("n_tokens"))
      .select(col(idCol), col(sourceCol), col("lang_pred"), col("log_w"),
        col("n_tokens"),
        floor(col("_cum") / packBudget).cast("long").as("pack_id"),
        (col("_cum") % packBudget).as("pack_offset"))
  }

  /** ONE INCREMENT of the continuous crawl — the production operating mode
    * the reference itself embodies (cron-scheduled incremental extraction:
    * `/root/reference/src/Core/Services/JobSchedulingService.cs:61-66`
    * re-fires the pipeline per schedule and
    * `DataIngestionJob.cs:36-159` lands each run as parquet + CTL):
    * batch N arrives and is curated AGAINST THE ACCUMULATED LAKE, not in
    * isolation.
    *
    *   batch → [[UrlFilter.filterDocs]] (t25) gate → [[Boilerplate]]
    *   extraction → [[chainFromExtracted]] (langid gate → quality →
    *   in-batch dedup → HISTORY dedup → DSIR resample → packing) →
    *   land parquet + CTL → append the batch's fingerprints to the index.
    *
    * History semantics (the i03 first-sighting convention): a batch doc is
    * new iff its extracted-text fingerprint is absent from every EARLIER
    * batch's post-URL-gate extracted set — the WHOLE extracted batch is
    * appended (quality- and resample-dropped docs included), so a recrawl
    * of a previously-seen page never re-enters curation, exactly the
    * FineWeb-style dedup-against-everything-seen discipline.
    *
    * Scale shape per batch, the parts beyond [[curate]]'s:
    *   - the URL gate is narrow + a (capped) broadcast blocklist join —
    *     blocked pages never reach extraction;
    *   - extraction persists ONCE (the [[curate]] seam, mandatory here:
    *     the curation chain and the index append both consume it);
    *   - history dedup reads the materialized [[FingerprintIndex]] —
    *     ~8 B/doc of history, NEVER the historical text corpus — through
    *     [[HistoryDedup]]'s bloom + bounded-broadcast confirm, so neither
    *     the history nor the batch shuffles (spec-pinned); the caller's
    *     manifest count (`expectedBatchRows`, the CTL contract) bounds the
    *     confirm broadcast with no extra scan;
    *   - the landed batch is one parquet file + CTL manifest (the
    *     reference's output contract, `CtlGenerationHandler.cs:27-126`),
    *     written BEFORE the index mutates so a failed batch never
    *     poisons the index (replaying it is idempotent: same curated
    *     content, `FingerprintIndex.append` overwrites by batch id).
    *
    * Determinism: every stage is the oracle-gated formulation, so a
    * multi-batch replay is oracle-able end to end (the c03 gate replays
    * three batches against one giant SQL chain at three scales).
    *
    * @return the landed curated batch (read back from the sink when
    *         `outDir` is given; local-checkpointed otherwise — either way
    *         evaluation is forced before the index append) */
  def curateIncrement(batch: DataFrame, idCol: String, htmlCol: String,
                      urlCol: String, langCol: String, sourceCol: String,
                      urlRules: UrlFilter.Rules,
                      blockedHosts: Option[DataFrame],
                      labeledPred: Column, targetLangs: Seq[String],
                      dsirTargetPred: Column,
                      indexDir: String, batchId: Long,
                      expectedHistoryRows: Long,
                      sampleK: Int = 100, packBudget: Long = 512L,
                      rules: Quality.Rules = Quality.Rules(),
                      expectedBatchRows: Long = -1L,
                      expectedHosts: Long = -1L,
                      outDir: Option[String] = None): DataFrame = {
    require(sampleK > 0 && packBudget > 0,
      s"crawl increment: sampleK=$sampleK packBudget=$packBudget")
    val spark = batch.sparkSession
    // 0. URL gate — blocked pages never reach the (expensive) extraction.
    //    `expectedHosts` is the blocklist manifest's cardinality (the same
    //    CTL-contract seam as `expectedBatchRows`): with it the broadcast-cap
    //    decision is free; without it EVERY increment pays one plan-time HLL
    //    job over the blocklist relation.
    val admitted = UrlFilter.filterDocs(batch, idCol, urlCol, urlRules,
      blockedHosts, expectedHosts = expectedHosts)
    // 1. extraction, persisted once: the curation chain and the index
    //    append both read the cached copy
    val ext = Boilerplate.extract(admitted, idCol, htmlCol,
        carry = Seq(langCol, sourceCol))
      .select(col(idCol), col(langCol), col(sourceCol), col("extracted_text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // 2. the c02 curation chain with the history-dedup seam after the
      //    in-batch dedup: survivors' fingerprints absent from the index.
      //    A fresh pipeline's FIRST batch has an empty index — dedup
      //    against it is the identity, so skip the bloom build + confirm
      //    plan outright (plan-time directory check; output identical by
      //    the anti-join-vs-empty semantics).
      val curated = chainFromExtracted(ext, idCol, langCol, sourceCol,
        labeledPred, targetLangs, dsirTargetPred, sampleK, packBudget, rules,
        postDedup =
          if (FingerprintIndex.isEmpty(spark, indexDir)) identity
          else df => HistoryDedup.newAgainstFingerprints(df,
            FingerprintIndex.read(spark, indexDir), "extracted_text",
            expectedHistoryRows, expectedBatchRows = expectedBatchRows))
      // 3. land the batch (forcing evaluation) BEFORE the index mutates —
      //    a failure here leaves the index untouched and the batch
      //    replayable
      val landed = outDir match {
        case Some(d) =>
          val res = sinks.writeBatch(curated, d, batchId)
          spark.read.parquet(res)
        case None => curated.localCheckpoint()
      }
      // 4. only now does this batch's extracted set join the index
      FingerprintIndex.append(ext, "extracted_text", indexDir, batchId)
      landed
    } finally ext.unpersist()
  }

  private object sinks {
    /** One parquet file + CTL manifest per batch (the reference's output
      * contract); returns the parquet path. */
    def writeBatch(curated: DataFrame, dir: String, batchId: Long): String = {
      val spark = curated.sparkSession
      val res = graft.sinks.ParquetSink.writeSingleFile(curated, dir,
        f"batch_$batchId%05d.parquet")
      val n = spark.read.parquet(res.path).count()
      val ctl = graft.sinks.CtlManifest.forFile(spark, res.path, n,
        s"crawl_increment_$batchId", "crawl")
      graft.sinks.CtlManifest.write(spark, dir, f"batch_$batchId%05d.ctl", ctl)
      res.path
    }
  }
}
