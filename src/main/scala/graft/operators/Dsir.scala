package graft.operators

import graft.functions.HashExpressions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (Xie et al., NeurIPS 2023): score
  * every raw document by how much more likely its hashed n-gram features are
  * under a target-domain model than under the raw-corpus model, so a pipeline
  * can up-sample target-like data. The reference's transform surface stops at
  * column-level cleansing (`/root/reference/src/Infrastructure/Transformation/
  * Common/DataCleansingStep.cs:24-63`); this is the corpus-selection extension
  * of it, the step DSIR runs between quality filtering and sampling.
  *
  * Feature map (the paper's §3.1 hashed n-grams): word unigrams AND bigrams,
  * each hashed into one of `buckets` bins — here with the portable 60-bit
  * md5 hash ([[HashExpressions.md5Hash60]]) so an external engine reproduces
  * the exact bucketing. Both bag-of-buckets models are multinomials with
  * add-one smoothing:
  *
  *   log w(d) = sum over d's grams g of
  *     [ ln((ct[b(g)] + 1) / (nt + B)) - ln((cr[b(g)] + 1) / (nr + B)) ]
  *
  * with `ct`/`cr` the bucket counts over the target/raw corpus, `nt`/`nr`
  * their totals, `B = buckets`.
  *
  * Scale shape — the model is FIXED-size by construction, the strongest
  * possible 100 TB story for a model-join family: unlike t15's
  * vocabulary-bounded bigram LM (which still grows with Heaps' law), the DSIR
  * model is exactly `B` rows no matter the corpus, so the scoring join is a
  * broadcast at ANY scale. The raw corpus is scanned and gram-exploded ONCE:
  * the only corpus-sized exchange is the per-doc bucket-count aggregation
  * keyed on `(id, bucket)` — rows of three integers, bounded by
  * min(grams-per-doc, B) per document — the raw model rolls up from that
  * relation (sum of per-doc counts is exactly the global counts), and the
  * final per-doc reduce ships `(id, decimal)` only. No text payload crosses
  * any exchange after the gram explode.
  *
  * Determinism (the [[Quality.lmScore]] pattern): each DISTINCT bucket's
  * log-ratio is rounded once at 9 decimals — 2B `ln` calls total, independent
  * of corpus size, confining any engine last-ulp `ln` disagreement to the
  * model — then each doc sums integer-count × quantized-ratio products as
  * exact decimals (order-independent) and rounds at 6.
  *
  * Output: `(id, n_grams, log_w)` for every raw doc with ≥ 1 token; higher
  * `log_w` = more target-like. Resampling itself composes downstream: rank by
  * `log_w` (or feed `exp` of it to [[Sampling.weightedSample]]'s prefix-sum
  * draw) — kept out of this operator so the weight contract stays exact.
  *
  * @param target the target-domain sample (same text column); typically a
  *               small curated set — its gram explode is corpus-sized only
  *               when the target is, and its model is still B rows after.
  */
object Dsir {

  /** `(id, bucket)` gram-bucket stream: word unigrams + bigrams of the
    * space-tokenized text, each md5-bucketed into `[0, buckets)`. */
  // gram construction + hashing + bucketing run in the ONE compiled pass
  // [[HashExpressions.Md5WordGramBuckets]] — per-row-multiset-identical to
  // the declarative split → bigram transform → explode → md5Hash60 % buckets
  // chain it replaced (Md5ExprSpec pin; the old chain interpreted the bigram
  // lambda per gram and built a hex string + radix parse per hash); no-token
  // rows yield an empty array, which explode drops exactly like the old
  // where(size(ws) >= 1)
  private def gramBuckets(df: DataFrame, idCol: String, textCol: String,
                          buckets: Int): DataFrame =
    df.select(col(idCol).as("id"),
        explode(HashExpressions.md5_word_gram_buckets(col(textCol), buckets))
          .as("bucket"))

  /** [[gramBuckets]] with extra columns carried through the explode —
    * same tokenization, same bucketing. */
  private def gramBucketsCarrying(df: DataFrame, idCol: String,
                                  textCol: String, buckets: Int,
                                  carry: Seq[String]): DataFrame =
    df.select(col(idCol).as("id") +: carry.map(col) :+
      explode(HashExpressions.md5_word_gram_buckets(col(textCol), buckets))
        .as("bucket"): _*)

  /** Single-pass variant for the common case where the target distribution
    * IS a predicate over the raw corpus (a curated split, an eval-like
    * slice): instead of two relations — whose twin gram explodes would
    * re-derive the whole upstream pipeline twice when `raw` is the tail of
    * a long lazy chain — the target membership rides the gram stream as a
    * precomputed flag, and ONE bucket rollup computes both models via
    * conditional sums (`ct = Σ c where flagged`, exactly the two-relation
    * counts since target ⊆ raw). Output is bit-identical to
    * `importanceWeights(raw, raw.where(targetPred), …)` (spec-pinned).
    *
    * `carry` names metadata columns (functionally dependent on `idCol`)
    * passed through the per-doc aggregations — they ride the narrow
    * `(id, bucket, c)` exchange, so downstream stages never join back to
    * the corpus for them (the [[CrawlPipeline]] composition seam). */
  def importanceWeights(raw: DataFrame, targetPred: Column, idCol: String,
                        textCol: String, buckets: Int,
                        carry: Seq[String]): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val gb = gramBucketsCarrying(raw.withColumn("_tgt", targetPred),
      idCol, textCol, buckets, "_tgt" +: carry)
    val docBuckets = gb
      .groupBy(col("id") +: col("_tgt") +: carry.map(col) :+ col("bucket"): _*)
      .agg(count(lit(1)).as("c"))
    // B rows, one rollup for BOTH models: raw counts as plain sums, target
    // counts as conditional sums over the same relation
    val bucketCounts = docBuckets.groupBy(col("bucket"))
      .agg(sum(col("c")).as("cr"),
        sum(when(col("_tgt"), col("c")).otherwise(0L)).as("ct"))
    val tot = bucketCounts.agg(sum(col("cr")).as("nr"), sum(col("ct")).as("nt"))
    val model = bucketCounts.crossJoin(broadcast(tot))
      .select(col("bucket"),
        round(
          log((col("ct") + lit(1)).cast("double") /
            (col("nt") + lit(buckets)).cast("double")) -
          log((col("cr") + lit(1)).cast("double") /
            (col("nr") + lit(buckets)).cast("double")), 9).as("lr"))
    docBuckets.join(broadcast(model), Seq("bucket"))
      .groupBy(col("id") +: carry.map(col): _*)
      .agg(sum(col("c")).as("n_grams"),
        sum(col("c").cast("decimal(12,0)") * col("lr").cast("decimal(12,9)"))
          .as("_wsum"))
      .select(col("id").as(idCol) +: carry.map(col) :+ col("n_grams") :+
        round(col("_wsum").cast("double"), 6).as("log_w"): _*)
  }

  /** Per-document DSIR log-importance weight of every `raw` doc against the
    * `target` sample. See object scaladoc for the contract. */
  def importanceWeights(raw: DataFrame, target: DataFrame, idCol: String,
                        textCol: String, buckets: Int = 1024): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val rawGb = gramBuckets(raw, idCol, textCol, buckets)
    val tgtGb = gramBuckets(target, idCol, textCol, buckets)
    // per-doc bucket counts FIRST — the one corpus-sized exchange: rows of
    // (id, bucket, c). The raw model then rolls up from THIS relation
    // (sum of per-doc counts == global counts, exactly) instead of
    // re-aggregating the gram stream, cutting the raw-side corpus scans from
    // three to one when Catalyst reuses the exchange — and where it doesn't,
    // the rollup costs one extra shuffle of these narrow integer rows,
    // still strictly cheaper than re-scanning and re-exploding the text.
    val docBuckets = rawGb.groupBy(col("id"), col("bucket"))
      .agg(count(lit(1)).as("c"))
    val rawCounts = docBuckets.groupBy(col("bucket")).agg(sum(col("c")).as("c"))
    val rawTotal = rawCounts.agg(sum(col("c")).as("n"))
    val tgtCounts = tgtGb.groupBy(col("bucket")).agg(count(lit(1)).as("c"))
    val tgtTotal = tgtCounts.agg(sum(col("c")).as("n"))
    // B-row model: full outer over the two count sides (a bucket may appear
    // in only one corpus), totals ride along as 1-row broadcasts. The single
    // rounding site for all ln() arithmetic in the operator.
    val model = tgtCounts.withColumnRenamed("c", "ct")
      .join(rawCounts.withColumnRenamed("c", "cr"), Seq("bucket"), "full_outer")
      .na.fill(0L, Seq("ct", "cr"))
      .crossJoin(broadcast(tgtTotal.withColumnRenamed("n", "nt")))
      .crossJoin(broadcast(rawTotal.withColumnRenamed("n", "nr")))
      .select(col("bucket"),
        round(
          log((col("ct") + lit(1)).cast("double") /
            (col("nt") + lit(buckets)).cast("double")) -
          log((col("cr") + lit(1)).cast("double") /
            (col("nr") + lit(buckets)).cast("double")), 9).as("lr"))
    docBuckets.join(broadcast(model), Seq("bucket"))
      .groupBy(col("id"))
      .agg(sum(col("c")).as("n_grams"),
        // cast each factor to decimal BEFORE multiplying: (12,0) x (12,9)
        // -> (25,9), inside Spark's 38-digit cap, so the whole sum is exact
        // decimal arithmetic over the already-quantized model values
        sum(col("c").cast("decimal(12,0)") * col("lr").cast("decimal(12,9)"))
          .as("_wsum"))
      .select(col("id").as(idCol), col("n_grams"),
        round(col("_wsum").cast("double"), 6).as("log_w"))
  }

  /** DSIR's resampling stage (Xie et al. §3.2): draw `k` docs WITHOUT
    * replacement, each with probability proportional to
    * `exp(log_w / temperature)`, via the Gumbel-top-k trick — perturb each
    * doc's scaled log-weight with standard Gumbel noise and keep the k
    * largest. Deterministic end to end: the "noise" is seeded by the doc id
    * itself through the portable md5 hash, reduced mod 2^52 so that
    * `u = (h mod 2^52 + 0.5) / 2^52` is an EXACTLY-representable double
    * strictly inside (0, 1) — every step (mod, add-half, divide-by-2^52) is
    * exact IEEE arithmetic in any engine, `g = -ln(-ln(u))` is always
    * finite, and the draw is content-keyed — idempotent under retry,
    * repartition, and append, the same contract as [[DatasetSplit]]. (A
    * naive `(h + 1) / (2^60 + 1)` fails at the edges: quotients within
    * 2^-54 of 1 round to exactly 1.0 and blow up the outer ln.)
    *
    * Scale shape: one projection over the weights relation, then a global
    * top-k — Spark plans `TakeOrderedAndProject` (per-partition heap of k,
    * merge on the driver), never a full sort or shuffle of the corpus.
    *
    * Determinism bound (weaker than [[importanceWeights]]'s, stated
    * honestly): the perturbed key is `round(log_w / temperature + g, 9)`
    * with TWO `ln` calls per doc — corpus-many rounding sites, not
    * model-bounded, so an engine whose `ln` differs in the last ulp exactly
    * at a 1e-9 half-way point could flip one key; ties on the quantized key
    * break by lowest id, so only a boundary collision (not key equality)
    * can reorder. Output: `(weights' columns..., key)`, the selected k docs
    * — input columns are PRESERVED so metadata carried into the weights
    * relation (source, token counts) rides the per-partition top-k heaps
    * instead of forcing a join back to the corpus after the draw. */
  def gumbelTopK(weights: DataFrame, idCol: String, logWCol: String,
                 k: Int, temperature: Double = 1.0): DataFrame = {
    require(k > 0, "k must be positive")
    require(temperature > 0, "temperature must be positive")
    // the perturbed key lands in the output as `key`; a caller column of
    // that name would be silently overwritten by withColumn — fail fast
    require(!weights.columns.contains("key"),
      "gumbelTopK: weights already has a 'key' column (the output claims " +
        "that name for the perturbed draw key) — rename it first")
    val twoTo52 = 4503599627370496L // 2^52
    val u = (pmod(HashExpressions.md5Hash60(col(idCol).cast("string")),
        lit(twoTo52)).cast("double") + lit(0.5)) / lit(twoTo52.toDouble)
    val key = round(col(logWCol) / lit(temperature) - log(-log(u)), 9)
    weights.withColumn("key", key)
      .orderBy(col("key").desc, col(idCol))
      .limit(k)
  }
}
