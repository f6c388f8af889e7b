package graft.operators

import graft.functions.{HashExpressions => H, TextFunctions => T, VectorFunctions => V}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, each designed shuffle-first
  * for the 100 TB case:
  *
  *  - exact dedup shuffles a 8-byte fingerprint, never the document text;
  *  - MinHash/SimHash candidate generation is banded LSH — candidates meet in
  *    hash-bucket partitions, so the join key space is bounded and all-pairs
  *    comparison never happens;
  *  - verification (exact Jaccard / Hamming) runs only on candidate pairs.
  *
  * Extension surface beyond the reference (SURVEY §7.1(7)); algorithms are the
  * standard public ones (Broder 1997 MinHash; Charikar 2002 SimHash;
  * banding per Mining of Massive Datasets ch.3).
  */
object Dedup {

  /** Exact dedup, keeping the lowest id per identical key. Implemented as a
    * fingerprint-partitioned min-id window: the shuffle key is `xxhash64(key)` — 8
    * bytes/row regardless of document size — and the text only rides along within
    * its own partition. */
  def exact(df: DataFrame, idCol: String, keyCol: String): DataFrame = {
    val fp = xxhash64(col(keyCol))
    // hash + exact key in the window partition: the hash bounds the shuffle key
    // width, the exact key guards against 64-bit collisions.
    val w = Window.partitionBy(fp, col(keyCol)).orderBy(col(idCol))
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  /** Exact-dup groups: one row per duplicated key with the surviving id and the
    * group size (droppable rows = dup_count - 1).
    *
    * The grouping key is fingerprint-led: `(xxhash64(key), key)`. Map-side
    * partial aggregation collapses duplicates before the exchange (shuffled
    * volume = distinct keys per partition, not raw rows), and the 8-byte hash
    * leading the composite key means partitioning and any sort-fallback compare
    * fingerprints before ever touching document-length text. The exact key stays
    * in the group as the 64-bit-collision guard, so results are exact. */
  def exactGroups(df: DataFrame, idCol: String, keyCol: String): DataFrame =
    df.groupBy(xxhash64(col(keyCol)).as("_fp"), col(keyCol))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))
      .drop("_fp")

  /** Normalized-text dedup: exact dedup over the whitespace/case-normalized
    * fingerprint (catches formatting-only dups). */
  def byFingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.withColumn("_fp", T.fingerprint(col(textCol)))
      .groupBy(col("_fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))
      .withColumnRenamed("_fp", "fingerprint")

  /** MinHash+LSH near-dup candidate pairs with exact-Jaccard verification.
    *
    * shingle → k-hash MinHash signature → split into `bands` bands → explode →
    * self-join on (band index, band hash) → verify candidates with exact Jaccard
    * over distinct shingle sets → pairs with `jaccard >= threshold`.
    *
    * Scale: the only wide exchanges are (a) the band-bucket join, whose key space
    * is bands × hash values, and (b) the id-keyed joins to fetch shingle sets for
    * *candidates only*. Nothing is ever all-pairs. */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
                   shingleN: Int = 3, numHashes: Int = 64, bands: Int = 16,
                   threshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands

    // one pass per doc: signature for banding + hashed sorted set for exact
    // verification (8-byte elements, merge-pass intersection)
    val shingled = df
      .select(col(idCol).as("id"), T.wordShingles(col(textCol), shingleN).as("shingles"))
      .filter(size(col("shingles")) > 0)
      .select(col("id"), H.hashed_sorted_set(col("shingles")).as("shingles"))
    val sigs = shingled
      .withColumn("sig", T.minhashSignature(col("shingles"), numHashes))

    // band hash: chain-hash the band's signature slice (no string building)
    val banded = sigs.select(
      col("id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => aggregate(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)),
          b.cast("long"), (acc, x) => xxhash64(acc, x)))))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "bandHash"))

    val left = banded.withColumnsRenamed(Map("id" -> "id_a"))
    val right = banded.withColumnsRenamed(Map("id" -> "id_b"))
    val candidates = left.join(right, Seq("band", "bandHash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()

    val setsA = shingled.select(col("id").as("id_a"), col("shingles").as("sh_a"))
    val setsB = shingled.select(col("id").as("id_b"), col("shingles").as("sh_b"))
    candidates
      .join(setsA, "id_a").join(setsB, "id_b")
      .withColumn("inter", H.sorted_intersect_count(col("sh_a"), col("sh_b")))
      .withColumn("jaccard",
        col("inter").cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Portable 60-bit token hash ([[graft.functions.HashExpressions.md5Hash60]])
    * — the alternative to engine-internal xxhash64 for signatures an external
    * oracle must verify. */
  private def portableTokenHash(tok: Column): Column = H.md5Hash60Compiled(tok)

  /** SimHash near-dup pairs: pigeonhole banding over `chunks` signature
    * chunks, then exact hamming verify. With `chunks > maxHamming` the
    * banding is EXHAUSTIVE (a pair differing in ≤ maxHamming bits has ≥ 1
    * untouched chunk), so output is exactly all pairs at hamming ≤ max.
    * `portableHash` swaps xxhash64 token hashing for the md5-derived 60-bit
    * hash, making the whole signature reproducible in ANSI SQL (bits 60-63
    * are then always 0 — hamming semantics are unaffected). */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3, chunks: Int = 4,
                   portableHash: Boolean = false): DataFrame = {
    require(chunks > maxHamming, "need chunks > maxHamming for pigeonhole recall")
    val bitsPerChunk = 64 / chunks
    // Empty/whitespace-only docs all hash to the all-ones signature (zero votes
    // pass the sign test — HashExpressions.SimHash64) and would form a quadratic
    // hamming-0 bucket; they carry no content to near-dup on, so drop them (the
    // same guard minhashPairs applies via size(shingles) > 0).
    val sigs = df
      .select(col(idCol).as("id"), T.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col("id"), T.simhash64(
        if (portableHash) transform(col("toks"), portableTokenHash _) else col("toks"))
        .as("simhash"))

    val banded = sigs.select(col("id"), col("simhash"),
      posexplode(transform(sequence(lit(0), lit(chunks - 1)),
        c => call_function("shiftright", col("simhash"), c * bitsPerChunk)
          .bitwiseAND(lit((1L << bitsPerChunk) - 1)))))
      .withColumnsRenamed(Map("pos" -> "chunk", "col" -> "chunkKey"))

    val left = banded.select(col("chunk"), col("chunkKey"),
      col("id").as("id_a"), col("simhash").as("sim_a"))
    val right = banded.select(col("chunk"), col("chunkKey"),
      col("id").as("id_b"), col("simhash").as("sim_b"))
    left.join(right, Seq("chunk", "chunkKey"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact n-gram Jaccard similarity pairs via a PREFIX-FILTERED
    * inverted-index candidate join: explode only each set's prefix, self-join
    * postings on shingle hash, length-filter, then verify with exact
    * merge-pass Jaccard over the full shingle sets. Never all-pairs.
    *
    * Prefix filtering (Chaudhuri et al. SSJoin ICDE 2006; Bayardo et al.
    * AllPairs WWW 2007; Xiao et al. PPJoin): under any consistent global
    * element order (here: the 8-byte hash's numeric order, which
    * `hashed_sorted_set` already provides), two sets with overlap ≥ α share
    * an element within their first `|s| - α + 1` elements. Jaccard ≥ t
    * implies overlap ≥ ceil(t·|s|) for EACH side (o ≥ t(|a|+|b|-o) and
    * |b| ≥ o give o ≥ t|a|; symmetrically t|b|), so indexing only the
    * `|s| - ceil(t·|s|) + 1`-prefix of every set is LOSSLESS for the
    * threshold — it cuts both the posting volume and, quadratically, the
    * candidate-pair exchange (the dominant shuffle of this operator family
    * at scale: measured 10.9 KB/input row at sf1 before prefix filtering)
    * while changing no output row. The same jaccard-vs-size bound yields the
    * free length filter `t·|a| ≤ |b| ∧ t·|b| ≤ |a|` applied during the
    * candidate join on two int columns.
    *
    * Candidate cost is Σ prefix-posting-list²; stop-shingle pruning
    * (`maxDocFreq`) still caps the quadratic term. Only the `maxDocFreq`
    * prune narrows recall, and — because document frequency is computed over
    * PREFIX postings and only prefix elements are indexed — its miss
    * condition is: a true pair is missed iff EVERY shingle the two PREFIXES
    * share has prefix-df > maxDocFreq. That is strictly broader than the
    * pre-prefix-filter rule ("shares nothing but stop-shingles overall"): a
    * pair sharing a rare shingle that falls OUTSIDE both prefixes is missed
    * when its in-prefix shared shingles are all pruned. (Prefix filtering
    * alone guarantees a shared element inside both prefixes for any
    * qualifying pair, so with the prune disabled recall is total.)
    * PropertySpec pins this composed miss model against a naive oracle at
    * small maxDocFreq. Prefix + length filtering are exact, and every
    * reported jaccard is computed on the complete sets. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        shingleN: Int = 3, threshold: Double = 0.5,
                        maxDocFreq: Long = 1000): DataFrame = {
    // hashed sorted sets: 8-byte elements for postings AND merge-pass verification
    val shingled = df
      .select(col(idCol).as("id"),
        H.hashed_sorted_set(T.wordShingles(col(textCol), shingleN)).as("shingles"))
      .filter(size(col("shingles")) > 0)

    // index the lossless prefix only: |s| - ceil(t·|s|) + 1 elements.
    // The 1e-9 slack guards float error in the SAFE direction: t·|s| can
    // compute a hair above a mathematically-integer product (0.7*10 =
    // 7.000000000000001 in doubles), which would inflate the ceil, shorten
    // the prefix below the lossless bound, and silently drop exact-boundary
    // pairs; subtracting epsilon can only lengthen the prefix (more
    // candidates, never fewer true pairs).
    val sz = size(col("shingles"))
    val prefixLen =
      (sz - ceil(lit(threshold) * sz - lit(1e-9)) + lit(1)).cast("int")
    val postings = shingled
      .select(col("id"), sz.as("n"),
        explode(slice(col("shingles"), lit(1), prefixLen)).as("sh"))

    // stop-shingle pruning: a shingle present in >maxDocFreq docs contributes
    // O(df²) candidate pairs; docs whose every shared shingle is that common
    // are not near-dups at any reasonable threshold.
    val filtered = postings
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("sh"))))
      .filter(col("df") <= maxDocFreq)

    val a = filtered.select(col("sh"), col("id").as("id_a"), col("n").as("n_a"))
    val b = filtered.select(col("sh"), col("id").as("id_b"), col("n").as("n_b"))
    // same epsilon slack on the length filter: t·|a| = |b| exactly is an
    // attainable boundary (t=0.7, |a|=10, |b|=7 admits jaccard = 0.7) and
    // float overshoot must not exclude it
    val candidates = a.join(b, "sh")
      .filter(col("id_a") < col("id_b") &&
        lit(threshold) * col("n_a") - lit(1e-9) <= col("n_b") &&
        lit(threshold) * col("n_b") - lit(1e-9) <= col("n_a"))
      .select("id_a", "id_b").distinct()

    val setsA = shingled.select(col("id").as("id_a"), col("shingles").as("sh_a"))
    val setsB = shingled.select(col("id").as("id_b"), col("shingles").as("sh_b"))
    candidates
      .join(setsA, "id_a").join(setsB, "id_b")
      .withColumn("inter", H.sorted_intersect_count(col("sh_a"), col("sh_b")))
      .withColumn("jaccard",
        col("inter").cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Cross-corpus decontamination: corpus docs whose exact n-gram Jaccard
    * against ANY eval doc reaches `threshold` — the near-dup upgrade of
    * verbatim contamination ([[Contamination.overlap]] catches shared grams;
    * this catches lightly-paraphrased benchmark leakage).
    *
    * Scale shape: the eval side is benchmark-sized, so its postings and full
    * shingle sets broadcast — candidate GENERATION probes the corpus in place
    * (no corpus shuffle, no self-join). Fetching shingle sets for the
    * candidates is the one corpus-wide exchange: a shuffle-hash join on the
    * 8-byte id (no sort, and no broadcast — with common grams the candidate
    * list can grow corpus-proportional, past any broadcast budget). One
    * hash-partitioning pass of the corpus relation is the honest floor for a
    * row-matched fetch at unbounded candidate counts. Candidate generation
    * uses the same LOSSLESS prefix + length filtering as
    * [[ngramJaccardPairs]] (see its scaladoc for the bound): unlike that
    * operator's stop-shingle prune there is no recall-narrowing knob here, so
    * recall at the threshold stays total by construction and an all-pairs
    * oracle is exact at every scale — prefix filtering just keeps the
    * candidate-pair `distinct` (the one exchange that grows with
    * contamination density) and the broadcast posting map quadratically
    * smaller than full-posting indexing would.
    * Output: `(id, n_eval_matches, max_jaccard)` per contaminated corpus doc;
    * anti-join it against the corpus to ship the clean remainder. */
  def crossJaccardFlags(corpus: DataFrame, evalDf: DataFrame, idCol: String,
                        textCol: String, shingleN: Int = 3,
                        threshold: Double = 0.5): DataFrame = {
    def shingled(df: DataFrame, as: String, shAs: String) = df
      .select(col(idCol).as(as),
        H.hashed_sorted_set(T.wordShingles(col(textCol), shingleN)).as(shAs))
      .filter(size(col(shAs)) > 0)
    val c = shingled(corpus, "id", "sh_c")
    val e = shingled(evalDf, "eval_id", "sh_e")
    // lossless prefix per side (epsilon slack per ngramJaccardPairs) + the
    // jaccard-vs-size length filter on the joined pair
    def prefixed(df: DataFrame, idAs: String, shCol: String, nAs: String) = {
      val sz = size(col(shCol))
      df.select(col(idAs), sz.as(nAs),
        explode(slice(col(shCol), lit(1),
          (sz - ceil(lit(threshold) * sz - lit(1e-9)) + lit(1)).cast("int")))
          .as("sh"))
    }
    val candidates = prefixed(c, "id", "sh_c", "n_c")
      .join(broadcast(prefixed(e, "eval_id", "sh_e", "n_e")), "sh")
      .where(col("id") =!= col("eval_id") &&
        lit(threshold) * col("n_c") - lit(1e-9) <= col("n_e") &&
        lit(threshold) * col("n_e") - lit(1e-9) <= col("n_c"))
      .select("id", "eval_id").distinct()
    // Fetching shingle sets for candidates: candidate count scales with how
    // much of the corpus shares grams with the eval set — common trigrams can
    // make it corpus-proportional, so broadcasting it would eventually blow
    // the broadcast limit. shuffle_hash hash-partitions both sides on the
    // 8-byte id with no sort; the corpus relation crosses that one exchange
    // (the honest floor for a row-matched fetch — see scaladoc).
    c.join(candidates.hint("shuffle_hash"), "id").join(broadcast(e), "eval_id")
      .withColumn("inter", H.sorted_intersect_count(col("sh_c"), col("sh_e")))
      .withColumn("jaccard",
        round(col("inter").cast("double") /
          (size(col("sh_c")) + size(col("sh_e")) - col("inter")), 6))
      .where(col("jaccard") >= threshold)
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_eval_matches"), max(col("jaccard")).as("max_jaccard"))
  }

  /** Embedding near-dup pairs: sign-LSH bucketing (multi-table for recall) then
    * exact cosine ≥ threshold within candidates.
    *
    * `planesPerTable = 0` AUTO-SIZES the planes to the corpus:
    * `max(4, ceil(log2(n / targetBucketSize)))` — the per-table bucket count
    * then grows with n, holding expected bucket occupancy (and therefore the
    * bucket self-join's pair count) roughly CONSTANT per bucket, i.e. total
    * candidate generation stays ~linear in n. Fixed planes are quadratic: at a
    * 10x corpus a 16-bucket table turns a 125-row bucket into 1250 rows and
    * the self-join cost x100 (measured: d06 went x178 at data x10 before
    * auto-sizing). The flip side is the honest LSH trade — more planes lower
    * per-table recall (collision prob p^planes), so a scaled corpus at the
    * same `tables` budget trades recall instead of cost; raise `tables` (cost
    * ~linear in it) or the threshold to buy recall back. The count() that
    * sizes the planes is a parquet-metadata action, same driver seam as the
    * IVF centroid seed.
    *
    * `probes > 0` is the CHEAPER recall knob (multi-probe LSH, Lv et al. VLDB
    * 2007): one join side additionally probes, per table, the `probes` buckets
    * reached by flipping its least-confident sign bits (see
    * [[graft.functions.VectorFunctions.probeBucketsFromDots]]). With
    * one-sided probing a 1-bit-different pair is recovered iff the differing
    * bit ranks inside the PROBED side's `probes` least-confident bits — for a
    * near-dup the differing plane's dot sits near zero on BOTH vectors, so it
    * usually ranks low on either side, but coverage is not symmetric and
    * probing both sides would buy the union at roughly double the expansion
    * (we take the cheaper single-sided trade; the recall curve below is
    * measured, not derived). Cost is `x(1+min(probes, planes))` on one side's
    * candidate generation vs `x2` per doubling of `tables` for comparable
    * recall; output exactness is UNAFFECTED either way (candidates only
    * widen; the exact-cosine verify filters identically).
    *
    * `probes < 0` selects SCALE-CONDITIONAL auto-probing, tied to the plane
    * count the corpus auto-sized to: 0 when `planesPerTable` resolves to the
    * 4-plane floor (the configs where candidate generation is MEASURED total
    * — sf0.01/sf0.1 recall 14/14 and 191/191 — so probe expansion buys
    * nothing and costs ~3x one side's candidates), else 2 (the measured sf1
    * trade at 8 auto-planes: recall 0.9425 at probes=0 → 0.986 at probes=2,
    * above the campaign's pinned 0.98 floor). The rule keys on planes, not a
    * row-count threshold, because per-table recall decays as p^planes — the
    * plane count IS the quantity probing compensates. */
  def embeddingNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                            dim: Int, threshold: Double = 0.95,
                            planesPerTable: Int = 12, tables: Int = 4,
                            seed: Long = 42L,
                            targetBucketSize: Int = 128,
                            probes: Int = 0): DataFrame = {
    val ppt =
      if (planesPerTable > 0) planesPerTable
      else autoPlanes(df.count(), targetBucketSize)
    require(ppt * tables <= 960, s"plane budget too large: $ppt x $tables")
    // auto-probe (probes < 0): see scaladoc — 0 at the 4-plane floor where
    // candidates are measured total, 2 above it (the pinned sf1 recall trade)
    val effProbes = if (probes >= 0) probes else autoProbes(ppt)
    val vecs = df.select(col(idCol).as("id"), V.l2normalize(col(vecCol)).as("v"))
    // all tables' hyperplanes in one literal matrix → all buckets in one pass
    val planes2d = (0 until tables).toArray
      .flatMap(t => V.hyperplanes(dim, ppt, seed + t))
    // letBind: dots stay a lambda leaf in the buckets expression (see
    // VectorFunctions.letBind — avoids CollapseProject tree multiplication)
    val banded = vecs
      .withColumn("_buckets",
        V.letBind(V.planeDots(col("v"), planes2d))(
          dots => V.bucketsFromDots(dots, ppt, tables)))
      .select(col("id"), col("v"),
        posexplode(col("_buckets")).as(Seq("table", "bucket")))

    // candidate pairs carry only ids through the bucket join + distinct (16
    // bytes/row); vectors re-attach by id afterwards, so each distinct pair is
    // dotted exactly ONCE — multi-table recall must not multiply either the
    // shuffled vector bytes or the dot-product count (same shape as
    // minhashPairs' candidate verification).
    val a = banded.select(col("table"), col("bucket"), col("id").as("id_a"))
    // Multi-probe expands ONE side only: a 1-bit-different pair matches when
    // EITHER row's probe flips the differing bit into the other's base bucket,
    // and with only b probing that means the bit must rank inside the b-row's
    // probe set. Probing both sides would roughly double the expansion for
    // the (larger) union coverage — the single-sided trade is the one whose
    // recall curve is measured and documented. Because the probing side is
    // always the HIGHER id (id_a < id_b filter), which row gets to probe — and
    // hence whether a given borderline pair is recovered — depends on id
    // assignment, not just geometry: the measured recall pins
    // (0.974/0.986/0.991/0.995 at probes=1..4, sf1) are specific to the
    // fixture's id ordering as well as its vectors.
    val b =
      if (effProbes <= 0)
        banded.select(col("table"), col("bucket"), col("id").as("id_b"))
      else vecs
        .withColumn("_tb",
          V.letBind(V.planeDots(col("v"), planes2d))(dots =>
            V.probeBucketsFromDots(dots, ppt, tables, effProbes)))
        .select(col("id").as("id_b"), explode(col("_tb")).as("tb"))
        .select(col("tb.table").as("table"), col("tb.bucket").as("bucket"),
          col("id_b"))
    val candidates = a.join(b, Seq("table", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val va = vecs.select(col("id").as("id_a"), col("v").as("v_a"))
    val vb = vecs.select(col("id").as("id_b"), col("v").as("v_b"))
    candidates
      .join(va, "id_a").join(vb, "id_b")
      .select(col("id_a"), col("id_b"), V.dot(col("v_a"), col("v_b")).as("cosine"))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
  }

  /** The scale-conditional probe rule (see [[embeddingNearDupPairs]]): probe
    * only past the 4-plane floor, where per-table recall p^planes has decayed
    * below the measured-total regime; 2 is the pinned sf1 trade. */
  private[graft] def autoProbes(planesPerTable: Int): Int =
    if (planesPerTable <= 4) 0 else 2

  /** Planes so that n rows over 2^planes buckets sit at ~`targetBucketSize`
    * occupancy; the floor of 4 keeps verify-scale corpora at the
    * recall-measured config. */
  private[graft] def autoPlanes(n: Long, targetBucketSize: Int): Int =
    math.max(4, math.ceil(
      math.log(math.max(1.0, n.toDouble / targetBucketSize)) / math.log(2.0)).toInt)

  /** Passage-level (CCNet-style) dedup: split each document into fixed-size
    * word chunks, keep only the globally FIRST occurrence of each distinct
    * chunk (ordered by doc id, then position), and reassemble the surviving
    * text. This is the line/paragraph dedup of C4/CCNet — boilerplate shared
    * across documents is removed everywhere but its first sighting — expressed
    * on fixed word windows because granularity is a parameter, not a format
    * assumption.
    *
    * Scale shape: chunk occurrences move on the hash-led key
    * `(xxhash64(chunk), chunk)` — the 8-byte hash leads every exchange, the
    * chunk text rides along only as the collision guard (same design as
    * [[exactGroups]]). A map-side-combining min aggregation finds each chunk's
    * first owner (shuffling only distinct chunks per partition), the
    * occurrences hash-join back against that compact owner table, and
    * survivors reassemble with one final shuffle on the doc id. No corpus-wide
    * window sort, no all-pairs comparison.
    *
    * Returns one row per document: (id, n_chunks, n_removed, clean_text). */
  def passageDedup(df: DataFrame, idCol: String, textCol: String,
                   chunkWords: Int = 4): DataFrame = {
    require(chunkWords >= 1, s"passageDedup: chunkWords out of range: $chunkWords")
    // drop empty tokens explicitly: trim only strips ' ', so a leading tab or
    // newline would otherwise leave a "" first token and shift every chunk
    // boundary (breaking dedup recall between edge-whitespace variants)
    val words = filter(split(trim(col(textCol)), "\\s+"), w => w =!= "")
    val nChunks = ceil(size(words).cast("double") / chunkWords).cast("int")
    // guard the empty-words case: sequence(0, -1) would count DOWN
    val chunks = when(size(words) === 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), nChunks - 1),
        i => array_join(slice(words, i * chunkWords + 1, lit(chunkWords)), " ")))
    val occ = df
      .select(col(idCol).as("id"), posexplode(chunks).as(Seq("pos", "chunk")))
      .where(col("chunk") =!= "")
    // first global owner of each chunk value: min (id, pos), found by a
    // map-side-combining aggregate on the hash-led key (not a window — a
    // window would sort whole partitions; min_by keeps O(distinct) state)
    val firstOwner = occ
      .groupBy(xxhash64(col("chunk")).as("_fp"), col("chunk"))
      .agg(min(struct(col("id"), col("pos"))).as("_first"))
      .select(col("_fp"), col("chunk").as("_chunk"),
        col("_first.id").as("first_id"), col("_first.pos").as("first_pos"))
    val kept = occ
      .join(firstOwner.hint("shuffle_hash"),
        xxhash64(occ("chunk")) === col("_fp") && occ("chunk") === col("_chunk"))
      .select(occ("id"), occ("pos"), occ("chunk"),
        (occ("id") === col("first_id") && occ("pos") === col("first_pos")).as("keep"))
    kept.groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("keep"), 0L).otherwise(1L)).as("n_removed"),
        array_join(transform(array_sort(
          collect_list(when(col("keep"), struct(col("pos"), col("chunk"))))),
          s => s("chunk")), " ").as("clean_text"))
  }

  /** Cross-document verbatim span coverage — the ExactSubstr dedup signal
    * (Lee et al. 2022, "Deduplicating Training Data Makes Language Models
    * Better"): for each document, find every k-token shingle that occurs more
    * than once ANYWHERE in the corpus (any offset, any document, including a
    * second occurrence in the same document) and measure the fraction of the
    * document's tokens covered by the union of their `[pos, pos+k-1]` windows,
    * counting overlapped tokens once. Catches verbatim spans at arbitrary
    * offsets that chunk-aligned [[passageDedup]] and whole-doc MinHash miss.
    *
    * Scale shape (100 TB): the gram text is dropped BEFORE the first exchange —
    * duplication detection shuffles `(id, pos, xxhash64(gram))` by the 8-byte
    * hash (a window count; no join build side), and the coverage sweep is a
    * per-document window over duplicated starts (second exchange, id-keyed)
    * with the fixed-length-interval union formula `sum(min(k, next - pos))`.
    * Linear in corpus size, no all-pairs comparison anywhere. A hash collision
    * can mark a unique span as duplicated (expected ~n²/2⁶⁴ gram pairs) — the
    * same trade as [[exact]]'s fingerprint key.
    *
    * Returns one row per document:
    * `(idCol, n_dup_spans, covered_tokens, dup_span_frac)`. */
  def dupSpanCoverage(df: DataFrame, idCol: String, textCol: String,
                      k: Int = 8): DataFrame = {
    require(k >= 1, s"dupSpanCoverage: k out of range: $k")
    val sh = df
      .select(col(idCol), posexplode(H.word_shingles(col(textCol), k))
        .as(Seq("pos", "gram")))
      .select(col(idCol), col("pos"), xxhash64(col("gram")).as("gh"))
    val dupStarts = sh
      .withColumn("occ", count(lit(1)).over(Window.partitionBy("gh")))
      .where(col("occ") > 1)
    val cov = dupStarts
      .withColumn("nxt", lead(col("pos"), 1)
        .over(Window.partitionBy(idCol).orderBy("pos")))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_dup_spans"),
        sum(when(col("nxt").isNull, k.toLong)
          .otherwise(least(lit(k.toLong), (col("nxt") - col("pos")).cast("long"))))
          .as("covered_tokens"))
    df.select(col(idCol), size(T.tokens(col(textCol))).cast("long").as("m"))
      .join(cov, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"),
        when(col("m") === 0L, 0.0)
          .otherwise(coalesce(col("covered_tokens"), lit(0L)).cast("double")
            / col("m"))
          .as("dup_span_frac"))
  }

  /** Duplication-ratio ESTIMATE — the planning pass run before committing a
    * cluster to a full dedup of a 100 TB corpus: one scan, no shuffle of the
    * payload (HLL sketches merge map-side), answering "how much smaller would
    * this corpus get?". `rsd` is the HyperLogLog relative standard deviation.
    * Returns one row: `(n_rows, n_distinct_est, dup_ratio_est)`. */
  def dupRatioEstimate(df: DataFrame, keyCol: String, rsd: Double = 0.02): DataFrame =
    df.agg(
      count(lit(1)).as("n_rows"),
      approx_count_distinct(T.fingerprint(col(keyCol)), rsd).as("n_distinct_est"))
      .withColumn("dup_ratio_est",
        when(col("n_rows") === 0L, 0.0).otherwise(
          lit(1.0) - col("n_distinct_est").cast("double") / col("n_rows")))
}
