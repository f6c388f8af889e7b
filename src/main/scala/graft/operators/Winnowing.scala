package graft.operators

import graft.functions.{HashExpressions => H}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken — "Winnowing:
  * Local Algorithms for Document Fingerprinting", SIGMOD 2003; the MOSS
  * algorithm): from every window of `w` consecutive character-k-gram hashes,
  * keep the minimum (rightmost on ties), then dedupe the selected
  * (position, hash) set. The guarantee that makes this THE fingerprinting
  * scheme for plagiarism/overlap detection: any shared substring of length
  * ≥ w + k − 1 contributes at least one IDENTICAL selected fingerprint in
  * both documents, at ~2/(w+1) the density of the full gram set — a compact,
  * position-robust signature the d02 whole-text hash and d03/d04 similarity
  * signatures don't provide (they answer "near-identical docs", winnowing
  * answers "which docs share a passage, and where").
  *
  * Scale shape: the whole selection runs INSIDE compiled higher-order
  * functions — grams, hashes, window minima are per-row arrays; only the
  * final `(id, pos, fp)` explode leaves the row, and no shuffle exists at
  * all (plan-pinned zero-Exchange in WinnowingSpec). O(len) per doc — the
  * selection is [[graft.functions.HashExpressions.WinnowSelect]]'s compiled
  * monotonic-deque pass.
  * Downstream overlap detection groups the ~2/(w+1)-dense fingerprints —
  * a fraction of d10's every-position shingle exchange.
  *
  * Determinism/portability: gram hashes are [[H.md5Hash60]] (the d04
  * portable contract — `CAST('0x' || substr(md5(g),1,15) AS BIGINT)` in
  * ANSI SQL), selection is integer argmin with a rightmost tie rule, so the
  * oracle reproduces the exact set. Positions are 1-based CODE POINTS over
  * the d02-normalized text (lower, trim, whitespace collapsed): Spark's
  * Substring/length and DuckDB's substr/length both index code points, so
  * the contract holds on ALL planes, supplementary included (pinned in
  * WinnowingSpec against a codePoints-based reference — a UTF-16-unit
  * reading would shift every position after the first emoji). Remaining
  * caveat: `lower` of exotic UPPERCASE (Turkish İ, ß full-casing) is
  * engine-dependent; already-lowercase non-BMP text is exact. */
object Winnowing {

  /** Per-doc k-gram hash arrays `(id, _hs)` — the shared prep for both the
    * positional fingerprint stream and the per-doc distinct-hash stream. */
  private def gramHashes(df: DataFrame, idCol: String, textCol: String,
                         k: Int): DataFrame = {
    val norm = regexp_replace(lower(trim(col(textCol))), "\\s+", " ")
    df.select(col(idCol).as("id"), norm.as("_norm"))
      .where(length(col("_norm")) >= k)
      // one compiled O(len) pass (H.Md5CharGramHashes) — value-identical to
      // transform(sequence(1, len-k+1), i => md5Hash60(substr(i, k))), which
      // is interpreted per gram, O(len) per substr (code-point re-scan), and
      // allocates a 32-char hex string + radix parse per hash
      .select(col("id"), H.md5_char_gram_hashes(col("_norm"), k).as("_hs"))
  }

  /** Selected fingerprints `(id, pos, fp)`, one row per distinct selected
    * (position, hash); docs shorter than `k` normalized chars emit nothing,
    * docs with fewer than `w` grams winnow a single all-gram window. */
  def fingerprints(df: DataFrame, idCol: String, textCol: String,
                   k: Int = 5, w: Int = 4): DataFrame = {
    require(k >= 1 && w >= 1, s"bad winnowing params: k=$k w=$w")
    // gram hashes stay declarative (md5/conv are codegen'd builtins); the
    // window-min selection runs in the compiled O(m) monotonic-deque
    // expression [[H.WinnowSelect]] — the interpreted per-window aggregate
    // formulation measured ~10 s over sf0.1's 5k docs, the compiled pass is
    // the same contract (argmin, rightmost tie, overlap-deduped) in one loop
    gramHashes(df, idCol, textCol, k)
      .select(col("id"), explode(H.winnow_select(col("_hs"), w)).as("s"))
      .select(col("id").as(idCol),
        col("s.p").cast("long").as("pos"), col("s.h").as("fp"))
  }

  /** Passage-overlap pairs over the winnowed index — the detection pass the
    * fingerprints exist for: docs sharing ≥ `minShared` distinct selected
    * hashes, with the shared count. The inverted-index self-join runs on the
    * ~2/(w+1)-dense fingerprint set instead of every gram (d10's exchange),
    * so the fp-keyed shuffle carries ~40% of the rows at w = 4 — measured
    * next to d10 in SIZING. `maxDocFreq` drops hashes present in more than
    * that many docs (ubiquitous boilerplate phrases — each contributes
    * df² pair rows); the prune is part of the operator CONTRACT and the
    * oracle models it exactly, so output stays bit-exact: a pair's shared
    * count simply excludes ubiquitous passages by definition.
    *
    * Hot-fingerprint shape: every aggregation buffer in this operator is
    * BOUNDED. At sane `maxDocFreq` (≤ 2^20) the per-fp id sets are built
    * with [[graft.functions.SketchAggregates.CollectSetBoundedLong]] capped
    * at `maxDocFreq + 1`: a boilerplate hash shared by millions of docs
    * stops collecting at the cap in every partial and merged buffer
    * (8·(maxDocFreq+1) bytes, ~8 KB at the default 1000) and the
    * `size(ids) ≤ maxDocFreq` prune still detects the overflow exactly —
    * unlike r10's plain `collect_set`, which buffered the full df-sized id
    * array BEFORE the size check, an executor OOM on exactly the corpus the
    * prune targets. This keeps the expensive winnowing CPU to ONE pass over
    * the corpus and the fp exchange to one aggregation. For pathological
    * `maxDocFreq` (> 2^20, where O(maxDocFreq) buffers are themselves a
    * memory hazard) the operator switches to a two-pass plan with
    * constant-size buffers: count doc frequency first (map-side-combinable),
    * prune, then self-join the surviving `(fp, id)` relation — same output,
    * one extra winnow pass and exchange. `df ≥ 2` is applied in both paths
    * (a fingerprint in one doc yields no pairs) — output-identical, and it
    * drops the unique-mass long tail before pair generation.
    *
    * Output: `(a_id, b_id, shared_fps)`, a_id < b_id. */
  def overlapPairs(df: DataFrame, idCol: String, textCol: String,
                   k: Int = 5, w: Int = 4, minShared: Long = 8,
                   maxDocFreq: Long = 1000): DataFrame = {
    overlapPairsImpl(df, idCol, textCol, k, w, minShared, maxDocFreq,
      singlePass = maxDocFreq < (1 << 20))
  }

  /** Path selection exposed for tests: both plans are output-identical by
    * construction (property-pinned in WinnowingSpec). */
  private[graft] def overlapPairsImpl(df: DataFrame, idCol: String,
                                      textCol: String, k: Int, w: Int,
                                      minShared: Long, maxDocFreq: Long,
                                      singlePass: Boolean): DataFrame = {
    require(k >= 1 && w >= 1, s"bad winnowing params: k=$k w=$w")
    require(minShared >= 1 && maxDocFreq >= 1,
      s"bad overlap params: minShared=$minShared maxDocFreq=$maxDocFreq")
    // distinct hashes per doc fall out of the per-row selection arrays
    // (array_distinct before the explode) — no exchange spent on row-level
    // distinct, and df / pair counts are over DISTINCT (doc, hash) pairs
    val docFps = gramHashes(df, idCol, textCol, k)
      .select(col("id"), explode(array_distinct(
        transform(H.winnow_select(col("_hs"), w), s => s.getField("h"))))
        .as("fp"))
    val pairs =
      if (singlePass) {
        // single pass: bounded per-fp sets, overflow detected by size
        docFps.groupBy(col("fp"))
          .agg(graft.functions.SketchAggregates
            .collectSetBounded(col("id"), (maxDocFreq + 1).toInt).as("ids"))
          .where(size(col("ids")).between(2, maxDocFreq))
          .select(explode(col("ids")).as("a_id"), col("ids"))
          .select(col("a_id"), explode(col("ids")).as("b_id"))
          .where(col("a_id") < col("b_id"))
      } else {
        // two passes, constant-size buffers: count-prune, then self-join
        val surviving = docFps.groupBy(col("fp"))
          .agg(count(lit(1)).as("_df"))
          .where(col("_df") >= 2 && col("_df") <= maxDocFreq)
          .select(col("fp"))
        val pruned = docFps.join(surviving, Seq("fp"))
        pruned.select(col("fp"), col("id").as("a_id"))
          .join(pruned.select(col("fp"), col("id").as("b_id")), Seq("fp"))
          .where(col("a_id") < col("b_id"))
          .select(col("a_id"), col("b_id"))
      }
    pairs.groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("shared_fps"))
      .where(col("shared_fps") >= minShared)
  }
}
