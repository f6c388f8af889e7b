package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines, built from
  * codegen'd `org.apache.spark.sql.functions` (no Scala closures in the hot path —
  * higher-order array functions + hash expressions only, so everything stays inside
  * Catalyst and distributes trivially).
  *
  * These go beyond the reference (whose only string ops are trim / empty→null,
  * `/root/reference/src/Infrastructure/Transformation/Common/DataCleansingStep.cs:43-51`)
  * — they are the §SURVEY-7.1(7) extension surface: language-ID, quality scoring,
  * token counting, fingerprinting, shingling.
  */
object TextFunctions {

  /** Lowercased whitespace tokens, empty-safe. */
  def tokens(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), t => length(t) > 0)

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword-count estimate: word-piece regex (letter runs, digit runs,
    * single punctuation marks), the usual pre-tokenizer shape for byte-pair
    * encoders. Counted with codegen'd `regexp_count`. */
  def bpeTokenCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"))

  /** Contiguous lowercase word n-grams ("shingles") as an array of strings.
    * Compiled expression ([[HashExpressions.WordShingles]]) — the higher-order
    * `transform(slice)` formulation was measured ~100µs per shingle interpreted. */
  def wordShingles(text: Column, n: Int): Column =
    HashExpressions.word_shingles(text, n)

  /** MinHash signature of a shingle array: `k` 64-bit hash families derived from
    * one xxhash64 per shingle (splitmix64 family mixing); signature element =
    * min over shingles. Empty input → null signature. Backed by the compiled
    * [[HashExpressions.MinHashSig]] — the equivalent nested higher-order-function
    * formulation is interpreted per element and measured ~40× slower. */
  def minhashSignature(shingles: Column, k: Int): Column =
    HashExpressions.minhash_sig(shingles, k)

  /** 64-bit SimHash of a token array (Charikar 2002): per-bit ±1 votes over each
    * token's xxhash64, sign bits packed into one long. Compiled expression
    * ([[HashExpressions.SimHash64]]); empty input → all-ones (ties vote 1). */
  def simhash64(toks: Column): Column = HashExpressions.simhash64(toks)

  /** Rolling-hash document fingerprint: 64-bit hash of the
    * whitespace-normalized, lowercased text — the exact-dup key that survives
    * formatting noise. */
  def fingerprint(text: Column): Column =
    xxhash64(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Winnowing-style robust fingerprint set: the `w` smallest shingle hashes
    * (bottom-w sketch) — a compact set whose overlap estimates containment. */
  def bottomSketch(shingles: Column, w: Int): Column =
    slice(array_sort(array_distinct(transform(shingles, s => xxhash64(s)))), 1, w)

  // ---- PII redaction ------------------------------------------------------

  /** Redact the textual PII a training-data pipeline strips before anything
    * else sees the corpus: emails, IPv4 addresses, long phone-style digit runs.
    * Pure `regexp_replace` chain — codegen'd, distributes with the scan, and the
    * patterns stay inside the regex subset Java and RE2 share, so the exact
    * transform is reproducible outside Spark. Replacement order matters only in
    * that emails go first (their digits must not be half-eaten as "phones"). */
  def redactPii(text: Column): Column = {
    val email = regexp_replace(text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    val ip = regexp_replace(email,
      "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "<IP>")
    regexp_replace(ip, "\\+?[0-9][0-9()\\- ]{7,}[0-9]", "<PHONE>")
  }

  // ---- repetition statistics (Gopher-style quality rules) ------------------

  /** Fraction of tokens that are repeats of an earlier token:
    * `1 - distinct/total` (0 for empty docs). */
  def dupTokenFrac(toks: Column): Column =
    when(size(toks) === 0, 0.0)
      .otherwise(lit(1.0) - size(array_distinct(toks)).cast("double")
        / size(toks).cast("double"))

  /** Fraction of the document taken by its single most frequent token —
    * the "top word" repetition rule. Linear per doc: sort the tokens, then one
    * `aggregate` pass tracks the current and best run length. */
  def topTokenFrac(toks: Column): Column =
    letBindStruct(array_sort(toks)) { sorted =>
      when(size(sorted) === 0, 0.0).otherwise(
        aggregate(sorted,
          struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
          (acc, x) => {
            val run = when(x === acc.getField("prev"), acc.getField("run") + 1L)
              .otherwise(lit(1L))
            struct(x.as("prev"), run.as("run"),
              greatest(acc.getField("best"), run).as("best"))
          },
          acc => acc.getField("best")).cast("double") / size(sorted).cast("double"))
    }

  /** Fraction of word 2-grams that are repeats — catches boilerplate loops that
    * token-level stats miss. */
  def dupBigramFrac(text: Column): Column =
    letBindStruct(wordShingles(text, 2)) { grams =>
      when(size(grams) === 0, 0.0)
        .otherwise(lit(1.0) - size(array_distinct(grams)).cast("double")
          / size(grams).cast("double"))
    }

  /** Expression-level `let` for arbitrary (incl. array) values — same
    * CollapseProject defense as [[VectorFunctions.letBind]]. */
  private def letBindStruct(value: Column)(body: Column => Column): Column =
    transform(array(struct(value.as("v"))), s => body(s.getField("v"))).getItem(0)

  // ---- quality scoring ----------------------------------------------------

  /** Ratio of non-alphanumeric, non-space chars to total chars (0 when empty). */
  def punctRatio(text: Column): Column = {
    val total = length(text)
    when(total === 0, 0.0)
      .otherwise(regexp_count(text, lit("[^A-Za-z0-9\\s]")).cast("double") / total)
  }

  /** Ratio of uppercase letters to letters (0 when no letters). */
  def upperRatio(text: Column): Column = {
    val letters = regexp_count(text, lit("[A-Za-z]"))
    when(letters === 0, 0.0)
      .otherwise(regexp_count(text, lit("[A-Z]")).cast("double") / letters)
  }

  private val enStopwords = Seq("the", "a", "an", "and", "or", "of", "to", "in",
    "is", "are", "was", "on", "for", "with", "as", "at", "by", "it", "this", "that")

  /** Fraction of tokens that are common English stopwords — a standard
    * natural-language-ness signal (near 0 for code/tables/gibberish). */
  def stopwordRatio(text: Column): Column = {
    val ts = tokens(text)
    // array_intersect would dedup; the ratio wants stopword *positions*, so filter.
    when(size(ts) === 0, 0.0)
      .otherwise(size(filter(ts, t => t.isin(enStopwords: _*))).cast("double") / size(ts))
  }

  /** Mean token length (0 when empty). */
  def meanTokenLen(text: Column): Column = {
    val ts = tokens(text)
    when(size(ts) === 0, 0.0)
      .otherwise(aggregate(ts, lit(0), (acc, t) => acc + length(t)).cast("double") / size(ts))
  }

  /** Composite document-quality score in [0,1]: long enough, natural stopword
    * density, sane punctuation/caps. Weights are heuristic; each component is a
    * deterministic built-in expression. Token-derived components come from ONE
    * compiled [[tokenStats]] pass (the declarative stack re-lowered and
    * re-split the text once per component); the ratios are the same integer
    * quotients, so the score is bit-identical (TextStatsSpec). */
  def qualityScore(text: Column): Column =
    letBindStruct(tokenStats(text)) { ts =>
      val n = ts.getField("n_tokens")
      val lenScore = least(n.cast("double") / 100.0, lit(1.0))
      val stopScore = least(
        when(n === 0, 0.0)
          .otherwise(ts.getField("stop_hits").cast("double") / n) * 5.0,
        lit(1.0))
      val punctPenalty = greatest(lit(0.0), lit(1.0) - punctRatio(text) * 4.0)
      val casePenalty = greatest(lit(0.0), lit(1.0) - upperRatio(text))
      round(lenScore * 0.4 + stopScore * 0.3 + punctPenalty * 0.2 + casePenalty * 0.1, 6)
    }

  // ---- single-pass token statistics (r13 optimization round) ---------------

  /** ONE compiled pass over the document computing every whitespace-token
    * statistic this file's primitives derive (counts, lengths, stopword and
    * language-profile hits, distinct tokens/bigrams) — see
    * [[TextStatsExpr.TokenStats]]. Ratios built from its integer fields are
    * bit-identical to the primitive-per-primitive formulations
    * (TextStatsSpec pins each one). */
  def tokenStats(text: Column): Column =
    TextStatsExpr.token_stats(text, enStopwords, langProfiles.map(_._2))

  /** [[langId]]'s argmax over per-profile hit counts already computed by
    * [[tokenStats]] — same struct-sort, same tie rule, same "und" fallback. */
  def langIdFromHits(hits: Column): Column = {
    val scored = langProfiles.zipWithIndex.map { case ((lang, _), prio) =>
      struct(
        (-hits.getItem(prio)).alias("negScore"),
        lit(prio).alias("prio"),
        lit(lang).alias("lang"))
    }
    val best = array_sort(array(scored: _*)).getItem(0)
    when(best.getField("negScore") === 0, lit("und")).otherwise(best.getField("lang"))
  }

  // ---- language identification -------------------------------------------

  /** Tiny deterministic stopword/character n-gram profiles per language. Public
    * knowledge (standard stopword lists); enough signal for routing/filtering. */
  private val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "was", "for",
      "with", "as", "his", "they", "at"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "una", "los", "las",
      "se", "del", "por", "con", "no"),
    "fr" -> Seq("le", "la", "les", "de", "des", "et", "un", "une", "du", "est",
      "que", "pour", "dans", "qui", "pas"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit",
      "auf", "für", "den", "von", "zu", "im"))

  /** N-gram/stopword-heuristic language ID: score = matching stopword positions
    * per language; argmax with deterministic tie-break (profile order); "und"
    * (undetermined) when nothing matches. Pure Catalyst expressions. */
  def langId(text: Column): Column = {
    val ts = tokens(text)
    // struct sort: (score desc via negation, stable priority asc, lang)
    val scored = langProfiles.zipWithIndex.map { case ((lang, words), prio) =>
      struct(
        (-size(filter(ts, t => t.isin(words: _*)))).alias("negScore"),
        lit(prio).alias("prio"),
        lit(lang).alias("lang"))
    }
    val best = array_sort(array(scored: _*)).getItem(0)
    when(best.getField("negScore") === 0, lit("und")).otherwise(best.getField("lang"))
  }
}
