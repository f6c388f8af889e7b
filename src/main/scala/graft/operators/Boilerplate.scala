package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML boilerplate removal — the step UPSTREAM of every text operator in a
  * crawl pipeline (the repo's text surface otherwise begins at clean text).
  * Densitometric block classification per Kohlschütter, Fankhauser &
  * Nejdl, "Boilerplate Detection using Shallow Text Features" (WSDM 2010):
  * segment the page into blocks at block-level tag boundaries, describe each
  * block by shallow text features — word count, link density (share of
  * words inside `<a>` anchors), text density (words per 80-char wrapped
  * line) — and keep the blocks that look like body text: boilerplate (nav
  * bars, footers, button rows) is short and link-dense, content is long and
  * link-sparse (their Fig. 4/§4 observation, compressed here into three
  * integer-exact local rules).
  *
  * A block is CONTENT iff
  *   `words ≥ minWords  ∧  3·linkWords ≤ words  ∧  words ≥ wordsPerLine·lines`
  * with `lines = ceil(chars / 80)` (the paper's fixed-width wrap model).
  * All three comparisons are integer arithmetic — no floats anywhere — so a
  * DuckDB oracle reproduces the classification and the extracted text
  * bit-for-bit.
  *
  * Scale shape: the entire pass — tag split, tag strip, anchor-text
  * extraction, token counts, classification, in-order reassembly — runs
  * INSIDE per-row higher-order functions over the block array. Zero
  * exchanges (plan-pinned in BoilerplateSpec); the 100 TB cost is scan +
  * CPU, exactly the t14/t21 shape.
  *
  * Caveats (documented contract): anchors are detected within a block —
  * an `<a>` spanning a block-tag boundary contributes its text but not its
  * link-ness to the following block; `<script>`/`<style>` bodies are not
  * special-cased (strip their tags like any other — feed pre-sanitized HTML
  * if script bodies carry text). */
object Boilerplate {

  /** Block-level tags that terminate a text block (inline tags — a, span,
    * b, i, em, strong — do NOT split). */
  private val blockTagPattern =
    "(?i)</?(?:p|div|h[1-6]|li|ul|ol|table|tr|td|th|br|hr|blockquote|pre|" +
      "section|article|header|footer|nav|aside|main|form|html|body|head|title)[^>]*>"

  private def normWs(c: Column): Column =
    trim(regexp_replace(c, "\\s+", " "))

  /** Per-doc extraction: `(idCol, carry..., content_blocks, boiler_blocks,
    * extracted_text)` — counts over NONEMPTY blocks (an empty string between
    * two adjacent tags is not a block), `extracted_text` the content blocks'
    * tag-stripped text joined in document order. `carry` names metadata
    * columns (source, labels, URLs) passed through unchanged — the pipeline
    * composition seam: extraction is a narrow map, so carried columns cost
    * nothing and downstream stages never re-join for them. */
  def extract(df: DataFrame, idCol: String, htmlCol: String,
              minWords: Int = 5, wordsPerLine: Int = 7,
              carry: Seq[String] = Nil): DataFrame = {
    require(minWords >= 1 && wordsPerLine >= 1,
      s"bad boilerplate params: minWords=$minWords wordsPerLine=$wordsPerLine")
    val stats = df.select(col(idCol).as("_id") +: carry.map(col) :+
      transform(split(col(htmlCol), blockTagPattern), raw => {
        val txt = normWs(regexp_replace(raw, "(?s)<[^>]*>", " "))
        val w = size(filter(split(txt, " "), t => t =!= ""))
        val linkTxt = array_join(
          regexp_extract_all(raw, lit("(?is)<a[^>]*>(.*?)</a>"), lit(1)), " ")
        val lw = size(filter(
          split(normWs(regexp_replace(linkTxt, "(?s)<[^>]*>", " ")), " "),
          t => t =!= ""))
        struct(txt.as("t"), w.cast("long").as("w"),
          length(txt).cast("long").as("c"), lw.cast("long").as("lw"))
      }).as("_bs"): _*)
    val nonEmpty = filter(col("_bs"), s => s.getField("w") >= 1)
    def isContent(s: Column): Column =
      s.getField("w") >= minWords &&
        s.getField("lw") * 3 <= s.getField("w") &&
        s.getField("w") >=
          lit(wordsPerLine) * floor((s.getField("c") + 79) / lit(80)).cast("long")
    val content = filter(nonEmpty, isContent(_))
    stats.select(col("_id").as(idCol) +: carry.map(col) :+
      size(content).cast("long").as("content_blocks") :+
      (size(nonEmpty) - size(content)).cast("long").as("boiler_blocks") :+
      array_join(transform(content, s => s.getField("t")), " ")
        .as("extracted_text"): _*)
  }

  /** Per-block rows for inspection/tests: `(idCol, block_idx, words,
    * link_words, chars, kept)` over nonempty blocks, `block_idx` 1-based in
    * document order counting nonempty blocks only. */
  def blockStats(df: DataFrame, idCol: String, htmlCol: String,
                 minWords: Int = 5, wordsPerLine: Int = 7): DataFrame = {
    val stats = df.select(col(idCol).as("_id"),
      transform(split(col(htmlCol), blockTagPattern), raw => {
        val txt = normWs(regexp_replace(raw, "(?s)<[^>]*>", " "))
        val w = size(filter(split(txt, " "), t => t =!= ""))
        val linkTxt = array_join(
          regexp_extract_all(raw, lit("(?is)<a[^>]*>(.*?)</a>"), lit(1)), " ")
        val lw = size(filter(
          split(normWs(regexp_replace(linkTxt, "(?s)<[^>]*>", " ")), " "),
          t => t =!= ""))
        struct(txt.as("t"), w.cast("long").as("w"),
          length(txt).cast("long").as("c"), lw.cast("long").as("lw"))
      }).as("_bs"))
    stats.select(col("_id"),
        posexplode(filter(col("_bs"), s => s.getField("w") >= 1)))
      .select(col("_id").as(idCol),
        (col("pos") + 1).cast("long").as("block_idx"),
        col("col.w").as("words"), col("col.lw").as("link_words"),
        col("col.c").as("chars"),
        (col("col.w") >= minWords &&
          col("col.lw") * 3 <= col("col.w") &&
          col("col.w") >= lit(wordsPerLine.toLong) *
            floor((col("col.c") + 79) / lit(80)).cast("long")).as("kept"))
  }
}
