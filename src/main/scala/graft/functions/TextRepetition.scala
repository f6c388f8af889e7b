package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The full Gopher repetition-rule battery (Rae et al. 2021, "Scaling Language
  * Models: Methods, Analysis & Insights from Training Gopher", table A1):
  * character-weighted n-gram repetition statistics used to drop
  * boilerplate/spam documents before LLM training. Extends t05's token-level
  * fractions ([[TextFunctions.dupTokenFrac]]) with the char-fraction rules:
  *
  *  - `top{2,3,4}_char_frac` — fraction of token characters contained in the
  *    occurrences of the single most frequent word n-gram. Ties broken by
  *    (count, gram char length, gram string) — all taken max, so the result is
  *    deterministic and engine-independent. Under self-overlapping grams the
  *    raw value can exceed 1 (chars are counted per occurrence, the published
  *    rule's behavior); thresholds treat it as "≥ cutoff".
  *  - `dup{5..10}_char_frac` — fraction of token characters covered by ANY
  *    occurrence of a duplicated n-gram, counting each character ONCE however
  *    many duplicated grams overlap it (the "careful not to double-count"
  *    clause of the published rule).
  *
  * Characters = token characters (whitespace excluded), so every statistic is
  * a ratio of exact integers and reproduces bit-for-bit in any engine.
  *
  * One compiled pass per document: tokenize once, then per n an O(L) hash-map
  * count + an O(L) coverage sweep — no O(L²) candidate scan, so cost stays
  * linear in document length at corpus scale. Same CodegenFallback rationale
  * as [[HashExpressions]]: the per-row call is chunky, only the inner loop
  * matters. Character counts are Unicode code points and the tie-break gram
  * comparison is code-point order (= UTF-8 byte order, what DuckDB's VARCHAR
  * compare and `length()` use) — NOT Java's UTF-16 units/order, which diverge
  * off the BMP (an emoji is two UTF-16 units but one character, and surrogate
  * blocks sort below U+E000..U+FFFF in UTF-16).
  *
  * Beyond the reference (its only text ops are trim/empty→null,
  * `/root/reference/src/Infrastructure/Transformation/Common/DataCleansingStep.cs:43-51`)
  * — this is §SURVEY-7.1(7) extension surface.
  */
object TextRepetition {

  val topNs: Seq[Int] = Seq(2, 3, 4)
  val dupNs: Seq[Int] = Seq(5, 6, 7, 8, 9, 10)
  val fieldNames: Seq[String] =
    topNs.map(n => s"top${n}_char_frac") ++ dupNs.map(n => s"dup${n}_char_frac")

  /** Code points, not UTF-16 units: one emoji = one character. */
  private[graft] def cpLen(s: String): Long = s.codePointCount(0, s.length).toLong

  /** Compare in Unicode code-point order — identical to unsigned UTF-8 byte
    * order (pinned against real UTF-8 byte arrays in TextFunctionsSpec).
    * UTF-16 code units ≥ U+E000 are shifted below the surrogate blocks so
    * that supplementary code points (encoded as surrogates) sort above all
    * BMP chars, exactly as their UTF-8 encodings do. */
  private[graft] def utf8Compare(a: String, b: String): Int = {
    val la = a.length; val lb = b.length
    var i = 0
    while (i < la && i < lb) {
      var ca = a.charAt(i).toInt
      var cb = b.charAt(i).toInt
      if (ca != cb) {
        if (ca >= 0xE000) ca -= 0x800 else if (ca >= 0xD800) ca += 0x2000
        if (cb >= 0xE000) cb -= 0x800 else if (cb >= 0xD800) cb += 0x2000
        return ca - cb
      }
      i += 1
    }
    la - lb
  }

  case class NgramRepetition(child: Expression)
      extends UnaryExpression with CodegenFallback {

    override def dataType: DataType = StructType(
      fieldNames.map(f => StructField(f, DoubleType, nullable = false)))

    override def nullSafeEval(input: Any): Any = {
      val toks = input.asInstanceOf[UTF8String].toLowerCase.toString
        .split("\\s+").filter(_.nonEmpty)
      val m = toks.length
      var total = 0L
      var i = 0
      while (i < m) { total += cpLen(toks(i)); i += 1 }

      val out = new Array[Any](topNs.length + dupNs.length)
      var f = 0
      topNs.foreach { n =>
        out(f) = if (m < n) 0.0 else topFrac(toks, n, total); f += 1
      }
      dupNs.foreach { n =>
        out(f) = if (m < n) 0.0 else dupFrac(toks, n, total); f += 1
      }
      new GenericInternalRow(out)
    }

    /** Join tokens i..i+n-1 with single spaces — identical gram spelling to
      * [[HashExpressions.WordShingles]] and the oracle's `array_to_string`. */
    private def grams(toks: Array[String], n: Int): Array[String] = {
      val k = toks.length - n + 1
      val gs = new Array[String](k)
      var i = 0
      while (i < k) {
        val sb = new java.lang.StringBuilder()
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j)); j += 1
        }
        gs(i) = sb.toString; i += 1
      }
      gs
    }

    private def counts(gs: Array[String]): java.util.HashMap[String, Int] = {
      val c = new java.util.HashMap[String, Int](gs.length * 2)
      var i = 0
      while (i < gs.length) { c.merge(gs(i), 1, Integer.sum); i += 1 }
      c
    }

    private def topFrac(toks: Array[String], n: Int, total: Long): Double = {
      val c = counts(grams(toks, n))
      var bestCnt = 0; var bestLen = -1L; var bestG = ""
      val it = c.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val cnt = e.getValue.intValue()
        val len = cpLen(e.getKey) - (n - 1)
        if (cnt > bestCnt || (cnt == bestCnt &&
            (len > bestLen || (len == bestLen && utf8Compare(e.getKey, bestG) > 0)))) {
          bestCnt = cnt; bestLen = len; bestG = e.getKey
        }
      }
      (bestCnt.toLong * bestLen).toDouble / total
    }

    private def dupFrac(toks: Array[String], n: Int, total: Long): Double = {
      val gs = grams(toks, n)
      val c = counts(gs)
      // ascending sweep over duplicated-gram starts: token positions covered by
      // the union of [i, i+n-1] windows, each token's chars counted once
      var end = -1; var chars = 0L
      var i = 0
      while (i < gs.length) {
        if (c.get(gs(i)) > 1) {
          var from = math.max(i, end + 1)
          val to = i + n - 1
          while (from <= to) { chars += cpLen(toks(from)); from += 1 }
          end = to
        }
        i += 1
      }
      chars.toDouble / total
    }

    override protected def withNewChildInternal(c: Expression): NgramRepetition =
      copy(child = c)
    override def prettyName: String = "ngram_repetition"
  }

  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

  /** Struct of all nine Gopher repetition statistics for a text column. */
  def ngramRepetition(text: Column): Column =
    column(NgramRepetition(expression(text)))
}
