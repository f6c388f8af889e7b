package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One compiled pass computing every whitespace-token statistic the quality
  * and text-feature operators need — the r13-optimization replacement for
  * stacking `tokens(text)`-based built-ins, each of which re-lowers and
  * re-splits the document (t01 evaluated the split six times per row;
  * Quality.flags four times).
  *
  * Tokenization contract (bit-compatible with
  * `filter(split(lower(trim(text)), "\\s+"), t => length(t) > 0)`):
  * trim ASCII spaces (Spark `trim` removes 0x20 only), full-Unicode
  * lowercase (`UTF8String.toLowerCase`, the `lower()` implementation), then
  * split on runs of Java-regex `\s` = the six ASCII whitespace chars — which
  * in UTF-8 never occur inside a multibyte sequence, so the byte scan is
  * exact. Token lengths are CODE POINTS (Spark `length`). Value-identity
  * with the declarative formulations is pinned in TextStatsSpec.
  *
  * Output struct (ints wrap like the ANSI-off declarative `aggregate` sum):
  * `n_tokens, sum_len, distinct_tokens, top_count, stop_hits, n_bigrams,
  * distinct_bigrams, profile_hits` — bigrams are counted as adjacent token
  * PAIRS; tokens contain no whitespace, so pair identity == identity of the
  * space-joined shingle strings `wordShingles(text, 2)` builds. */
object TextStatsExpr {

  case class TokenStats(child: Expression, stopwords: Seq[String],
                        profiles: Seq[Seq[String]])
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StructType(Seq(
      StructField("n_tokens", IntegerType, nullable = false),
      StructField("sum_len", IntegerType, nullable = false),
      StructField("distinct_tokens", IntegerType, nullable = false),
      StructField("top_count", IntegerType, nullable = false),
      StructField("stop_hits", IntegerType, nullable = false),
      StructField("n_bigrams", IntegerType, nullable = false),
      StructField("distinct_bigrams", IntegerType, nullable = false),
      StructField("profile_hits", ArrayType(IntegerType, containsNull = false),
        nullable = false)))

    @transient private lazy val stopSet: java.util.HashSet[UTF8String] = {
      val s = new java.util.HashSet[UTF8String]()
      stopwords.foreach(w => s.add(UTF8String.fromString(w)))
      s
    }
    // token -> bitmask of profiles containing it (profiles are tiny fixed
    // stopword lists; one lookup per token instead of one per profile)
    @transient private lazy val profMask: java.util.HashMap[UTF8String, Integer] = {
      val m = new java.util.HashMap[UTF8String, Integer]()
      profiles.zipWithIndex.foreach { case (words, i) =>
        words.foreach { w =>
          val k = UTF8String.fromString(w)
          m.merge(k, Integer.valueOf(1 << i),
            (a: Integer, b: Integer) => Integer.valueOf(a | b))
        }
      }
      m
    }

    @inline private def isWs(b: Byte): Boolean =
      b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

    override def nullSafeEval(input: Any): Any = {
      val t = input.asInstanceOf[UTF8String].trim().toLowerCase()
      val bytes = t.getBytes
      val n = bytes.length
      val ids = new java.util.HashMap[UTF8String, Integer]()
      val counts = new java.util.ArrayList[Int]()
      val bigrams = new java.util.HashSet[java.lang.Long]()
      val profHits = new Array[Int](profiles.length)
      var nTokens = 0
      var sumLen = 0
      var stopHits = 0
      var nBigrams = 0
      var prevId = -1
      var i = 0
      while (i < n) {
        while (i < n && isWs(bytes(i))) i += 1
        if (i < n) {
          val start = i
          var len = 0 // code points
          while (i < n && !isWs(bytes(i))) {
            i += UTF8String.numBytesForFirstByte(bytes(i))
            len += 1
          }
          val tok = UTF8String.fromBytes(bytes, start, i - start)
          nTokens += 1
          sumLen += len
          if (stopSet.contains(tok)) stopHits += 1
          val mask = profMask.get(tok)
          if (mask != null) {
            var p = 0
            val mv = mask.intValue()
            while (p < profHits.length) {
              if (((mv >> p) & 1) == 1) profHits(p) += 1
              p += 1
            }
          }
          var id = ids.size()
          val prev = ids.putIfAbsent(tok, Integer.valueOf(id))
          if (prev != null) id = prev.intValue()
          if (id == counts.size()) counts.add(1)
          else counts.set(id, counts.get(id) + 1)
          if (prevId >= 0) {
            nBigrams += 1
            bigrams.add(java.lang.Long.valueOf((prevId.toLong << 32) | id.toLong))
          }
          prevId = id
        }
      }
      var top = 0
      var c = 0
      while (c < counts.size()) {
        if (counts.get(c) > top) top = counts.get(c)
        c += 1
      }
      InternalRow(nTokens, sumLen, ids.size(), top, stopHits, nBigrams,
        bigrams.size(), new GenericArrayData(profHits))
    }
    override protected def withNewChildInternal(c: Expression): TokenStats =
      copy(child = c)
    override def prettyName: String = "token_stats"
  }

  /** All word trigrams of the single-space-tokenized text as one compiled
    * pass — value-identical to
    *   `transform(sequence(1, size(ws) - 2), i => struct(el(i), el(i+1), el(i+2)))`
    * over `ws = filter(split(text, " "), _ != "")` for texts of ≥ 3 tokens
    * (TextStatsSpec pin); shorter texts return an empty array, which the
    * consuming `explode` drops exactly like the declarative
    * `where(size(ws) >= 3)`. Tokens are zero-copy byte slices. */
  case class WordTriples(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(
      StructType(Seq(
        StructField("w1", StringType, nullable = false),
        StructField("w2", StringType, nullable = false),
        StructField("w3", StringType, nullable = false))),
      containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val bytes = input.asInstanceOf[UTF8String].getBytes
      val n = bytes.length
      val toks = new java.util.ArrayList[UTF8String]()
      var i = 0
      while (i < n) {
        while (i < n && bytes(i) == ' ') i += 1
        if (i < n) {
          val start = i
          while (i < n && bytes(i) != ' ') i += 1
          toks.add(UTF8String.fromBytes(bytes, start, i - start))
        }
      }
      val t = toks.size()
      if (t < 3) return new GenericArrayData(Array.empty[Any])
      val out = new Array[Any](t - 2)
      var j = 0
      while (j + 2 < t) {
        out(j) = InternalRow(toks.get(j), toks.get(j + 1), toks.get(j + 2))
        j += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression): WordTriples =
      copy(child = c)
    override def prettyName: String = "word_triples"
  }

  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
  def token_stats(text: Column, stopwords: Seq[String],
                  profiles: Seq[Seq[String]]): Column =
    column(TokenStats(expression(text), stopwords, profiles))
  def word_triples(text: Column): Column =
    column(WordTriples(expression(text)))
}
