package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the sketching hot paths.
  *
  * The declarative formulations (nested `transform`/`aggregate` higher-order
  * functions) are interpreted per element with boxing — measured ~12µs per hash
  * evaluation, i.e. 200+ s for 5k docs × 64 families × ~50 shingles. These
  * expressions do the same math in one compiled JVM loop per row: the whole
  * signature costs a few µs. `CodegenFallback` is deliberate — the per-row call
  * is chunky enough that interpreting the *call* is free; only the inner loop
  * matters, and that is compiled Scala.
  *
  * Hashing is xxhash64 (same family Spark uses for `xxhash64()`), with
  * per-family derivation via the splitmix64 finalizer (Steele et al., public
  * domain) — deterministic across runs, partitions, and executors.
  */
object HashExpressions {

  private final val GOLDEN = 0x9e3779b97f4a7c15L

  /** splitmix64 finalizer: full-avalanche 64-bit mixer. */
  @inline private[functions] def mix64(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  @inline private[functions] def hashString(s: UTF8String, seed: Long): Long =
    org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
      s, StringType, seed)

  /** MinHash signature of an array<string> or pre-hashed array<long>: k 64-bit
    * families, family i = mix64(base(s) ^ (i+1)·golden) where base is xxhash64
    * of the string (or the long element as-is); element i = min over the array.
    * Empty/null input → null (callers filter empties). */
  case class MinHashSig(child: Expression, k: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true
    private lazy val elementIsLong = child.dataType match {
      case ArrayType(LongType, _) => true
      case ArrayType(StringType, _) => false
      case t => throw new IllegalArgumentException(s"minhash_sig over $t")
    }
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      if (n == 0) return null
      val mins = Array.fill(k)(Long.MaxValue)
      var j = 0
      while (j < n) {
        val base =
          if (elementIsLong) arr.getLong(j)
          else hashString(arr.getUTF8String(j), 42L)
        var i = 0
        while (i < k) {
          val h = mix64(base ^ ((i + 1) * GOLDEN))
          if (h < mins(i)) mins(i) = h
          i += 1
        }
        j += 1
      }
      new GenericArrayData(mins)
    }
    override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
    override def prettyName: String = "minhash_sig"
  }

  /** 64-bit SimHash of an array<string> (Charikar 2002): per-bit ±1 votes from
    * each token's xxhash64; sign bits packed into one long. Empty → all-ones
    * (-1L), since zero votes pass the `>= 0` sign test — callers bucketing
    * signatures must filter empty-token inputs or every degenerate document
    * lands at hamming 0 from every other (see Dedup.simhashPairs). */
  case class SimHash64(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    // array<long> = caller supplies PRE-HASHED tokens (e.g. a portable
    // md5-derived hash an external oracle can recompute); array<string> =
    // hash here with xxhash64 (fastest, engine-internal). Mirrors MinHashSig.
    private lazy val elementIsLong = child.dataType match {
      case ArrayType(LongType, _) => true
      case ArrayType(StringType, _) => false
      case t => throw new IllegalArgumentException(s"simhash64 over $t")
    }
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val votes = new Array[Int](64)
      var j = 0
      val n = arr.numElements()
      while (j < n) {
        val h =
          if (elementIsLong) arr.getLong(j)
          else hashString(arr.getUTF8String(j), 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
        j += 1
      }
      var sig = 0L
      var b = 0
      while (b < 64) { if (votes(b) >= 0) sig |= (1L << b); b += 1 }
      java.lang.Long.valueOf(sig)
    }
    override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
    override def prettyName: String = "simhash64"
  }

  /** Hash every element of an array<string> to a long (xxhash64, seed 42) and
    * return the SORTED distinct array — the compact set representation used for
    * exact intersection counting. */
  case class HashedSortedSet(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val hs = new Array[Long](n)
      var j = 0
      while (j < n) { hs(j) = hashString(arr.getUTF8String(j), 42L); j += 1 }
      java.util.Arrays.sort(hs)
      // dedup in place
      var out = 0
      var i = 0
      while (i < n) {
        if (out == 0 || hs(i) != hs(out - 1)) { hs(out) = hs(i); out += 1 }
        i += 1
      }
      new GenericArrayData(if (out == n) hs else java.util.Arrays.copyOf(hs, out))
    }
    override protected def withNewChildInternal(c: Expression): HashedSortedSet = copy(child = c)
    override def prettyName: String = "hashed_sorted_set"
  }

  /** |A ∩ B| for two SORTED long arrays via a single merge pass — replaces
    * `array_intersect` (per-row hash-set build, interpreted) on the candidate
    * verification path. */
  case class SortedIntersectCount(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = IntegerType
    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      var i = 0; var j = 0; var c = 0
      val nx = x.numElements(); val ny = y.numElements()
      while (i < nx && j < ny) {
        val xv = x.getLong(i); val yv = y.getLong(j)
        if (xv == yv) { c += 1; i += 1; j += 1 }
        else if (xv < yv) i += 1
        else j += 1
      }
      java.lang.Integer.valueOf(c)
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedIntersectCount =
      copy(left = l, right = r)
    override def prettyName: String = "sorted_intersect_count"
  }

  /** Lowercased word n-gram shingles of a string in one compiled pass:
    * whitespace-split, then n-grams joined with single spaces. Replaces the
    * `transform(sequence, i => concat_ws(slice(tokens)))` formulation (~100µs
    * per shingle interpreted). Output order matches that formulation. */
  case class WordShingles(child: Expression, n: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val toks = input.asInstanceOf[UTF8String].toLowerCase.toString
        .split("\\s+").filter(_.nonEmpty)
      if (toks.length < n) return new GenericArrayData(Array.empty[Any])
      val out = new Array[Any](toks.length - n + 1)
      var i = 0
      while (i + n <= toks.length) {
        val sb = new java.lang.StringBuilder()
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j)); j += 1
        }
        out(i) = UTF8String.fromString(sb.toString)
        i += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression): WordShingles = copy(child = c)
    override def prettyName: String = "word_shingles"
  }

  /** Dot product of a float/double array column against every row of a constant
    * hyperplane matrix — the sign-LSH projection — in one compiled loop.
    * Returns array<double> of length planes.length. */
  case class PlaneDots(child: Expression, planes: Array[Array[Double]])
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    private lazy val elementIsFloat = child.dataType match {
      case ArrayType(FloatType, _) => true
      case ArrayType(DoubleType, _) => false
      case t => throw new IllegalArgumentException(s"plane_dots over $t")
    }
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val dim = arr.numElements()
      val v = new Array[Double](dim)
      var i = 0
      while (i < dim) {
        v(i) = if (elementIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        i += 1
      }
      val out = new Array[Any](planes.length)
      var p = 0
      while (p < planes.length) {
        val plane = planes(p)
        var acc = 0.0
        var j = 0
        val m = math.min(dim, plane.length)
        while (j < m) { acc += v(j) * plane(j); j += 1 }
        out(p) = acc
        p += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression): PlaneDots = copy(child = c)
    override def prettyName: String = "plane_dots"
  }

  /** Σ aᵢ·bᵢ over two float/double arrays in a compiled loop (accumulated in
    * double, in array order — deterministic). */
  case class ArrayDot(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    private def isFloat(e: Expression) = e.dataType match {
      case ArrayType(FloatType, _) => true
      case ArrayType(DoubleType, _) => false
      case t => throw new IllegalArgumentException(s"array_dot over $t")
    }
    private lazy val leftFloat = isFloat(left)
    private lazy val rightFloat = isFloat(right)
    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var acc = 0.0
      var i = 0
      while (i < n) {
        val xv = if (leftFloat) x.getFloat(i).toDouble else x.getDouble(i)
        val yv = if (rightFloat) y.getFloat(i).toDouble else y.getDouble(i)
        acc += xv * yv
        i += 1
      }
      java.lang.Double.valueOf(acc)
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): ArrayDot =
      copy(left = l, right = r)
    override def prettyName: String = "array_dot"
  }

  /** Winnowing selection (Schleimer et al., SIGMOD 2003) over a pre-hashed
    * gram array: for every window of `w` consecutive hashes keep the minimum
    * (RIGHTMOST position on ties), deduped — the exact contract of
    * [[graft.operators.Winnowing.fingerprints]]'s declarative form, as one
    * compiled O(m) monotonic-deque pass instead of an interpreted O(m·w)
    * nested higher-order-function tree (which measured ~10 s over sf0.1's
    * 5k docs — the per-window `aggregate` boxes a struct per element).
    * Deque invariant: strictly increasing hashes; an incoming equal-or-
    * smaller hash pops the back, which IS the rightmost-tie rule. A selected
    * (p, h) repeats only across consecutive windows (its covering windows
    * are contiguous), so last-emitted dedup is complete.
    * Input `array<long>`; fewer than `w` elements → one all-gram window;
    * empty → null (callers filter). Output `array<struct<p:int, h:long>>`,
    * positions 1-based. */
  case class WinnowSelect(child: Expression, w: Int)
      extends UnaryExpression with CodegenFallback {
    require(w >= 1, s"winnow_select: w = $w")
    override def dataType: DataType = ArrayType(
      StructType(Seq(StructField("p", IntegerType, nullable = false),
        StructField("h", LongType, nullable = false))),
      containsNull = false)
    override def nullable: Boolean = true
    override def nullSafeEval(input: Any): Any = {
      val hs = input.asInstanceOf[ArrayData]
      val m = hs.numElements()
      if (m == 0) return null
      val we = math.min(w, m)
      val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      // ring deque of positions (0-based), hashes increasing front→back
      val dq = new Array[Int](m)
      var head = 0; var tail = 0 // [head, tail)
      var lastP = -1
      var i = 0
      while (i < m) {
        val h = hs.getLong(i)
        while (tail > head && hs.getLong(dq(tail - 1)) >= h) tail -= 1
        dq(tail) = i; tail += 1
        if (i >= we) { if (dq(head) <= i - we) head += 1 }
        if (i >= we - 1) {
          val p = dq(head)
          if (p != lastP) {
            out += InternalRow(p + 1, hs.getLong(p))
            lastP = p
          }
        }
        i += 1
      }
      new GenericArrayData(out.toArray[Any])
    }
    override protected def withNewChildInternal(c: Expression): WinnowSelect =
      copy(child = c)
    override def prettyName: String = "winnow_select"
  }

  /** Thread-local MD5 digest: `MessageDigest.getInstance` per evaluation is
    * a measurable JCA lookup, and digest instances are not thread-safe, so
    * the compiled md5 expressions below share one instance per thread. */
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  @inline private def md5Digest(): java.security.MessageDigest = {
    val m = md5Local.get(); m.reset(); m
  }

  /** First 60 bits of an MD5 digest as a long — EXACTLY the value of
    * `conv(substr(md5(x), 1, 15), 16, 10)`: the first 15 hex chars are the
    * first 15 nibbles, i.e. the big-endian first 8 bytes shifted right one
    * nibble. */
  @inline private def md5First60(d: Array[Byte]): Long = {
    val hi =
      ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
        ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
        ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    hi >>> 4
  }

  /** Compiled [[md5Hash60]]: one digest over the UTF-8 bytes, no hex-string
    * materialization, no radix-conversion parse. Value-identical to the
    * declarative idiom (pinned in Md5ExprSpec); the SQL formulation remains
    * the documented portable contract for external oracles. */
  case class Md5Hash60Expr(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    private lazy val isBinary = child.dataType match {
      case BinaryType => true
      case StringType => false
      case t => throw new IllegalArgumentException(s"md5_hash60 over $t")
    }
    override def nullSafeEval(input: Any): Any = {
      val bytes =
        if (isBinary) input.asInstanceOf[Array[Byte]]
        else input.asInstanceOf[UTF8String].getBytes
      java.lang.Long.valueOf(md5First60(md5Digest().digest(bytes)))
    }
    override protected def withNewChildInternal(c: Expression): Md5Hash60Expr =
      copy(child = c)
    override def prettyName: String = "md5_hash60"
  }

  /** All code-point `k`-gram [[md5Hash60]] hashes of a string in ONE compiled
    * pass — value-identical to
    * `transform(sequence(1, length(s) - k + 1), i => md5Hash60(substr(s, i, k)))`
    * for strings of ≥ k code points (pinned in Md5ExprSpec), but O(len)
    * instead of O(len²) (each `substr(i, k)` re-scans from the string start
    * to find code point i) and with zero per-gram string/hex allocations.
    * Strings shorter than k code points return an EMPTY array — callers
    * filter them out first (the declarative form's `sequence(1, len-k+1)`
    * is a descending-sequence trap there). */
  case class Md5CharGramHashes(child: Expression, k: Int)
      extends UnaryExpression with CodegenFallback {
    require(k >= 1, s"md5_char_gram_hashes: k = $k")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String]
      val bytes = s.getBytes
      val offs = codePointOffsets(bytes)
      val n = offs.length - 1 - k + 1 // grams = code points - k + 1
      if (n <= 0) return new GenericArrayData(Array.empty[Long])
      val out = new Array[Long](n)
      val md = md5Local.get()
      var i = 0
      while (i < n) {
        md.reset()
        md.update(bytes, offs(i), offs(i + k) - offs(i))
        out(i) = md5First60(md.digest())
        i += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression): Md5CharGramHashes =
      copy(child = c)
    override def prettyName: String = "md5_char_gram_hashes"
  }

  /** All code-point `n`-gram substrings of a string in ONE compiled pass —
    * value-identical to
    * `transform(sequence(1, length(s) - n + 1), i => substr(s, i, n))` for
    * strings of ≥ n code points (pinned in Md5ExprSpec), but O(len): the
    * byte offsets of all code points are computed once and each gram is a
    * zero-copy slice of the input's byte buffer. Shorter strings return an
    * empty array (callers filter them first). */
  case class CharGrams(child: Expression, n: Int)
      extends UnaryExpression with CodegenFallback {
    require(n >= 1, s"char_grams: n = $n")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String]
      val bytes = s.getBytes
      val offs = codePointOffsets(bytes)
      val cnt = offs.length - 1 - n + 1
      if (cnt <= 0) return new GenericArrayData(Array.empty[Any])
      val out = new Array[Any](cnt)
      var i = 0
      while (i < cnt) {
        out(i) = UTF8String.fromBytes(bytes, offs(i), offs(i + n) - offs(i))
        i += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression): CharGrams =
      copy(child = c)
    override def prettyName: String = "char_grams"
  }

  /** DSIR's hashed-gram feature map in ONE compiled pass: word unigram and
    * bigram [[md5Hash60]] buckets of the single-space-tokenized text —
    * value-identical (as a per-row multiset, which is all the downstream
    * bucket aggregations consume; order mirrors `concat(ws, bigrams)`) to
    *   `explode(concat(ws, bigrams))` → `md5Hash60(g) % buckets`
    * with `ws = filter(split(text, " "), _ != "")` and bigrams joined with
    * one space (pinned in Md5ExprSpec). Tokens are split on LITERAL spaces
    * (the Dsir contract — not \s+); no-token rows yield an empty array,
    * which `explode` drops exactly like the declarative `where(size >= 1)`.
    * Bigram digests stream tok1, ' ', tok2 into one MD5 — no concatenated
    * string is materialized. */
  case class Md5WordGramBuckets(child: Expression, buckets: Int)
      extends UnaryExpression with CodegenFallback {
    require(buckets > 0, s"md5_word_gram_buckets: buckets = $buckets")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    private val space = Array[Byte](' ')
    override def nullSafeEval(input: Any): Any = {
      val bytes = input.asInstanceOf[UTF8String].getBytes
      val n = bytes.length
      // token byte ranges (split on literal ' ', empties dropped)
      val starts = new java.util.ArrayList[Int]()
      val ends = new java.util.ArrayList[Int]()
      var i = 0
      while (i < n) {
        while (i < n && bytes(i) == ' ') i += 1
        if (i < n) {
          starts.add(i)
          while (i < n && bytes(i) != ' ') i += 1
          ends.add(i)
        }
      }
      val t = starts.size()
      if (t == 0) return new GenericArrayData(Array.empty[Long])
      val out = new Array[Long](t + math.max(t - 1, 0))
      val md = md5Local.get()
      var j = 0
      while (j < t) { // unigrams, in token order
        md.reset()
        md.update(bytes, starts.get(j), ends.get(j) - starts.get(j))
        out(j) = md5First60(md.digest()) % buckets
        j += 1
      }
      j = 0
      while (j < t - 1) { // bigrams, in token order
        md.reset()
        md.update(bytes, starts.get(j), ends.get(j) - starts.get(j))
        md.update(space)
        md.update(bytes, starts.get(j + 1), ends.get(j + 1) - starts.get(j + 1))
        out(t + j) = md5First60(md.digest()) % buckets
        j += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression): Md5WordGramBuckets =
      copy(child = c)
    override def prettyName: String = "md5_word_gram_buckets"
  }

  /** Byte offsets of each code point start, plus the terminal offset —
    * length = numChars + 1. */
  @inline private def codePointOffsets(bytes: Array[Byte]): Array[Int] = {
    // first pass: count code points (cheap — byte class dispatch only)
    var nChars = 0
    var i = 0
    while (i < bytes.length) {
      i += UTF8String.numBytesForFirstByte(bytes(i))
      nChars += 1
    }
    val offs = new Array[Int](nChars + 1)
    var c = 0
    i = 0
    while (i < bytes.length) {
      offs(c) = i
      i += UTF8String.numBytesForFirstByte(bytes(i))
      c += 1
    }
    offs(nChars) = bytes.length
    offs
  }

  /** Portable 60-bit hash: `conv(substr(md5(x), 1, 15), 16, 10)` — built only
    * from functions every SQL engine ships (md5 + string ops + radix
    * conversion), so an external oracle can recompute it verbatim. The ONE
    * definition of this idiom: Dedup's portable SimHash tokens and Reconcile's
    * row hashes both route here — diverging copies would silently break the
    * "portable" contract.
    *
    * Two evaluation forms, chosen by call-site context (r13 measurement):
    * this declarative form stays fully whole-stage-codegen'd and WINS at
    * one-hash-per-row sites (v01 row hashes / t13 draw keys measured ~1.25×
    * slower under the interpreted-call form); [[md5Hash60Compiled]] wins
    * INSIDE interpreted higher-order lambdas, where the per-element
    * expression tree is interpreted anyway and the hex string + radix parse
    * dominate (d04's per-token hashing measured 2.6× faster). Both are
    * value-identical (Md5ExprSpec). */
  def md5Hash60(c: Column): Column = {
    import org.apache.spark.sql.functions.{conv, md5, substring}
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")
  }

  /** Compiled [[md5Hash60]] for interpreted-lambda call sites — see the
    * form-selection note above. */
  def md5Hash60Compiled(c: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
    column(Md5Hash60Expr(expression(c.cast("string"))))
  }

  // ---- Column-facing wrappers (Spark 4: Column wraps a ColumnNode, so
  //      Expression↔Column goes through the sql-package bridge) ----
  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
  def minhash_sig(shingles: Column, k: Int): Column =
    column(MinHashSig(expression(shingles), k))
  def simhash64(tokens: Column): Column = column(SimHash64(expression(tokens)))
  def hashed_sorted_set(strings: Column): Column =
    column(HashedSortedSet(expression(strings)))
  def sorted_intersect_count(a: Column, b: Column): Column =
    column(SortedIntersectCount(expression(a), expression(b)))
  def word_shingles(text: Column, n: Int): Column =
    column(WordShingles(expression(text), n))
  def plane_dots(vec: Column, planes: Array[Array[Double]]): Column =
    column(PlaneDots(expression(vec), planes))
  def array_dot(a: Column, b: Column): Column =
    column(ArrayDot(expression(a), expression(b)))
  def winnow_select(hashes: Column, w: Int): Column =
    column(WinnowSelect(expression(hashes), w))
  def md5_char_gram_hashes(text: Column, k: Int): Column =
    column(Md5CharGramHashes(expression(text), k))
  def md5_word_gram_buckets(text: Column, buckets: Int): Column =
    column(Md5WordGramBuckets(expression(text), buckets))
  def char_grams(text: Column, n: Int): Column =
    column(CharGrams(expression(text), n))
}
