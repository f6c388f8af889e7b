package graft

import graft.functions.{TextFunctions => T}
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one[A](c: org.apache.spark.sql.Column, text: String): A =
    Seq(text).toDF("t").select(c.as("r")).collect()(0).getAs[A]("r")

  test("tokenCount handles empty / multi-space / mixed-case") {
    assert(one[Int](T.tokenCount(col("t")), "hello  world foo") == 3)
    assert(one[Int](T.tokenCount(col("t")), "") == 0)
    assert(one[Int](T.tokenCount(col("t")), "   ") == 0)
  }

  test("wordShingles produces n-grams in order; short text -> empty") {
    val sh = Seq("a b c d").toDF("t")
      .select(T.wordShingles(col("t"), 2).as("r")).collect()(0).getSeq[String](0)
    assert(sh == Seq("a b", "b c", "c d"))
    assert(Seq("a b").toDF("t").select(T.wordShingles(col("t"), 3).as("r"))
      .collect()(0).getSeq[String](0).isEmpty)
  }

  test("minhash signatures: identical texts match, different texts differ") {
    val df = Seq("the quick brown fox jumps over the lazy dog",
      "the quick brown fox jumps over the lazy dog",
      "completely different words here entirely now").toDF("t")
    val sigs = df.select(T.minhashSignature(T.wordShingles(col("t"), 2), 16).as("s"))
      .collect().map(_.getSeq[Long](0))
    assert(sigs(0).toSeq == sigs(1).toSeq)
    assert(sigs(0).toSeq != sigs(2).toSeq)
    assert(sigs(0).length == 16)
  }

  test("simhash: near-identical texts are close in Hamming distance") {
    val df = Seq(
      ("a", "the quick brown fox jumps over the lazy dog and runs far away today"),
      ("b", "the quick brown fox jumps over the lazy dog and runs far away tonight"),
      ("c", "entirely unrelated content about database query optimization engines")).toDF("id", "t")
    val m = df.select(col("id"), T.simhash64(T.tokens(col("t"))).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(m("a"), m("b")) < ham(m("a"), m("c")))
    assert(ham(m("a"), m("b")) <= 12)
  }

  test("fingerprint is whitespace/case-invariant") {
    val fps = Seq("Hello   World", "hello world", "goodbye world").toDF("t")
      .select(T.fingerprint(col("t")).as("f")).collect().map(_.getLong(0))
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
  }

  test("langId picks the dominant stopword language, und when none") {
    assert(one[String](T.langId(col("t")),
      "the cat and the dog sat on the mat for a while") == "en")
    assert(one[String](T.langId(col("t")),
      "el perro y el gato en la casa de los abuelos") == "es")
    assert(one[String](T.langId(col("t")),
      "der Hund und die Katze sind nicht im Haus") == "de")
    assert(one[String](T.langId(col("t")), "zzz qqq xxx") == "und")
  }

  test("quality score: natural prose scores higher than junk") {
    val good = one[Double](T.qualityScore(col("t")),
      "the researchers published a detailed analysis of the system and its " +
        "performance for a wide range of workloads in the field")
    val junk = one[Double](T.qualityScore(col("t")), "$$$ !!! ### @@@ %%%")
    assert(good > junk)
    assert(good >= 0.0 && good <= 1.0)
  }

  test("punct/upper ratios and bpe token count") {
    assert(one[Double](T.punctRatio(col("t")), "ab!?") == 0.5)
    assert(one[Double](T.upperRatio(col("t")), "AbCd") == 0.5)
    assert(one[Int](T.bpeTokenCount(col("t")), "hello, world 42") == 2 + 1 + 2) // hello , world 4 2
  }

  test("redactPii masks emails, IPv4s, and phone runs; clean text unchanged") {
    def red(s: String) = one[String](T.redactPii(col("t")), s)
    assert(red("mail me at jane.doe+x@corp.example.org today") ==
      "mail me at <EMAIL> today")
    assert(red("server at 10.0.255.7 responded") == "server at <IP> responded")
    assert(red("call +1 (415) 555-0199 now") == "call <PHONE> now")
    assert(red("the quick brown fox") == "the quick brown fox")
    // email digits must not be re-eaten as a phone
    assert(red("a12345678901@ex.co") == "<EMAIL>")
  }

  test("repetition stats: dup/top token fractions and bigram repeats") {
    // "a a a b": 4 tokens, 2 distinct -> dup 0.5; top "a" 3/4
    assert(one[Double](T.dupTokenFrac(T.tokens(col("t"))), "a a a b") == 0.5)
    assert(one[Double](T.topTokenFrac(T.tokens(col("t"))), "a a a b") == 0.75)
    assert(one[Double](T.topTokenFrac(T.tokens(col("t"))), "x y z") == 1.0 / 3)
    assert(one[Double](T.dupTokenFrac(T.tokens(col("t"))), "") == 0.0)
    assert(one[Double](T.topTokenFrac(T.tokens(col("t"))), "") == 0.0)
    // "a b a b a": bigrams (a b, b a, a b, b a) -> 4 total, 2 distinct
    assert(one[Double](T.dupBigramFrac(col("t")), "a b a b a") == 0.5)
    assert(one[Double](T.dupBigramFrac(col("t")), "one") == 0.0)
  }

  private def rep(text: String): Map[String, Double] = {
    val row = Seq(text).toDF("t")
      .select(graft.functions.TextRepetition.ngramRepetition(col("t")).as("r"))
      .select(graft.functions.TextRepetition.fieldNames.map(f => col(s"r.$f")): _*)
      .collect()(0)
    graft.functions.TextRepetition.fieldNames.zipWithIndex
      .map { case (f, i) => f -> row.getDouble(i) }.toMap
  }

  test("ngram repetition: top-n char fractions incl. >1 self-overlap cases") {
    // "a b a b a b c": 7 tokens, 7 chars. top2 = "a b" x3, charlen 2 -> 6/7;
    // top3 ties ("a b a" x2, "b a b" x2) -> gram-max tie-break, 2*3/7;
    // top4 = "a b a b" x2, charlen 4 -> 8/7 (> 1 under self-overlap).
    val r = rep("a b a b a b c")
    assert(r("top2_char_frac") == 6.0 / 7)
    assert(r("top3_char_frac") == 6.0 / 7)
    assert(r("top4_char_frac") == 8.0 / 7)
    assert(r("dup5_char_frac") == 0.0, "all 5-grams distinct")
    // case folding: "spam SPAM spam" -> "spam spam" x2, charlen 8, total 12
    assert(rep("  spam   SPAM  spam ")("top2_char_frac") == 16.0 / 12)
  }

  test("ngram repetition: dup-n coverage counts overlapped chars once") {
    // "x y z x y z x y z w": dup 5-gram starts {0,1,3,4}; their [i, i+4]
    // windows union to tokens 0..8 -> 9 of 10 chars despite 4x5=20 window slots
    val r = rep("x y z x y z x y z w")
    assert(r("dup5_char_frac") == 0.9)
    assert(r("dup6_char_frac") == 0.9, "starts {0,3} cover 0..8")
    assert(r("dup7_char_frac") == 0.0, "no duplicated 7-gram")
    assert(r("top3_char_frac") == 0.9, "'x y z' x3, charlen 3")
  }

  test("ngram repetition: supplementary-plane text counts code points, not UTF-16 units") {
    // toks [😀, 😀, ab], total 4 chars. Both 2-grams occur once; code-point
    // charlen makes "😀 ab" (3 chars) beat "😀 😀" (2 chars) -> 3/4. Counting
    // UTF-16 units would tie both grams at 4 and yield 4/6 — the off-BMP
    // divergence from the DuckDB oracle (code points, UTF-8 byte order) that
    // this case pins.
    assert(rep("😀 😀 ab")("top2_char_frac") == 3.0 / 4)
    // dup5 coverage: duplicated 5-gram windows cover tokens 0..9 of 11
    // single-CHAR tokens (an emoji is one character); UTF-16 units would give
    // 12/13 instead.
    assert(rep("😀 a b c d 😀 a b c d e")("dup5_char_frac") == 10.0 / 11)
    // CJK Ext-B (U+20000, also supplementary): same rule, top2 = "𠀀 ab" 3/4
    assert(rep("𠀀 𠀀 ab")("top2_char_frac") == 3.0 / 4)
  }

  test("utf8Compare == unsigned UTF-8 byte order on random strings incl. surrogates") {
    val T14 = graft.functions.TextRepetition
    val rnd = new scala.util.Random(77)
    def randString(): String = {
      val sb = new StringBuilder
      (0 until rnd.nextInt(8)).foreach { _ =>
        rnd.nextInt(4) match {
          case 0 => sb.append(('a' + rnd.nextInt(26)).toChar)                 // ascii
          case 1 => sb.append((0x20 + rnd.nextInt(0xD7DF)).toChar)            // BMP low
          case 2 => sb.append((0xE000 + rnd.nextInt(0x2000)).toChar)          // BMP high
          case 3 => sb.appendAll(Character.toChars(0x10000 + rnd.nextInt(0x10000)))
        }
      }
      sb.toString
    }
    def byteCompare(a: Array[Byte], b: Array[Byte]): Int = {
      val n = math.min(a.length, b.length)
      var i = 0
      while (i < n) {
        val d = (a(i) & 0xff) - (b(i) & 0xff)
        if (d != 0) return d
        i += 1
      }
      a.length - b.length
    }
    for (_ <- 1 to 5000) {
      val x = randString(); val y = randString()
      val want = Integer.signum(byteCompare(x.getBytes("UTF-8"), y.getBytes("UTF-8")))
      assert(Integer.signum(T14.utf8Compare(x, y)) == want,
        s"'$x' (${x.map(_.toInt.toHexString)}) vs '$y' (${y.map(_.toInt.toHexString)})")
    }
  }

  test("ngram repetition: degenerate inputs are all-zero, never null/NaN") {
    for (t <- Seq("", "   ", "hello", "a b c")) {
      val r = rep(t)
      assert(r.values.forall(v => !v.isNaN && !v.isInfinite), (t, r))
      assert(r("dup5_char_frac") == 0.0 && r("top4_char_frac") == 0.0, (t, r))
    }
    // m == n boundary: exactly one 2-gram, count 1, charlen 4, total 4 -> 1.0
    assert(rep("ab cd")("top2_char_frac") == 1.0)
  }
}
