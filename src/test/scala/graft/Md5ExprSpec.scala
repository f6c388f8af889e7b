package graft

import graft.functions.HashExpressions
import org.apache.spark.sql.functions._

/** Value-identity pins for the round-13 compiled hot-path expressions: each
  * compiled form must equal the declarative formulation it replaced, byte for
  * byte, on adversarial inputs (multibyte, supplementary-plane, empty,
  * boundary lengths) — the declarative idioms remain the documented oracle
  * contract, so any divergence is an engine bug, not a test flake. */
class Md5ExprSpec extends SparkSpec {
  import spark.implicits._

  /** The pre-round declarative idiom, verbatim. */
  private def declMd5Hash60(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  private val samples = Seq(
    "", " ", "a", "ab", "abc", "hello world", "the quick brown fox",
    "ünïcödé tëxt", "日本語のテキストです", "emoji 🎉🚀 inside",
    "𝔰𝔲𝔭𝔭𝔩𝔢𝔪𝔢𝔫𝔱𝔞𝔯𝔶", "mixed ascii 混合 text 🎯 done",
    "a b  c   d", "\ttabs\tand\nnewlines\n", "ß capital İ edge",
    ("repeat " * 100).trim)

  test("compiled md5_hash60 equals conv(substr(md5(x),1,15),16,10)") {
    val df = samples.toDF("s")
    val rows = df.select(
      HashExpressions.md5Hash60Compiled(col("s")).as("got"),
      declMd5Hash60(col("s")).as("want")).collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    // null propagates
    val nr = Seq[Option[String]](None).toDF("s")
      .select(HashExpressions.md5Hash60Compiled(col("s"))).collect()
    assert(nr.head.isNullAt(0))
  }

  test("compiled char_grams equals transform(sequence, substr) slicing") {
    for (n <- Seq(1, 2, 3, 5, 16)) {
      val df = samples.toDF("s").where(length(col("s")) >= n)
      val rows = df.select(
        HashExpressions.char_grams(col("s"), n).as("got"),
        transform(sequence(lit(1), length(col("s")) - (n - 1)),
          i => col("s").substr(i, lit(n))).as("want")).collect()
      rows.foreach { r =>
        assert(r.getSeq[String](0) === r.getSeq[String](1), s"n=$n")
      }
    }
    // below-n strings: compiled form returns empty (callers filter first)
    val short = Seq("ab").toDF("s")
      .select(HashExpressions.char_grams(col("s"), 3)).collect()
    assert(short.head.getSeq[String](0).isEmpty)
  }

  test("compiled md5_word_gram_buckets equals the declarative DSIR gram chain") {
    val B = 64
    val df = samples.toDF("s")
    val ws = filter(split(col("s"), " "), t => t =!= "")
    val bigrams = when(size(col("ws")) >= 2,
      transform(sequence(lit(1), size(col("ws")) - 1), i =>
        concat_ws(" ", element_at(col("ws"), i), element_at(col("ws"), i + 1))))
      .otherwise(array().cast("array<string>"))
    val rows = df.select(col("s"), ws.as("ws"))
      .select(col("s"),
        HashExpressions.md5_word_gram_buckets(col("s"), B).as("got"),
        when(size(col("ws")) >= 1,
          transform(concat(col("ws"), bigrams),
            g => declMd5Hash60(g) % B))
          .otherwise(array().cast("array<long>")).as("want")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](1).sorted === r.getSeq[Long](2).sorted,
        s"input: '${r.getString(0)}'")
    }
  }

  test("compiled md5_char_gram_hashes equals per-gram declarative md5Hash60") {
    for (k <- Seq(1, 2, 5, 16)) {
      val df = samples.toDF("s").where(length(col("s")) >= k)
      val rows = df.select(
        HashExpressions.md5_char_gram_hashes(col("s"), k).as("got"),
        transform(sequence(lit(1), length(col("s")) - (k - 1)),
          i => declMd5Hash60(col("s").substr(i, lit(k)))).as("want")).collect()
      rows.foreach { r =>
        assert(r.getSeq[Long](0) === r.getSeq[Long](1), s"k=$k")
      }
    }
  }
}
