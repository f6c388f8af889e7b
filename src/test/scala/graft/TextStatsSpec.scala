package graft

import graft.functions.{TextFunctions => T}
import graft.sources.Lake
import org.apache.spark.sql.functions._

/** Value-identity pins for the single-pass TokenStats expression: every
  * ratio/count the r13 optimization round derives from it must equal the
  * declarative primitive stack it replaced — on adversarial strings AND on
  * real lake documents. The primitives stay in TextFunctions as the
  * reference formulation. */
class TextStatsSpec extends SparkSpec {
  import spark.implicits._

  private val samples = Seq(
    "", " ", "\t\t", "one", "one two", "one one one",
    "The the THE tHe", "a b  c   d\te\nf",
    "ünïcödé tëxt ünïcödé", "日本語 の テキスト 日本語",
    "emoji 🎉 tokens 🎉 emoji", "the and of to in is that it was for",
    "  leading and trailing  ", "punct, punct. punct! (punct)",
    "la de la que y en el un", "der die das und ist nicht",
    ("the word " * 50).trim, "single")

  private val stopSeq: Seq[Any] = Seq("the", "a", "an", "and", "or", "of",
    "to", "in", "is", "are", "was", "on", "for", "with", "as", "at", "by",
    "it", "this", "that")

  private def statsDf = {
    val lake = Lake.table(spark, sf0001, "documents")
      .select(col("text").as("s")).limit(400)
    samples.toDF("s").unionAll(lake)
  }

  test("tokenStats counts equal the declarative primitives") {
    val ts = T.tokens(col("s"))
    val rows = statsDf.select(
      T.tokenStats(col("s")).as("st"),
      size(ts).as("n"),
      aggregate(ts, lit(0), (acc, t) => acc + length(t)).as("sumLen"),
      size(array_distinct(ts)).as("dist"),
      size(filter(ts, t => t.isin(stopSeq: _*))).as("stops"),
      size(T.wordShingles(col("s"), 2)).as("nbg"),
      size(array_distinct(T.wordShingles(col("s"), 2))).as("distbg")).collect()
    rows.foreach { r =>
      val st = r.getStruct(0)
      assert(st.getInt(0) === r.getInt(1), "n_tokens")
      assert(st.getInt(1) === r.getInt(2), "sum_len")
      assert(st.getInt(2) === r.getInt(3), "distinct_tokens")
      assert(st.getInt(4) === r.getInt(4), "stop_hits")
      assert(st.getInt(5) === math.max(r.getInt(5), 0), "n_bigrams")
      assert(st.getInt(6) === r.getInt(6), "distinct_bigrams")
    }
  }

  test("top_count equals the sorted-run topTokenFrac numerator") {
    val rows = statsDf.select(
      T.tokenStats(col("s")).getField("top_count").as("got"),
      (T.topTokenFrac(T.tokens(col("s"))) *
        size(T.tokens(col("s")))).as("want")).collect()
    rows.foreach { r =>
      assert(math.abs(r.getInt(0).toDouble - r.getDouble(1)) < 1e-9)
    }
  }

  test("langIdFromHits(profile_hits) equals langId") {
    val rows = statsDf.select(
      T.langIdFromHits(T.tokenStats(col("s")).getField("profile_hits")).as("got"),
      T.langId(col("s")).as("want")).collect()
    rows.foreach(r => assert(r.getString(0) === r.getString(1)))
  }

  test("single-pass qualityScore is bit-identical to the primitive stack") {
    val rows = statsDf.select(
      T.qualityScore(col("s")).as("got"),
      round(
        least(T.tokenCount(col("s")).cast("double") / 100.0, lit(1.0)) * 0.4 +
          least(T.stopwordRatio(col("s")) * 5.0, lit(1.0)) * 0.3 +
          greatest(lit(0.0), lit(1.0) - T.punctRatio(col("s")) * 4.0) * 0.2 +
          greatest(lit(0.0), lit(1.0) - T.upperRatio(col("s"))) * 0.1,
        6).as("want")).collect()
    rows.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }

  test("word_triples equals the declarative split + transform trigram tree") {
    val ws = filter(split(col("s"), " "), t => t =!= "")
    val rows = statsDf.select(
      graft.functions.TextStatsExpr.word_triples(col("s")).as("got"),
      when(size(ws) >= 3,
        transform(sequence(lit(1), size(ws) - 2), i =>
          struct(element_at(ws, i).as("w1"),
            element_at(ws, i + 1).as("w2"),
            element_at(ws, i + 2).as("w3"))))
        .otherwise(array().cast("array<struct<w1:string,w2:string,w3:string>>"))
        .as("want")).collect()
    rows.foreach { r =>
      assert(r.getSeq[org.apache.spark.sql.Row](0) ===
        r.getSeq[org.apache.spark.sql.Row](1))
    }
  }

  test("Quality.flags columns are bit-identical to the primitive formulation") {
    val df = statsDf.withColumn("id", monotonically_increasing_id())
    val got = graft.operators.Quality.flags(df, "s")
    val want = df
      .withColumn("n_tokens", T.tokenCount(col("s")).cast("long"))
      .withColumn("mean_token_len", T.meanTokenLen(col("s")))
      .withColumn("symbol_ratio", T.punctRatio(col("s")))
      .withColumn("stopword_ratio", T.stopwordRatio(col("s")))
      .withColumn("dup_bigram_frac", T.dupBigramFrac(col("s")))
    val g = got.select("id", "n_tokens", "mean_token_len", "symbol_ratio",
      "stopword_ratio", "dup_bigram_frac").collect()
      .map(r => r.getLong(0) -> r).toMap
    want.select("id", "n_tokens", "mean_token_len", "symbol_ratio",
      "stopword_ratio", "dup_bigram_frac").collect().foreach { w =>
      val r = g(w.getLong(0))
      assert(r.getLong(1) === w.getLong(1))
      (2 to 5).foreach(i => assert(r.getDouble(i) === w.getDouble(i), s"col $i"))
    }
  }
}
