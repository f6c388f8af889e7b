package graft

import graft.operators.Dsir
import org.apache.spark.sql.functions.col

class DsirSpec extends SparkSpec {
  import spark.implicits._

  // Small corpus with a clear target signal: target docs (ids 0, 97-like
  // convention is the caller's concern — here we pass an explicit subset)
  // talk about "spark sql", outliers about other things. One-token and
  // repeated-gram docs cover the tokenization edges.
  private val docs = Seq(
    0L -> "spark sql engine",
    1L -> "spark sql engine fast",
    2L -> "cats chase mice",
    3L -> "spark",               // one token: unigram only, no bigram branch
    4L -> "sql sql sql",         // repeated grams: per-doc counts > 1
    5L -> "mice chase cats chase mice")
  private def df = docs.toDF("doc_id", "text")
  private def target = df.where(col("doc_id") < 2)

  private val B = 64

  private def run() = Dsir.importanceWeights(df, target, "doc_id", "text", buckets = B)
    .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap

  // The operator's exact contract, independently in plain Scala: md5-60-bit
  // bucketed unigrams+bigrams, add-one smoothed target/raw bucket models,
  // per-DISTINCT-bucket log-ratio rounded at 9, per-doc sum of
  // count x quantized-ratio as exact BigDecimal, rounded at 6.
  private def miniOracle(): Map[Long, (Long, Double)] = {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def bucket(g: String): Long = java.lang.Long.parseLong(md5hex(g).take(15), 16) % B
    def grams(text: String): Seq[String] = {
      val ws = text.split(" ").filter(_.nonEmpty).toSeq
      ws ++ ws.zip(ws.drop(1)).map { case (a, b) => s"$a $b" }
    }
    val all = docs.map { case (id, t) => id -> grams(t).map(bucket) }
    val tgtIds = docs.collect { case (id, _) if id < 2 => id }.toSet
    val rawCounts = all.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tgtCounts = all.filter(p => tgtIds(p._1)).flatMap(_._2)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nr = rawCounts.values.sum
    val nt = tgtCounts.values.sum
    def lr(b: Long): BigDecimal = {
      val v = math.log((tgtCounts.getOrElse(b, 0L) + 1).toDouble / (nt + B)) -
        math.log((rawCounts.getOrElse(b, 0L) + 1).toDouble / (nr + B))
      BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    }
    all.filter(_._2.nonEmpty).map { case (id, bs) =>
      val perBucket = bs.groupBy(identity).view.mapValues(_.size).toMap
      val w = perBucket.map { case (b, c) => BigDecimal(c) * lr(b) }.sum
      id -> ((bs.size.toLong,
        w.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }.toMap
  }

  test("matches a driver-side exact recomputation (mini-oracle)") {
    assert(run() == miniOracle())
  }

  test("target-like docs score above outliers") {
    val got = run()
    // doc 1 shares nearly every gram with the target; docs 2 and 5 share none
    assert(got(1L)._2 > got(2L)._2)
    assert(got(1L)._2 > got(5L)._2)
  }

  test("deterministic across executions") {
    assert(run() == run())
  }

  test("one-token docs carry exactly one gram and empty docs drop") {
    val withEmpty = (docs :+ (6L -> "") :+ (7L -> "   ")).toDF("doc_id", "text")
    val got = Dsir.importanceWeights(withEmpty, target, "doc_id", "text", buckets = B)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(3L) == 1L)
    assert(!got.contains(6L) && !got.contains(7L))
  }

  test("gumbelTopK matches a driver-side exact draw and plans as top-k") {
    val weights = Dsir.importanceWeights(df, target, "doc_id", "text", buckets = B)
    val picked = Dsir.gumbelTopK(weights, "doc_id", "log_w", k = 3)
    // driver-side recomputation of the content-keyed draw
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val twoTo52 = 4503599627370496L
    val byId = weights.collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val want = byId.toSeq.map { case (id, lw) =>
      val h = java.lang.Long.parseLong(md5hex(id.toString).take(15), 16) % twoTo52
      val u = (h.toDouble + 0.5) / twoTo52.toDouble
      val key = BigDecimal(lw - math.log(-math.log(u)))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      (id, lw, key)
    }.sortBy { case (id, _, key) => (-key, id) }.take(3)
    val got = picked.select("doc_id", "log_w", "key").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    assert(got.sortBy { case (id, _, key) => (-key, id) } == want)
    val plan = picked.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"global top-k must plan as TakeOrderedAndProject, not a full sort:\n$plan")
  }

  test("gumbelTopK is idempotent: same draw after repartition and re-run") {
    val weights = Dsir.importanceWeights(df, target, "doc_id", "text", buckets = B)
    def ids(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(_.getLong(0)).toSet
    val a = ids(Dsir.gumbelTopK(weights, "doc_id", "log_w", k = 3))
    val b = ids(Dsir.gumbelTopK(weights.repartition(7), "doc_id", "log_w", k = 3))
    assert(a == b && a.size == 3)
  }

  test("the scoring join is broadcast (B-row model never shuffles the corpus)") {
    val plan = Dsir.importanceWeights(df, target, "doc_id", "text", buckets = B)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"expected a broadcast scoring join in:\n$plan")
  }

  test("single-pass predicate overload is bit-identical to the two-relation " +
       "form, on the fixture and on the lake") {
    import org.apache.spark.sql.functions.col
    def norm(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(_.toString).sorted.toSeq
    val pred = col("doc_id") % 3 === 0
    val two = Dsir.importanceWeights(df, df.where(pred), "doc_id", "text",
      buckets = B)
    val one = Dsir.importanceWeights(df, pred, "doc_id", "text",
        buckets = B, carry = Nil)
      .select("doc_id", "n_grams", "log_w")
    assert(norm(one) == norm(two))
    val docs = graft.sources.Lake.table(spark, sf0001, "documents")
      .select(col("doc_id"), col("text"))
    val lp = col("doc_id") % 13 === 0
    val lakeTwo = Dsir.importanceWeights(docs, docs.where(lp),
      "doc_id", "text", buckets = 1024)
    val lakeOne = Dsir.importanceWeights(docs, lp, "doc_id", "text",
        buckets = 1024, carry = Nil)
      .select("doc_id", "n_grams", "log_w")
    assert(norm(lakeOne) == norm(lakeTwo))
  }

  test("carried metadata rides the aggregations and the draw — no join " +
       "back needed, values correct") {
    import org.apache.spark.sql.functions.{col, concat_ws, lit}
    val meta = df.withColumn("src", concat_ws("_", lit("s"), col("doc_id") % 2))
    val w = Dsir.importanceWeights(meta, col("doc_id") % 3 === 0,
      "doc_id", "text", buckets = B, carry = Seq("src"))
    val picked = Dsir.gumbelTopK(w, "doc_id", "log_w", k = 3)
    val rows = picked.collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getAs[String]("src") == s"s_${r.getAs[Long]("doc_id") % 2}")
    }
    assert(picked.columns.contains("key") && picked.columns.contains("n_grams"))
  }
}
