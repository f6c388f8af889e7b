package graft

import graft.operators.{Features, Profile}
import org.apache.spark.sql.functions._

/** Feature scaling, tf-idf top terms, and histogram profiling. */
class FeaturesSpec extends SparkSpec {
  import spark.implicits._

  test("min-max normalization maps group extremes to 0/1, constant groups to 0") {
    val df = Seq(
      (1L, "a", 10.0), (2L, "a", 20.0), (3L, "a", 15.0),
      (4L, "b", 7.0), (5L, "b", 7.0)
    ).toDF("id", "g", "x")
    val got = Features.minMaxNormalize(df, "g", "x")
      .select("id", "x_norm").as[(Long, Double)].collect().toMap
    assert(got(1L) == 0.0 && got(2L) == 1.0 && got(3L) == 0.5)
    assert(got(4L) == 0.0 && got(5L) == 0.0, "constant group must normalize to 0")
  }

  test("min-max normalization broadcasts stats; fact side does not shuffle") {
    val df = (1L to 100L).map(i => (i, s"g${i % 3}", i.toDouble)).toDF("id", "g", "x")
    val plan = Features.minMaxNormalize(df, "g", "x")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("z-score outliers flags only the far point, with the right sign") {
    // group "a": nine 10.0s and one 100.0 — mean 19, var 729, sd 27;
    // z(100) = 3 > 2.5, z(10) = -1/3. group "b": constant -> var 0, no rows.
    val df = ((1L to 9L).map(i => (i, "a", 10.0)) ++ Seq((10L, "a", 100.0)) ++
      Seq((11L, "b", 5.0), (12L, "b", 5.0))).toDF("id", "g", "x")
    val got = Features.zScoreOutliers(df, "g", "x", zThreshold = 2.5)
      .select("id", "z").as[(Long, Double)].collect().toSeq
    assert(got == Seq((10L, 3.0)))
  }

  test("z-score outliers keeps null-group rows in their own group") {
    val df = Seq((1L, Option("a"), 1.0), (2L, Option.empty[String], 0.0),
      (3L, Option.empty[String], 0.0), (4L, Option.empty[String], 100.0),
      (5L, Option.empty[String], 0.0), (6L, Option.empty[String], 0.0)
    ).toDF("id", "g", "x")
    val got = Features.zScoreOutliers(df, "g", "x", zThreshold = 1.9)
      .select("id").as[Long].collect().toSeq
    assert(got == Seq(4L), s"null group must z-score internally: $got")
  }

  test("z-score outliers fails loud when a value overflows the decimal moments") {
    // 1e17 overflows decimal(18,2) at the cast. Under ANSI (Spark 4 default)
    // the cast itself throws; under non-ANSI the NULL would silently drop the
    // row from the moments — the operator's own assert catches that. Either
    // way: loud failure, never a quietly wrong z.
    val df = Seq((1L, "a", 1.0e17), (2L, "a", 1.0), (3L, "a", 2.0))
      .toDF("id", "g", "x")
    val e = intercept[Exception] {
      Features.zScoreOutliers(df, "g", "x", zThreshold = 2.0).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(m => m.contains("decimal overflow")
      || m.contains("NUMERIC_VALUE_OUT_OF_RANGE")), msgs(e).toString)
  }

  test("z-score outliers' non-ANSI overflow guard trips on a NULLed moment") {
    val prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val df = Seq((1L, "a", 1.0e17), (2L, "a", 1.0), (3L, "a", 2.0))
        .toDF("id", "g", "x")
      val e = intercept[Exception] {
        Features.zScoreOutliers(df, "g", "x", zThreshold = 2.0).collect()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("decimal overflow")), msgs(e).toString)
    } finally spark.conf.set("spark.sql.ansi.enabled", prev)
  }

  test("tf-idf ranks a group-heavy rare term above common terms") {
    val docs = Seq(
      (1L, "a", "zebra zebra zebra common common"),
      (2L, "a", "common words only here"),
      (3L, "b", "common words only here too"),
      (4L, "b", "common stuff common stuff")
    ).toDF("doc_id", "src", "text")
    val top = Features.tfidfTopTerms(docs, "src", "doc_id", "text", k = 2)
    val a1 = top.where($"src" === "a" && $"rank" === 1)
      .select("term", "tf", "df").as[(String, Long, Long)].collect().head
    // zebra: tf=3 in src a, df=1 -> score 3*4/1=12; 'common' df=4 scores lower
    assert(a1 == (("zebra", 3L, 1L)), a1.toString)
    // deterministic: rank ties break by term
    val again = Features.tfidfTopTerms(docs, "src", "doc_id", "text", k = 2)
    assert(top.collect().toSeq == again.collect().toSeq)
  }

  test("histogram buckets count every non-null row exactly once") {
    val df = Seq(0.0, 1.0, 9.99, 10.0, 25.0, 99.9).toDF("x")
      .union(Seq.empty[Double].toDF("x"))
    val got = Profile.histogram(df, "x", width = 10.0)
      .select("bucket", "n").as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 3L, 1L -> 1L, 2L -> 1L, 9L -> 1L), got.toString)
    val edges = Profile.histogram(df, "x", width = 10.0)
      .select("bucket", "bucket_lo").as[(Long, Double)].collect().toMap
    assert(edges(2L) == 20.0)
  }

  test("dailyDense fills every missing (day, group) combo with zero") {
    import java.sql.Timestamp
    val events = Seq(
      (Timestamp.valueOf("2024-01-01 10:00:00"), "a"),
      (Timestamp.valueOf("2024-01-01 11:00:00"), "a"),
      (Timestamp.valueOf("2024-01-04 10:00:00"), "b")
    ).toDF("ts", "g")
    val got = graft.operators.TimeSeries.dailyDense(events, "ts", "g")
      .as[(java.sql.Date, String, Long)].collect()
      .map { case (d, g, n) => (d.toString, g, n) }.toSet
    // 4-day span x 2 groups = 8 rows, 2 nonzero
    assert(got.size == 8)
    assert(got.count(_._3 > 0) == 2)
    assert(got(("2024-01-01", "a", 2L)) && got(("2024-01-04", "b", 1L)))
    assert(got(("2024-01-02", "a", 0L)) && got(("2024-01-03", "b", 0L)))
  }
}
