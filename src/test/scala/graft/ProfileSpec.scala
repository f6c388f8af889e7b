package graft

import graft.operators.Profile

class ProfileSpec extends SparkSpec {

  test("profile counts rows, non-nulls, distincts, and min/max in one pass") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("a")), (2L, Some("b")), (3L, None), (4L, Some("b"))
    ).toDF("id", "s")
    val p = Profile.profile(df, Seq("id", "s"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))).toMap
    assert(p("id") == ((4L, 4L, 4L, "1", "4")))
    assert(p("s") == ((4L, 3L, 2L, "a", "b")))
  }

  test("collect_set_bounded: exact sorted distinct set under the cap, " +
       "stops collecting (size stays cap) over it, dedups across partitions") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val under = (1L to 6L).flatMap(v => Seq(v, v)).toDF("v").repartition(4)
      .agg(graft.functions.SketchAggregates.collectSetBounded(col("v"), 10))
      .head().getSeq[Long](0)
    assert(under == (1L to 6L), "under cap: exact distinct set, ascending")
    val over = (1L to 100L).toDF("v").repartition(8)
      .agg(graft.functions.SketchAggregates.collectSetBounded(col("v"), 10))
      .head().getSeq[Long](0)
    assert(over.size == 10, s"over cap: size must stop exactly at cap: $over")
    assert(over.distinct.size == 10 && over == over.sorted)
  }

  test("space_saving is exact (err 0) when distincts fit the capacity") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c")).toDF("v")
      .repartition(4) // exercise partial buffers + merge
    val rows = df.agg(graft.functions.SketchAggregates.spaceSaving(col("v"), 8).as("s"))
      .select(explode(col("s")).as("e"))
      .select("e.item", "e.cnt", "e.err")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == Seq(("a", 5L, 0L), ("b", 3L, 0L), ("c", 1L, 0L)))
  }

  test("space_saving under eviction keeps bounds honest and heavy hitters present") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 60x "hot", and 30 singletons through a capacity-8 sketch: N=90,
    // f(hot)=60 > N/8, so Space-Saving guarantees "hot" survives; every
    // reported cnt must over-estimate and cnt-err under-estimate truth.
    val truth = Seq.fill(60)("hot") ++ (1 to 30).map(i => f"one$i%02d")
    val df = new scala.util.Random(42).shuffle(truth).toDF("v").repartition(4)
    val rows = df.agg(graft.functions.SketchAggregates.spaceSaving(col("v"), 8).as("s"))
      .select(explode(col("s")).as("e"))
      .select("e.item", "e.cnt", "e.err")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.length <= 8)
    val byItem = rows.map(r => r._1 -> r).toMap
    assert(byItem.contains("hot"), s"heavy hitter evicted: ${rows.toSeq}")
    val trueCounts = truth.groupBy(identity).view.mapValues(_.size.toLong).toMap
    rows.foreach { case (item, cnt, err) =>
      val actual = trueCounts(item)
      assert(cnt >= actual, s"$item: upper bound $cnt < true $actual")
      assert(cnt - err <= actual, s"$item: lower bound ${cnt - err} > true $actual")
    }
  }

  test("hostile column names (quotes, dots, backticks) profile safely") {
    import spark.implicits._
    val df = Seq((1L, "x"), (2L, "y"))
      .toDF("user's id", "a.b`c")
    val p = Profile.profile(df, Seq("user's id", "a.b`c"))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(p == Map("user's id" -> 2L, "a.b`c" -> 2L))
  }
}
