package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits (known Morton codes)") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (3L, 5L))
      .toDF("x", "y")
      .select(Layout.zValue(Seq(col("x"), col("y")), bits = 4).as("z"))
    // morton(x,y) with x in even bits, y in odd: (3,5) = 0b11,0b101 ->
    // bits: x0=1->b0, y0=1->b1, x1=1->b2, y1=0, x2=0, y2=1->b5 = 100111b = 39
    assert(df.as[Long].collect().toSeq == Seq(0L, 1L, 2L, 3L, 39L))
  }

  test("rangeBucket scales and clamps") {
    val df = Seq(-5.0, 0.0, 49.9, 99.9, 250.0).toDF("v")
      .select(Layout.rangeBucket(col("v"), 0.0, 100.0, bits = 8).as("b"))
    val bs = df.as[Long].collect().toSeq
    assert(bs.head == 0L && bs.last == 255L) // clamped
    assert(bs(2) == (49.9 * 2.56).floor.toLong)
  }

  test("z-ordered files prune on parquet stats: a y-filter reads a fraction of rows") {
    // The payoff z01 computes the key FOR: on plain parquet, Spark prunes at
    // the ROW-GROUP level from footer min/max stats of pushed filters. An
    // x-sorted layout leaves y scattered — every row group spans all of y, so
    // a y-predicate reads the whole table; z-ordered files each cover a small
    // (x, y) hyper-rectangle, so most row groups are skipped on that same
    // predicate. Asserted on the scan's numOutputRows metric (= rows read
    // from surviving row groups, before Spark's residual Filter).
    val base = graft.util.Scratch.dir("graft-zorder-payoff")
    try {
      val n = 100000L
      val df = spark.range(n).select(
        pmod(xxhash64($"id"), lit(1000L)).as("x"),
        pmod(xxhash64($"id" + 7), lit(1000L)).as("y"),
        $"id".as("payload"))
      df.repartitionByRange(8, col("x")).sortWithinPartitions("x")
        .write.parquet(s"$base/by_x")
      Layout.zOrder(df, Seq(("x", 0.0, 1000.0), ("y", 0.0, 1000.0)), numFiles = 8)
        .write.parquet(s"$base/by_z")

      val conf = spark.conf
      val savedAqe = conf.get("spark.sql.adaptive.enabled")
      conf.set("spark.sql.adaptive.enabled", "false") // plain plan -> scan leaf
      try {
        def scanRows(path: String): (Long, Long) = {
          val q = spark.read.parquet(path).where(col("y") >= 100 && col("y") < 150)
          val out = q.collect().length.toLong // executes THIS plan -> metrics live
          val scan = q.queryExecution.executedPlan.collectLeaves()
            .find(_.nodeName.contains("Scan")).get
          (scan.metrics("numOutputRows").value, out)
        }
        val (readX, outX) = scanRows(s"$base/by_x")
        val (readZ, outZ) = scanRows(s"$base/by_z")
        assert(outX == outZ, "layouts must return identical results")
        // x-sorted: no row group can be skipped on y (each spans all of y)
        assert(readX == n, s"expected the x-sorted scan to read all $n rows, got $readX")
        // z-ordered: most row groups skip a 5%-of-range y predicate
        assert(readZ <= n / 2,
          s"z-ordered scan read $readZ rows; stats pruning should skip most row groups")
      } finally conf.set("spark.sql.adaptive.enabled", savedAqe)
    } finally graft.util.Scratch.deleteRecursively(base)
  }

  test("z-ordered layout clusters BOTH dimensions; single-column sort does not") {
    // uniform 2-d grid; 16 output partitions
    val grid = for { x <- 0 until 128; y <- 0 until 128 }
      yield (x.toDouble, y.toDouble)
    val df = grid.toDF("x", "y")
    val dims = Seq(("x", 0.0, 128.0), ("y", 0.0, 128.0))

    def avgSpreadPerPartition(d: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val s = d.withColumn("pid", spark_partition_id())
        .groupBy("pid")
        .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
        .agg(avg("sx"), avg("sy")).as[(Double, Double)].head()
      s
    }

    val z = Layout.zOrder(df, dims, numFiles = 16)
    val (zx, zy) = avgSpreadPerPartition(z)
    val lex = df.repartitionByRange(16, col("x")).sortWithinPartitions("x")
    val (_, ly) = avgSpreadPerPartition(lex)

    // x-sorted layout leaves y unclustered (full 127 spread); z-order bounds both
    assert(ly > 120.0, s"lex y-spread $ly")
    assert(zx < 64.0 && zy < 64.0, s"z spreads ($zx, $zy) should be < half the range")
  }
}
