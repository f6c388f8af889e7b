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
