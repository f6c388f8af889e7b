package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: binned vs sweep interval-overlap on the o04 fixture. */
object O04Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def windows(df: DataFrame, key: String, lo: String, hi: String) = df
      .select(col("o_orderkey").as(key),
        datediff(col("o_orderdate"), lit("1970-01-01")).cast("long").as(lo))
      .withColumn(hi, col(lo) + 3L)

    for (dir <- args) {
      val orders = spark.read.parquet(s"$dir/orders.parquet")
      val marchA = windows(
        orders.where(col("o_orderdate").between("1995-03-01", "1995-03-31")),
        "a_key", "a_lo", "a_hi")
      val allB = windows(orders, "b_key", "b_lo", "b_hi")

      def agg(j: DataFrame) = j.where(col("a_key") =!= col("b_key"))
        .groupBy(col("a_key").as("o_orderkey"))
        .agg(count(lit(1)).as("n_concurrent"))

      def time(tag: String, mk: => DataFrame): Unit = {
        // warmup then min of 2
        val ts = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          mk.write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"$dir $tag min=${ts.drop(1).min}%.2f all=${ts.map(t => f"$t%.2f").mkString(",")}")
      }

      val pairs = agg(graft.operators.RangeJoin.intervalOverlap(
        marchA, "a_lo", "a_hi", allB, "b_lo", "b_hi", 4L))
        .agg(sum("n_concurrent")).head().getLong(0)
      println(s"$dir genuine pairs = $pairs")

      time("binned  ", agg(graft.operators.RangeJoin.intervalOverlap(
        marchA, "a_lo", "a_hi", allB, "b_lo", "b_hi", 4L)))
      for (salt <- Seq(1, 8)) {
        time(s"sweep s$salt", agg(graft.operators.RangeJoin.intervalOverlapSweep(
          marchA, "a_lo", "a_hi", allB, "b_lo", "b_hi", 4L, salt)))
      }
      time("count   ", graft.operators.RangeJoin.intervalOverlapCount(
          marchA, "a_key", "a_lo", "a_hi", allB, "b_lo", "b_hi")
        .select(col("a_key").as("o_orderkey"),
          (col("overlap_count") - 1L).as("n_concurrent"))
        .where(col("n_concurrent") > 0))
    }
    spark.stop()
  }
}
