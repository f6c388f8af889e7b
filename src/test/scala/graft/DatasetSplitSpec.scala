package graft

import graft.operators.DatasetSplit
import org.apache.spark.sql.functions._

class DatasetSplitSpec extends SparkSpec {

  private def docs = spark.read.parquet(s"$sf001/documents.parquet")

  test("every row gets a valid split, proportions near the weights") {
    val counts = docs
      .select(DatasetSplit.assign(col("text"),
        Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1)).as("split"))
      .groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = counts.values.sum.toDouble
    assert(counts.keySet == Set("train", "valid", "test"), counts.toString)
    assert(math.abs(counts("train") / n - 0.8) < 0.06, counts.toString)
    assert(math.abs(counts("valid") / n - 0.1) < 0.05, counts.toString)
  }

  test("assignment is deterministic and content-keyed: identical text, identical split") {
    val s = spark; import s.implicits._
    val twice = Seq((1L, "the same document"), (2L, "the same document"),
      (3L, "a different one")).toDF("id", "text")
      .select(col("id"), DatasetSplit.assign(col("text"),
        Seq("train" -> 0.9, "test" -> 0.1)).as("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(twice(1L) == twice(2L)) // exact dups can never straddle splits
    // and re-running the same expression yields the same assignment
    val again = Seq((1L, "the same document")).toDF("id", "text")
      .select(DatasetSplit.assign(col("text"), Seq("train" -> 0.9, "test" -> 0.1)))
      .head().getString(0)
    assert(again == twice(1L))
  }

  test("unnormalized weights normalize") {
    val s = spark; import s.implicits._
    val out = Seq((1L, "x")).toDF("id", "text")
      .select(DatasetSplit.assign(col("text"), Seq("a" -> 8.0, "b" -> 2.0)))
      .head().getString(0)
    assert(out == "a" || out == "b")
  }
}
