package graft

import graft.operators.AsofJoin
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkSpec {

  test("lastAtOrBefore: latest right at-or-before each left ts; null when none precedes") {
    val s = spark; import s.implicits._
    val left = Seq((1L, 10L, "p1"), (1L, 20L, "p2"), (2L, 5L, "p3"), (3L, 9L, "p4"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, 10L, "r10"), (1L, 15L, "r15"), (1L, 25L, "r25"), (2L, 6L, "r6"))
      .toDF("k", "ts", "v")
    val out = AsofJoin.lastAtOrBefore(left, right, Seq("k"), "ts",
        struct(col("v")), "_m")
      .select(col("tag"), col("_m.v").as("v"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("p1") == "r10") // equal timestamp matches (at-or-before)
    assert(out("p2") == "r15") // latest of r10/r15, not the later r25
    assert(out("p3") == null)  // right rows for k=2 are all after ts=5
    assert(out("p4") == null)  // key with no right rows at all
  }

  test("lastAtOrBefore preserves all left rows and columns") {
    val s = spark; import s.implicits._
    val left = Seq((1L, 10L, "a", 1.5), (1L, 12L, "b", 2.5)).toDF("k", "ts", "tag", "x")
    val right = Seq((1L, 11L, 99L)).toDF("k", "ts", "rid")
    val out = AsofJoin.lastAtOrBefore(left, right, Seq("k"), "ts",
      struct(col("rid")), "_m")
    assert(out.count() == 2)
    assert(out.columns.toSet == Set("k", "ts", "tag", "x", "_m"))
  }
}
