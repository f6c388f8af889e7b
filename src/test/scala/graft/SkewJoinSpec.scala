package graft

import graft.operators.SkewJoin
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {

  test("salted inner join computes exactly the plain equi-join") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
    val o = spark.read.parquet(s"$sf0001/orders.parquet")
      .select(col("o_orderkey"), col("o_orderpriority"))
    val salted = SkewJoin.saltedInnerJoin(li, o,
      Seq("l_orderkey" -> "o_orderkey"), salts = 4,
      saltBy = Seq("l_orderkey", "l_linenumber"))
      .select("l_orderkey", "l_linenumber", "o_orderpriority")
    val plain = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .select("l_orderkey", "l_linenumber", "o_orderpriority")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("a hot key's rows spread across multiple salt buckets, deterministically") {
    val s = spark; import s.implicits._
    val hot = (1L to 200L).map(i => (42L, i)).toDF("k", "row_id")
    val buckets = hot
      .select(pmod(xxhash64(col("k"), col("row_id")), lit(8)).as("salt"))
      .distinct().count()
    assert(buckets > 4, s"hot key only landed in $buckets salt buckets")
    // deterministic: the same operator run twice matches row-for-row
    val small = Seq((42L, "x")).toDF("sk", "v")
    val a = SkewJoin.saltedInnerJoin(hot, small, Seq("k" -> "sk"), 8, Seq("row_id"))
      .orderBy("row_id").collect()
    val b = SkewJoin.saltedInnerJoin(hot, small, Seq("k" -> "sk"), 8, Seq("row_id"))
      .orderBy("row_id").collect()
    assert(a.toSeq == b.toSeq)
    assert(a.length == 200)
  }
}
