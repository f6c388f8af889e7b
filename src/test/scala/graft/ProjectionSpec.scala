package graft

import graft.operators.Projection
import graft.sources.Lake
import org.apache.spark.sql.functions._

class ProjectionSpec extends SparkSpec {
  import spark.implicits._

  test("driver-side sign matrix equals Spark SQL's md5 parity — the " +
       "engine-portability contract behind the oracle") {
    val grid = (1 to 64).flatMap(j => (1 to 16).map(k => (j, k))).toDF("j", "k")
    val fromSql = grid.select(col("j"), col("k"),
        when(substring(md5(concat(col("j").cast("string"), lit("_"),
          col("k").cast("string"))), 1, 1)
          .isin("0", "2", "4", "6", "8", "a", "c", "e"), 1L).otherwise(-1L)
          .as("s"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    for (j <- 1 to 64; k <- 1 to 16)
      assert(Projection.sign(j, k) == fromSql((j, k)), s"sign($j,$k)")
  }

  test("JL quality: projected-cosine error tracks the 1/sqrt(dOut) law — " +
       "monotone in dOut, and within the bound's headroom at dOut = 16") {
    val e = Lake.table(spark, sf0001, "embeddings")
    val orig = e.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      val n = math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum)
      if (n == 0) 0 else d / n
    }
    val ids = orig.keys.toSeq.sorted.take(30)
    def mae(dOut: Int): Double = {
      val proj = Projection.randomProject(e, "vec_id", "embedding", dOut = dOut)
        .collect().groupBy(_.getLong(0))
        .map { case (id, rs) =>
          id -> rs.sortBy(_.getInt(1)).map(_.getDouble(2))
        }
      val errs = for (i <- ids.indices; l <- (i + 1) until ids.size) yield
        math.abs(cos(orig(ids(i)), orig(ids(l))) -
          cos(proj(ids(i)), proj(ids(l))))
      errs.sum / errs.size
    }
    val (m4, m16, m36) = (mae(4), mae(16), mae(36))
    assert(m4 > m16 && m16 > m36,
      s"cosine error must shrink as dOut grows: $m4, $m16, $m36")
    // JL distortion ~ 1/sqrt(dOut); measured 0.19 at dOut=16 on this corpus
    assert(m16 < 1.0 / math.sqrt(16.0),
      s"mean |cos error| at dOut=16 out of JL range: $m16")
  }

  test("plan: the projection is a pure narrow map — zero exchanges") {
    val e = Lake.table(spark, sf0001, "embeddings")
    val plan = Projection.randomProject(e, "vec_id", "embedding")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"projection must fuse into the scan with no shuffle:\n$plan")
  }

  test("dOut must be a perfect square (binary-exact normalizer)") {
    val e = Lake.table(spark, sf0001, "embeddings")
    intercept[IllegalArgumentException] {
      Projection.randomProject(e, "vec_id", "embedding", dOut = 12)
    }
  }

  test("projectedVectors packs exactly randomProject's values (to float) " +
       "as the ANN-consumable column, with the same zero-exchange plan") {
    val e = Lake.table(spark, sf0001, "embeddings")
    val flat = Projection.randomProject(e, "vec_id", "embedding", dOut = 16)
      .collect().map(r => (r.getLong(0), r.getInt(1).toLong) -> r.getDouble(2).toFloat)
      .toMap
    val packed = Projection.projectedVectors(e, "vec_id", "embedding", dOut = 16)
    assert(!packed.queryExecution.executedPlan.toString.contains("Exchange"))
    packed.collect().foreach { r =>
      val id = r.getLong(0); val v = r.getSeq[Float](1)
      assert(v.length == 16)
      v.zipWithIndex.foreach { case (y, k0) =>
        assert(y == flat((id, k0 + 1L)), s"vec $id dim ${k0 + 1}")
      }
    }
  }
}
