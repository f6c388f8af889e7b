package graft

import graft.operators.Clustering

class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  // two obvious blobs in 2-d: four points near (0,0), four near (10,10);
  // seeds (the two lowest ids) start one in each blob.
  private val blobs = Seq(
    (0L, Array(0.0f, 0.5f)), (2L, Array(0.5f, 0.0f)),
    (4L, Array(0.0f, 0.0f)), (6L, Array(0.5f, 0.5f)),
    (1L, Array(10.0f, 10.5f)), (3L, Array(10.5f, 10.0f)),
    (5L, Array(10.0f, 10.0f)), (7L, Array(10.5f, 10.5f))
  ).toDF("vec_id", "embedding")

  test("one Lloyd step assigns the blobs correctly and emits exact means") {
    val got = Clustering.kmeansStep(blobs, "vec_id", "embedding", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    // cluster 0 seeded at (0,0.5) owns the low blob; cluster 1 the high blob
    assert(got((0L, 0L)) == ((4L, 0.25)) && got((0L, 1L)) == ((4L, 0.25)))
    assert(got((1L, 0L)) == ((4L, 10.25)) && got((1L, 1L)) == ((4L, 10.25)))
  }

  test("chained steps are a fixed point once blobs are separated, and deterministic") {
    def matrixOf(step: org.apache.spark.sql.DataFrame): Array[Array[Double]] =
      step.orderBy("cluster", "dim_idx").collect()
        .groupBy(_.getLong(0)).toSeq.sortBy(_._1)
        .map(_._2.sortBy(_.getLong(1)).map(_.getDouble(3)))
        .toArray
    val step1 = matrixOf(Clustering.kmeansStep(blobs, "vec_id", "embedding", k = 2))
    val step2 = matrixOf(Clustering.kmeansStep(blobs, "embedding", step1))
    assert(step1.map(_.toSeq).toSeq == step2.map(_.toSeq).toSeq,
      s"separated blobs must be a Lloyd fixed point: ${step1.map(_.toSeq).toSeq} vs ${step2.map(_.toSeq).toSeq}")
    // re-running the same step reproduces bit-identical centroids
    val again = matrixOf(Clustering.kmeansStep(blobs, "vec_id", "embedding", k = 2))
    assert(step1.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("populations are consistent across dims and sum to the corpus size") {
    val one = blobs.where($"vec_id" % 2 === 0) // low blob only, seeds both inside
    val rows = Clustering.kmeansStep(one, "vec_id", "embedding", k = 2).collect()
    // one row per (cluster, dim); each cluster reports the same n on both
    // dims; totals cover all 4 vectors (empty clusters emit no rows)
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).distinct.length == rows.length)
    val byCluster = rows.groupBy(_.getLong(0)).map { case (c, rs) =>
      c -> rs.map(_.getLong(2)).distinct }
    assert(byCluster.values.forall(_.length == 1))
    assert(byCluster.values.map(_.head).sum == 4L)
  }
}
