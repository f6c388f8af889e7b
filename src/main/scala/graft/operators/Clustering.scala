package graft.operators

import graft.functions.{VectorFunctions => V}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed k-means (Lloyd) over an embedding column — the clustering pass
  * behind IVF cell placement, corpus domain discovery, and diversity-aware
  * sampling.
  *
  * One Lloyd iteration = assign (map-only: centroids ride along as a literal
  * matrix, each vector scores all centroids in one compiled pass — no join, no
  * shuffle) + update (one aggregation keyed by (cluster, dimension) — partial
  * aggregation collapses each partition to k×dim cells before the exchange,
  * so a 100 TB corpus shuffles k×dim×partitions tiny cells, never vectors).
  *
  * Determinism is the deliberate twist on textbook Lloyd: float means vary
  * with accumulation order, which is why `Similarity.ivfTopK` ships an
  * id-sampled quantizer. Here the mean's numerator is an EXACT decimal sum of
  * the float components — order-independent, so the updated centroids are
  * bit-identical on every run, any partitioning, and any engine (the DuckDB
  * oracle recomputes them). Assignment breaks score ties toward the lowest
  * cluster id. Chain `kmeansStep` k times for full training; each step stays
  * deterministic, so the whole training run is reproducible — the property
  * that makes an IVF index rebuild yield the same cells twice.
  */
object Clustering {

  /** One deterministic Lloyd iteration. Seeds are the `k` lowest-id vectors;
    * assignment minimizes L2 distance via the argmax of `a·c - |c|²/2`
    * (monotone-equivalent, one fused dot pass per row).
    *
    * Returns the updated centroids, one row per (cluster, dim_idx):
    * `(cluster, dim_idx, n, centroid)` with `n` the cluster population and
    * `centroid` the exact-decimal mean rounded to 6 decimals. */
  def kmeansStep(df: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    require(k >= 1, s"kmeansStep: k out of range: $k")
    // deterministic seeds: the k lowest-id vectors (tiny driver collect —
    // k × dim doubles, the same seam ivfTopK uses)
    val seeds: Array[Array[Double]] = df.orderBy(col(idCol)).limit(k)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).toArray.map(_.toDouble))
    kmeansStep(df, vecCol, seeds)
  }

  /** Lloyd iteration against explicit `centroids` — chain it: feed the
    * previous step's `(cluster, dim_idx, centroid)` rows back in as the next
    * step's matrix. */
  def kmeansStep(df: DataFrame, vecCol: String,
                 centroids: Array[Array[Double]]): DataFrame = {
    val cents2d = centroids
    val cnorm2Half: Array[Double] = cents2d.map(c => c.map(x => x * x).sum / 2)
    val scores = transform(V.planeDots(col(vecCol), cents2d),
      (d, j) => d - get(lit(cnorm2Half), j))
    val cluster = (array_position(scores, array_max(scores)) - 1).cast("long")
    df.select(cluster.as("cluster"), posexplode(col(vecCol)).as(Seq("dim_idx", "v")))
      .groupBy(col("cluster"), col("dim_idx").cast("long").as("dim_idx"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("v").cast("decimal(27,10)")).cast("double") / count(lit(1)), 6)
          .as("centroid"))
  }
}
