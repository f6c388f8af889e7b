package graft.operators

import graft.functions.{VectorFunctions => V}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDeDup — semantic deduplication via cluster-then-compare (Abbas et al.
  * 2023, arXiv:2303.09540): assign every embedding to its nearest centroid,
  * then look for near-duplicate pairs ONLY within a cluster, never across the
  * whole corpus. The clustering is what makes semantic dedup tractable at
  * scale — pairwise cost drops from n² to sum(cluster_size²), and each cluster
  * dedups independently (perfectly parallel over the cluster key).
  *
  * Where [[Dedup.embeddingNearDupPairs]] (d06) answers "which pairs are
  * near-dups" with recall governed by LSH tables/probes, SemDeDup answers
  * "which rows do I ship" with recall governed by centroid placement: a
  * cross-cluster near-dup pair is missed by design (the paper accepts this —
  * K trades recall against cost exactly like LSH plane count does). The two
  * compose: SemDeDup for the bulk semantic pass, d06/d07 for the exact-ish
  * near-dup sweep.
  *
  * Bit-reproducibility contract (the [[Clustering.kmeansStep]] stance, taken
  * one step further): every comparison this operator makes is exact. Vector
  * components are quantized once to integers (`round(x · 10⁶)` — far below
  * any semantic-similarity noise floor), after which
  *  - quantized dots and squared L2 distances are sums of integer products
  *    whose every partial sum stays under 2⁵³ (|x| ≤ ~11 suffices at dim 64),
  *    i.e. EXACT in double in any accumulation order, on any engine;
  *  - the pair cosine `dot / (sqrt(n2a) · sqrt(n2b))` is built only from
  *    IEEE-754 basic ops (mul/div/sqrt are correctly rounded everywhere), so
  *    its bits — and the ≥ eps verdict — are identical on every engine;
  *  - assignment argmin and the survivor rule compare integers.
  *  Unquantized floats would instead disagree across engines at ~1e-7
  *  (float32 normalization + accumulation order), enough to flip a cluster
  *  assignment or a threshold verdict on true near-ties.
  *
  * Determinism choices (same seams as [[Similarity.ivfTopK]]):
  *  - Centroids default to the `k` lowest-id vectors (k × dim driver collect —
  *    the bounded quantizer seam; swap in trained k-means centroids via the
  *    explicit-seeds overload without touching the rest). The paper sizes
  *    K ~ √n; scale K with the corpus to hold per-cluster pair cost.
  *  - Assignment is squared-L2 argmin with ties to the lowest centroid index
  *    (array_position returns the FIRST max) — the k-means geometry.
  *  - The survivor rule is integer-exact: within each ≥-eps pair the LOWER id
  *    survives, so a row is removed iff ANY lower-id row in its cluster sits
  *    within eps. The paper measured the keeper choice as immaterial (§4.1:
  *    random / closest / farthest to centroid performed alike);
  *    keep-lowest-id is the reproducible member of that family.
  *
  * Scale shape: assignment is map-only (centroids ride along as a literal
  * matrix, one fused dot pass per row — no join, no shuffle). The within-
  * cluster self-join shuffles the quantized vectors ONCE, keyed by the 8-byte
  * cluster id (self-join of one plan → ReusedExchange, so the corpus crosses
  * the fabric once — the honest floor for a pairwise compare); the removed-id
  * distinct and the final keep-flag join carry 8-byte ids only. */
object SemDedup {

  /** Component quantization: integers up to ~2²⁰ per unit of magnitude keep
    * 64-dim dot partial sums exact in double (headroom to |x| ≈ 11). */
  private val Quantum = 1e6

  /** Deterministic-seed entry point: centroids = the `k` lowest-id vectors. */
  def semDedup(df: DataFrame, idCol: String, vecCol: String,
               k: Int, eps: Double): DataFrame = {
    require(k >= 1, s"semDedup: k out of range: $k")
    val seeds: Array[Array[Double]] = quantized(df, idCol, vecCol)
      .orderBy(col("id")).limit(k)
      .select(col("qv")).collect()
      .map(_.getSeq[Double](0).toArray)
    semDedupQuantizedSeeds(df, idCol, vecCol, seeds, eps)
  }

  /** SemDeDup against explicit real-valued `centroids` (e.g. a trained
    * [[Clustering.kmeansStep]] matrix); they are quantized like the data. */
  def semDedup(df: DataFrame, idCol: String, vecCol: String,
               centroids: Array[Array[Double]], eps: Double): DataFrame =
    semDedupQuantizedSeeds(df, idCol, vecCol,
      // same half-away-from-zero rule as the SQL round() quantizing the data
      centroids.map(_.map(x => math.copySign(math.floor(math.abs(x * Quantum) + 0.5), x))), eps)

  /** Core pass over pre-quantized centroids.
    * Output: one row per input — `(id, cluster, kept)`; ship `kept` rows. */
  private def semDedupQuantizedSeeds(df: DataFrame, idCol: String, vecCol: String,
                                     qSeeds: Array[Array[Double]],
                                     eps: Double): DataFrame = {
    // exact integer ||seed||² per centroid (driver-side, k values)
    val seedN2: Array[Double] = qSeeds.map(_.map(x => x * x).sum)
    // map-only assignment: all centroid dots in one compiled pass; squared-L2
    // argmin == argmax of (2·dot − ||seed||²) since ||row||² is constant per
    // row — every score an exact integer, ties to the first (lowest) index
    val scores = transform(V.planeDots(col("qv"), qSeeds),
      (d, j) => d * 2 - get(lit(seedN2), j))
    val assigned = quantized(df, idCol, vecCol)
      .withColumn("cluster",
        (array_position(scores, array_max(scores)) - 1).cast("long"))
    // within-cluster pairwise: one cluster-keyed exchange of the quantized
    // vectors (reused for both join sides); the cosine compare is
    // bit-identical on any engine (exact dot, correctly-rounded sqrt/div)
    val a = assigned.select(col("cluster"), col("id").as("id_a"),
      col("qv").as("va"), col("n2").as("n2a"))
    val b = assigned.select(col("cluster"), col("id").as("id_b"),
      col("qv").as("vb"), col("n2").as("n2b"))
    val removed = a.join(b, Seq("cluster"))
      .where(col("id_a") < col("id_b") &&
        col("n2a") > 0 && col("n2b") > 0 &&
        V.dot(col("va"), col("vb")) / (sqrt(col("n2a")) * sqrt(col("n2b"))) >= eps)
      .select(col("id_b").as("id")).distinct()
    assigned.select(col("id"), col("cluster"))
      .join(removed.withColumn("_hit", lit(true)), Seq("id"), "left")
      .select(col("id"), col("cluster"),
        not(coalesce(col("_hit"), lit(false))).as("kept"))
  }

  /** `(id, qv, n2)`: integer-quantized components + exact squared norm. */
  private def quantized(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol).as("id"),
        transform(col(vecCol), x => round(x.cast("double") * Quantum)).as("qv"))
      .withColumn("n2", V.dot(col("qv"), col("qv")))
}
