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
  *    K ~ √n; `k = 0` ENFORCES that rule — K = max(16, ceil(√n)) — so
  *    per-cluster occupancy (and the Σ size² pair cost) holds ~√n as the
  *    corpus grows instead of silently going quadratic at a fixed K.
  *  - Assignment is squared-L2 argmin with ties to the lowest centroid index
  *    (array_position returns the FIRST max) — the k-means geometry.
  *  - The survivor rule is integer-exact: within each ≥-eps pair the LOWER id
  *    survives, so a row is removed iff ANY lower-id row in its cluster sits
  *    within eps. The paper measured the keeper choice as immaterial (§4.1:
  *    random / closest / farthest to centroid performed alike);
  *    keep-lowest-id is the reproducible member of that family.
  *
  * Scale shape: assignment is map-only (centroids ride along as a literal
  * matrix, one fused dot pass per row — no join, no shuffle). Cluster
  * populations come back as a K-row driver collect (the same bounded seam as
  * the centroid seeds) and pick between two within-cluster plans:
  *  - no cluster above `targetBlockRows`: plain cluster-keyed self-join —
  *    the quantized vectors cross the fabric ONCE (both sides read the same
  *    exchange, ReusedExchange; PlanSpec pins it);
  *  - any oversized cluster: a SALTED blocked self-join — each cluster's
  *    rows split into `nb = clamp(ceil(size / targetBlockRows), 1,
  *    maxBlocks)` hash blocks (a literal array indexed by cluster), one side
  *    lands at its own block, the other replicates across the cluster's
  *    `nb` blocks, and the join keys on `(cluster, block)`. Every unordered
  *    pair is still compared exactly once per orientation — output
  *    IDENTICAL to the unsalted join (property-pinned) — but a hot
  *    cluster's m² compares spread over `nb` tasks instead of serializing
  *    on one straggler partition.
  * That is the skew fix salting CAN buy; the Σ size² compare count itself is
  * the operator's semantics — the paper's documented trade — and is governed
  * only by K (hence the enforced √n rule, measured on a hot-cluster fixture
  * in SCALING_r10). The removed-id distinct and the final keep-flag join
  * carry 8-byte ids only. */
object SemDedup {

  /** Component quantization: integers up to ~2²⁰ per unit of magnitude keep
    * 64-dim dot partial sums exact in double (headroom to |x| ≈ 11). */
  private val Quantum = 1e6

  /** 2⁵³ — the largest double magnitude below which every integer is exact.
    * The bit-reproducibility contract needs every dot partial sum under this;
    * since partial sums of Σ qaᵢ·qbᵢ are bounded by √(‖qa‖²·‖qb‖²), enforcing
    * ‖qv‖² < 2⁵³ PER ROW (and per seed) is sufficient for every pairwise and
    * row-seed dot in the pass — checked at runtime, not left to the caller. */
  private val MaxExactN2 = 9007199254740992.0 // 2^53

  /** Deterministic-seed entry point: centroids = the `k` lowest-id vectors;
    * `k = 0` auto-sizes K = max(16, ceil(√n)) (the paper's K ~ √n rule — one
    * `count()` driver seam, same as [[Dedup.autoPlanes]]'s). */
  def semDedup(df: DataFrame, idCol: String, vecCol: String,
               k: Int, eps: Double,
               targetBlockRows: Int = 4096, maxBlocks: Int = 64): DataFrame = {
    require(k >= 0, s"semDedup: k out of range: $k")
    val kEff = if (k > 0) k else autoK(df.count())
    val seeds: Array[Array[Double]] = quantized(df, idCol, vecCol)
      .orderBy(col("id")).limit(kEff)
      .select(col("qv")).collect()
      .map(_.getSeq[Double](0).toArray)
    semDedupQuantizedSeeds(df, idCol, vecCol, seeds, eps,
      targetBlockRows, maxBlocks)
  }

  /** K ~ √n (Abbas et al. §3): expected cluster size √n, expected pair cost
    * Σ size² ≈ n^1.5 instead of n²; the floor keeps verify-scale corpora at
    * the oracle-pinned K = 16 configuration. */
  private[graft] def autoK(n: Long): Int =
    math.max(16, math.ceil(math.sqrt(math.max(0L, n).toDouble)).toInt)

  /** SemDeDup against explicit real-valued `centroids` (e.g. a trained
    * [[Clustering.kmeansStep]] matrix); they are quantized like the data. */
  def semDedup(df: DataFrame, idCol: String, vecCol: String,
               centroids: Array[Array[Double]], eps: Double): DataFrame =
    semDedupQuantizedSeeds(df, idCol, vecCol,
      // same half-away-from-zero rule as the SQL round() quantizing the data
      centroids.map(_.map(x => math.copySign(math.floor(math.abs(x * Quantum) + 0.5), x))),
      eps, 4096, 64)

  /** Core pass over pre-quantized centroids.
    * Output: one row per input — `(id, cluster, kept)`; ship `kept` rows. */
  private def semDedupQuantizedSeeds(df: DataFrame, idCol: String, vecCol: String,
                                     qSeeds: Array[Array[Double]],
                                     eps: Double,
                                     targetBlockRows: Int,
                                     maxBlocks: Int): DataFrame = {
    require(targetBlockRows >= 1 && maxBlocks >= 1,
      s"semDedup: block params out of range: $targetBlockRows/$maxBlocks")
    // exact integer ||seed||² per centroid (driver-side, k values); the same
    // 2^53 bound the data rows get checked against below
    val seedN2: Array[Double] = qSeeds.map(_.map(x => x * x).sum)
    seedN2.foreach(n2 => require(n2 < MaxExactN2,
      f"semDedup: centroid ||qv||^2 = $n2%.0f >= 2^53 — quantized magnitude " +
        "too large for the exact-dot contract (see scaladoc)"))
    // map-only assignment: all centroid dots in one compiled pass; squared-L2
    // argmin == argmax of (2·dot − ||seed||²) since ||row||² is constant per
    // row — every score an exact integer, ties to the first (lowest) index
    val scores = transform(V.planeDots(col("qv"), qSeeds),
      (d, j) => d * 2 - get(lit(seedN2), j))
    val assigned = quantized(df, idCol, vecCol)
      .withColumn("cluster",
        (array_position(scores, array_max(scores)) - 1).cast("long"))
    // cluster populations: a K-row driver seam (same bounded class as the
    // centroid-seed collect) that decides, per cluster, how many hash blocks
    // the within-cluster self-join fans out over. Costs one extra assignment
    // pass; buys the plan branch below.
    val k = qSeeds.length
    val sizeByCluster: Map[Int, Long] = assigned
      .groupBy(col("cluster")).agg(count(lit(1)).as("_n"))
      .collect().map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    val nbArr: Array[Int] = Array.tabulate(k)(c =>
      math.min(maxBlocks, math.max(1,
        math.ceil(sizeByCluster.getOrElse(c, 0L).toDouble / targetBlockRows).toInt)))
    // the cosine compare is bit-identical on any engine (exact dot,
    // correctly-rounded sqrt/div — see the class scaladoc contract)
    val pairFilter = (d: DataFrame) => d
      .where(col("id_a") < col("id_b") &&
        col("n2a") > 0 && col("n2b") > 0 &&
        V.dot(col("va"), col("vb")) / (sqrt(col("n2a")) * sqrt(col("n2b"))) >= eps)
      .select(col("id_b").as("id")).distinct()
    val removed =
      if (nbArr.forall(_ == 1)) {
        // no oversized cluster: the quantized vectors cross the fabric ONCE —
        // both self-join sides read the same cluster-keyed exchange
        // (ReusedExchange; PlanSpec pins it)
        val a = assigned.select(col("cluster"), col("id").as("id_a"),
          col("qv").as("va"), col("n2").as("n2a"))
        val b = assigned.select(col("cluster"), col("id").as("id_b"),
          col("qv").as("vb"), col("n2").as("n2b"))
        pairFilter(a.join(b, Seq("cluster")))
      } else {
        // salted blocked self-join: per-cluster block count rides along as a
        // LITERAL array indexed by cluster (no extra join). Side b lands at
        // its own hash block; side a replicates across the cluster's nb
        // blocks, so the join on (cluster, _blk) reproduces the plain
        // cluster join's pair stream EXACTLY (both orientations once;
        // id_a < id_b keeps one) while a hot cluster's pair work fans out
        // over nb tasks instead of one straggler partition. The price is the
        // second exchange (no reuse across differing sides) plus nb-fold
        // replication of oversized clusters' vectors — paid only under skew,
        // by this branch.
        val nbCol = get(lit(nbArr), col("cluster").cast("int"))
        val a = assigned.select(col("cluster"),
          explode(sequence(lit(0), nbCol - 1)).as("_blk"),
          col("id").as("id_a"), col("qv").as("va"), col("n2").as("n2a"))
        val b = assigned.select(col("cluster"),
          pmod(xxhash64(col("id")), nbCol).cast("int").as("_blk"),
          col("id").as("id_b"), col("qv").as("vb"), col("n2").as("n2b"))
        pairFilter(a.join(b, Seq("cluster", "_blk")))
      }
    assigned.select(col("id"), col("cluster"))
      .join(removed.withColumn("_hit", lit(true)), Seq("id"), "left")
      .select(col("id"), col("cluster"),
        not(coalesce(col("_hit"), lit(false))).as("kept"))
  }

  /** `(id, qv, n2)`: integer-quantized components + exact squared norm.
    * The norm doubles as the runtime guard for the exact-dot contract: a row
    * whose ‖qv‖² reaches 2⁵³ would silently void bit-reproducibility (dot
    * partial sums are bounded by √(‖qa‖²·‖qb‖²)), so it raises instead —
    * the guard rides the n2 column, which every downstream compare consumes,
    * so column pruning can never elide it. */
  private def quantized(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol).as("id"),
        transform(col(vecCol), x => round(x.cast("double") * Quantum)).as("qv"))
      .withColumn("n2", {
        val n2 = V.dot(col("qv"), col("qv"))
        when(n2 < lit(MaxExactN2), n2).otherwise(raise_error(concat(
          lit("semDedup: ||qv||^2 >= 2^53 for id "), col("id").cast("string"),
          lit(" — component magnitude breaks the exact-dot contract"))))
      })
}
