package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Connected components over a pair list — the step that turns near-dup PAIRS
  * (Dedup.minhashPairs / ngramJaccardPairs / embeddingNearDupPairs) into dedup
  * CLUSTERS with one canonical survivor each. A pair list alone can't drive
  * deletion: if A~B and B~C, keeping "one of each pair" either deletes too much
  * or too little; the unit of deduplication is the component.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al., "Connected
  * Components in MapReduce and Beyond", SoCC 2014) — the published
  * shuffle-friendly formulation. Each phase is one aggregation + one join keyed
  * on 8-byte vertex ids; rounds converge in O(log² n) regardless of component
  * diameter, which is what makes it safe for 100 TB chain-shaped near-dup
  * graphs where naive min-label propagation needs O(diameter) rounds. State
  * between rounds is just the shrinking edge list; `localCheckpoint` truncates
  * the lineage so the plan doesn't grow with the round count.
  *
  * There is no reference analogue (the reference has no graph surface); the
  * operator exists for the training-data pipeline extension (SURVEY §7.1(7)).
  */
object Components extends org.apache.spark.internal.Logging {

  /** Resolve components of the undirected graph given by `(srcCol, dstCol)`
    * pairs. Output: one row per distinct vertex, `(vertex, component)` where
    * `component` is the smallest vertex id in its component. */
  def connectedComponents(pairs: DataFrame, srcCol: String, dstCol: String,
                          maxRounds: Int = 50): DataFrame =
    connectedComponentsWithRounds(pairs, srcCol, dstCol, maxRounds)._1

  /** As [[connectedComponents]] but also returns the convergence round count —
    * the test seam that lets ComponentsSpec pin the per-round action budget
    * without parsing logs. */
  private[graft] def connectedComponentsWithRounds(
      pairs: DataFrame, srcCol: String, dstCol: String,
      maxRounds: Int = 50): (DataFrame, Int) = {
    // Lazy checkpoints: the per-round checksum action materializes the
    // round's checkpoint as a side effect, so the redundant eager-checkpoint
    // count job (one full pass over the round's output, every round) is gone
    // — measured ~25% off d07 wall at sf0.1. The remaining per-round jobs are
    // AQE stage materialization, i.e. the round's actual shuffles; forcing
    // them into one job (AQE + auto-broadcast off → one sort-merge job per
    // round) was tried and measured 1.8-2x SLOWER at toy scale
    // (task-launch-dominated) while also discarding AQE's partition
    // coalescing, which is exactly what the shrinking edge list needs on a
    // real cluster. ComponentsSpec pins the invariants: no count-job per
    // round, and at most two job-running executions per round.
    var edges = pairs
      .select(col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(eager = false)

    var converged = false
    var round = 0
    var prevSum = checksum(edges)
    while (!converged && round < maxRounds) {
      val t0 = System.nanoTime()
      val next = smallStar(largeStar(edges)).localCheckpoint(eager = false)
      val nextSum = checksum(next)
      converged = nextSum == prevSum
      edges = next
      prevSum = nextSum
      round += 1
      logWarning(s"connectedComponents round $round: edges=${nextSum._1} " +
        f"${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxRounds rounds")

    // fixpoint is a star forest: every edge points (member -> root); roots
    // appear only on the v side, so add their self-rows.
    val labels = edges
      .select(col("u").as("vertex"), col("v").as("component"))
      .union(edges.select(col("v").as("vertex"), col("v").as("component")))
      .distinct()
    (labels, round)
  }

  /** Near-dup clusters from a pair list: `(id, cluster_id, cluster_size)` per
    * member, `cluster_id` = min member id (the canonical survivor — matching
    * the min-id keep rule of [[Dedup.exactGroups]]). */
  def clusters(pairs: DataFrame, idACol: String, idBCol: String): DataFrame = {
    val cc = connectedComponents(pairs, idACol, idBCol)
    val sizes = cc.groupBy(col("component")).agg(count(lit(1)).as("cluster_size"))
    cc.join(sizes, "component")
      .select(col("vertex").as("id"), col("component").as("cluster_id"),
        col("cluster_size"))
  }

  /** Large-star (Kiveris alg. 1): connect every neighbor larger than `u` to
    * `u`'s minimum neighborhood member. Strictly-larger emission keeps the
    * total edge count non-increasing while shortcutting long chains.
    *
    * The two `bidir` reads cannot share one exchange: the aggregate side
    * shuffles partial-aggregated rows (map-side combine) while the probe side
    * shuffles the `v > u` half of the raw pairs — different exchange inputs by
    * construction, so the probe-side filter placement is plan-neutral
    * (Catalyst pushes it below the join either way; verified on the physical
    * plan). The filter halves the probe side's shuffle volume instead. */
  private[operators] def largeStar(edges: DataFrame): DataFrame = {
    val bidir = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
    val m = bidir.groupBy("u").agg(min(col("v")).as("mv"))
      .select(col("u"), least(col("mv"), col("u")).as("m"))
    bidir.filter(col("v") > col("u"))
      .join(m, "u")
      .select(col("v").as("u"), col("m").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** Small-star (Kiveris alg. 2): orient edges toward the smaller endpoint,
    * then connect each node's smaller neighbors (and itself) to the minimum. */
  private[operators] def smallStar(edges: DataFrame): DataFrame = {
    val dir = edges.select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      .filter(col("u") =!= col("v"))
    val m = dir.groupBy("u").agg(min(col("v")).as("m")) // m < u by orientation
    dir.join(m, "u")
      .select(col("v").as("u"), col("m").as("v"))
      .union(m.select(col("u"), col("m").as("v")))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** Order-insensitive edge-set fingerprint — one tiny action per round.
    * XOR-fold (not sum) so ANSI overflow checking never trips; edges are
    * distinct, so cancellation can't produce false convergence. */
  private def checksum(edges: DataFrame): (Long, Long) = {
    val r = edges.agg(count(lit(1)),
      expr("bit_xor(xxhash64(u, v))")).head()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }
}
