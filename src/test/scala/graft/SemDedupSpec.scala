package graft

import graft.operators.SemDedup

class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  // Unit-circle fixture: seeds (the two lowest ids) sit on the axes, every
  // other vector at a hand-chosen angle. eps = 0.98 ≈ 11.5° of separation.
  //  0: 0°  (seed, cluster 0)         1: 90° (seed, cluster 1)
  //  2: 11.4° — dup of 0 (cos ≈ .98027 ≥ .98; acos(.98) = 11.478°) → removed
  //  3: 22.8° — dup of 2 ONLY (cos(0,3) ≈ .9219)  → removed via the chain:
  //     the greedy keep-lowest-id rule removes a row if ANY lower-id
  //     in-cluster row is within eps, even one that is itself removed
  //  4: 44° — cluster 0, nothing within eps there → kept
  //  5: 46° — cluster 1; cos(4,5) ≈ .9994 ≥ eps but CROSS-cluster → both
  //     kept (the documented SemDeDup miss: pairs split by the partition)
  //  6: 70° at radius 0.5 — cluster 1, nothing within eps              → kept
  //  7: 6 + ~4e-7 per component — SAME integers after the 1e-6
  //     quantization, so cos_q == 1.0 exactly                          → removed
  private def pt(deg: Double, r: Double = 1.0): Array[Float] = {
    val t = math.toRadians(deg)
    Array((r * math.cos(t)).toFloat, (r * math.sin(t)).toFloat)
  }
  private val vecs = Seq(
    0L -> pt(0), 1L -> pt(90), 2L -> pt(11.4), 3L -> pt(22.8),
    4L -> pt(44), 5L -> pt(46), 6L -> pt(70, 0.5),
    7L -> pt(70, 0.5).map(x => x + 4e-7f))
  private def df = vecs.toDF("vec_id", "embedding")

  private def run() = SemDedup.semDedup(df, "vec_id", "embedding", k = 2, eps = 0.98)
    .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap

  test("clusters, chain removal, cross-cluster miss, quantized-equality removal") {
    val got = run()
    val expect = Map(
      0L -> ((0L, true)), 2L -> ((0L, false)), 3L -> ((0L, false)),
      4L -> ((0L, true)),
      1L -> ((1L, true)), 5L -> ((1L, true)), 6L -> ((1L, true)),
      7L -> ((1L, false)))
    assert(got == expect, s"got $got")
  }

  test("explicit-centroid overload matches the lowest-id-seed default here") {
    val explicit = SemDedup.semDedup(df, "vec_id", "embedding",
        Array(Array(1.0, 0.0), Array(0.0, 1.0)), eps = 0.98)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(explicit == run())
  }

  test("result matches a driver-side exact recomputation (mini-oracle)") {
    // same contract, independently in plain Scala: quantize half-away at 1e6,
    // L2 argmin with lowest-index ties, removed iff any lower-id in-cluster
    // row has dot/(sqrt*sqrt) >= eps
    def q(v: Array[Float]): Array[Double] =
      v.map(x => math.copySign(math.floor(math.abs(x.toDouble * 1e6) + 0.5), x.toDouble))
    val qv = vecs.toMap.view.mapValues(q).toMap
    val seeds = vecs.sortBy(_._1).take(2).map(x => qv(x._1))
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    def cluster(id: Long): Int =
      seeds.zipWithIndex.minBy { case (s, i) =>
        (dot(qv(id), qv(id)) + dot(s, s) - 2 * dot(qv(id), s), i) }._2
    def cos(a: Long, b: Long) =
      dot(qv(a), qv(b)) / (math.sqrt(dot(qv(a), qv(a))) * math.sqrt(dot(qv(b), qv(b))))
    val ids = vecs.map(_._1)
    val expect = ids.map { id =>
      val c = cluster(id)
      val removed = ids.exists(o => o < id && cluster(o) == c && cos(o, id) >= 0.98)
      id -> ((c.toLong, !removed))
    }.toMap
    assert(run() == expect)
  }

  test("deterministic across executions") {
    assert(run() == run())
  }

  test("salted blocked self-join is output-invariant (forced multi-block)") {
    // targetBlockRows = 1 forces every cluster to fan out over
    // min(size, maxBlocks) hash blocks — the salted pair stream must
    // reproduce the unsalted output EXACTLY (salting is a skew/parallelism
    // fix, never a semantic knob)
    val salted = SemDedup.semDedup(df, "vec_id", "embedding", k = 2,
        eps = 0.98, targetBlockRows = 1, maxBlocks = 5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(salted == run())
  }

  test("k = 0 auto-sizes K = max(16, ceil(sqrt(n)))") {
    assert(SemDedup.autoK(0) == 16)
    assert(SemDedup.autoK(256) == 16)
    assert(SemDedup.autoK(257) == 17)
    assert(SemDedup.autoK(1000000) == 1000)
    // n = 8 here, so auto-K floors at 16 and limit(16) yields all 8 vectors
    // as seeds — identical to an explicit k = 8 run
    val auto = SemDedup.semDedup(df, "vec_id", "embedding", k = 0, eps = 0.98)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    val k8 = SemDedup.semDedup(df, "vec_id", "embedding", k = 8, eps = 0.98)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(auto == k8)
  }

  test("trained-centroid chain: kmeansStep centroids drive the explicit " +
       "overload, verified against a mini-oracle on the SAME centroids") {
    // x02 -> d11: one Lloyd step's (cluster, dim_idx, centroid) rows pivot
    // into the centroid matrix — the path the paper hangs recall on
    val step = graft.operators.Clustering
      .kmeansStep(df, "vec_id", "embedding", k = 2)
      .collect().map(r => (r.getLong(0).toInt, r.getLong(1).toInt, r.getDouble(3)))
    val cents = Array.ofDim[Double](2, 2)
    step.foreach { case (c, d, v) => cents(c)(d) = v }
    val got = SemDedup.semDedup(df, "vec_id", "embedding", cents, eps = 0.98)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    // mini-oracle: same quantization (half away from zero at 1e6), same
    // squared-L2 argmin with lowest-index ties, same survivor rule
    def qd(v: Array[Double]): Array[Double] =
      v.map(x => math.copySign(math.floor(math.abs(x * 1e6) + 0.5), x))
    def qf(v: Array[Float]): Array[Double] = qd(v.map(_.toDouble))
    val seeds = cents.map(qd)
    val qv = vecs.toMap.view.mapValues(qf).toMap
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    def cluster(id: Long): Int =
      seeds.zipWithIndex.minBy { case (s, i) =>
        (dot(qv(id), qv(id)) + dot(s, s) - 2 * dot(qv(id), s), i) }._2
    def cos(a: Long, b: Long) =
      dot(qv(a), qv(b)) / (math.sqrt(dot(qv(a), qv(a))) * math.sqrt(dot(qv(b), qv(b))))
    val ids = vecs.map(_._1)
    val expect = ids.map { id =>
      val c = cluster(id)
      val removed = ids.exists(o => o < id && cluster(o) == c && cos(o, id) >= 0.98)
      id -> ((c.toLong, !removed))
    }.toMap
    assert(got == expect, s"got $got expect $expect")
    // trained centroids must differ from the raw seeds (the step actually
    // moved them), or this test degenerates into the overload-equality one
    assert(cents(0).toSeq != Seq(1.0, 0.0) || cents(1).toSeq != Seq(0.0, 1.0))
  }

  test("runtime guard: ||qv||^2 >= 2^53 raises instead of silently losing " +
       "the exact-dot contract") {
    // q = 4000 * 1e6 = 4e9; q^2 = 1.6e19 >= 2^53 — one oversized component
    val bad = Seq(0L -> Array(4000f, 0f), 1L -> Array(0.5f, 0.5f))
      .toDF("vec_id", "embedding")
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + "|" + msgs(t.getCause)
    val e = intercept[Throwable] {
      SemDedup.semDedup(bad, "vec_id", "embedding", k = 1, eps = 0.9).collect()
    }
    assert(msgs(e).contains("2^53"), s"unexpected error: ${msgs(e).take(300)}")
    // same bound on explicit centroids, checked eagerly driver-side
    val e2 = intercept[IllegalArgumentException] {
      SemDedup.semDedup(df, "vec_id", "embedding",
        Array(Array(4e9, 0.0)), eps = 0.9)
    }
    assert(e2.getMessage.contains("2^53"))
  }
}
