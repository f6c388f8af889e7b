package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector primitives over `array<float>` embedding columns, written as
  * Catalyst higher-order functions (`zip_with` + `aggregate`) — no UDF, so the dot
  * products stay inside the expression engine and distribute with the scan.
  *
  * Extension surface beyond the reference (which has no array types at all —
  * SURVEY §1.1/§1.2): similarity search over the `embeddings` table.
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ via zip_with + aggregate, computed in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0 when either vector has zero norm. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val nn = norm(a) * norm(b)
    when(nn === 0.0, 0.0).otherwise(d / nn)
  }

  /** L2-normalize once up front so downstream cosine = plain dot — at scale this
    * halves the per-pair cost and should be materialized with the vectors. */
  def l2normalize(a: Column): Column = {
    val n = norm(a)
    when(n === 0.0, a).otherwise(transform(a, x => (x.cast("double") / n).cast("float")))
  }

  def l2distance(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double"); d * d
      }),
      lit(0.0), (acc, x) => acc + x))

  /** Deterministic pseudo-random unit hyperplanes for sign-LSH, seeded — the same
    * planes on every executor and every run. */
  def hyperplanes(dim: Int, numPlanes: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(numPlanes) {
      val v = Array.fill(dim)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
  }

  /** Sign-LSH bucket id: one bit per hyperplane (random-projection LSH, Charikar
    * 2002). `planes` is a compile-time constant array, so each dot unrolls into a
    * literal-array zip_with — no shuffle, no UDF. */
  def signBucket(vec: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val d = aggregate(
        zip_with(vec, typedLit(p.toSeq), (x, w) => x.cast("double") * w),
        lit(0.0), (acc, x) => acc + x)
      when(d >= 0.0, lit(1L << i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
}
