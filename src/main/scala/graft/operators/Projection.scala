package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss random projection — the dimensionality-reduction
  * step in front of similarity search at corpus scale: project `array<float>`
  * embeddings from dIn to dOut dimensions with a ±1 sign matrix (Achlioptas,
  * "Database-friendly random projections", PODS 2001 — ±1 entries scaled by
  * 1/√dOut preserve pairwise distances in expectation), so the downstream
  * ANN passes (s01–s03, d06) pay dOut-wide dots and dOut-wide shuffles
  * instead of dIn-wide ones. The reference has no array types at all
  * (SURVEY §1.1); this extends the similarity-search surface.
  *
  * Scale shape: the sign matrix is dOut × dIn literals compiled into ONE
  * `transform` expression (the [[SemDedup]] centroid-seed / [[Dedup]] plane
  * pattern — a model-bounded driver seam), so the projection is a pure
  * narrow map fused into the scan: ZERO exchanges at any corpus size
  * (plan-pinned in ProjectionSpec).
  *
  * Determinism (the [[SemDedup]] exact-arithmetic contract): components
  * quantize to integers (round half-away at 1e6), the per-dimension sums
  * Σⱼ ±qxⱼ are exact LONG arithmetic — order-free — and the single final
  * division by `1e6·√dOut` (with √dOut enforced integral, so the divisor is
  * binary-exact) is one IEEE op. The sign for (j,k) is the parity of the
  * first hex digit of `md5("j_k")` (1-based indices) — a hash every engine
  * reproduces, which is what makes the plain-SQL oracle bit-exact. */
object Projection {

  /** Same quantum as [[SemDedup]]: |x| ≲ 11 keeps 64-dim sums exact. */
  private val Quantum = 1e6

  /** ±1 from md5 parity — identical to `md5(j || '_' || k)` in SQL. */
  private[graft] def sign(j: Int, k: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"${j}_${k}".getBytes("UTF-8"))
    // first hex digit = high nibble of byte 0
    if (((hex(0) >> 4) & 1) == 0) 1L else -1L
  }

  /** Flat projection rows `(id, k, y)`, k in 1..dOut:
    * `y_k = (Σⱼ sign(j,k)·round(xⱼ·1e6)) / (1e6·√dOut)`.
    * `dOut` must be a perfect square so the normalizer is binary-exact.
    * Vectors shorter than `dIn` project to NULL (zip_with pads), surfacing
    * bad input instead of silently truncating. */
  def randomProject(df: DataFrame, idCol: String, vecCol: String,
                    dIn: Int = 64, dOut: Int = 16): DataFrame = {
    require(dIn >= 1 && dOut >= 1, s"bad dims: $dIn -> $dOut")
    val root = math.sqrt(dOut.toDouble)
    require(root == math.rint(root),
      s"dOut = $dOut must be a perfect square: the 1/sqrt(dOut) normalizer " +
        "must be binary-exact for the bit-reproducibility contract")
    val signs: Seq[Seq[Long]] =
      Seq.tabulate(dOut, dIn)((k, j) => sign(j + 1, k + 1))
    val qx = transform(col(vecCol),
      x => round(x.cast("double") * Quantum).cast("long"))
    val qsums: Column = transform(typedLit(signs), srow =>
      aggregate(zip_with(col("_qx"), srow, (a, b) => a * b),
        lit(0L), (acc, v) => acc + v))
    df.select(col(idCol).as("id"), qx.as("_qx"))
      .select(col("id"), posexplode(qsums).as(Seq("k0", "qsum")))
      .select(col("id").as(idCol), (col("k0") + 1).as("k"),
        (col("qsum").cast("double") / lit(Quantum * root)).as("y"))
  }

  /** The same projection packed as a VECTOR column `(idCol, <vecCol>_proj:
    * array<float>)` — the shape the ANN operators consume, so x03 chains
    * directly into s01/s02/d06 (project 64 → dOut dims, then search the
    * short vectors). Identical narrow-map shape and arithmetic as
    * [[randomProject]], without the row explode. */
  def projectedVectors(df: DataFrame, idCol: String, vecCol: String,
                       dIn: Int = 64, dOut: Int = 16): DataFrame = {
    require(dIn >= 1 && dOut >= 1, s"bad dims: $dIn -> $dOut")
    val root = math.sqrt(dOut.toDouble)
    require(root == math.rint(root),
      s"dOut = $dOut must be a perfect square: the 1/sqrt(dOut) normalizer " +
        "must be binary-exact for the bit-reproducibility contract")
    val signs: Seq[Seq[Long]] =
      Seq.tabulate(dOut, dIn)((k, j) => sign(j + 1, k + 1))
    val qx = transform(col(vecCol),
      x => round(x.cast("double") * Quantum).cast("long"))
    val qsums: Column = transform(typedLit(signs), srow =>
      aggregate(zip_with(col("_qx"), srow, (a, b) => a * b),
        lit(0L), (acc, v) => acc + v))
    df.select(col(idCol).as("id"), qx.as("_qx"))
      .select(col("id").as(idCol),
        transform(qsums,
          q => (q.cast("double") / lit(Quantum * root)).cast("float"))
          .as(s"${vecCol}_proj"))
  }
}
