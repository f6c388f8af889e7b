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

  /** Expression-level `let`: bind `value` once as a lambda variable and build the
    * body against that leaf. Without this, Catalyst's CollapseProject inlines a
    * projected subexpression into every one of its N use sites — for nested
    * vector expressions (buckets→dots→normalize) that multiplies tree size per
    * nesting level and stalls the optimizer for minutes. `transform(array(v),
    * x -> body)[0]` evaluates `value` exactly once per row and keeps every use a
    * leaf reference. */
  def letBind(value: Column)(body: Column => Column): Column =
    transform(array(value), v => body(v)).getItem(0)

  /** Σ aᵢ·bᵢ accumulated in double, in array order (deterministic). Compiled
    * expression — the zip_with+aggregate formulation boxes per element. */
  def dot(a: Column, b: Column): Column = HashExpressions.array_dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0 when either vector has zero norm. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val nn = norm(a) * norm(b)
    when(nn === 0.0, 0.0).otherwise(d / nn)
  }

  /** L2-normalize once up front so downstream cosine = plain dot — at scale this
    * halves the per-pair cost and should be materialized with the vectors.
    * The norm is letBind-bound: one evaluation per row, not per element. */
  def l2normalize(a: Column): Column =
    letBind(norm(a)) { n =>
      when(n === 0.0, a)
        .otherwise(transform(a, x => (x.cast("double") / n).cast("float")))
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
    * literal-array zip_with — no shuffle, no UDF.
    *
    * Single-table/few-planes use only: every plane adds a full zip_with tree, so
    * multi-table banding MUST go through [[signBucketsAll]] (one shared
    * expression) — building T×P of these blows up optimizer + codegen time. */
  def signBucket(vec: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val d = aggregate(
        zip_with(vec, typedLit(p.toSeq), (x, w) => x.cast("double") * w),
        lit(0.0), (acc, x) => acc + x)
      when(d >= 0.0, lit(1L << i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** Dot of `vec` against every hyperplane in ONE 2-D literal array — a single
    * `transform`, so tables×planes dots cost one modest expression tree instead
    * of T×P separate zip_with trees (which blow up optimizer + codegen time).
    * Materialize the result with `withColumn` before feeding [[bucketsFromDots]],
    * so the dots are computed once per row. */
  def planeDots(vec: Column, planes2d: Array[Array[Double]]): Column =
    HashExpressions.plane_dots(vec, planes2d)

  private def shl(c: Column, n: Column) = call_function("shiftleft", c, n)

  /** Table `t`'s sign-LSH bucket from a materialized dots column:
    * bucket(t) = Σ_i [dots(t·P+i) ≥ 0] << i. The ONE definition of the bucket
    * encoding — base buckets and probe flips must agree bit-for-bit, so both
    * [[bucketsFromDots]] and [[probeBucketsFromDots]] build on this. */
  private def baseBucket(dots: Column, planesPerTable: Int, t: Column): Column =
    aggregate(
      sequence(lit(0), lit(planesPerTable - 1)),
      lit(0L),
      (acc, i) => acc.bitwiseOR(
        when(element_at(dots, t * planesPerTable + i + 1) >= 0.0,
          shl(lit(1L), i)).otherwise(lit(0L))))

  /** Per-table sign-LSH bucket ids from a materialized dots column. Returns
    * `array<long>` of length `tables` — posexplode for (table, bucket) rows. */
  def bucketsFromDots(dots: Column, planesPerTable: Int, tables: Int): Column =
    transform(sequence(lit(0), lit(tables - 1)), t =>
      baseBucket(dots, planesPerTable, t))

  /** Multi-probe sign-LSH buckets (Lv et al., "Multi-Probe LSH", VLDB 2007):
    * per table, the base bucket PLUS the `probes` buckets at Hamming distance
    * 1 reached by flipping the LEAST-CONFIDENT sign bits — the planes whose
    * |dot| is smallest, i.e. exactly the bits most likely to differ between
    * two near-duplicates (a sign flip between near-identical vectors requires
    * both dots to sit near the plane). Returns
    * `array<struct<table:int, bucket:long>>` of length
    * `tables*(1+min(probes, planesPerTable))` — at most every bit of a table's
    * signature can be probed — ready to `explode` into probe rows.
    *
    * Scale shape: probing multiplies ONE side's bucket rows (and therefore
    * candidate generation) by `1+probes` — still linear in n — while per-table
    * recall grows from p^k toward p^k + Σ_probed k·p^(k-1)(1-p) without the
    * extra full hash tables that buying the same recall via `tables` would
    * cost. Ties in |dot| break on the plane index, so probe choice is
    * deterministic. */
  def probeBucketsFromDots(dots: Column, planesPerTable: Int, tables: Int,
                           probes: Int): Column = {
    val p = math.min(probes, planesPerTable)
    flatten(transform(sequence(lit(0), lit(tables - 1)), t =>
      letBind(baseBucket(dots, planesPerTable, t)) { base =>
        // (|dot|, bit) structs sort lexicographically: least-confident first
        val ranked = slice(
          array_sort(transform(sequence(lit(0), lit(planesPerTable - 1)), i =>
            struct(abs(element_at(dots, t * planesPerTable + i + 1)).as("conf"),
                   i.as("bit")))),
          1, p)
        concat(
          array(struct(t.as("table"), base.as("bucket"))),
          transform(ranked, r =>
            struct(t.as("table"),
              base.bitwiseXOR(shl(lit(1L), r.getField("bit"))).as("bucket"))))
      }))
  }
}
