package graft

import graft.operators.Drift
import org.apache.spark.sql.functions._

/** PSI drift-report semantics: smoothing, sign, and the zero-drift anchor. */
class DriftSpec extends SparkSpec {
  import spark.implicits._

  private def report(ref: Seq[Long], cur: Seq[Long]) =
    Drift.psi(ref.toDF("bin").withColumn("bin", col("bin")),
      cur.toDF("bin"), "bin")
      .as[(Long, Long, Long, Double, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap

  test("identical snapshots drift exactly zero, term by term") {
    val d = Seq(1L, 1L, 2L, 3L, 3L, 3L)
    val got = report(d, d)
    assert(got.size == 3)
    got.values.foreach { case (_, refN, curN, refP, curP, term, total) =>
      assert(refN == curN); assert(refP == curP)
      assert(term == 0.0); assert(total == 0.0)
    }
  }

  test("bins absent from one snapshot survive via add-one smoothing") {
    // ref has bin 9 that cur lacks, cur has bin 7 that ref lacks
    val got = report(Seq(1L, 1L, 9L), Seq(1L, 1L, 7L))
    assert(got.keySet == Set(1L, 7L, 9L))
    val (_, refN9, curN9, refP9, curP9, _, _) = got(9L)
    assert(refN9 == 1L && curN9 == 0L)
    // smoothed: (1+1)/(3+3) and (0+1)/(3+3) — finite, nonzero
    assert(refP9 == 2.0 / 6.0 && curP9 == 1.0 / 6.0)
    // every term of a PSI is nonnegative ((p-q) and ln(p/q) share sign)
    got.values.foreach { case (_, _, _, _, _, term, total) =>
      assert(term >= 0.0); assert(total > 0.0)
    }
  }

  test("psi_total is the exact decimal sum of the per-bin terms and every " +
       "term is nonnegative on a skewed pair of snapshots") {
    val ref = (1L to 400L).map(i => i % 7)
    val cur = (1L to 300L).map(i => (i * i) % 5)
    val rows = report(ref, cur).values.toSeq
    val total = rows.head._7
    rows.foreach { r =>
      assert(r._6 >= 0.0)
      assert(r._7 == total) // repeated on every row
    }
    val summed = rows.map(r => BigDecimal(r._6)).sum
    assert(BigDecimal(total) == summed)
  }
}
