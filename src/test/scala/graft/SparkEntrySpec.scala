package graft

import org.apache.spark.sql.functions._

/** Smoke coverage of the driver contract: every query runs at sf0.001 and the
  * flagship entry returns rows. (Value-level correctness is gated by the driver's
  * DuckDB compare at sf0.01 — locally reproduced by tools/compare_oracle.py.) */
class SparkEntrySpec extends SparkSpec {

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("queries and oracles are in exact 1:1 correspondence") {
    // as of round 3 EVERY query carries an exact oracle — pin it both ways so
    // a new operator cannot land without one (or an oracle outlive its query)
    val orphanOracles = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    val unoracled = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(orphanOracles.isEmpty, s"oracle without query: $orphanOracles")
    assert(unoracled.isEmpty, s"query without oracle: $unoracled")
  }

  test("all queries execute at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, sf0001).limit(1).collect(); None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("minhash pairs finds near-dup structure in the synthetic documents") {
    val pairs = SparkEntry.queries("d03_minhash_pairs")(spark, sf0001)
    // jaccard bounded and ids ordered
    val bad = pairs.filter(col("jaccard") > 1.0 || col("jaccard") < 0.0 ||
      col("id_a") >= col("id_b")).count()
    assert(bad == 0)
  }
}
