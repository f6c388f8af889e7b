package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic train/valid/test assignment for training-data pipelines.
  *
  * The bucket is content-keyed — the first 8 hex digits of `md5(key)` scaled
  * to [0,1) — NOT `rand()`: the assignment is a pure function of the row, so
  * it survives repartitioning, task retry, re-runs, engine changes, and
  * incremental appends (a new batch of documents lands in the same split
  * distribution without reading old data). That idempotence is the property a
  * 100 TB corpus actually needs from a splitter; a seeded `rand()` has none of
  * it.
  *
  * Keying on document *content* also makes exact duplicates land in the same
  * split — dedup-before-split remains best practice, but leakage from exact
  * dups is structurally impossible here. Key on a stable id instead when
  * near-dup leakage is handled elsewhere.
  */
object DatasetSplit {

  /** Assignment expression: `splits` are (name, weight) pairs; weights are
    * normalized. Rows map to names by cumulative weight over the md5 bucket. */
  def assign(key: Column, splits: Seq[(String, Double)]): Column = {
    require(splits.nonEmpty && splits.forall(_._2 > 0), "positive split weights required")
    val total = splits.map(_._2).sum
    // first 8 hex digits of md5 -> 32-bit value -> [0, 1)
    val bucket = conv(substring(md5(encode(key, "UTF-8")), 1, 8), 16, 10)
      .cast("double") / 4294967296.0
    val cums = splits.map(_._2 / total).scanLeft(0.0)(_ + _).tail
    splits.zip(cums).dropRight(1)
      .foldLeft(when(lit(false), null): Column) { case (acc, ((name, _), cum)) =>
        acc.when(bucket < cum, name)
      }
      .otherwise(splits.last._1)
  }
}
