package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC snapshot merge — `MERGE INTO` semantics over immutable parquet. The
  * reference service re-extracts full result sets every run
  * (`DataIngestionJob.cs` has no notion of a changelog); pairing its
  * high-watermark incremental extraction (pipeline/Incremental.scala) with this
  * operator closes the loop: increments carry I/U/D change rows, and a periodic
  * merge collapses base + changelog into the next snapshot.
  *
  * Semantics (latest-wins): for each key, the change row with the highest
  * `seqCol` wins; any change beats the base row; a winning delete drops the key
  * from the snapshot. Keys never touched by the changelog pass through
  * unchanged.
  *
  * Scale design (100 TB base, ~GB-scale changelog):
  *  - ONE hash shuffle on the merge key: base and changelog are unioned first,
  *    so Spark plans a single Exchange + one window pass — never a join per
  *    change batch. At 1000 executors the base streams through; per-key state
  *    is the handful of candidate rows for that key.
  *  - The window frame is row_number over (priority, seq) desc — no full-key
  *    sort of the base beyond the shuffle's local sort, and map-side the
  *    changelog is negligible.
  *  - For partitioned snapshots, [[touchedPartitions]] computes which partition
  *    values the changelog hits; rewrite ONLY those partitions
  *    (`spark.sql.sources.partitionOverwriteMode=dynamic`) and leave the rest
  *    of the 100 TB untouched on disk — merge cost tracks the changelog, not
  *    the base.
  */
object Merge {

  /** Collapse `base` + `changes` into the next snapshot — ONE-SHOT semantics:
    * any change beats the base row regardless of sequence (sequences order
    * changes within this batch only), and tombstones are dropped from the
    * output. Correct when the base is ground truth older than every change;
    * for repeated folding across runs, where a replayed changelog with stale
    * sequences must lose to what a previous run already applied, use
    * [[snapshotState]] — it persists the winning sequence and tombstones.
    *
    * `changes` must carry the base's payload columns plus `opCol` (operation
    * code; rows equal to `deleteOp` are deletes, anything else upserts) and
    * `seqCol` (change order within the batch — a monotonic LSN/commit
    * timestamp; (key, seq) should be unique — on a tie the delete wins, by an
    * explicit is-delete tiebreak).
    */
  def snapshot(base: DataFrame, changes: DataFrame, keyCols: Seq[String],
               seqCol: String, opCol: String, deleteOp: String = "D"): DataFrame = {
    require(keyCols.nonEmpty, "merge needs at least one key column")
    val payload = base.columns.toSeq
    require(payload.forall(changes.columns.contains),
      s"changes must carry every base column; missing ${payload.filterNot(changes.columns.contains)}")
    // base rows rank below every change row; among changes, highest seq wins.
    val b = base.select(payload.map(col) :+ lit(0L).as("graft_pri") :+
      lit(0L).as("graft_seq") :+ lit("").as("graft_op"): _*)
    val c = changes.select(payload.map(col) :+ lit(1L).as("graft_pri") :+
      col(seqCol).cast("long").as("graft_seq") :+ col(opCol).as("graft_op"): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("graft_pri").desc, col("graft_seq").desc,
        (col("graft_op") === deleteOp).desc)
    b.unionByName(c)
      .withColumn("graft_rn", row_number().over(w))
      .where(col("graft_rn") === 1 && col("graft_op") =!= deleteOp)
      .select(payload.map(col): _*)
  }

  /** Cross-run-safe stateful snapshot: like [[snapshot]], but the stored shape
    * persists the winning sequence and operation per key (`graft_seq`,
    * `graft_op`) and RETAINS tombstones — so folding successive changelogs is
    * ordered by the changelog's OWN sequence column regardless of run order.
    * A replayed or out-of-order batch with stale sequences loses to the
    * persisted winner, and a deleted key can never be resurrected by a late
    * update with an older sequence (the same rule as
    * streaming `UpsertView.mergeBatch`, generalized to multi-column keys).
    *
    * `base` is either a previous snapshotState output (carries
    * `graft_seq`/`graft_op`) or a plain first-run base, whose rows enter at
    * sequence 0. On a sequence tie: delete wins, then the incoming change
    * beats the persisted row. Filter live rows with [[serve]]. Same
    * single-Exchange plan as [[snapshot]]. */
  def snapshotState(base: DataFrame, changes: DataFrame, keyCols: Seq[String],
                    seqCol: String, opCol: String,
                    deleteOp: String = "D"): DataFrame = {
    require(keyCols.nonEmpty, "merge needs at least one key column")
    val stateCols = Set("graft_seq", "graft_op")
    val payload = base.columns.toSeq.filterNot(stateCols)
    require(payload.forall(changes.columns.contains),
      s"changes must carry every base column; missing ${payload.filterNot(changes.columns.contains)}")
    val b =
      if (base.columns.contains("graft_seq"))
        base.select(payload.map(col) :+ col("graft_seq") :+ col("graft_op") :+
          lit(0L).as("graft_pri"): _*)
      else
        base.select(payload.map(col) :+ lit(0L).as("graft_seq") :+
          lit("").as("graft_op") :+ lit(0L).as("graft_pri"): _*)
    val c = changes.select(payload.map(col) :+
      col(seqCol).cast("long").as("graft_seq") :+
      col(opCol).as("graft_op") :+ lit(1L).as("graft_pri"): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("graft_seq").desc, (col("graft_op") === deleteOp).desc,
        col("graft_pri").desc)
    b.unionByName(c)
      .withColumn("graft_rn", row_number().over(w))
      .where(col("graft_rn") === 1)
      .select(payload.map(col) :+ col("graft_seq") :+ col("graft_op"): _*)
  }

  /** Live rows of a [[snapshotState]] snapshot (tombstones and state columns
    * are storage concerns, not serve-time ones). */
  def serve(snap: DataFrame, deleteOp: String = "D"): DataFrame =
    snap.where(col("graft_op") =!= deleteOp).drop("graft_seq", "graft_op")

  /** Distinct values of `partCol` the changelog touches — the partitions a
    * dynamic-overwrite merge must rewrite. Tiny result (collected or broadcast
    * by the caller); the distinct runs over the changelog only, and map-side
    * combine means the exchange carries just the distinct values. */
  def touchedPartitions(changes: DataFrame, partCol: String): DataFrame =
    changes.select(col(partCol)).distinct()

  /** SCD type-2 history: instead of collapsing to the latest state
    * ([[snapshot]]), KEEP every version as a validity interval —
    * `(payload..., valid_from, valid_to, is_current)` — the slowly-changing-
    * dimension shape time-travel joins (as-of lookups against "what was this
    * row worth then") need. Base rows open at sequence 0; each change closes
    * its predecessor's interval at its own sequence; a delete closes the
    * predecessor and contributes no row of its own, so a deleted key has no
    * current version.
    *
    * Same single key shuffle as [[snapshot]] (union + one window pass, `lead`
    * instead of `row_number`); the output grows with history length, which is
    * the point. `(key, seq)` must be unique — simultaneous changes have no
    * well-defined interval order. */
  def scd2(base: DataFrame, changes: DataFrame, keyCols: Seq[String],
           seqCol: String, opCol: String, deleteOp: String = "D"): DataFrame = {
    require(keyCols.nonEmpty, "scd2 needs at least one key column")
    val payload = base.columns.toSeq
    require(payload.forall(changes.columns.contains),
      s"changes must carry every base column; missing ${payload.filterNot(changes.columns.contains)}")
    val b = base.select(payload.map(col) :+ lit(0L).as("graft_seq") :+
      lit("").as("graft_op"): _*)
    val c = changes.select(payload.map(col) :+
      col(seqCol).cast("long").as("graft_seq") :+ col(opCol).as("graft_op"): _*)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col("graft_seq"))
    b.unionByName(c)
      .withColumn("graft_to", lead(col("graft_seq"), 1).over(w))
      .where(col("graft_op") =!= deleteOp)
      .select(payload.map(col) ++ Seq(
        col("graft_seq").as("valid_from"),
        col("graft_to").as("valid_to"),
        col("graft_to").isNull.cast("int").as("is_current")): _*)
  }
}
