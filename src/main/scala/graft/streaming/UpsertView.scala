package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming upsert-materialized view: a changelog stream folded into a
  * latest-state-per-key snapshot, micro-batch by micro-batch — the streaming
  * twin of `operators.Merge` and the shape a CDC feed takes on a lake with no
  * table format underneath (plain parquet, no Delta/Iceberg).
  *
  * Correctness across out-of-order batches: the snapshot keeps TOMBSTONES
  * (deleted keys stay, op='D') so a late update with an older sequence can
  * never resurrect a deleted key; the served view filters them. Winner per
  * key is max (seq, is-delete, tiebreak) — an associative/commutative max, so
  * folding batch-by-batch equals one global pass regardless of how the
  * changelog was chopped into micro-batches (MergeBatchSpec asserts this).
  *
  * Crash-safety without a table format: each micro-batch writes the FULL next
  * snapshot to a fresh `v=<batchId>` directory (never in place), so a replayed
  * batch (restart between sink write and checkpoint commit) overwrites its own
  * directory — idempotent; readers of version N are never disturbed. The
  * rewrite-the-world cost is the honest price of plain parquet; at 100 TB,
  * either partition the snapshot and rewrite only `Merge.touchedPartitions`,
  * or hand the problem to a table format's transactional commit.
  */
object UpsertView {

  /** Latest state per key of `base ∪ batch`: one window pass over the union,
    * ordered by (seq, is-delete, tiebreak) descending. Both inputs must carry
    * `keyCol`, `seqCol`, `opCol`, `tieCol`; tombstone rows are RETAINED. */
  def mergeBatch(base: DataFrame, batch: DataFrame, keyCol: String,
                 seqCol: String, opCol: String, tieCol: String,
                 deleteOp: String = "D"): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(seqCol).desc, (col(opCol) === deleteOp).desc, col(tieCol).desc)
    base.unionByName(batch)
      .withColumn("graft_rn", row_number().over(w))
      .where(col("graft_rn") === 1)
      .drop("graft_rn")
  }

  /** The `events` table as a changelog: `error` events delete the user's row,
    * anything else upserts it. seq is event-time micros; event_id breaks ties. */
  def eventsChangelog(events: DataFrame): DataFrame =
    // unix_micros, NOT cast("long"): casting a timestamp to long truncates to
    // SECONDS, which would collapse sub-second orderings onto the tiebreaks
    events.select(col("user_id"), unix_micros(col("ts")).as("seq"),
      col("event_id"),
      when(col("event_type") === "error", lit("D")).otherwise(lit("U")).as("op"),
      col("value"))

  /** Run the changelog stream to completion (AvailableNow), folding each
    * micro-batch into the next snapshot version (via [[graft.sinks.SnapshotStore]]'s
    * replay-idempotent commit protocol), and return the SERVED view (latest
    * version, tombstones filtered). */
  def runUpsertStream(spark: SparkSession, dir: String, snapDir: String,
                      checkpointDir: String): DataFrame = {
    import graft.sinks.SnapshotStore
    val q = eventsChangelog(EventsStream.readEvents(spark, dir)).writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val ss = batch.sparkSession
        // base = newest snapshot version BELOW this batch id: on replay the
        // half-written v=<batchId> dir is ignored and rebuilt from the same base
        val base = SnapshotStore.latest(ss, snapDir, maxId = Some(batchId - 1))
          .map { case (_, p) => SnapshotStore.read(ss, p) }
          .getOrElse(batch.toDF().where(lit(false)))
        SnapshotStore.write(
          mergeBatch(base, batch.toDF(), "user_id", "seq", "op", "event_id"),
          snapDir, batchId)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .start()
    q.awaitTermination()
    // snapDir and checkpointDir are a PAIR: batch ids come from the
    // checkpoint, so reusing a snapshot dir with a fresh checkpoint would
    // restart ids at 0 and serve whatever old version sorts last — always
    // create/retire them together.
    val latest = graft.sinks.SnapshotStore.versions(spark, snapDir).lastOption
      .getOrElse(throw new IllegalStateException(
        s"no committed snapshot version under $snapDir — empty source, " +
          "or a checkpoint that had already drained it"))._2
    spark.read.parquet(latest).where(col("op") =!= lit("D"))
      .select(col("user_id"), col("event_id"), col("value"))
  }
}
