package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed-table utilities — the co-located-join half of the 100 TB story.
  *
  * A fact table bucketed (and sorted) on its join key, joined to another table
  * bucketed on the same key with the same bucket count, plans as a sort-merge
  * join with **zero Exchange** on the bucketed side(s): partitioning is baked
  * into the table layout at write time, so the shuffle that dominates large
  * joins disappears from every downstream query that joins on the bucket key.
  * This is Spark's answer to the pre-partitioned layouts a 100 TB lake needs
  * (PlanSpec asserts the no-Exchange property).
  *
  * The reference has no notion of layout at all — it materializes whole result
  * sets in memory (`PipelineContext.cs:11-13`); bucketing is the lake-native
  * replacement for "let the source DB handle big joins".
  */
object Bucketing {

  /** Write `df` as a managed bucketed table, bucketed AND sorted by `keyCols`.
    * Sorting within buckets lets the sort-merge join skip its sort step too. */
  def writeBucketed(df: DataFrame, table: String,
                    keyCols: Seq[String], buckets: Int): Unit =
    df.write
      .bucketBy(buckets, keyCols.head, keyCols.tail: _*)
      .sortBy(keyCols.head, keyCols.tail: _*)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)
}
