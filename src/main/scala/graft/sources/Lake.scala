package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Lake-table catalog over the driver-generated parquet test lake.
  *
  * The reference delegates all relational work to the source RDBMS — the whole SQL
  * text is shipped to SQL Server / Oracle (reference
  * `src/Worker/Jobs/DataIngestionJob.cs:84-112`,
  * `src/Infrastructure/DataExtraction/SqlServerDataSource.cs:55-59`). Spark-first, the
  * equivalent query surface is: register each lake table as a temp view once, then let
  * `spark.sql` / DataFrame ops plan against the parquet scans. Predicate pushdown,
  * column pruning and partition pruning then come free from Catalyst, replacing the
  * remote database's optimizer.
  *
  * At 100 TB the only change is the path: these would be partitioned/bucketed
  * catalog tables (`spark.table(name)`) instead of loose parquet files; every
  * downstream operator in this library is written against the DataFrame, not the
  * path, so nothing else changes.
  */
object Lake {
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // The events table's `ts` contract is a UTC instant (TimestampType), but
    // lake files come from mixed writers: the driver-generated lake stores
    // TIMESTAMP(NANOS), which Spark reads only as raw nanos-since-epoch longs
    // (spark.sql.legacy.parquet.nanosAsLong=true — set by Verify/Bench/test
    // sessions); other engines write TIMESTAMP_NTZ with UTC wall-clock values.
    // Normalize both to TimestampType (micros) so every downstream time op
    // sees one type regardless of who wrote the file.
    if (name == "events") df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
    else df
  }

  // once-per-(session, dir) memo for registerAll: temp-view registration is
  // session-global state, and concurrent registerAll calls from a thread pool
  // (Verify's SPARK_GRAFT_VERIFY_PAR path) would race createOrReplaceTempView
  // on the one session. The memo makes every call after the first (for the
  // same dir) a no-op, so parallel queries never write session state at all;
  // a dir CHANGE re-registers, keeping sequential multi-lake use correct.
  // WeakHashMap so a stopped session's entry can be collected.
  private val registered =
    new java.util.WeakHashMap[SparkSession, String]()

  /** Register every lake table as a temp view named after the table, so raw-SQL
    * extraction (reference `ExtractionType.Query`) is a straight `spark.sql(text)`.
    * Idempotent and thread-safe per (session, dir): only the first call for a
    * given dir registers; later calls (any thread) return after a memo check. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    registered.synchronized {
      if (registered.get(spark) != dir) {
        tableNames.foreach(n => table(spark, dir, n).createOrReplaceTempView(n))
        registered.put(spark, dir)
      }
    }
}
