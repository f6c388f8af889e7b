package graft.pipeline

import graft.sinks.ParquetSink
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** High-watermark incremental extraction — change-data-capture in the only
  * form the reference's config surface could express it (its roadmap lists CDC
  * unimplemented, `/root/reference/README.md:1784`; its cron re-runs re-extract
  * everything every time). Each run extracts only rows whose monotonically
  * increasing cursor column (event time, sequence id) is beyond the last run's
  * maximum, appends them to the destination, and advances the persisted
  * watermark. At 100 TB this is the difference between scanning a day and
  * scanning a decade: the cursor predicate pushes into the parquet scan (or the
  * remote DB for JDBC sources), so untouched partitions are never read.
  *
  * Exactly-once shape: every increment lands under a deterministic
  * subdirectory keyed by the watermark it started from, written with
  * overwrite. A crash between data commit and watermark advance makes the
  * retry rewrite the SAME subdirectory — idempotent, no duplicates — and the
  * watermark file itself moves by atomic rename. */
object Incremental {

  /** Where a run's increment lands: deterministic in the starting watermark,
    * so retries overwrite instead of duplicating. */
  private[pipeline] def incrementDir(destDir: String, from: Option[Long]): String =
    s"$destDir/inc_from=${from.getOrElse(Long.MinValue)}"

  /** Read the persisted watermark (micros since epoch), if any. */
  def loadWatermark(spark: SparkSession, statePath: String): Option[Long] = {
    val p = new Path(statePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes(), "UTF-8").trim.toLong)
      finally in.close()
    }
  }

  /** Persist the watermark by write-then-atomic-rename. */
  def saveWatermark(spark: SparkSession, statePath: String, value: Long): Unit = {
    val p = new Path(statePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(p.getParent, s".${p.getName}.tmp-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    try out.write(value.toString.getBytes("UTF-8")) finally out.close()
    if (fs.exists(p)) fs.delete(p, false)
    if (!fs.rename(tmp, p))
      throw new IllegalStateException(s"watermark rename failed: $tmp -> $p")
  }

  /** Run one increment: extract rows with `cursorCol` strictly beyond the
    * persisted watermark, append them under the destination, advance the
    * watermark to the increment's max. Returns rows landed this run.
    *
    * The new watermark is observed during the write scan itself (no second
    * pass), and only persisted after the data commit. `cursorCol` must be a
    * timestamp column; the watermark is kept in epoch micros. */
  def runIncrement(source: DataFrame, cursorCol: String,
                   statePath: String, destDir: String): Long = {
    val spark = source.sparkSession
    val last = loadWatermark(spark, statePath)
    // compare on the column itself (not unix_micros(col) > v): a plain
    // timestamp comparison is what the parquet/JDBC source can push down;
    // wrapping the column in a conversion would force a full scan.
    val inc = last.map { v =>
      val cutoff = java.time.Instant.EPOCH.plus(v, java.time.temporal.ChronoUnit.MICROS)
      source.filter(col(cursorCol) > lit(cutoff))
    }.getOrElse(source)

    val obs = org.apache.spark.sql.Observation()
    val observed = inc.observe(obs,
      count(lit(1)).as("rows"), max(unix_micros(col(cursorCol))).as("max_cursor"))
    ParquetSink.writePartitioned(observed, incrementDir(destDir, last))
    val rows = obs.get("rows").asInstanceOf[Long]
    if (rows > 0) saveWatermark(spark, statePath,
      obs.get("max_cursor").asInstanceOf[Long])
    rows
  }

  /** Everything landed so far (union of all increments). */
  def readAll(spark: SparkSession, destDir: String): DataFrame =
    spark.read.parquet(s"$destDir/inc_from=*")

  /** Everything landed so far when increments DRIFTED in schema over time
    * (columns added by upstream releases): `mergeSchema` unions the per-file
    * schemas, older increments surface the new columns as null. Schema merge
    * reads every file footer up front — fine per ingest run; a 100 TB lake
    * serving interactive reads should pin the merged schema in a catalog and
    * pass it explicitly instead of rediscovering it per query. */
  def readAllEvolved(spark: SparkSession, destDir: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(s"$destDir/inc_from=*")

  /** Retention sweep: delete increments whose data is entirely at or below
    * `cutoffMicros`. Increment `inc_from=x_i` holds rows with cursor in
    * `(x_i, x_{i+1}]` where `x_{i+1}` is the NEXT increment's start (its max
    * advanced the watermark that named the next directory), so it is
    * droppable iff `x_{i+1} <= cutoff` — a pure directory-listing decision,
    * no data scan, and the newest increment is never dropped (its upper bound
    * is open). The chronic alternative — filtering old rows by rewriting the
    * table — scans and rewrites 100 TB to delete a day; this deletes
    * whole immutable increment directories. Returns the deleted paths. */
  def retentionSweep(spark: SparkSession, destDir: String,
                     cutoffMicros: Long): Seq[String] = {
    val dest = new Path(destDir)
    val fs = dest.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dest)) return Seq.empty
    val starts = fs.listStatus(dest).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("inc_from="))
      .map(s => s.getPath.getName.stripPrefix("inc_from=").toLong -> s.getPath)
      .sortBy(_._1)
    starts.zip(starts.drop(1)).collect {
      case ((_, path), (nextStart, _)) if nextStart <= cutoffMicros =>
        fs.delete(path, true)
        path.toString
    }
  }
}
