package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned snapshot directories — the commit protocol both the streaming
  * upsert view and the merge-publish pipeline use on plain parquet (no table
  * format): each new snapshot lands in a fresh `v=<n>` directory, never in
  * place, so a crashed or replayed writer rebuilds its OWN version while
  * readers of the previous version are never disturbed. The newest complete
  * version is the served one; old versions are retained for readers in flight
  * (sweep them like `Incremental.retentionSweep` once their readers drain). */
object SnapshotStore {

  /** All COMMITTED versions under `dir`, ascending. A version counts only
    * with its `_SUCCESS` marker — a writer that died mid-write leaves a
    * directory without one, and treating that as a readable base would
    * propagate a truncated snapshot into every later version. (Requires the
    * default committer behavior; do not disable
    * `mapreduce.fileoutputcommitter.marksuccessfuljobs`.) */
  def versions(spark: SparkSession, dir: String): Seq[(Long, String)] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // ONE glob round trip for all markers — latest() runs per micro-batch, so
    // on an object store a per-version exists() probe (or a separate base-dir
    // exists()) would multiply metadata RPCs; the glob's null contract already
    // covers a missing base dir
    Option(fs.globStatus(new Path(p, "v=*/_SUCCESS")))
      .getOrElse(Array.empty).toSeq
      .map(_.getPath.getParent)
      .flatMap(q => q.getName.stripPrefix("v=").toLongOption.map((_, q.toString)))
      .sortBy(_._1)
  }

  /** ALL `v=` directories, committed or not — sweep needs to see crashed
    * writers' leftovers, which [[versions]] deliberately hides. */
  private def allVersionDirs(spark: SparkSession, dir: String): Seq[(Long, String)] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter(_.getName.startsWith("v="))
      .flatMap(q => q.getName.stripPrefix("v=").toLongOption.map((_, q.toString)))
      .sortBy(_._1)
  }

  /** Newest version at or below `maxId` (a replaying writer of version `id`
    * passes `maxId = id - 1` to ignore its own half-written directory);
    * newest overall when None. */
  def latest(spark: SparkSession, dir: String,
             maxId: Option[Long] = None): Option[(Long, String)] =
    versions(spark, dir).filter(v => maxId.forall(v._1 <= _)).lastOption

  /** Read one version by the full path [[versions]]/[[latest]] returned. */
  def read(spark: SparkSession, versionPath: String): DataFrame =
    spark.read.parquet(versionPath)

  /** Write `df` as version `id` (overwrite: a replay rebuilds its own dir). */
  def write(df: DataFrame, dir: String, id: Long): String = {
    val path = s"$dir/v=$id"
    df.write.mode("overwrite").parquet(path)
    path
  }

  /** Drop all but the newest `keep` COMMITTED versions — a directory-listing
    * decision and whole-directory deletes, like `Incremental.retentionSweep`:
    * no data scan, no rewrite. Size `keep` to the longest reader you allow in
    * flight. Also reclaims marker-less directories a crashed writer left
    * BELOW the newest committed version (superseded, never servable garbage);
    * a marker-less directory above it may be a writer in flight and is left
    * alone. Returns the deleted paths. */
  def sweep(spark: SparkSession, dir: String, keep: Int): Seq[String] = {
    require(keep >= 1, s"must keep at least the served version: $keep")
    val committed = versions(spark, dir)
    if (committed.isEmpty) return Seq.empty
    val newest = committed.last._1
    val keepPaths = committed.takeRight(keep).map(_._2).toSet
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    allVersionDirs(spark, dir)
      .filter { case (id, p) => !keepPaths.contains(p) && id <= newest }
      .map { case (_, p) =>
        fs.delete(new Path(p), true)
        p
      }
  }
}
