package graft.sinks

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.DataFrame

import java.util.UUID

/** Parquet sink with the reference's output contract — one deterministic file per
  * run, atomically visible — plus a partitioned mode for scale.
  *
  * Reference behavior re-expressed:
  *  - single file, Snappy, one row group: `ParquetWriterService.cs:20-73` buffers the
  *    whole file as `byte[]`; we stream via Spark's parquet writer instead and honor
  *    the *declared* compression/rowGroupSize config the reference ignores
  *    (`DatasetConfiguration.cs:57-58` vs `ParquetWriterService.cs:42-44`).
  *  - atomic visibility: temp + rename, `FileSystemUploadProvider.cs:78-106` — here
  *    Hadoop `FileSystem.rename` of the committed part-file onto the final name.
  *
  * Scale note (SURVEY §7.4(4)): `coalesce(1)` serializes the final write and is part
  * of the single-file *contract*, not a default. At 100 TB callers use
  * `writePartitioned`, which keeps one file per task and aggregates the manifest
  * across part files (manifest-of-manifests, see [[CtlManifest.forDirectory]]).
  */
object ParquetSink {

  final case class WriteResult(path: String, files: Seq[String], bytes: Long)

  private def codecOption(codec: String): String = codec.toLowerCase match {
    case "none" => "none"
    case c @ ("snappy" | "gzip" | "lz4" | "brotli" | "zstd") => c
    case other => throw new IllegalArgumentException(s"Unknown compression codec: $other")
  }

  /** Write `df` as exactly one parquet file at `destDir/fileName`, atomically.
    * `sortWithinFile` re-applies a global order just before the single-partition
    * write, because `coalesce(1)` upstream of an `orderBy` would otherwise collapse
    * the sort's parallelism and >1-partition plans don't preserve order (§7.4(5)). */
  def writeSingleFile(df: DataFrame, destDir: String, fileName: String,
                      compression: String = "Snappy",
                      rowGroupSize: Long = 128L * 1024 * 1024,
                      overwrite: Boolean = true): WriteResult = {
    val spark = df.sparkSession
    val hadoopConf = spark.sparkContext.hadoopConfiguration
    val dest = new Path(destDir)
    val fs = dest.getFileSystem(hadoopConf)
    fs.mkdirs(dest)
    val finalPath = new Path(dest, fileName)
    if (fs.exists(finalPath) && !overwrite)
      throw new IllegalStateException(s"Destination exists and overwriteExisting=false: $finalPath")

    val tmp = new Path(dest, s".tmp-${UUID.randomUUID()}")
    try {
      df.coalesce(1).write
        .option("compression", codecOption(compression))
        .option("parquet.block.size", rowGroupSize.toString)
        .mode("overwrite")
        .parquet(tmp.toString)
      val part = fs.listStatus(tmp)
        .find(_.getPath.getName.startsWith("part-"))
        .getOrElse(throw new IllegalStateException(s"No part file under $tmp"))
      if (fs.exists(finalPath)) fs.delete(finalPath, false)
      if (!fs.rename(part.getPath, finalPath))
        throw new IllegalStateException(s"Atomic rename failed: ${part.getPath} -> $finalPath")
      val size = fs.getFileStatus(finalPath).getLen
      WriteResult(finalPath.toString, Seq(finalPath.toString), size)
    } finally {
      fs.delete(tmp, true)
    }
  }

  /** Scale path: one parquet directory, one file per task, optional hive-style
    * partition columns. No coalesce — full write parallelism. */
  def writePartitioned(df: DataFrame, destDir: String,
                       partitionBy: Seq[String] = Nil,
                       compression: String = "Snappy",
                       rowGroupSize: Long = 128L * 1024 * 1024,
                       overwrite: Boolean = true): WriteResult = {
    val writer = df.write
      .option("compression", codecOption(compression))
      .option("parquet.block.size", rowGroupSize.toString)
      .mode(if (overwrite) "overwrite" else "errorifexists")
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer)
      .parquet(destDir)
    val spark = df.sparkSession
    val dest = new Path(destDir)
    val fs = dest.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = listPartFiles(fs, dest)
    WriteResult(destDir, files.map(_.toString), files.map(p => fs.getFileStatus(p).getLen).sum)
  }

  /** Hive-style partition columns of a parquet directory, read off the
    * `name=value` subdirectory chain (directory listing only, no data scan).
    * Empty for a flat directory. At each level, ALL sibling subdirectories
    * must agree: either none is `k=v` (flat) or every one is `k=v` with the
    * same key — a mixed or inconsistent directory fails loudly rather than
    * silently misdetecting the layout (and then silently flattening a
    * partitioned table on compact). */
  def partitionColumnsOf(fs: FileSystem, dir: Path): Seq[String] = {
    val cols = Seq.newBuilder[String]
    var level = dir
    var found = true
    while (found) {
      found = false
      val subs = fs.listStatus(level).filter { s =>
        val n = s.getPath.getName
        s.isDirectory && !n.startsWith(".") && !n.startsWith("_")
      }
      val kv = subs.filter(_.getPath.getName.contains("="))
      if (kv.nonEmpty) {
        val stray = subs.filterNot(_.getPath.getName.contains("="))
        require(stray.isEmpty,
          s"Mixed directory under $level: hive 'k=v' subdirs alongside " +
            s"non-partition dirs [${stray.map(_.getPath.getName).mkString(", ")}]")
        val keys = kv.map(_.getPath.getName.takeWhile(_ != '=')).distinct
        require(keys.length == 1,
          s"Inconsistent partition keys under $level: [${keys.mkString(", ")}]")
        cols += keys.head
        level = kv.head.getPath
        found = true
      }
    }
    cols.result()
  }

  /** Compact a parquet directory's small files into ~`targetBytes` files —
    * the small-files problem is the chronic failure mode of incremental
    * ingestion at scale (every streaming micro-batch / cron run adds part
    * files; a 100 TB table accumulates millions, and scan planning + NN load
    * degrade long before the data does). Rewrites into
    * `ceil(totalBytes / targetBytes)` partitions, then swaps the directory
    * atomically-enough for an uncatalogued lake path (write aside + rename).
    * Hive-partitioned directories keep their layout: partition columns are
    * detected from the `k=v` directory chain and the rewrite re-applies
    * `partitionBy`, so partition pruning survives compaction (a flattening
    * rewrite would keep the rows but silently kill every pruned scan).
    * Partition VALUES are read back as strings (type inference disabled for
    * the rewrite read): `k=0250` must come back as directory `k=0250`, not a
    * re-rendered `k=250`. Sizing note: the partitioned rewrite clusters by
    * partition key, so a hot partition lands in one task and can produce a
    * single file above `targetBytes` — the pruning-preserving trade; split
    * such a partition downstream if it outgrows a task.
    * Returns the new layout. */
  def compact(spark: org.apache.spark.sql.SparkSession, dir: String,
              targetBytes: Long = 128L * 1024 * 1024,
              compression: String = "Snappy"): WriteResult = {
    val dest = new Path(dir)
    val fs = dest.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val currentBytes = listPartFiles(fs, dest).map(p => fs.getFileStatus(p).getLen).sum
    val parts = math.max(1, math.ceil(currentBytes.toDouble / targetBytes).toInt)
    val partCols = partitionColumnsOf(fs, dest)
    val tmp = new Path(dest.getParent, s".compact-${UUID.randomUUID()}")
    // the rewrite action completes before any rename, so the source directory
    // is never read and replaced concurrently. Partitioned layouts cluster the
    // rewrite by partition key so each output partition dir gets ~`parts`
    // whole files rather than a sliver of every task's output.
    val inferKey = "spark.sql.sources.partitionColumnTypeInference.enabled"
    val prevInfer = spark.conf.getOption(inferKey)
    spark.conf.set(inferKey, "false")
    try {
      val src = spark.read.parquet(dir)
      val rewrite =
        if (partCols.isEmpty) src.repartition(parts)
        else src.repartition(parts,
          partCols.map(org.apache.spark.sql.functions.col): _*)
      val writer = rewrite.write
        .option("compression", codecOption(compression))
        .mode("overwrite")
      (if (partCols.isEmpty) writer else writer.partitionBy(partCols: _*))
        .parquet(tmp.toString)
    } finally prevInfer match {
      case Some(v) => spark.conf.set(inferKey, v)
      case None    => spark.conf.unset(inferKey)
    }
    val old = new Path(dest.getParent, s".old-${UUID.randomUUID()}")
    if (!fs.rename(dest, old)) throw new IllegalStateException(s"rename away failed: $dest")
    if (!fs.rename(tmp, dest)) {
      fs.rename(old, dest) // restore
      throw new IllegalStateException(s"rename into place failed: $tmp -> $dest")
    }
    fs.delete(old, true)
    val files = listPartFiles(fs, dest)
    WriteResult(dir, files.map(_.toString), files.map(p => fs.getFileStatus(p).getLen).sum)
  }

  private[graft] def listPartFiles(fs: FileSystem, dir: Path): Seq[Path] = {
    val it = fs.listFiles(dir, true)
    val buf = Seq.newBuilder[Path]
    while (it.hasNext) {
      val f = it.next()
      val n = f.getPath.getName
      if (!n.startsWith("_") && !n.startsWith(".") &&
          (n.endsWith(".parquet") || n.startsWith("part-")))
        buf += f.getPath
    }
    buf.result().sortBy(_.toString)
  }
}
