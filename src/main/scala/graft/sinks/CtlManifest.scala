package graft.sinks

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

import java.security.MessageDigest
import java.time.{ZonedDateTime, ZoneOffset}
import java.time.format.DateTimeFormatter

/** CTL control/manifest file — the reference's companion CSV for every parquet
  * output: header `RecordCount,RefDate,Checksum,Timestamp,DatasetName,Source`,
  * SHA-256 of the parquet bytes, dataset name `{id}_{yyyyMMddHHmmss}`, RFC-4180
  * escaping. Reference: `src/Core/Handlers/CtlGenerationHandler.cs:27-126`
  * (sha256 `:55-57`, name `:62-64`), `src/Infrastructure/Parquet/CtlWriterService.cs:20-64`
  * (escaping `:52-64`), record shape `src/Core/Interfaces/Parquet/ICtlWriter.cs:20-51`.
  *
  * Differences from the reference, by design: the checksum is computed by streaming
  * the *committed* file(s) from the filesystem (the reference hashes an in-memory
  * `byte[]` — impossible at scale), and [[forDirectory]] extends the contract to
  * multi-file outputs by hashing the concatenation of per-file SHA-256 digests in
  * file-name order (manifest-of-manifests, SURVEY §7.4(4)).
  */
object CtlManifest {

  final case class CtlRecord(
      recordCount: Long,
      refDate: String,
      checksum: String,
      timestamp: String,
      datasetName: String,
      source: String)

  // ISO-8601 round-trip ("o") format, 7 fractional digits at UTC — the reference
  // writes BOTH RefDate and Timestamp with `DateTime.ToString("o")`
  // (CtlGenerationHandler.cs:70-72, e.g. 2026-01-12T10:30:00.0000000Z), so
  // downstream CTL consumers parse one shape for both fields.
  private val tsFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSSSSSS'Z'")
  private val nameFmt = DateTimeFormatter.ofPattern("yyyyMMddHHmmss")

  def sha256OfFile(fs: FileSystem, file: Path): String = {
    val md = MessageDigest.getInstance("SHA-256")
    val in = fs.open(file)
    try {
      val buf = new Array[Byte](1 << 20)
      var n = in.read(buf)
      while (n >= 0) { if (n > 0) md.update(buf, 0, n); n = in.read(buf) }
    } finally in.close()
    md.digest().map("%02x".format(_)).mkString
  }

  /** Record for a single-file output (the reference's exact contract). */
  def forFile(spark: SparkSession, parquetFile: String, recordCount: Long,
              datasetId: String, source: String,
              now: ZonedDateTime = ZonedDateTime.now(ZoneOffset.UTC)): CtlRecord = {
    val p = new Path(parquetFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    build(sha256OfFile(fs, p), recordCount, datasetId, source, now)
  }

  /** Record for a partitioned (multi-file) output: checksum = SHA-256 over the
    * concatenated per-part digests in lexicographic file order — deterministic for
    * a committed directory regardless of task scheduling. */
  def forDirectory(spark: SparkSession, dir: String, recordCount: Long,
                   datasetId: String, source: String,
                   now: ZonedDateTime = ZonedDateTime.now(ZoneOffset.UTC)): CtlRecord = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val md = MessageDigest.getInstance("SHA-256")
    ParquetSink.listPartFiles(fs, p).foreach(f =>
      md.update(sha256OfFile(fs, f).getBytes("UTF-8")))
    build(md.digest().map("%02x".format(_)).mkString, recordCount, datasetId, source, now)
  }

  private def build(checksum: String, recordCount: Long, datasetId: String,
                    source: String, now: ZonedDateTime): CtlRecord =
    CtlRecord(
      recordCount = recordCount,
      refDate = now.withZoneSameInstant(ZoneOffset.UTC).format(tsFmt),
      checksum = checksum,
      timestamp = now.withZoneSameInstant(ZoneOffset.UTC).format(tsFmt),
      datasetName = s"${datasetId}_${now.format(nameFmt)}",
      source = source)

  /** RFC-4180 CSV serialization (`CtlWriterService.cs:24-64`). */
  def toCsv(r: CtlRecord): String = {
    def esc(s: String): String =
      if (s.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
        "\"" + s.replace("\"", "\"\"") + "\""
      else s
    "RecordCount,RefDate,Checksum,Timestamp,DatasetName,Source\r\n" +
      Seq(r.recordCount.toString, r.refDate, r.checksum, r.timestamp,
        r.datasetName, r.source).map(esc).mkString(",") + "\r\n"
  }

  /** Write the CTL next to the data, atomically (tmp + rename — the reference's
    * `FileSystemUploadProvider.cs:78-106` pattern). */
  def write(spark: SparkSession, destDir: String, fileName: String, r: CtlRecord): String = {
    val dest = new Path(destDir)
    val fs = dest.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(dest)
    val tmp = new Path(dest, s".tmp-ctl-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    try out.write(toCsv(r).getBytes("UTF-8")) finally out.close()
    val finalPath = new Path(dest, fileName)
    if (fs.exists(finalPath)) fs.delete(finalPath, false)
    if (!fs.rename(tmp, finalPath))
      throw new IllegalStateException(s"Atomic rename failed: $tmp -> $finalPath")
    finalPath.toString
  }
}
