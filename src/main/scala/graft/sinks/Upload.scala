package graft.sinks

import graft.config.UploadConfig
import org.apache.hadoop.fs.{FileSystem, FileUtil, Path}
import org.apache.spark.sql.SparkSession

/** Post-write placement semantics from the reference's upload layer, implemented
  * as *declared* rather than as the dead code shipped (SURVEY §4.2):
  *
  *  - bounded retry with backoff (`UploadConfiguration.{EnableRetry,MaxRetries}`,
  *    `DatasetConfiguration.cs:68-69` — declared, never enforced by the
  *    reference's providers);
  *  - overwrite control (`OverwriteExisting`, always-true in the reference,
  *    `FileSystemUploadProvider.cs:88`);
  *  - optional local copy, non-fatal on failure (`UploadHandler.cs:84-87,
  *    131-163`).
  *
  * "Upload" for a Spark engine is a Hadoop-FileSystem move: the same code path
  * covers local FS, HDFS, and (with the right hadoop jars) ABFS/S3.
  */
object Upload {

  final case class UploadResult(destination: String, attempts: Int,
                                localCopy: Option[String], bytes: Long)

  /** Azure Blob destination mapping (`AzureBlobStorageProvider.cs:21-56`): the
    * reference's bespoke `BlobServiceClient` becomes a Hadoop-FS URI — with the
    * hadoop-azure jars on the classpath, `abfss://container@account.dfs.core.
    * windows.net/path` goes through the exact same [[place]] code path as local
    * FS and HDFS. The template carries the deployment's storage account (the
    * reference keeps it in `AzureBlobOptions.ConnectionString`, app-level not
    * dataset-level); `{container}` is substituted per dataset. Tests point the
    * template at a `file://` directory to exercise the full path without Azure. */
  val defaultAzureUriTemplate: String =
    sys.env.getOrElse("GRAFT_AZURE_CONTAINER_URI",
      "abfss://{container}@account.dfs.core.windows.net")

  def azureContainerUri(template: String, containerName: String): String = {
    require(containerName.nonEmpty, "azureBlobConfig.containerName is empty")
    template.replace("{container}", containerName)
  }

  def place(spark: SparkSession, srcFile: String, destDir: String,
            fileName: String, cfg: UploadConfig,
            sleep: Long => Unit = Thread.sleep): UploadResult = {
    val conf = spark.sparkContext.hadoopConfiguration
    val src = new Path(srcFile)
    val srcFs = src.getFileSystem(conf)
    val dest = new Path(destDir)
    val destFs = dest.getFileSystem(conf)
    val target = new Path(dest, fileName)
    val maxAttempts = if (cfg.enableRetry) math.max(1, cfg.maxRetries) else 1

    var attempt = 0
    var done = false
    var lastError: Throwable = null
    while (!done && attempt < maxAttempts) {
      attempt += 1
      try {
        destFs.mkdirs(dest)
        if (destFs.exists(target)) {
          if (!cfg.overwriteExisting)
            throw new IllegalStateException(
              s"Destination exists and overwriteExisting=false: $target")
          destFs.delete(target, false)
        }
        // tmp-then-rename on the DESTINATION fs in both branches: a copy that
        // dies mid-flight must never leave a partial file at `target`, or a
        // retry with overwriteExisting=false would mistake it for a completed
        // upload and refuse permanently.
        val tmp = new Path(dest, s".tmp-upload-${java.util.UUID.randomUUID()}")
        try {
          FileUtil.copy(srcFs, src, destFs, tmp, false, conf)
          if (!destFs.rename(tmp, target))
            throw new IllegalStateException(s"rename failed: $tmp -> $target")
        } finally {
          if (destFs.exists(tmp)) destFs.delete(tmp, false)
        }
        done = true
      } catch {
        case e: IllegalStateException if e.getMessage.contains("overwriteExisting") =>
          throw e // config refusal — retrying cannot help
        case e: Throwable =>
          lastError = e
          if (attempt < maxAttempts) sleep(100L * attempt)
      }
    }
    if (!done) throw new RuntimeException(
      s"Upload failed after $attempt attempts: ${lastError.getMessage}", lastError)

    // optional local copy — failures are non-fatal (UploadHandler.cs:84-87)
    val localCopy =
      if (cfg.keepLocalCopy && cfg.localCopyPath.nonEmpty) {
        try {
          val lc = new Path(cfg.localCopyPath)
          val lcFs = lc.getFileSystem(conf)
          lcFs.mkdirs(lc)
          val lcTarget = new Path(lc, fileName)
          if (lcFs.exists(lcTarget)) lcFs.delete(lcTarget, false)
          FileUtil.copy(destFs, target, lcFs, lcTarget, false, conf)
          Some(lcTarget.toString)
        } catch { case _: Throwable => None }
      } else None

    UploadResult(target.toString, attempt, localCopy,
      destFs.getFileStatus(target).getLen)
  }

  private[graft] def hadoopFs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
}
