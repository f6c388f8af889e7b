package graft.config

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import java.nio.file.{Files, Path, Paths}
import java.time.ZonedDateTime
import java.time.format.DateTimeFormatter
import scala.jdk.CollectionConverters._

/** The reference's declarative per-dataset JSON dialect, re-modelled as Scala case
  * classes. Field names and defaults mirror
  * `/root/reference/src/Core/Models/DatasetConfiguration.cs:5-106`; parsing behavior
  * (case-insensitive keys, enums-as-strings, JSON→native coercion) mirrors
  * `src/Infrastructure/Services/DatasetConfigurationService.cs:22-123`.
  *
  * Reference dataset JSON files (`src/Worker/Datasets/dataset-*.json`) parse unchanged.
  */
final case class DatasetConfig(
    datasetId: String,
    name: String = "",
    description: String = "",
    enabled: Boolean = true,
    cronExpression: String = "0 0 * * * ?",
    source: SourceConfig = SourceConfig(),
    transformations: Seq[TransformConfig] = Nil,
    parquet: ParquetConfig = ParquetConfig(),
    upload: UploadConfig = UploadConfig(),
    merge: MergeConfig = MergeConfig(),
    maintenance: MaintenanceConfig = MaintenanceConfig(),
    notifications: NotificationConfig = NotificationConfig(),
    metadata: MetaConfig = MetaConfig())

/** `SourceConfiguration` (`DatasetConfiguration.cs:23-43`). For the lake engine,
  * `type` gains a `"Parquet"` member alongside the reference's SqlServer/Oracle
  * (`src/Core/Enums/Enums.cs:3-9`); extraction types mirror `Enums.cs:11-16`. */
final case class SourceConfig(
    `type`: String = "Parquet",
    connectionStringKey: String = "",
    extractionType: String = "Query",
    procedureName: String = "",
    packageName: String = "",
    sqlFilePath: String = "",
    sqlText: String = "", // lake-engine extension: inline SQL, no file indirection
    parameters: Map[String, Any] = Map.empty,
    commandTimeout: Int = 300)

/** `TransformationConfiguration` (`DatasetConfiguration.cs:45-60`): reflection-keyed
  * step type + order + enabled + environment gate + free-form config. */
final case class TransformConfig(
    `type`: String,
    enabled: Boolean = true,
    order: Int = 0,
    environments: Seq[String] = Nil,
    config: Map[String, Any] = Map.empty)

/** `ParquetConfiguration` (`DatasetConfiguration.cs:55-61`). The reference declares
  * compression/rowGroupSize/statistics but hardcodes Snappy + one row group
  * (`ParquetWriterService.cs:42-44`); we honor the declared semantics instead. */
final case class ParquetConfig(
    fileNamePattern: String = "data_{date:yyyyMMdd}_{time:HHmmss}.parquet",
    compressionCodec: String = "Snappy",
    rowGroupSize: Int = 5000,
    enableStatistics: Boolean = true)

final case class UploadConfig(
    provider: String = "FileSystem",
    fileSystemConfig: Option[FileSystemConfig] = None,
    azureBlobConfig: Option[AzureBlobConfig] = None,
    overwriteExisting: Boolean = false,
    enableRetry: Boolean = true,
    maxRetries: Int = 3,
    keepLocalCopy: Boolean = false,
    localCopyPath: String = "")

/** Lake-engine extension (no reference counterpart — its roadmap lists CDC
  * unimplemented): when enabled, the extracted rows are a CHANGELOG
  * (key + sequence + operation columns) folded into a versioned latest-state
  * snapshot instead of an append-only file drop. */
final case class MergeConfig(
    enabled: Boolean = false,
    keyColumns: Seq[String] = Nil,
    sequenceColumn: String = "",
    operationColumn: String = "",
    deleteOperation: String = "D")

/** Lake-engine extension: a MAINTENANCE dataset — its scheduled "run" is a
  * small-file compaction of a parquet directory (the chronic debt incremental
  * ingestion accrues) instead of an extraction. Scheduled like any dataset, so
  * the cron + no-overlap gate apply; `compactDir` resolves against the run's
  * destination root unless absolute. */
final case class MaintenanceConfig(
    enabled: Boolean = false,
    compactDir: String = "",
    targetFileBytes: Long = 128L * 1024 * 1024)

final case class FileSystemConfig(basePath: String = "", relativePath: String = "")
final case class AzureBlobConfig(containerName: String = "", blobPath: String = "")
final case class NotificationConfig(
    onSuccess: Boolean = false, onFailure: Boolean = true, channels: Seq[String] = Nil)
final case class MetaConfig(
    owner: String = "", contact: String = "", tags: Seq[String] = Nil)

object DatasetConfig {
  private val mapper = new ObjectMapper()

  /** Load every `dataset-*.json` in a directory — the reference's glob
    * (`DatasetConfigurationService.cs:34`). */
  def loadDirectory(dir: String): Seq[DatasetConfig] =
    Files.list(Paths.get(dir)).iterator().asScala
      .filter(p => p.getFileName.toString.matches("dataset-.*\\.json"))
      .toSeq.sortBy(_.toString)
      .map(parseFile)

  def parseFile(path: Path): DatasetConfig = parse(Files.readString(path))

  def parse(json: String): DatasetConfig = {
    val root = mapper.readTree(json)
    DatasetConfig(
      datasetId = str(root, "datasetId"),
      name = str(root, "name"),
      description = str(root, "description"),
      enabled = bool(root, "enabled", default = true),
      cronExpression = strOr(root, "cronExpression", "0 0 * * * ?"),
      source = get(root, "source").map(parseSource).getOrElse(SourceConfig()),
      transformations = get(root, "transformations").toSeq
        .flatMap(_.elements().asScala)
        .map(parseTransform),
      parquet = get(root, "parquet").map(parseParquet).getOrElse(ParquetConfig()),
      upload = get(root, "upload").map(parseUpload).getOrElse(UploadConfig()),
      merge = get(root, "merge").map(m => MergeConfig(
        enabled = bool(m, "enabled", default = false),
        keyColumns = strSeq(m, "keyColumns"),
        sequenceColumn = str(m, "sequenceColumn"),
        operationColumn = str(m, "operationColumn"),
        deleteOperation = strOr(m, "deleteOperation", "D"))).getOrElse(MergeConfig()),
      maintenance = get(root, "maintenance").map(m => MaintenanceConfig(
        enabled = bool(m, "enabled", default = false),
        compactDir = str(m, "compactDir"),
        targetFileBytes = get(m, "targetFileBytes").map(_.asLong(128L * 1024 * 1024))
          .getOrElse(128L * 1024 * 1024))).getOrElse(MaintenanceConfig()),
      notifications = get(root, "notifications").map(n => NotificationConfig(
        bool(n, "onSuccess", default = false), bool(n, "onFailure", default = true),
        strSeq(n, "channels"))).getOrElse(NotificationConfig()),
      metadata = get(root, "metadata").map(m => MetaConfig(
        str(m, "owner"), str(m, "contact"), strSeq(m, "tags")))
        .getOrElse(MetaConfig()))
  }

  private def parseSource(n: JsonNode) = SourceConfig(
    `type` = strOr(n, "type", "Parquet"),
    connectionStringKey = str(n, "connectionStringKey"),
    extractionType = strOr(n, "extractionType", "Query"),
    procedureName = str(n, "procedureName"),
    packageName = str(n, "packageName"),
    sqlFilePath = str(n, "sqlFilePath"),
    sqlText = str(n, "sqlText"),
    parameters = get(n, "parameters").map(coerceMap).getOrElse(Map.empty),
    commandTimeout = int(n, "commandTimeout", 300))

  private def parseTransform(n: JsonNode) = TransformConfig(
    `type` = str(n, "type"),
    enabled = bool(n, "enabled", default = true),
    order = int(n, "order", 0),
    environments = strSeq(n, "environments"),
    config = get(n, "config").map(coerceMap).getOrElse(Map.empty))

  private def parseParquet(n: JsonNode) = ParquetConfig(
    fileNamePattern = strOr(n, "fileNamePattern", ParquetConfig().fileNamePattern),
    compressionCodec = strOr(n, "compressionCodec", "Snappy"),
    rowGroupSize = int(n, "rowGroupSize", 5000),
    enableStatistics = bool(n, "enableStatistics", default = true))

  private def parseUpload(n: JsonNode) = UploadConfig(
    provider = strOr(n, "provider", "FileSystem"),
    fileSystemConfig = get(n, "fileSystemConfig").map(f =>
      FileSystemConfig(str(f, "basePath"), str(f, "relativePath"))),
    azureBlobConfig = get(n, "azureBlobConfig").map(f =>
      AzureBlobConfig(str(f, "containerName"), str(f, "blobPath"))),
    overwriteExisting = bool(n, "overwriteExisting", default = false),
    enableRetry = bool(n, "enableRetry", default = true),
    maxRetries = int(n, "maxRetries", 3),
    keepLocalCopy = bool(n, "keepLocalCopy", default = false),
    localCopyPath = str(n, "localCopyPath"))

  /** JSON value → native Scala, mirroring the reference's JsonElement coercion ladder
    * string / int64 / decimal→double / bool / null / array / object
    * (`DatasetConfigurationService.cs:104-123`). */
  def coerceValue(n: JsonNode): Any = {
    if (n.isTextual) n.asText()
    else if (n.isIntegralNumber) n.asLong()
    else if (n.isNumber) n.asDouble()
    else if (n.isBoolean) n.asBoolean()
    else if (n.isNull) null
    else if (n.isArray) n.elements().asScala.map(coerceValue).toList
    else if (n.isObject) coerceMap(n)
    else n.asText()
  }

  private def coerceMap(n: JsonNode): Map[String, Any] =
    n.properties().asScala.map(e => e.getKey -> coerceValue(e.getValue)).toMap

  // -- case-insensitive field access (reference parses with
  //    PropertyNameCaseInsensitive, `DatasetConfigurationService.cs:26-30`) --
  private def get(n: JsonNode, field: String): Option[JsonNode] = {
    val exact = n.get(field)
    if (exact != null && !exact.isNull) Some(exact)
    else n.properties().asScala
      .find(e => e.getKey.equalsIgnoreCase(field) && !e.getValue.isNull)
      .map(_.getValue)
  }
  private def str(n: JsonNode, f: String): String = strOr(n, f, "")
  private def strOr(n: JsonNode, f: String, d: String): String =
    get(n, f).map(_.asText()).getOrElse(d)
  private def bool(n: JsonNode, f: String, default: Boolean): Boolean =
    get(n, f).map(_.asBoolean(default)).getOrElse(default)
  private def int(n: JsonNode, f: String, d: Int): Int =
    get(n, f).map(_.asInt(d)).getOrElse(d)
  private def strSeq(n: JsonNode, f: String): Seq[String] =
    get(n, f).toSeq.flatMap(_.elements().asScala).map(_.asText())
}

/** Output-file-name templating — `{date:fmt}` / `{time:fmt}` plus bare `{date}` /
  * `{time}`, UTC now — mirroring `DataIngestionJob.cs:161-169`. The clock is a
  * parameter so tests are deterministic (SURVEY §7.4(2)). */
object FileNameTemplate {
  private val token = raw"\{(date|time)(?::([^}]+))?\}".r

  def render(pattern: String, now: ZonedDateTime): String =
    token.replaceAllIn(pattern, m => {
      val fmt = (m.group(1), Option(m.group(2))) match {
        case (_, Some(f))  => f
        case ("date", None) => "yyyyMMdd"
        case (_, None)      => "HHmmss"
      }
      now.format(DateTimeFormatter.ofPattern(fmt))
    })
}
