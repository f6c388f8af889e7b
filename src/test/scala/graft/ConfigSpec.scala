package graft

import graft.config.{DatasetConfig, FileNameTemplate}
import org.scalatest.funsuite.AnyFunSuite

import java.time.{ZoneOffset, ZonedDateTime}

class ConfigSpec extends AnyFunSuite {

  // the reference's dataset-trades-query.json shape, verbatim dialect
  private val sampleJson =
    """{
      |  "datasetId": "trades-daily-query",
      |  "name": "Daily Trades via SQL Query",
      |  "enabled": false,
      |  "cronExpression": "0 */2 * * * ?",
      |  "source": {
      |    "type": "SqlServer",
      |    "connectionStringKey": "TradesSqlServer",
      |    "extractionType": "Query",
      |    "sqlFilePath": "GetDailyTrades.sql",
      |    "parameters": { "StartDate": "2024-01-01", "Count": 42, "Ratio": 0.5,
      |                    "Flag": true, "Nothing": null, "Tags": ["a", "b"] },
      |    "commandTimeout": 300
      |  },
      |  "transformations": [
      |    { "type": "DataCleansing", "enabled": true, "order": 1,
      |      "environments": ["Production"],
      |      "config": { "trimWhitespace": true, "removeEmptyStrings": false } }
      |  ],
      |  "parquet": { "fileNamePattern": "trades_{date:yyyyMMdd}_{time:HHmmss}.parquet",
      |               "compressionCodec": "Snappy", "rowGroupSize": 10000 },
      |  "upload": { "provider": "FileSystem",
      |              "fileSystemConfig": { "basePath": "/out", "relativePath": "Trades/" },
      |              "overwriteExisting": false, "maxRetries": 3 },
      |  "metadata": { "owner": "Trades Team", "tags": ["trades", "daily"] }
      |}""".stripMargin

  test("parses the reference JSON dialect") {
    val cfg = DatasetConfig.parse(sampleJson)
    assert(cfg.datasetId == "trades-daily-query")
    assert(!cfg.enabled)
    assert(cfg.source.`type` == "SqlServer")
    assert(cfg.source.sqlFilePath == "GetDailyTrades.sql")
    assert(cfg.transformations.head.`type` == "DataCleansing")
    assert(cfg.transformations.head.environments == Seq("Production"))
    assert(cfg.parquet.rowGroupSize == 10000)
    assert(cfg.upload.fileSystemConfig.get.relativePath == "Trades/")
    assert(cfg.metadata.tags == Seq("trades", "daily"))
  }

  test("parameter coercion ladder: string/long/double/bool/null/array") {
    val p = DatasetConfig.parse(sampleJson).source.parameters
    assert(p("StartDate") == "2024-01-01")
    assert(p("Count") == 42L)
    assert(p("Ratio") == 0.5)
    assert(p("Flag") == true)
    assert(p("Nothing") == null)
    assert(p("Tags") == List("a", "b"))
  }

  test("defaults match the reference model defaults") {
    val cfg = DatasetConfig.parse("""{"datasetId": "x"}""")
    assert(cfg.enabled)
    assert(cfg.cronExpression == "0 0 * * * ?")
    assert(cfg.parquet.compressionCodec == "Snappy")
    assert(cfg.parquet.rowGroupSize == 5000)
    assert(cfg.upload.maxRetries == 3)
  }

  test("filename templating: {date:fmt}/{time:fmt} and bare tokens, UTC") {
    val now = ZonedDateTime.of(2026, 8, 12, 9, 30, 15, 0, ZoneOffset.UTC)
    assert(FileNameTemplate.render("t_{date:yyyyMMdd}_{time:HHmmss}.parquet", now) ==
      "t_20260812_093015.parquet")
    assert(FileNameTemplate.render("{date}-{time}.parquet", now) ==
      "20260812-093015.parquet")
    assert(FileNameTemplate.render("plain.parquet", now) == "plain.parquet")
  }

  test("merge section parses case-insensitively with defaults") {
    val cfg = DatasetConfig.parse("""{
      "datasetId": "m",
      "Merge": { "Enabled": true, "keyColumns": ["k1", "k2"],
                 "sequenceColumn": "lsn", "operationColumn": "op" }
    }""")
    assert(cfg.merge.enabled)
    assert(cfg.merge.keyColumns == Seq("k1", "k2"))
    assert(cfg.merge.sequenceColumn == "lsn")
    assert(cfg.merge.deleteOperation == "D") // default
    // absent section -> disabled
    assert(!DatasetConfig.parse("""{ "datasetId": "x" }""").merge.enabled)
  }

  test("maintenance section parses case-insensitively with defaults") {
    val cfg = DatasetConfig.parse("""{
      "datasetId": "m",
      "Maintenance": { "Enabled": true, "compactDir": "events_tbl",
                       "targetFileBytes": 1048576 }
    }""")
    assert(cfg.maintenance.enabled)
    assert(cfg.maintenance.compactDir == "events_tbl")
    assert(cfg.maintenance.targetFileBytes == 1048576L)
    val d = DatasetConfig.parse("""{ "datasetId": "x" }""").maintenance
    assert(!d.enabled && d.targetFileBytes == 128L * 1024 * 1024)
  }
}
