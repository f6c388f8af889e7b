package graft

import graft.operators.{CrawlPipeline, FingerprintIndex, HistoryDedup, UrlFilter}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.nio.file.Files

class CrawlIncrementSpec extends SparkSpec {
  import spark.implicits._

  // every text passes the t06 gate (>= 5 tokens, stopwords present, low
  // symbol ratio) and the single 'en' label makes the langid gate trivial,
  // so the tests isolate the INCREMENT mechanics: URL gate, history dedup,
  // sinks, index state
  private def html(text: String): String =
    "<html><body><nav><a href=\"/\">home</a> <a href=\"/a\">about</a> " +
      "<a href=\"/c\">contact</a></nav><p>" + text +
      "</p><div class=\"foot\"><a href=\"/t\">terms</a> all rights " +
      "reserved</div></body></html>"

  private def pages(rows: (Long, String, String)*): DataFrame =
    rows.toSeq.map { case (id, url, text) =>
      (id, html(text), url, "en", "srcA")
    }.toDF("doc_id", "html", "url", "lang", "source")

  private val tA = "the quick brown fox jumps over the lazy dog and it " +
    "runs far away into the hills"
  private val tB = "it was the best of times and it was the worst of " +
    "times for all of the people"
  private val tC = "call me ishmael and some years ago never mind how " +
    "long precisely I went to the sea"
  private val tD = "in the beginning the earth was without form and the " +
    "darkness was upon the face of it"

  private def increment(batch: DataFrame, indexDir: String, batchId: Long,
                        outDir: Option[String] = None,
                        blockedHosts: Option[DataFrame] = None): DataFrame =
    CrawlPipeline.curateIncrement(batch, "doc_id", "html", "url",
      "lang", "source",
      UrlFilter.Rules(blockedTlds = Seq("xyz")), blockedHosts,
      labeledPred = lit(true), targetLangs = Seq("en"),
      dsirTargetPred = col("doc_id") % 2 === 0,
      indexDir = indexDir, batchId = batchId,
      expectedHistoryRows = 10000L, sampleK = 10,
      expectedBatchRows = 10000L, outDir = outDir)

  test("history rule: a later batch drops docs whose extracted text an " +
       "earlier batch already landed (even under a different id), keeps " +
       "genuinely-new ones; in-batch first-sighting also appended") {
    val dir = Files.createTempDirectory("graft-c03-spec").toString
    val idx = s"$dir/fpindex"
    val b0 = increment(pages(
      (1L, "https://a.com/p", tA), (2L, "https://b.com/p", tB)), idx, 0L)
    assert(b0.select("doc_id").as[Long].collect().toSet == Set(1L, 2L))
    val b1 = increment(pages(
      (10L, "https://c.com/p", tA),   // duplicate of batch 0's doc 1
      (11L, "https://d.com/p", tC)), idx, 1L)
    assert(b1.select("doc_id").as[Long].collect().toSet == Set(11L))
    // batch 2 dups batch 1's NEW doc and batch 0's -> only tD survives
    val b2 = increment(pages(
      (20L, "https://e.com/p", tC), (21L, "https://f.com/p", tB),
      (22L, "https://g.com/p", tD)), idx, 2L)
    assert(b2.select("doc_id").as[Long].collect().toSet == Set(22L))
  }

  test("quality- and resample-dropped docs still count as SEEN (the " +
       "first-sighting convention: the whole extracted batch is appended)") {
    val dir = Files.createTempDirectory("graft-c03-spec2").toString
    val idx = s"$dir/fpindex"
    val junk = "zzzz xxxx qqqq" // < 5 tokens, no stopwords -> quality-dropped
    val b0 = increment(pages(
      (1L, "https://a.com/p", tA), (2L, "https://b.com/p", junk)), idx, 0L)
    assert(b0.select("doc_id").as[Long].collect().toSet == Set(1L))
    // recrawl of the junk page in batch 1: seen (batch 0 extracted it), so
    // it is dropped by HISTORY dedup before quality even matters
    val b1 = increment(pages(
      (10L, "https://c.com/p", junk), (11L, "https://d.com/p", tB)), idx, 1L)
    assert(b1.select("doc_id").as[Long].collect().toSet == Set(11L))
    // the index holds exactly the two batches' distinct extracted fps
    val fps = FingerprintIndex.read(spark, idx).count()
    assert(fps == 4L, s"expected 4 indexed fingerprints, got $fps")
  }

  test("URL gate runs BEFORE extraction/history: blocked pages neither " +
       "land nor enter the index") {
    val dir = Files.createTempDirectory("graft-c03-spec3").toString
    val idx = s"$dir/fpindex"
    val bl = Seq("evil.com").toDF("host")
    val b0 = increment(pages(
      (1L, "https://a.com/p", tA),
      (2L, "https://evil.com/p", tB),      // blocklisted host
      (3L, "https://tracker.xyz/p", tC)),  // blocked tld
      idx, 0L, blockedHosts = Some(bl))
    assert(b0.select("doc_id").as[Long].collect().toSet == Set(1L))
    assert(FingerprintIndex.read(spark, idx).count() == 1L)
    // the blocked text is NOT seen: it survives a later unblocked crawl
    val b1 = increment(pages((10L, "https://ok.org/p", tB)), idx, 1L,
      blockedHosts = Some(bl))
    assert(b1.select("doc_id").as[Long].collect().toSet == Set(10L))
  }

  test("per-batch sink contract: one parquet + one CTL per batch, CTL " +
       "record count == landed rows, checksum == sha256 of the file") {
    val dir = Files.createTempDirectory("graft-c03-spec4").toString
    val idx = s"$dir/fpindex"
    val out = s"$dir/out"
    val b0 = increment(pages(
      (1L, "https://a.com/p", tA), (2L, "https://b.com/p", tB)), idx, 0L,
      outDir = Some(out))
    increment(pages((10L, "https://c.com/p", tC)), idx, 1L,
      outDir = Some(out))
    val files = new java.io.File(out).listFiles().map(_.getName)
      .filterNot(_.startsWith(".")).sorted // local-FS .crc shadows
    assert(files.toSeq == Seq("batch_00000.ctl", "batch_00000.parquet",
      "batch_00001.ctl", "batch_00001.parquet"), files.mkString(", "))
    val ctl = new String(Files.readAllBytes(
      java.nio.file.Paths.get(s"$out/batch_00000.ctl")), "UTF-8")
    val fields = ctl.split("\r\n")(1).split(",")
    assert(fields(0).toLong == b0.count())
    val p = new org.apache.hadoop.fs.Path(s"$out/batch_00000.parquet")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fields(2) == graft.sinks.CtlManifest.sha256OfFile(fs, p))
    assert(fields(4).startsWith("crawl_increment_0_"))
  }

  test("batch replay is idempotent: same curated rows, index content " +
       "unchanged (overwrite by batch id)") {
    val dir = Files.createTempDirectory("graft-c03-spec5").toString
    val idx = s"$dir/fpindex"
    increment(pages((1L, "https://a.com/p", tA)), idx, 0L)
    val batch1 = pages((10L, "https://b.com/p", tB),
      (11L, "https://c.com/p", tC))
    val first = increment(batch1, idx, 1L).collect().map(_.toString).sorted
    val fpsAfterFirst = FingerprintIndex.read(spark, idx)
      .as[Long].collect().sorted.toSeq
    val replay = increment(batch1, idx, 1L).collect().map(_.toString).sorted
    val fpsAfterReplay = FingerprintIndex.read(spark, idx)
      .as[Long].collect().sorted.toSeq
    // a replay AFTER a successful run dedups against its own first run's
    // fingerprints: nothing double-lands (at-most-once landing; a retry
    // after a FAILURE still lands fully, because the index only appends
    // AFTER the landing step). Index state is unchanged either way.
    assert(first.nonEmpty)
    assert(replay.isEmpty,
      s"replayed batch must not double-land, got ${replay.mkString(", ")}")
    assert(fpsAfterReplay == fpsAfterFirst)
  }

  test("plan: history dedup reads the index FINGERPRINTS-ONLY (~8 B/doc " +
       "ReadSchema), never a text column") {
    val dir = Files.createTempDirectory("graft-c03-spec6").toString
    val idx = s"$dir/fpindex"
    FingerprintIndex.append(
      pages((1L, "https://a.com/p", tA)).select(col("doc_id"),
        col("html").as("text")), "text", idx, 0L)
    val batch = pages((10L, "https://b.com/p", tB))
      .select(col("doc_id"), col("html").as("text"))
    // the index scans live inside the bloom subquery and the confirm
    // join's build side (not reachable through SparkPlan.children), so
    // the pin reads the rendered plan: every fpindex scan line must carry
    // the fp-only ReadSchema
    val plan = HistoryDedup.newAgainstFingerprints(batch,
      FingerprintIndex.read(spark, idx), "text",
      expectedHistoryRows = 1000L, expectedBatchRows = 1000L)
      .queryExecution.executedPlan.toString
    val idxScanLines = plan.linesIterator
      .filter(l => l.contains("FileScan parquet") && l.contains("fpindex"))
      .toSeq
    assert(idxScanLines.nonEmpty, s"no index scan found:\n$plan")
    idxScanLines.foreach { l =>
      assert(l.contains("ReadSchema: struct<_fp:bigint>"),
        s"index scan must read only _fp:\n$l")
    }
  }
}
