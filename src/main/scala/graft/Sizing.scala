package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Capacity-sizing harness: measures, per heavy operator, the bytes that
  * actually cross an exchange relative to the bytes scanned — the two numbers
  * a capacity plan for a 100 TB run is built from (shuffle fabric volume and
  * `spark.sql.shuffle.partitions` sizing). ShuffleMetricsSpec pins ORDER
  * relations ("this shuffles less than that") as regression tests; this main
  * records the absolute volumes as an artifact, which SIZING.md turns into
  * per-operator 100 TB projections.
  *
  * Method: each SparkEntry query runs once to a noop sink under a
  * task-metrics listener accumulating input bytes/records and shuffle
  * read+write bytes/records. Runs are SEQUENTIAL in one JVM; volumes (unlike
  * wall times) are deterministic per plan + data, so a single run is the
  * honest measurement and host noise is irrelevant.
  *
  * Output: one JSON line (also written to SPARK_GRAFT_SIZING_OUT):
  * `{"metric":"sizing","sf":...,"ops":{op:{input_rows,input_bytes,
  * shuffle_write_bytes,shuffle_read_bytes,shuffle_write_records,
  * output_rows},...}}`.
  *
  * Caveat: `input_bytes` (task-level inputMetrics.bytesRead) is recorded for
  * transparency but is NOT trustworthy under local[*] — measured at ~0.2% of
  * a verified 10.8 MB parquet scan (the Hadoop FS-statistics callback
  * under-reports on the local scheme). Row counts and shuffle volumes are
  * accurate; tools/sizing_report.py therefore derives the compressed-input
  * denominator from the lake files themselves, never from input_bytes.
  *
  * Env: SPARK_GRAFT_SF_DIR (lake), SPARK_GRAFT_SIZING_OPS (comma list;
  * default = the heavy-operator set below), SPARK_GRAFT_SIZING_OUT.
  */
object Sizing {

  /** The operators whose shuffle volume dominates a training-data pipeline at
    * scale — the rows a 100 TB capacity sheet needs. */
  val defaultOps: Seq[String] = Seq(
    "d01_dedup_exact", "d02_dedup_fingerprint", "d03_minhash_pairs",
    "d04_simhash_pairs", "d05_ngram_jaccard", "d06_embedding_neardup",
    "d07_dedup_clusters", "d08_quality_survivors", "d09_cross_decontam",
    "d10_dup_spans", "t10_passage_dedup", "t13_weighted_sample",
    "s02_ann_lsh", "s03_ann_ivf", "s04_ann_pq", "s05_ann_ivfpq",
    "c01_contamination",
    "o04_interval_overlap", "o07_interval_pairs",
    "x01_tfidf", "x02_kmeans_step", "q02_agg_pricing", "q03_join_agg",
    "d11_semdedup", "t15_lm_perplexity", "d05_ngram_jaccard_t08",
    "t16_dsir_weights", "t17_dsir_resample", "t18_unimax_mix",
    "t19_temperature_mix", "d12_incremental_dedup", "v02_drift_psi",
    "e04_transitions", "t20_source_curation", "x03_random_projection",
    "t21_winnow_fingerprints", "d13_winnow_overlap", "t22_language_id",
    "t23_boilerplate", "i03_fingerprint_index",
    "c02_crawl_pipeline", "s06_ann_ivfpq_residual", "t24_kn_trigram_lm",
    "t25_url_filter", "c03_incremental_crawl", "c04_crawl_kn_gate")

  /** Measurement-only variants that are NOT part of the oracle-gated suite:
    * d05 at a production threshold (t = 0.8) — the prefix filter's lossless
    * prefix shrinks from |s|−ceil(0.4|s|)+1 to |s|−ceil(0.8|s|)+1, so its
    * scaladoc claim ("quadratically more exchange saved at real-world
    * thresholds") becomes a measured number next to the shipped t = 0.4 row. */
  val extraOps: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] = Map(
    "d05_ngram_jaccard_t08" -> ((s: SparkSession, dir: String) =>
      graft.operators.Dedup.ngramJaccardPairs(
        graft.sources.Lake.table(s, dir, "documents")
          .select(org.apache.spark.sql.functions.col("doc_id"),
            org.apache.spark.sql.functions.col("text")),
        "doc_id", "text", shingleN = 3, threshold = 0.8)))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_SIZING_OUT", "SIZING_LAST.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val ops = sys.env.get("SPARK_GRAFT_SIZING_OPS")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(defaultOps)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // One accumulator set, reset per op; the listener bus is async so each op
    // polls to stability before reading (ShuffleMetricsSpec's pattern).
    @volatile var inBytes = 0L; @volatile var inRecords = 0L
    @volatile var swBytes = 0L; @volatile var swRecords = 0L
    @volatile var srBytes = 0L
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null) {
          inBytes += t.taskMetrics.inputMetrics.bytesRead
          inRecords += t.taskMetrics.inputMetrics.recordsRead
          swBytes += t.taskMetrics.shuffleWriteMetrics.bytesWritten
          swRecords += t.taskMetrics.shuffleWriteMetrics.recordsWritten
          srBytes += t.taskMetrics.shuffleReadMetrics.totalBytesRead
        }
    }
    spark.sparkContext.addSparkListener(listener)

    val results = scala.collection.mutable.LinkedHashMap.empty[String, String]
    for (op <- ops) {
      SparkEntry.queries.get(op).orElse(extraOps.get(op)) match {
        case None => System.err.println(s"[sizing] SKIP unknown op $op")
        case Some(fn) =>
          inBytes = 0; inRecords = 0; swBytes = 0; swRecords = 0; srBytes = 0
          val obs = org.apache.spark.sql.Observation()
          fn(spark, sfDir)
            .observe(obs, org.apache.spark.sql.functions.count(
              org.apache.spark.sql.functions.lit(1)).as("n"))
            .write.format("noop").mode("overwrite").save()
          val outRows = obs.get("n").asInstanceOf[Long]
          // poll the async listener bus to stability — on the sum of ALL five
          // accumulators: under local[*] bytesRead under-reports to ~0, so a
          // trailing task-end that moves only records/read-bytes must still
          // extend the stability window or its event is silently dropped
          var last = -1L; var spins = 0
          while (inBytes + inRecords + swBytes + swRecords + srBytes != last
                 && spins < 50) {
            last = inBytes + inRecords + swBytes + swRecords + srBytes
            Thread.sleep(100); spins += 1
          }
          results(op) =
            s"""{"input_rows":$inRecords,"input_bytes":$inBytes,""" +
              s""""shuffle_write_bytes":$swBytes,""" +
              s""""shuffle_write_records":$swRecords,""" +
              s""""shuffle_read_bytes":$srBytes,"output_rows":$outRows}"""
          System.err.println(f"[sizing] $op in=${inBytes / 1e6}%.1fMB/" +
            f"$inRecords rows shufW=${swBytes / 1e6}%.2fMB/$swRecords rows " +
            f"out=$outRows")
          spark.catalog.clearCache()
      }
    }

    val json = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString(
      s"""{"metric":"sizing","sf":${graft.util.Json.str(sfDir)},"ops":{""",
      ",", "}}")
    println(json)
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
