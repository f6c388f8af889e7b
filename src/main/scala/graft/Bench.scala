package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and prints
  * ONE JSON line. Each query is forced through the `noop` sink — unlike `count()`,
  * which lets Catalyst prune all columns and skip most of the work, noop fully
  * materializes every output row, so the timing reflects real execution. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // per query: two discarded warmup runs (codegen/JIT/broadcast build — one
    // is not enough for regex- and loop-heavy compositions, whose C2 tiers
    // keep warming into the third execution), then MIN of 3 timed runs,
    // with an explicit GC between queries — a single long-lived JVM
    // accumulating 44 queries' codegen caches showed 30x-inflated readings on
    // arbitrary queries under best-of-2 (BENCH_r01/r02 outliers).
    // dev knob: SPARK_GRAFT_BENCH_ONLY="d07,d08" limits the run (driver unset -> all)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty[String])
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only.exists(n.startsWith) }
      .map { case (name, fn) =>
      // A failed query must NOT masquerade as a (bogus, fast) timing: it is
      // recorded as null in the JSON and fails the whole bench run (rc != 0)
      // so a regression can never read as a speedup.
      def once(): Either[Throwable, Double] = {
        // queries with an internal persist seam (c02/c03 extraction) must
        // not serve later runs from an earlier run's cache: every timed
        // run pays its own full execution
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          Right((System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable => Left(e) }
      }
      // MIN of 3, not median: instrumented runs showed the host stalling for
      // multi-minute windows that span consecutive runs (a 0.5s/round
      // component loop measured 59s+41s inside one stall, 0.4s right after),
      // so any order statistic but the min is poisoned by scheduler noise
      // unrelated to the engine. Min-of-warm-runs is the standard robust
      // estimator for CPU-bound local benchmarks on shared hosts.
      val best: Option[Double] = once() match { // first warmup, discarded
        case Left(e) =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          None
        case Right(_) =>
          once() // second warmup, discarded
          val runs = (1 to 3).map(_ => once())
          runs.collectFirst { case Left(e) => e } match {
            case Some(e) =>
              System.err.println(s"[bench] $name failed: ${e.getMessage}")
              None
            case None => Some(runs.collect { case Right(t) => t }.min)
          }
      }
      spark.catalog.clearCache()
      System.gc()
      name -> best
    }
    def num(d: Double): String = graft.util.Json.num(d)
    val qs = results.map { case (k, v) =>
      "\"" + k + "\":" + v.map(num).getOrElse("null")
    }.mkString("{", ",", "}")
    val total = results.flatMap(_._2).sum
    val failedQueries = results.collect { case (k, None) => k }

    // BASELINE.md comparison: the reference's end-to-end ingestion class is
    // extract -> transform -> single-file snappy parquet + CTL manifest
    // (~19.4k rows/s single-threaded). Same pipeline, same shape, full lineitem.
    val cfg = graft.config.DatasetConfig(
      datasetId = "bench-ingest",
      source = graft.config.SourceConfig(extractionType = "Query",
        sqlText = "SELECT * FROM lineitem"),
      transformations = Seq(graft.config.TransformConfig("DataCleansing",
        order = 1, config = Map("trimWhitespace" -> true))))
    // best of 2 for the same host-stall reason as the per-query min above;
    // fresh dest per run (the direct-write path refuses to overwrite by design)
    val (pipeSec, pipeRows) = (1 to 2).map { _ =>
      val dest = java.nio.file.Files.createTempDirectory("graft-bench-pipe")
      val t0 = System.nanoTime()
      val ctx = graft.pipeline.IngestionPipeline.run(spark, cfg, sfDir, dest.toString)
      val elapsed = (System.nanoTime() - t0) / 1e9
      graft.util.Scratch.deleteRecursively(dest) // hygiene: no /tmp leak per run
      (elapsed, ctx.rowCount.getOrElse(0L))
    }.minBy(_._1)

    val jsonLine = s"""{"metric":"total","value":${num(total)},"unit":"sec","queries":$qs,""" +
      s""""pipeline_rows":$pipeRows,"pipeline_sec":${num(pipeSec)},""" +
      s""""pipeline_rows_per_sec":${num(if (pipeSec > 0) pipeRows / pipeSec else 0.0)},""" +
      s""""sf":"$sfDir"}"""
    println(jsonLine)
    // stdout tails get truncated by log capture; a file copy keeps the
    // artifact lossless (every query present, parseable). Defaults to
    // BENCH_LAST.json in the working dir so driver-run benches always leave it.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LAST.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (jsonLine + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
    if (failedQueries.nonEmpty) {
      System.err.println(s"[bench] FAILED: ${failedQueries.mkString(", ")}")
      sys.exit(1)
    }
  }
}
