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
    // per query: one discarded warmup run (codegen/JIT/broadcast build), then
    // median of 3 timed runs, with an explicit GC between queries — a single
    // long-lived JVM accumulating 44 queries' codegen caches showed 30x-inflated
    // readings on arbitrary queries under best-of-2 (BENCH_r01/r02 outliers).
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      once() // warmup, discarded
      val median = (1 to 3).map(_ => once()).sorted.apply(1)
      spark.catalog.clearCache()
      System.gc()
      name -> median
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum

    // BASELINE.md comparison: the reference's end-to-end ingestion class is
    // extract -> transform -> single-file snappy parquet + CTL manifest
    // (~19.4k rows/s single-threaded). Same pipeline, same shape, full lineitem.
    val dest = java.nio.file.Files.createTempDirectory("graft-bench-pipe").toString
    val cfg = graft.config.DatasetConfig(
      datasetId = "bench-ingest",
      source = graft.config.SourceConfig(extractionType = "Query",
        sqlText = "SELECT * FROM lineitem"),
      transformations = Seq(graft.config.TransformConfig("DataCleansing",
        order = 1, config = Map("trimWhitespace" -> true))))
    val t0 = System.nanoTime()
    val ctx = graft.pipeline.IngestionPipeline.run(spark, cfg, sfDir, dest)
    val pipeSec = (System.nanoTime() - t0) / 1e9
    val pipeRows = ctx.rowCount.getOrElse(0L)

    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""pipeline_rows":$pipeRows,"pipeline_sec":$pipeSec,""" +
      s""""pipeline_rows_per_sec":${if (pipeSec > 0) pipeRows / pipeSec else 0.0},""" +
      s""""sf":"$sfDir"}""")
    spark.stop()
  }
}
