package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool (r13 optimization round): stage-by-stage wall decomposition of
  * the composed crawl pipelines (c02/c03/c04) — which stage of the ONE lazy
  * plan actually costs, measured by materializing successively longer
  * prefixes of the chain to the noop sink. Each prefix is timed in its own
  * fresh-cache run, min of `reps`. Usage:
  *   runMain graft.OptProbe <sfDir> [reps]
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
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

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(label: String)(mk: => DataFrame): Unit = {
      val ts = (1 to reps).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        spark.sparkContext.setJobDescription(label)
        noop(mk)
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[opt] $label%-34s min=${ts.min}%6.2f  runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    val pages = graft.sources.Lake.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"), col("source"),
        concat(
          lit("<html><body><nav><a href=\"/\">home</a> " +
            "<a href=\"/a\">about</a> <a href=\"/c\">contact</a></nav><p>"),
          col("text"),
          lit("</p><div class=\"foot\"><a href=\"/t\">terms</a> " +
            "<a href=\"/p\">privacy</a> all rights reserved</div>" +
            "</body></html>")).as("html"))

    def ext0 = graft.operators.Boilerplate.extract(pages, "doc_id", "html",
        carry = Seq("lang", "source"))
      .select(col("doc_id"), col("lang"), col("source"), col("extracted_text"))

    time("extract")(ext0)
    time("extract+langid")({
      val ext = ext0
      graft.operators.LangId.classify(
        ext.where(col("doc_id") % 5 =!= 0), ext, "doc_id", "extracted_text", "lang")
    })
    time("langid over persisted ext")({
      val ext = ext0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      ext.count() // force the cache so langid pays only its own work
      graft.operators.LangId.classify(
        ext.where(col("doc_id") % 5 =!= 0), ext, "doc_id", "extracted_text", "lang")
    })
    time("kn score over persisted ext")({
      val ext = ext0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      ext.count()
      graft.operators.Quality.knTrigramScore(ext, "doc_id", "extracted_text")
    })
    time("quality flags over persisted ext")({
      val ext = ext0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      ext.count()
      graft.operators.Quality.flags(ext, "extracted_text")
    })
    time("c02 full")(
      graft.operators.CrawlPipeline.curate(pages, "doc_id", "html",
        "lang", "source",
        labeledPred = col("doc_id") % 5 =!= 0, targetLangs = Seq("en"),
        dsirTargetPred = col("doc_id") % 13 === 0,
        sampleK = 100, packBudget = 512L, persistExtracted = true))
    time("c04 full")(
      graft.operators.CrawlPipeline.curate(pages, "doc_id", "html",
        "lang", "source",
        labeledPred = col("doc_id") % 5 =!= 0, targetLangs = Seq("en"),
        dsirTargetPred = col("doc_id") % 13 === 0,
        sampleK = 100, packBudget = 512L, persistExtracted = true,
        knHeadFrac = Some(0.8)))

    // --- c03: per-JOB wall breakdown of one full run ---
    if (args.contains("--c03")) {
      val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
      val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Double)]()
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.put(e.jobId, (Option(e.properties.getProperty("spark.job.description"))
            .orElse(Option(e.properties.getProperty("callSite.short")))
            .getOrElse(""), System.nanoTime()))
        override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val (d, t0) = jobs.getOrDefault(e.jobId, ("?", System.nanoTime()))
          done.add((e.jobId, d, (System.nanoTime() - t0) / 1e9))
        }
      }
      spark.sparkContext.addSparkListener(l)
      spark.catalog.clearCache()
      val fn = SparkEntry.queries("c03_incremental_crawl")
      val t0 = System.nanoTime()
      noop(fn(spark, sfDir))
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      spark.sparkContext.removeSparkListener(l)
      println(f"[opt] c03 wall: $wall%.2f s, jobs: ${done.size()}")
      done.iterator().forEachRemaining { case (id, d, s) =>
        println(f"[opt]   job $id%3d ${s}%6.2f s  $d")
      }
    }
    spark.stop()
  }
}
