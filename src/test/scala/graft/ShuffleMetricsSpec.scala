package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame

/** Plan-shape tests pin STRUCTURE; this spec pins actual shuffle VOLUME via
  * task metrics — the difference between "the plan looks right" and "the
  * bytes really don't move". */
class ShuffleMetricsSpec extends SparkSpec {

  /** Total shuffle-write bytes of one action, via a task-metrics listener. */
  private def shuffleWriteBytes(df: DataFrame): Long = {
    val sc = spark.sparkContext
    @volatile var bytes = 0L
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          bytes += t.taskMetrics.shuffleWriteMetrics.bytesWritten
    }
    sc.addSparkListener(listener)
    try {
      df.write.format("noop").mode("overwrite").save()
      // listener bus is async; poll until the metric stabilizes
      var last = -1L
      var spins = 0
      while (bytes != last && spins < 50) {
        last = bytes; Thread.sleep(100); spins += 1
      }
      bytes
    } finally sc.removeSparkListener(listener)
  }

  test("heap top-k aggregate shuffles a fraction of the window formulation") {
    // same question (top-3 lineitems per returnflag): the window plan must
    // shuffle every row; the heap aggregate's map-side combine sends at most
    // k rows per group per partition to the exchange.
    val windowBytes = shuffleWriteBytes(
      SparkEntry.queries("q05_window_topn")(spark, sf0001))
    val heapBytes = shuffleWriteBytes(
      SparkEntry.queries("o05_topk_per_group")(spark, sf0001))
    assert(heapBytes > 0 && windowBytes > 0)
    assert(heapBytes * 5 < windowBytes,
      s"heap aggregate shuffled $heapBytes B vs window's $windowBytes B — " +
        "map-side combine is not doing its job")
  }

  test("fingerprint dedup shuffle stays near the distinct payload, not raw size") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // 2000 copies of 10 distinct ~1KB documents: partial aggregation must
    // collapse duplicates BEFORE the exchange, so shuffle volume tracks the
    // 10 distinct docs (~10KB), not the 2MB raw corpus.
    val doc = "lorem ipsum dolor sit amet " * 40 // ~1KB
    val docs = (1 to 2000).map(i => (i.toLong, s"$doc${i % 10}")).toDF("doc_id", "text")
    val rawBytes = 2000L * doc.length
    val got = shuffleWriteBytes(
      graft.operators.Dedup.exactGroups(docs, "doc_id", "text"))
    assert(got > 0)
    assert(got < rawBytes / 20,
      s"dedup shuffled $got B on a ${rawBytes} B corpus with 10 distinct docs")
  }

  test("contamination sweep: corpus grams never cross an exchange to meet eval") {
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Lake.table(spark, sf0001, "documents")
      .select(col("doc_id"), col("text"))
    val evalDf = docs.where(col("doc_id") % 97 === 0)
    val total = shuffleWriteBytes(
      graft.operators.Contamination.overlap(docs, evalDf, "doc_id", "text", n = 3))
    // the only exchange is the final per-doc count aggregate over (doc_id,
    // gram_h) hits — a few KB; corpus gram text (hundreds of KB) must not move
    val corpusTextBytes = docs.agg(sum(length(col("text")))).head().getLong(0)
    assert(total < corpusTextBytes / 10,
      s"contamination shuffled $total B vs $corpusTextBytes B of corpus text")
  }
}
