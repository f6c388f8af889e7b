package graft

import graft.sources.Lake
import graft.streaming.EventsStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

class StreamingSpec extends SparkSpec {

  test("AvailableNow windowed aggregation equals the batch GROUP BY") {
    val streamed = EventsStream.runAvailableNow(spark, sf0001,
      EventsStream.hourlyByType, "t_stream_hourly")
      .orderBy("window_start", "event_type").collect()
    val batch = Lake.table(spark, sf0001, "events")
      .groupBy(date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("value_sum"))
      .orderBy("window_start", "event_type").collect()
    assert(streamed.length == batch.length)
    assert(streamed.toSeq == batch.toSeq)
  }

  test("Append-to-files production path emits exactly the watermark-closed windows") {
    val out = graft.util.Scratch.dir("graft-st01-test")
    val streamed = EventsStream.runAvailableNowToFiles(spark, sf0001,
      EventsStream.hourlyByType, s"$out/data", s"$out/ckpt")
      .orderBy("window_start", "event_type").collect()
    val ev = Lake.table(spark, sf0001, "events")
    val mx = ev.agg(max(col("ts"))).head().getTimestamp(0)
    val batch = ev
      .groupBy(date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("value_sum"))
      .filter(col("window_start") + expr("INTERVAL 1 HOUR") <=
        lit(mx) - expr("INTERVAL 2 HOURS"))
      .orderBy("window_start", "event_type").collect()
    assert(streamed.nonEmpty)
    assert(streamed.length == batch.length,
      s"streamed ${streamed.length} windows, batch-closed ${batch.length}")
    assert(streamed.toSeq == batch.toSeq)
  }

  test("hopping windows double-count each event across two windows and finalize") {
    val out = graft.util.Scratch.dir("graft-st09-test")
    val streamed = EventsStream.runAvailableNowToFiles(spark, sf0001,
      EventsStream.hoppingByType, s"$out/data", s"$out/ckpt")
    val ev = Lake.table(spark, sf0001, "events")
    val mx = ev.agg(max(col("ts"))).head().getTimestamp(0)
    // every event belongs to exactly 2 hour-long windows (hop 30 min):
    // the aligned 30-min bucket's window and the one starting 30 min earlier
    val buckets = ev.select(
        explode(array(
          date_trunc("minute", col("ts")) - expr("INTERVAL 1 MINUTE") * (minute(col("ts")) % 30),
          date_trunc("minute", col("ts")) - expr("INTERVAL 1 MINUTE") * (minute(col("ts")) % 30)
            - expr("INTERVAL 30 MINUTES"))).as("window_start"),
        col("event_type"), col("value"))
    val batch = buckets
      .groupBy(col("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("value_sum"))
      .filter(col("window_start") + expr("INTERVAL 1 HOUR") <=
        lit(mx) - expr("INTERVAL 2 HOURS"))
    assert(streamed.count() > 0)
    assert(streamed.orderBy("window_start", "event_type").collect().toSeq ==
      batch.orderBy("window_start", "event_type").collect().toSeq)
  }

  test("windowed drift PSI equals the batch twin; a reference missing a type " +
       "folds it into the other bin (finite, positive drift)") {
    val ev = Lake.table(spark, sf0001, "events")
    val ref = ev.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .orderBy(col("event_type"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val out = graft.util.Scratch.dir("graft-st10-test")
    val streamed = EventsStream.runAvailableNowToFiles(spark, sf0001,
      e => EventsStream.windowedDrift(e, ref), s"$out/data", s"$out/ckpt")
    // withWatermark is a no-op on batch input, so the operator IS its twin
    val mx = ev.agg(max(col("ts"))).head().getTimestamp(0)
    val batch = EventsStream.windowedDrift(ev, ref)
      .filter(col("window_start") + expr("INTERVAL 1 HOUR") <=
        lit(mx) - expr("INTERVAL 2 HOURS"))
    assert(streamed.count() > 0)
    assert(streamed.orderBy("window_start").collect().toSeq ==
      batch.orderBy("window_start").collect().toSeq)
    // drop one reference type: its events fold into the other bin — every
    // window's PSI stays finite and positive, and the corpus-mean drift
    // rises clearly (a ~20%-mass type now reads as fully novel traffic)
    val dropped = ref.filterNot(_._1 == ref.head._1)
    val fullPsi = batch.select(col("psi")).collect().map(_.getDouble(0))
    val dropPsi = EventsStream.windowedDrift(ev, dropped)
      .filter(col("window_start") + expr("INTERVAL 1 HOUR") <=
        lit(mx) - expr("INTERVAL 2 HOURS"))
      .select(col("psi")).collect().map(_.getDouble(0))
    dropPsi.foreach(p => assert(!p.isNaN && !p.isInfinite && p > 0.0))
    assert(dropPsi.sum / dropPsi.length > fullPsi.sum / fullPsi.length,
      "mean drift must rise when a major reference type goes missing")
  }

  test("flatMapGroupsWithState sessionization emits watermark-expired sessions " +
    "that match the batch formulation") {
    import spark.implicits._
    val gap = 30
    val events = EventsStream.readEvents(spark, sf0001)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[EventsStream.Event]
    val q = EventsStream.sessionize(events, gap).writeStream
      .format("memory").queryName("t_sessions")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        graft.util.Scratch.dir("graft-ckpt-sess").toString)
      .start()
    q.awaitTermination()
    val streamed = spark.table("t_sessions")
      .select(col("user_id"), unix_timestamp(col("session_start")).as("s"),
        unix_timestamp(col("session_end")).as("e"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

    val batch = EventsStream.sessionizeBatch(
      Lake.table(spark, sf0001, "events"), gap)
      .select(col("user_id"), unix_timestamp(col("session_start")).as("s"),
        unix_timestamp(col("session_end")).as("e"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

    // the stream can only emit sessions whose timeout passed the final
    // watermark; everything it emits must be a real batch session
    assert(streamed.nonEmpty, "no sessions emitted")
    assert(streamed.subsetOf(batch),
      s"streamed sessions not in batch result: ${streamed.diff(batch).take(3)}")
    // and it must cover most of them (watermark = max ts - 2h holds back only
    // the tail)
    assert(streamed.size >= batch.size / 2,
      s"too few sessions: ${streamed.size} of ${batch.size}")
  }

  test("foreachBatch ingest stream lands parquet + CTL per micro-batch, rows complete") {
    val out = graft.util.Scratch.dir("graft-st-ingest")
    val landed = EventsStream.runIngestStream(spark, sf0001,
      ev => ev.select(col("event_id"), col("user_id")),
      s"$out/data", s"$out/ckpt")
    val total = Lake.table(spark, sf0001, "events").count()
    assert(landed.count() == total)

    val dir = new java.io.File(s"$out/data")
    val parquets = dir.listFiles().filter(_.getName.endsWith(".parquet"))
    val ctls = dir.listFiles().filter(_.getName.endsWith(".ctl"))
    assert(parquets.nonEmpty && parquets.length == ctls.length,
      s"${parquets.length} parquet vs ${ctls.length} ctl files")
    // each manifest's RecordCount matches its parquet file; counts sum to total
    val counts = parquets.sortBy(_.getName).map { pf =>
      val ctl = new java.io.File(pf.getPath.stripSuffix(".parquet") + ".ctl")
      val lines = scala.io.Source.fromFile(ctl).getLines().toSeq
      val n = lines(1).split(",")(0).toLong
      assert(spark.read.parquet(pf.getPath).count() == n)
      n
    }
    assert(counts.sum == total)
  }

  test("schema footer sniff is cached: many stream constructions, one read per path") {
    // fresh path so no earlier test has warmed the cache for it
    val dir = graft.util.Scratch.dir("graft-sniff-cache")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val before = EventsStream.sniffCount.get()
    (1 to 6).foreach(_ => EventsStream.readEvents(spark, dir.toString))
    assert(EventsStream.sniffCount.get() - before == 1,
      "six stream constructions on one path must sniff the footer exactly once")
    // and the cached schema still yields a working stream
    assert(EventsStream.readEvents(spark, dir.toString).isStreaming)

    // invalidation hook: a caller that KNOWS it rewrote the path in place
    // drops the entry and the next construction re-sniffs (per-path form
    // leaves other paths cached)
    EventsStream.invalidateSchemaCache(dir.toString)
    val afterInvalidate = EventsStream.sniffCount.get()
    EventsStream.readEvents(spark, dir.toString)
    assert(EventsStream.sniffCount.get() - afterInvalidate == 1,
      "invalidated path must be re-sniffed on next stream construction")
  }

  test("left-outer stream join emits watermark-finalized unmatched purchases") {
    val out = graft.util.Scratch.dir("graft-st08-spec")
    val res = graft.streaming.EventsStream.runAvailableNowToFiles(spark, sf0001,
      ev => graft.streaming.EventsStream.purchaseClickLeftJoin(ev)
        .select(col("purchase_id"), col("p_ts"), col("click_id")),
      s"$out/data", s"$out/ckpt")
    assert(res.count() > 0)
    assert(res.where(col("click_id").isNull).count() > 0,
      "some purchases have no qualifying click and must still emit")
    // matched rows agree with the inner-join formulation on the same data;
    // the WithState variant must also report the run's peak state rows and
    // state memory — the scaling harness's bounded-state evidence comes from
    // this seam
    val (inner, stateRows, stateMem) = graft.streaming.EventsStream
      .runAvailableNowToFilesWithState(spark, sf0001,
        ev => graft.streaming.EventsStream.purchaseClickJoin(ev)
          .select(col("purchase_id"), col("p_ts"), col("click_id")),
        s"$out/data2", s"$out/ckpt2")
    val matchedOuter = res.where(col("click_id").isNotNull)
      .select("purchase_id", "click_id").collect().toSet
    assert(inner.select("purchase_id", "click_id").collect().toSet == matchedOuter)
    assert(stateRows.exists(_ > 0),
      s"stream-stream join must report peak state rows, got $stateRows")
    assert(stateMem.exists(_ > 0),
      s"stream-stream join must report peak state memory, got $stateMem")
  }
}
