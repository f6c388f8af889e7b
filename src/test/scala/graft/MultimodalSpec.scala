package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.{MediaRecord, SynthAudio, SynthImage}
import graft.sources.Lake
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private def media = Multimodal.packFromText(
    Lake.table(spark, sf0001, "documents").limit(20), "doc_id", "text", "source")

  private def pngMedia = Multimodal.packSyntheticImages(
    Lake.table(spark, sf0001, "documents").limit(20), "doc_id", "source")

  test("packFromText produces the opaque-payload media schema") {
    val schema = media.schema
    assert(schema("payload").dataType.typeName == "binary")
    assert(schema("media_id").dataType.typeName == "long")
    assert(media.count() == 20)
  }

  test("packSyntheticImages emits genuine PNG bytes") {
    val rows = pngMedia.select("media_id", "payload").collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val bytes = r.getAs[Array[Byte]]("payload")
      // PNG signature: 89 50 4E 47 0D 0A 1A 0A
      assert(bytes.take(8).toSeq ==
        Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    }
  }

  test("extractFeatures decodes real PNGs back to the closed-form features") {
    val feats = Multimodal.extractFeatures(pngMedia).collect()
    assert(feats.length == 20)
    feats.foreach { f =>
      val id = f.media_id
      assert(f.width == SynthImage.width(id))
      assert(f.height == SynthImage.height(id))
      assert(f.channels == 3)
      var sum = 0L
      for (y <- 0 until f.height; x <- 0 until f.width; c <- 0 until 3)
        sum += SynthImage.sample(id, x, y, c)
      val expected = sum.toDouble / (f.width.toLong * f.height * 3).toDouble / 255.0
      assert(f.mean_intensity == expected) // lossless round trip — exact
      assert(f.n_bytes > 8) // real encoded size, not a formula
    }
  }

  test("extractFeatures drops undecodable payloads instead of failing the stage") {
    val spark2 = spark
    import spark2.implicits._
    val corrupt = Seq(
      MediaRecord(1L, "image", SynthImage.png(1L), "ok"),
      MediaRecord(2L, "image", Array[Byte](1, 2, 3, 4), "bad"),
      MediaRecord(3L, "image", Array.emptyByteArray, "empty")).toDF()
    val out = Multimodal.extractFeatures(corrupt).collect()
    assert(out.map(_.media_id).toSeq == Seq(1L))
  }

  test("packSyntheticAudio emits genuine RIFF/WAVE bytes") {
    val wavMedia = Multimodal.packSyntheticAudio(
      Lake.table(spark, sf0001, "documents").limit(20), "doc_id", "source")
    val rows = wavMedia.select("media_id", "payload").collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val bytes = r.getAs[Array[Byte]]("payload")
      assert(new String(bytes.take(4), "US-ASCII") == "RIFF")
      assert(new String(bytes.slice(8, 12), "US-ASCII") == "WAVE")
    }
  }

  test("extractAudioFeatures decodes real WAVs back to the closed-form features") {
    val wavMedia = Multimodal.packSyntheticAudio(
      Lake.table(spark, sf0001, "documents").limit(20), "doc_id", "source")
    val feats = Multimodal.extractAudioFeatures(wavMedia).collect()
    assert(feats.length == 20)
    feats.foreach { f =>
      val id = f.media_id
      assert(f.sample_rate == SynthAudio.sampleRate(id))
      assert(f.channels == 1)
      assert(f.bits == 16)
      assert(f.n_samples == SynthAudio.nSamples(id).toLong)
      var ss = 0L
      for (i <- 0 until SynthAudio.nSamples(id)) {
        val s = SynthAudio.sample(id, i).toLong
        ss += s * s
      }
      // lossless PCM round trip — doubles match exactly, not approximately
      assert(f.duration_sec == f.n_samples.toDouble / f.sample_rate)
      assert(f.rms == math.sqrt(ss.toDouble / f.n_samples))
    }
  }

  test("extractAudioFeatures drops undecodable payloads instead of failing the stage") {
    val spark2 = spark
    import spark2.implicits._
    val corrupt = Seq(
      MediaRecord(1L, "audio", SynthAudio.wav(1L), "ok"),
      MediaRecord(2L, "audio", Array[Byte](82, 73, 70, 70, 1, 2, 3), "truncated"),
      MediaRecord(3L, "audio", Array.emptyByteArray, "empty"),
      MediaRecord(4L, "audio", SynthImage.png(4L), "wrong-codec")).toDF()
    val out = Multimodal.extractAudioFeatures(corrupt).collect()
    assert(out.map(_.media_id).toSeq == Seq(1L))
  }

  test("video container round-trips: sampled frames decode to closed-form features") {
    import graft.operators.Multimodal.SynthVideo
    val vids = Multimodal.packSyntheticVideo(
      Lake.table(spark, sf0001, "documents").limit(20), "doc_id", "source")
    val feats = Multimodal.extractSampledFrames(vids, stride = 2).collect()
    val byDoc = feats.groupBy(_.media_id)
    assert(byDoc.size == 20)
    feats.foreach { f =>
      val fk = SynthVideo.frameKey(f.media_id, f.frame_idx)
      assert(f.frame_idx % 2 == 0)
      assert(f.width == SynthImage.width(fk))
      assert(f.height == SynthImage.height(fk))
      var sum = 0L
      for (y <- 0 until f.height; x <- 0 until f.width; c <- 0 until 3)
        sum += SynthImage.sample(fk, x, y, c)
      assert(f.mean_intensity ==
        sum.toDouble / (f.width.toLong * f.height * 3).toDouble / 255.0)
    }
    byDoc.foreach { case (id, fs) =>
      // frames 0, 2, 4... up to nFrames — sampling is an index walk, exact
      val expect = (0 until SynthVideo.nFrames(id)).filter(_ % 2 == 0)
      assert(fs.map(_.frame_idx).sorted.toSeq == expect)
    }
  }

  test("video codec: bad magic yields no rows; truncated tail drops cleanly") {
    import graft.operators.Multimodal.{SynthVideo, VideoCodec}
    val good = SynthVideo.container(7L)
    assert(VideoCodec.sampleFrames(
      MediaRecord(7L, "video", good, "ok"), 1).size == SynthVideo.nFrames(7L))
    // wrong magic: not this container format
    assert(VideoCodec.sampleFrames(
      MediaRecord(8L, "video", "AVI0".getBytes ++ good.drop(4), "bad"), 1).isEmpty)
    // truncated mid-frame: frames before the cut survive, tail drops
    val cut = good.take(good.length - 3)
    val partial = VideoCodec.sampleFrames(
      MediaRecord(7L, "video", cut, "cut"), 1).toSeq
    assert(partial.size == SynthVideo.nFrames(7L) - 1)
    assert(partial.map(_.frame_idx) == (0 until SynthVideo.nFrames(7L) - 1))
  }

  test("GIF container round-trips: real GIF89a bytes, frames decode closed-form") {
    import graft.operators.Multimodal.SynthGif
    // the payload is a genuine GIF file (public container, not bespoke framing)
    val bytes = SynthGif.container(5L)
    assert(new String(bytes.take(6), "US-ASCII") == "GIF89a", "not a GIF89a header")
    val gifs = Multimodal.packSyntheticGif(
      Lake.table(spark, sf0001, "documents").limit(20), "doc_id", "source")
    val feats = Multimodal.extractGifFrames(gifs, stride = 2).collect()
    val byDoc = feats.groupBy(_.media_id)
    assert(byDoc.size == 20)
    feats.foreach { f =>
      assert(f.frame_idx % 2 == 0)
      assert(f.width == SynthGif.width(f.media_id))
      assert(f.height == SynthGif.height(f.media_id))
      var sum = 0L
      for (y <- 0 until f.height; x <- 0 until f.width)
        sum += 3L * SynthGif.gray(f.media_id, f.frame_idx, x, y)
      assert(f.mean_intensity ==
        sum.toDouble / (f.width.toLong * f.height * 3).toDouble / 255.0)
    }
    byDoc.foreach { case (id, fs) =>
      val expect = (0 until SynthGif.nFrames(id)).filter(_ % 2 == 0)
      assert(fs.map(_.frame_idx).sorted.toSeq == expect)
    }
  }

  test("GIF codec: non-GIF payloads yield no rows, not failures") {
    import graft.operators.Multimodal.GifCodec
    assert(GifCodec.sampleFrames(
      MediaRecord(1L, "video", Array.emptyByteArray, "empty"), 1).isEmpty)
    assert(GifCodec.sampleFrames(
      MediaRecord(2L, "video", "not a gif at all".getBytes, "junk"), 1).isEmpty)
    // a PNG payload finds the png reader, which has exactly one frame — the
    // gif sampler still behaves (decodes it as frame 0) rather than crashing
    val png = GifCodec.sampleFrames(
      MediaRecord(3L, "video", SynthImage.png(3L), "png"), 1).toSeq
    assert(png.size <= 1)
  }

  test("GIF codec: malformed LZW/truncated GIF bytes drop, never crash the task") {
    import graft.operators.Multimodal.{GifCodec, SynthGif}
    val good = SynthGif.container(7L)
    // Corruptions past the header keep the gif ImageReader selected, so the
    // failure surfaces inside getNumImages/read — historically as
    // RuntimeExceptions (AIOOBE from the LZW decoder), which the
    // drop-not-crash contract must swallow, not just IOException.
    // (bytes, dimsPinned): truncations leave every surviving frame's image
    // descriptor intact, so decoded frames must carry the true dimensions; a
    // mid-stream byte FLIP may legitimately land in (or shift parsing into) a
    // descriptor, where a partial decode with odd dims still honors the
    // drop-not-crash contract — only no-throw is pinned there.
    val corruptions = Seq(
      (good.take(good.length / 2), true),              // truncated mid-stream
      (good.take(20), true),                           // header + screen desc only
      (good.updated(good.length / 2, 0xFF.toByte)      // flipped bytes mid-stream
        .updated(good.length / 2 + 1, 0x00.toByte), false))
    corruptions.zipWithIndex.foreach { case ((bytes, dimsPinned), i) =>
      // must not throw; partial decode (frames before the corruption) is fine
      val out = GifCodec.sampleFrames(
        MediaRecord(100L + i, "video", bytes, "corrupt"), 1).toSeq
      if (dimsPinned) out.foreach { f =>
        assert(f.width == SynthGif.width(7L) && f.height == SynthGif.height(7L),
          s"frame from corrupt container has wrong dims ${f.width}x${f.height}")
      }
    }
  }

  test("frame extractors reject a non-positive stride at plan time") {
    val gifs = Multimodal.packSyntheticGif(
      Lake.table(spark, sf0001, "documents").limit(2), "doc_id", "source")
    intercept[IllegalArgumentException](Multimodal.extractGifFrames(gifs, stride = 0))
    intercept[IllegalArgumentException](Multimodal.extractGifFrames(gifs, stride = -1))
    intercept[IllegalArgumentException](Multimodal.extractSampledFrames(gifs, stride = 0))
    intercept[IllegalArgumentException](Multimodal.sampleFrames(media, stride = 0))
    intercept[IllegalArgumentException](Multimodal.sampleFrames(media, frameBytes = 0))
  }

  test("materialize packs once per key per JVM and round-trips the media table") {
    Multimodal.clearMediaCache()
    val docs = Lake.table(spark, sf0001, "documents").limit(10)
    def packed = Multimodal.packSyntheticGif(docs, "doc_id", "source")
    val before = Multimodal.packCount.get()
    val first = Multimodal.materialize(spark, "spec#gif")(packed)
    assert(Multimodal.packCount.get() - before == 1)
    // second call with the same key: cache hit — the by-name fixture is not
    // re-packed, the table is read back from parquet
    val second = Multimodal.materialize(spark, "spec#gif")(
      sys.error("cache miss: packer re-evaluated"))
    assert(Multimodal.packCount.get() - before == 1)
    assert(second.count() == 10 && first.count() == 10)
    // the parquet round trip preserves payload bytes exactly: decoded frame
    // features from the materialized table equal the direct-pack features
    val direct = Multimodal.extractGifFrames(packed, stride = 2)
      .collect().map(f => (f.media_id, f.frame_idx, f.mean_intensity)).sorted.toSeq
    val viaCache = Multimodal.extractGifFrames(second, stride = 2)
      .collect().map(f => (f.media_id, f.frame_idx, f.mean_intensity)).sorted.toSeq
    assert(viaCache == direct)
    Multimodal.clearMediaCache()
  }

  test("sampleFrames keeps every stride-th pseudo-frame") {
    val out = Multimodal.sampleFrames(media, frameBytes = 64, stride = 2)
    val rows = out.filter(col("media_id") === out.select(min("media_id")).first().getLong(0))
      .orderBy("frame_idx").collect()
    val idxs = rows.map(_.getAs[Int]("frame_idx")).toSeq
    assert(idxs == idxs.indices.map(_ * 2)) // 0, 2, 4, ...
    val nFrames = rows.head.getAs[Int]("n_frames")
    assert(idxs.last < nFrames)
  }
}
