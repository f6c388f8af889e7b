package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` payloads with
  * typed metadata, and batched per-partition feature extraction.
  *
  * The image path is REAL: payloads are genuine PNG files and
  * [[ImageCodec.decode]] runs `javax.imageio.ImageIO` (public JDK) to recover
  * width/height/channels and compute mean pixel intensity from the decoded
  * raster. Because PNG is lossless, a deterministic synthetic image (dims and
  * pixel values closed-form in the id — [[SynthImage]]) round-trips exactly,
  * which is what lets the DuckDB oracle check the decoded features value-for-value
  * without having a PNG decoder of its own.
  *
  * Scale notes: payloads never pass through a shuffle here — extraction is a
  * narrow `mapPartitions` directly over the scan; metadata-only queries should
  * select the typed columns so the parquet reader prunes the (huge) binary column
  * away entirely. `ImageIO`'s disk-backed stream cache is disabled once per JVM
  * (it would otherwise write a temp file per decode on every executor).
  */
object Multimodal {

  /** One media row: opaque payload + typed metadata. */
  final case class MediaRecord(
      media_id: Long,
      media_type: String, // "image" | "audio" | "video"
      payload: Array[Byte],
      source: String)

  /** Extracted features — fixed, flat schema so downstream is pure relational. */
  final case class MediaFeatures(
      media_id: Long,
      media_type: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      channels: Int,
      mean_intensity: Double)

  /** Deterministic synthetic image: dims and every RGB sample are closed-form in
    * the id, so an external oracle can recompute the expected features while the
    * engine proves them through a real PNG encode→decode round trip. */
  object SynthImage {
    def width(id: Long): Int  = (id % 16 + 4).toInt  // 4..19 px
    def height(id: Long): Int = (id % 12 + 4).toInt  // 4..15 px

    /** Channel sample at (x, y): c=0/1/2 for R/G/B. */
    def sample(id: Long, x: Int, y: Int, c: Int): Int =
      ((id * 31 + x * 7 + y * 13 + c * 5) % 256).toInt

    /** Encode the synthetic image as a real PNG via javax.imageio. */
    def png(id: Long): Array[Byte] = {
      val w = width(id); val h = height(id)
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = (sample(id, x, y, 0) << 16) | (sample(id, x, y, 1) << 8) |
            sample(id, x, y, 2)
          img.setRGB(x, y, rgb)
          x += 1
        }
        y += 1
      }
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
  }

  /** Exact integer RGB sum over the raster; one entry point so every codec's
    * mean-intensity doubles are built from the same integers with the same
    * IEEE op order (what lets an ANSI-SQL oracle match them bit-for-bit). */
  private def rgbSum(img: BufferedImage): Long = {
    var sum = 0L
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
        x += 1
      }
      y += 1
    }
    sum
  }

  /** intensity over the RGB planes regardless of alpha presence */
  private def meanIntensity(img: BufferedImage): Double =
    rgbSum(img).toDouble / (img.getWidth.toLong * img.getHeight * 3).toDouble / 255.0

  /** Real image decoder: `ImageIO.read` over the payload bytes. Corrupt or
    * non-image payloads yield `None` (callers drop them — a 100 TB media crawl
    * always contains undecodable bytes; crashing the stage on one is wrong).
    * All codec catches here are `NonFatal`, not just `IOException`: the JDK
    * readers throw RuntimeExceptions on malformed data (e.g.
    * ArrayIndexOutOfBoundsException from the GIF LZW decoder), and the
    * drop-not-crash contract covers those bytes too. */
  object ImageCodec {
    // One-time JVM setting: keep ImageIO off its disk-backed stream cache.
    ImageIO.setUseCache(false)

    def decode(r: MediaRecord): Option[MediaFeatures] = {
      val img =
        try ImageIO.read(new ByteArrayInputStream(r.payload))
        catch { case scala.util.control.NonFatal(_) => null }
      if (img == null) None
      else
        Some(MediaFeatures(r.media_id, r.media_type, r.payload.length.toLong,
          img.getWidth, img.getHeight, img.getColorModel.getNumComponents,
          meanIntensity(img)))
    }
  }

  /** Extracted audio features — flat schema, same design as [[MediaFeatures]]. */
  final case class AudioFeatures(
      media_id: Long,
      media_type: String,
      sample_rate: Int,
      channels: Int,
      bits: Int,
      n_samples: Long,
      duration_sec: Double,
      rms: Double)

  /** Deterministic synthetic audio: sample count, rate, and every 16-bit PCM
    * sample are closed-form in the id, so an external oracle recomputes the
    * expected duration/RMS while the engine proves them through a real WAV
    * encode→decode round trip (`javax.sound.sampled`, public JDK — WAV PCM is
    * lossless, the audio analogue of [[SynthImage]]'s PNG argument). */
  object SynthAudio {
    private val rates = Array(8000, 11025, 16000, 22050)
    def sampleRate(id: Long): Int = rates((id % 4).toInt)
    def nSamples(id: Long): Int   = (id % 256 + 64).toInt

    /** Signed 16-bit PCM sample i, range -1001..1001. */
    def sample(id: Long, i: Int): Int = ((id * 31 + i * 17) % 2003).toInt - 1001

    /** Encode as a real RIFF/WAVE file: 16-bit little-endian mono PCM. */
    def wav(id: Long): Array[Byte] = {
      import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
      val n = nSamples(id)
      val pcm = new Array[Byte](n * 2)
      var i = 0
      while (i < n) {
        val s = sample(id, i)
        pcm(2 * i) = (s & 0xff).toByte
        pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new AudioFormat(sampleRate(id).toFloat, 16, 1, true, false)
      val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, n.toLong)
      val bos = new ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
  }

  /** Real audio decoder: `AudioSystem.getAudioInputStream` parses the RIFF
    * header (rate/channels/bits) and yields raw PCM frames; RMS and duration
    * come from the decoded samples. Undecodable payloads yield `None`, same
    * drop-not-fatal contract as [[ImageCodec]]. Sum of squares stays in exact
    * Long arithmetic; the only floating ops are the final two divisions and
    * the sqrt, so an ANSI-SQL oracle reproduces the doubles bit-for-bit. */
  object AudioCodec {
    def decode(r: MediaRecord): Option[AudioFeatures] = {
      import javax.sound.sampled.{AudioSystem, UnsupportedAudioFileException}
      val ais =
        try AudioSystem.getAudioInputStream(new ByteArrayInputStream(r.payload))
        catch {
          case _: UnsupportedAudioFileException => null
          case scala.util.control.NonFatal(_) => null
        }
      if (ais == null) None
      else {
        val fmt = ais.getFormat
        val bytes = ais.readAllBytes()
        val bits = fmt.getSampleSizeInBits
        val channels = fmt.getChannels
        if (bits != 16 || fmt.isBigEndian) None // scope: 16-bit LE PCM
        else {
          val n = bytes.length / 2
          var ss = 0L
          var i = 0
          while (i < n) {
            val s = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort.toInt
            ss += s.toLong * s
            i += 1
          }
          val perChannel = n.toLong / channels
          val rate = fmt.getSampleRate.toDouble
          Some(AudioFeatures(r.media_id, r.media_type, fmt.getSampleRate.toInt,
            channels, bits, perChannel,
            perChannel.toDouble / rate,
            math.sqrt(ss.toDouble / n)))
        }
      }
    }
  }

  /** Per-frame features from a decoded video-style container. */
  final case class FrameFeatures(
      media_id: Long,
      frame_idx: Int,
      width: Int,
      height: Int,
      mean_intensity: Double)

  /** Deterministic synthetic "video": a length-prefixed stream of REAL PNG
    * frames (`GFV1` magic, then per frame a 4-byte big-endian length + the
    * PNG bytes). Container framing is the part a video pipeline owns — the
    * per-frame codec is the image path, reused. Frame f of id is
    * [[SynthImage]] keyed by `id * 1000 + f`, so every sampled frame's
    * decoded features stay closed-form for the oracle. */
  object SynthVideo {
    val Magic: Array[Byte] = "GFV1".getBytes("US-ASCII")
    def nFrames(id: Long): Int = (id % 6 + 2).toInt // 2..7 frames
    def frameKey(id: Long, f: Int): Long = id * 1000L + f

    def container(id: Long): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      bos.write(Magic)
      var f = 0
      while (f < nFrames(id)) {
        val png = SynthImage.png(frameKey(id, f))
        bos.write(png.length >>> 24); bos.write(png.length >>> 16)
        bos.write(png.length >>> 8); bos.write(png.length)
        bos.write(png)
        f += 1
      }
      bos.toByteArray
    }
  }

  /** Real frame sampler + decoder: walk the container's frame index, decode
    * ONLY every `stride`-th frame via `ImageIO` (skipped frames cost a seek,
    * not a decode — the point of frame sampling), and emit per-frame
    * features. A payload without the magic or with a corrupt length yields
    * no rows; an individually undecodable frame is skipped, not fatal —
    * the same drop contract as [[ImageCodec]]/[[AudioCodec]]. */
  object VideoCodec {
    def sampleFrames(r: MediaRecord, stride: Int): Iterator[FrameFeatures] = {
      val p = r.payload
      val m = SynthVideo.Magic
      if (p.length < m.length + 4 || !p.take(m.length).sameElements(m))
        return Iterator.empty
      val out = scala.collection.mutable.ArrayBuffer.empty[FrameFeatures]
      var off = m.length
      var f = 0
      while (off + 4 <= p.length) {
        val len = ((p(off) & 0xff) << 24) | ((p(off + 1) & 0xff) << 16) |
          ((p(off + 2) & 0xff) << 8) | (p(off + 3) & 0xff)
        off += 4
        if (len < 0 || off + len > p.length) return out.iterator // truncated tail
        if (f % stride == 0) {
          val img =
            try ImageIO.read(new ByteArrayInputStream(p, off, len))
            catch { case scala.util.control.NonFatal(_) => null }
          if (img != null)
            out += FrameFeatures(r.media_id, f, img.getWidth, img.getHeight,
              meanIntensity(img))
        }
        off += len
        f += 1
      }
      out.iterator
    }
  }

  /** Deterministic synthetic multi-frame GIF — the PUBLIC-container video
    * path (GIF89a via the JDK's `ImageIO` gif plugin), complementing
    * [[SynthVideo]]'s bespoke length-prefixed framing. GIF frames are
    * palette-indexed (≤256 colors), so losslessness needs frames that fit one
    * palette: each frame is 8-bit GRAYSCALE over a 256-entry identity gray
    * ramp — an indexed write/read round-trips every sample exactly, which is
    * what keeps the decoded features closed-form for the oracle. All frames
    * of one container share the logical-screen dims (constant frame size,
    * like real video); pixels vary per frame. */
  object SynthGif {
    def nFrames(id: Long): Int = (id % 6 + 2).toInt // 2..7 frames
    def width(id: Long): Int   = (id % 16 + 4).toInt
    def height(id: Long): Int  = (id % 12 + 4).toInt

    /** Gray level of frame f at (x, y) — closed form for the oracle. */
    def gray(id: Long, f: Int, x: Int, y: Int): Int =
      ((id * 31 + f * 97 + x * 7 + y * 13) % 256).toInt

    private val grayRamp: java.awt.image.IndexColorModel = {
      val ramp = Array.tabulate(256)(_.toByte)
      new java.awt.image.IndexColorModel(8, 256, ramp, ramp, ramp)
    }

    def frame(id: Long, f: Int): BufferedImage = {
      val w = width(id); val h = height(id)
      val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, grayRamp)
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { raster.setSample(x, y, 0, gray(id, f, x, y)); x += 1 }
        y += 1
      }
      img
    }

    /** Encode as a real multi-frame GIF via `ImageWriter.writeToSequence`. */
    def container(id: Long): Array[Byte] = {
      val writer = ImageIO.getImageWritersByFormatName("gif").next()
      val bos = new ByteArrayOutputStream()
      val ios = ImageIO.createImageOutputStream(bos)
      try {
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        var meta: javax.imageio.metadata.IIOMetadata = null
        var f = 0
        while (f < nFrames(id)) {
          val img = frame(id, f)
          if (meta == null) {
            // The JDK writer defaults to INTERLACED output, whose 4-pass row
            // order (0,2,1,3 at height 4) does not survive its own read path
            // for sub-8-row frames — write sequential rows explicitly. All
            // frames of a container share dims+palette, so the metadata tree
            // is built once and reused across the sequence.
            meta = writer.getDefaultImageMetadata(
              new javax.imageio.ImageTypeSpecifier(img), writer.getDefaultWriteParam)
            val fmt = meta.getNativeMetadataFormatName
            val tree = meta.getAsTree(fmt).asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
            val desc = tree.getElementsByTagName("ImageDescriptor").item(0)
              .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
            desc.setAttribute("interlaceFlag", "FALSE")
            meta.setFromTree(fmt, tree)
          }
          writer.writeToSequence(new javax.imageio.IIOImage(img, null, meta), null)
          f += 1
        }
        writer.endWriteSequence()
      } finally { writer.dispose(); ios.close() }
      bos.toByteArray
    }
  }

  /** Real GIF frame sampler: the format's own `ImageReader` walks the frame
    * sequence; only every `stride`-th frame is raster-decoded. Non-GIF or
    * corrupt payloads yield no rows; a bad individual frame is skipped —
    * the same drop contract as the other codecs. */
  object GifCodec {
    def sampleFrames(r: MediaRecord, stride: Int): Iterator[FrameFeatures] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[FrameFeatures]
      val iis =
        try ImageIO.createImageInputStream(new ByteArrayInputStream(r.payload))
        catch { case scala.util.control.NonFatal(_) => null }
      if (iis == null) return Iterator.empty
      try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return Iterator.empty
        val reader = readers.next()
        try {
          reader.setInput(iis, false, true)
          // NonFatal, not IOException: the JDK GIF reader throws
          // ArrayIndexOutOfBoundsException (and kin) on malformed LZW data —
          // a corrupt crawl payload must drop, not crash the stage.
          val n = try reader.getNumImages(true)
                  catch { case scala.util.control.NonFatal(_) => 0 }
          var f = 0
          while (f < n) {
            if (f % stride == 0) {
              val img = try reader.read(f)
                        catch { case scala.util.control.NonFatal(_) => null }
              if (img != null)
                out += FrameFeatures(r.media_id, f, img.getWidth, img.getHeight,
                  meanIntensity(img))
            }
            f += 1
          }
        } finally reader.dispose()
      } finally iis.close()
      out.iterator
    }
  }

  /** Pack real multi-frame GIF containers ([[SynthGif.container]]). */
  def packSyntheticGif(df: DataFrame, idCol: String, sourceCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(sourceCol).as("src"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, src) =>
        MediaRecord(id, "video", SynthGif.container(id), src)
      })
      .toDF()
  }

  /** Batched GIF frame-sample + decode over the container column. */
  def extractGifFrames(media: DataFrame, stride: Int = 2): Dataset[FrameFeatures] = {
    // Fail at plan time, not as an ArithmeticException (f % 0) inside an
    // executor task; a negative stride would silently emit only frame 0.
    require(stride > 0, s"stride must be positive, got $stride")
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions(_.flatMap(GifCodec.sampleFrames(_, stride)))
  }

  /** Pack real frame containers ([[SynthVideo.container]]) keyed by an id. */
  def packSyntheticVideo(df: DataFrame, idCol: String, sourceCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(sourceCol).as("src"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, src) =>
        MediaRecord(id, "video", SynthVideo.container(id), src)
      })
      .toDF()
  }

  /** Batched frame-sample + decode over the container column. */
  def extractSampledFrames(media: DataFrame, stride: Int = 2): Dataset[FrameFeatures] = {
    require(stride > 0, s"stride must be positive, got $stride")
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions(_.flatMap(VideoCodec.sampleFrames(_, stride)))
  }

  /** Pack real WAV payloads ([[SynthAudio.wav]]) keyed by an id column; the
    * encode runs in the executors, same as [[packSyntheticImages]]. */
  def packSyntheticAudio(df: DataFrame, idCol: String, sourceCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(sourceCol).as("src"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, src) =>
        MediaRecord(id, "audio", SynthAudio.wav(id), src)
      })
      .toDF()
  }

  /** Batched audio feature extraction — iterator-in/iterator-out per
    * partition, undecodable rows dropped (see [[extractFeatures]]). */
  def extractAudioFeatures(media: DataFrame): Dataset[AudioFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions(_.flatMap(AudioCodec.decode))
  }

  /** Pack a text table into the media shape (opaque-bytes stand-in:
    * `encode(text)` is the payload). Used by the metadata-only paths (m02/m03)
    * where the payload is never decoded. */
  def packFromText(df: DataFrame, idCol: String, textCol: String,
                   sourceCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit("image").as("media_type"),
      encode(col(textCol), "UTF-8").as("payload"),
      col(sourceCol).as("source"))

  /** Pack real PNG payloads ([[SynthImage.png]]) keyed by an id column. The
    * encode runs distributed in the executors — the driver never sees a byte. */
  def packSyntheticImages(df: DataFrame, idCol: String, sourceCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(sourceCol).as("src"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, src) =>
        MediaRecord(id, "image", SynthImage.png(id), src)
      })
      .toDF()
  }

  /** Batched feature extraction: one decoder invocation stream per partition —
    * the Scala analogue of `mapInPandas` (iterator-of-batches in, iterator out),
    * so decoder setup cost is amortized per partition, not per row. Undecodable
    * payloads are dropped, not fatal. */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      // per-partition decoder setup goes here (codec contexts, model load)
      it.flatMap(ImageCodec.decode)
    }
  }

  // ---- materialized media tables (fixture support) ----

  /** Per-JVM pack-once-read-thereafter media tables. Packing synthetic
    * containers is fixture GENERATION — a production lake already stores media
    * as binary columns — so a query that times decode must not re-encode the
    * fixture on every execution (the r7 bench's m05/m06 numbers were dominated
    * by GIF/PNG *writing*, not the frame sampler under test). First call per
    * `cacheKey` runs the packer and writes one parquet table to a
    * Scratch-registered dir (removed on JVM exit); every later call — warmups,
    * timed runs, repeated verify queries — is a plain parquet scan, so the
    * measured plan is scan → narrow decode map, exactly the production shape.
    *
    * A lake table at a fixed path is immutable within a JVM (same contract as
    * the streaming schema cache), so keying by (lake dir, kind) is sound;
    * [[clearMediaCache]] restores fresh-JVM semantics for tests. */
  // Memo holder: computeIfAbsent only ALLOCATES (cheap, non-blocking, as its
  // contract requires — a multi-second Spark write job inside the mapping
  // function would hold the map bin lock, serializing unrelated keys that
  // share it and deadlocking on any re-entrant pack). The pack itself runs
  // under the memo's own per-key lazy-val lock, outside the map.
  private final class PackOnce(@volatile private var pack: () => String) {
    // clear the thunk after the pack: it captures the caller's logical plan
    // (e.g. a wide union of synthetic frames), which must not stay pinned for
    // the JVM's lifetime once only the path String is needed
    lazy val path: String = { val p = pack(); pack = null; p }
  }
  private val mediaCache = new java.util.concurrent.ConcurrentHashMap[String, PackOnce]()
  private[graft] val packCount = new java.util.concurrent.atomic.AtomicLong(0)

  /** Test hook: forget all materialized paths (fresh-JVM semantics). */
  private[graft] def clearMediaCache(): Unit = mediaCache.clear()

  /** Read the materialized media table for `cacheKey`, packing it first iff
    * this JVM hasn't already. `packed` is only evaluated on a cache miss. */
  def materialize(spark: SparkSession, cacheKey: String)
                 (packed: => DataFrame): DataFrame = {
    val memo = mediaCache.computeIfAbsent(cacheKey, _ => new PackOnce(() => {
      packCount.incrementAndGet()
      val out = graft.util.Scratch.dir("graft-media").resolve("media.parquet").toString
      packed.write.mode("overwrite").parquet(out)
      out
    }))
    spark.read.parquet(memo.path)
  }

  /** Video-style frame sampling plumbing: split each payload into fixed-size
    * pseudo-frames and keep every `stride`-th — demonstrates the explode shape
    * (one row in, many out) without a codec. */
  def sampleFrames(media: DataFrame, frameBytes: Int = 1024, stride: Int = 2): DataFrame = {
    require(frameBytes > 0, s"frameBytes must be positive, got $frameBytes")
    require(stride > 0, s"stride must be positive, got $stride")
    media
      .withColumn("n_frames",
        greatest(ceil(length(col("payload")).cast("double") / frameBytes), lit(1)).cast("int"))
      .select(col("media_id"), col("media_type"), col("n_frames"),
        explode(filter(sequence(lit(0), col("n_frames") - 1),
          i => i % stride === 0)).as("frame_idx"))
  }
}
