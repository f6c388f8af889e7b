package graft

import graft.operators.Multimodal
import graft.sources.Lake
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private def media = Multimodal.packFromText(
    Lake.table(spark, sf0001, "documents").limit(20), "doc_id", "text", "source")

  test("packFromText produces the opaque-payload media schema") {
    val schema = media.schema
    assert(schema("payload").dataType.typeName == "binary")
    assert(schema("media_id").dataType.typeName == "long")
    assert(media.count() == 20)
  }

  test("extractFeatures is deterministic and schema-complete") {
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    assert(f1.toSeq == f2.toSeq)
    assert(f1.forall(f => f.width > 0 && f.height > 0 && f.channels == 3))
    assert(f1.forall(f => f.mean_intensity >= 0.0 && f.mean_intensity <= 1.0))
    // n_bytes equals the true payload length
    val lens = media.select(col("media_id"), length(col("payload")).as("len"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(f1.forall(f => f.n_bytes == lens(f.media_id).toLong))
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
