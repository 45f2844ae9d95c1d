package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row

class MultimodalSpec extends SparkSpec {

  private def mediaDf = {
    val rows = Seq(
      Row(1L, "image", Array.fill[Byte](500)(7), Map("name" -> "a.png")),
      Row(2L, "audio", Array.fill[Byte](300)(1), Map("name" -> "b.wav")),
      Row(3L, "video", Array.tabulate[Byte](8192)(i => (i % 127).toByte), Map("name" -> "c.mp4")))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Multimodal.mediaSchema)
  }

  test("decode: schema-typed per-partition batched feature extraction (stubbed codec)") {
    val out = Multimodal.decode(mediaDf, new Multimodal.StubDecoder(8), batchSize = 2)
    assert(out.schema == Multimodal.featureSchema)
    val rows = out.collect().sortBy(_.getLong(0))
    assert(rows.length == 3)
    val img = rows(0)
    assert(img.getAs[String]("modality") == "image")
    assert(img.getAs[Long]("byte_len") == 500L)
    assert(!img.isNullAt(3) && !img.isNullAt(4)) // width/height set for image
    assert(img.isNullAt(5))                      // no duration for image
    assert(img.getAs[scala.collection.Seq[Float]]("feature").length == 8)
    val aud = rows(1)
    assert(aud.isNullAt(3) && !aud.isNullAt(5))
    // determinism across runs
    val again = Multimodal.decode(mediaDf, new Multimodal.StubDecoder(8)).collect().sortBy(_.getLong(0))
    assert(rows.map(_.getAs[scala.collection.Seq[Float]]("feature")).toSeq ==
      again.map(_.getAs[scala.collection.Seq[Float]]("feature")).toSeq)
  }

  test("sampleFrames slices video bytes into frame-shaped rows") {
    val frames = Multimodal.sampleFrames(mediaDf, everyNth = 2, frameBytes = 1024)
    val rows = frames.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Array[Byte]]("frame_bytes").length == 1024))
    assert(rows.map(_.getAs[Int]("frame_index")).toSeq == rows.indices.toSeq)
  }
}
