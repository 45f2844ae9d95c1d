package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (north-star surface; BASELINE.json).
  *
  * Media travels as opaque `binary` columns with typed metadata — the 100 TB
  * pattern: bytes stay columnar in parquet, decode/feature-extract runs
  * per-partition on executors with a batch-capable decoder. The actual codec
  * calls are STUBBED (no image/audio libraries in this container): the
  * `StubDecoder` derives deterministic pseudo-features from the bytes so the
  * schema, partitioning, batch shape, and failure handling — the Spark-side
  * plumbing — are real and tested, and a production decoder drops in by
  * implementing [[MediaDecoder]].
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image | audio | video
    StructField("bytes", BinaryType, nullable = false),
    StructField("meta", MapType(StringType, StringType), nullable = true)))

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("byte_len", LongType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true),
    StructField("feature", ArrayType(FloatType), nullable = false)))

  /** Batch decoder contract: one call per partition-batch, outputs must be
    * 1:1 with inputs (order preserved). */
  trait MediaDecoder extends Serializable {
    def decodeBatch(rows: Seq[(Long, String, Array[Byte])]): Seq[Row]
  }

  /** STUB: a real implementation would decode image/audio bytes (e.g. via a
    * JNI codec); this derives deterministic pseudo-features from md5 so
    * tests exercise the full pipeline shape. */
  final class StubDecoder(featureDim: Int = 8) extends MediaDecoder {
    def decodeBatch(rows: Seq[(Long, String, Array[Byte])]): Seq[Row] =
      rows.map { case (id, modality, bytes) =>
        val h = graft.functions.Kernels.md5Hex(new String(bytes.take(64), "ISO-8859-1") + "#mm")
        def hx(i: Int): Int = Integer.parseInt(h.substring(i, i + 4), 16)
        val feature = Array.tabulate(featureDim)(i => (hx((i * 2) % 28) % 1000) / 1000f)
        modality match {
          case "image" =>
            Row(id, modality, bytes.length.toLong, hx(0) % 4096, hx(4) % 4096, null, feature)
          case "audio" | "video" =>
            Row(id, modality, bytes.length.toLong, null, null, (hx(8) % 600000).toLong, feature)
          case _ =>
            Row(id, modality, bytes.length.toLong, null, null, null, feature)
        }
      }
  }

  /** Distributed decode / feature extraction: mapPartitions with
    * batch-shaped decoder calls (`batchSize` rows per call), schema-typed
    * output. Repartition first if media rows are skewed by size. */
  def decode(media: DataFrame, decoder: MediaDecoder = new StubDecoder(),
             batchSize: Int = 16): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select(col("media_id"), col("modality"), col("bytes")).rdd
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          decoder.decodeBatch(batch.map(r => (r.getLong(0), r.getString(1),
            r.getAs[Array[Byte]](2))))
        }
      }
    spark.createDataFrame(rdd, featureSchema)
  }

  /** Frame sampling stub: every nth "frame" of a video byte stream — the
    * real cut points come from the container format; the slicing/explode
    * plumbing is what scales. */
  def sampleFrames(media: DataFrame, everyNth: Int, frameBytes: Int = 1024): DataFrame =
    media.filter(col("modality") === "video")
      .select(col("media_id"),
        posexplode(expr(
          s"transform(sequence(0, CAST(floor(length(bytes) / ($frameBytes * $everyNth)) AS INT) - 1), " +
          s"i -> substring(bytes, i * $frameBytes * $everyNth + 1, $frameBytes))"))
          .as(Seq("frame_index", "frame_bytes")))
}
