package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` with typed
  * metadata. The Spark-side plumbing (schema, partition-wise batching, row
  * explosion for frames) is real; the codec itself is behind [[BinaryDecoder]]
  * because this container ships no image/audio libraries — [[StubDecoder]] is
  * a clearly-marked deterministic fake that real deployments replace.
  *
  * Mirrors the reference's raw-format handling (Flink
  * flink-formats/flink-avro + user-defined DeserializationSchema surface,
  * flink-core/src/main/java/org/apache/flink/api/common/serialization/
  * DeserializationSchema.java): bytes in, typed rows out, executed
  * partition-parallel with no driver involvement.
  */
trait BinaryDecoder extends Serializable {
  /** (width, height, format) of an encoded image. */
  def imageMeta(bytes: Array[Byte]): (Int, Int, String)
  /** Fixed-dim feature vector for an encoded media blob. */
  def features(bytes: Array[Byte], dim: Int): Array[Float]
  /** Byte offsets of sampled frames in an encoded video blob. */
  def frameOffsets(bytes: Array[Byte], everyN: Int): Seq[Long]
}

/** STUB — not a real codec. Parses a fake 12-byte header
  * [w:int][h:int][fmt:int] and derives "features" from byte statistics, so
  * tests are deterministic without native image libraries. */
object StubDecoder extends BinaryDecoder {
  private def i32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
  def imageMeta(bytes: Array[Byte]): (Int, Int, String) = {
    require(bytes.length >= 12, "stub header is 12 bytes")
    val fmt = i32(bytes, 8) match { case 0 => "jpeg"; case 1 => "png"; case _ => "raw" }
    (i32(bytes, 0), i32(bytes, 4), fmt)
  }
  def features(bytes: Array[Byte], dim: Int): Array[Float] =
    Array.tabulate(dim)(i => bytes.drop(12).zipWithIndex
      .collect { case (b, j) if j % dim == i => (b & 0xff).toFloat }.sum)
  def frameOffsets(bytes: Array[Byte], everyN: Int): Seq[Long] =
    (12L until bytes.length.toLong by everyN.toLong).toSeq
}

object MultimodalOps {
  case class MediaRow(media_id: Long, media: Array[Byte])
  case class ImageMeta(media_id: Long, width: Int, height: Int, format: String)
  case class Frame(media_id: Long, frame_no: Int, byte_offset: Long)
  case class Features(media_id: Long, features: Array[Float])

  /** binary → (width, height, format). Partition-wise batch decode — the
    * Scala analog of a `mapInPandas` batch UDF: one decoder instance per
    * partition, rows streamed through it. */
  def decodeImageMeta(media: Dataset[MediaRow], decoder: BinaryDecoder): Dataset[ImageMeta] = {
    implicit val enc = Encoders.product[ImageMeta]
    media.mapPartitions { iter =>
      iter.map { r =>
        val (w, h, f) = decoder.imageMeta(r.media)
        ImageMeta(r.media_id, w, h, f)
      }
    }
  }

  /** video-as-binary → one row per sampled frame (row explosion keeps the
    * downstream pipeline columnar; frames repartition freely). */
  def frameSample(media: Dataset[MediaRow], decoder: BinaryDecoder, everyN: Int): Dataset[Frame] = {
    implicit val enc = Encoders.product[Frame]
    media.mapPartitions { iter =>
      iter.flatMap { r =>
        decoder.frameOffsets(r.media, everyN).zipWithIndex.map {
          case (off, i) => Frame(r.media_id, i, off)
        }
      }
    }
  }

  /** binary → fixed-dim float vector, ready for graft.operators.Similarity. */
  def featureExtract(media: Dataset[MediaRow], decoder: BinaryDecoder, dim: Int): Dataset[Features] = {
    implicit val enc = Encoders.product[Features]
    media.mapPartitions(iter => iter.map(r => Features(r.media_id, decoder.features(r.media, dim))))
  }

  /** Typed-metadata projection for a mixed media DataFrame: size + magic-based
    * kind sniffing with builtins only (no decode). */
  def mediaStats(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("n_bytes", length(col(binCol)))
      .withColumn("header_hex", hex(substring(col(binCol), 1, 4)))
}
