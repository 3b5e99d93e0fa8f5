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

/** REAL pure-JVM header parser for the three ubiquitous image containers —
  * no native libs needed, so `imageMeta` is not a stub for actual JPEG/PNG/
  * GIF bytes:
  *  - JPEG: walk the marker segments from SOI to the first SOFn
  *    (baseline/progressive frame header) and read height/width from it.
  *  - PNG: IHDR is mandated to be the first chunk; width/height are the
  *    8 bytes after the chunk type.
  *  - GIF: logical screen descriptor, little-endian dims at offset 6.
  * `features`/`frameOffsets` still require a codec (pixel decode) and keep
  * deterministic byte-statistics placeholders — clearly marked, as real
  * deployments plug a codec-backed [[BinaryDecoder]]. */
object ImageHeaderDecoder extends BinaryDecoder {
  private def u16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
  private def u16le(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def i32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  def imageMeta(bytes: Array[Byte]): (Int, Int, String) = {
    require(bytes.length >= 10, "not an image header")
    if ((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) { // JPEG SOI
      var off = 2
      while (off + 9 < bytes.length) {
        if ((bytes(off) & 0xff) != 0xff) sys.error("bad JPEG marker stream")
        val marker = bytes(off + 1) & 0xff
        val len = u16(bytes, off + 2)
        // SOFn frame headers (C0-CF except DHT C4, JPG C8, DAC CC):
        // [len][precision][height:2][width:2]...
        if (marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc)
          return (u16(bytes, off + 7), u16(bytes, off + 5), "jpeg")
        off += 2 + len
      }
      sys.error("JPEG without SOF frame header")
    } else if (bytes.length >= 24 && i32(bytes, 0) == 0x89504e47) { // PNG
      (i32(bytes, 16), i32(bytes, 20), "png")
    } else if (bytes.length >= 10 && bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F') {
      (u16le(bytes, 6), u16le(bytes, 8), "gif")
    } else sys.error("unknown image container")
  }

  // codec-requiring paths: deterministic placeholders (see scaladoc)
  def features(bytes: Array[Byte], dim: Int): Array[Float] =
    StubDecoder.features(bytes, dim)
  def frameOffsets(bytes: Array[Byte], everyN: Int): Seq[Long] =
    StubDecoder.frameOffsets(bytes, everyN)
}

/** REAL pure-JVM RIFF/WAVE header parser — the audio analog of
  * [[ImageHeaderDecoder]] (and like it, not a stub: these are the container
  * bytes themselves). Walks the RIFF chunk list ([id:4][size:4 LE][payload]),
  * reads PCM format fields from the mandatory `fmt ` chunk and the payload
  * size from the `data` chunk; duration follows from byte rate. Sample
  * DECODING would need a codec for non-PCM encodings and stays out of scope
  * exactly as pixel decode does for images. */
object AudioHeaderDecoder {
  private def u16le(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def i32le(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** (channels, sampleRateHz, bitsPerSample, durationMs) of a WAV blob. */
  def audioMeta(bytes: Array[Byte]): (Int, Int, Int, Long) = {
    require(bytes.length >= 44 && tag(bytes, 0) == "RIFF" && tag(bytes, 8) == "WAVE",
      "not a RIFF/WAVE container")
    var off = 12
    var channels = -1; var rate = -1; var bits = -1; var byteRate = -1
    var dataBytes = -1L
    while (off + 8 <= bytes.length && (channels < 0 || dataBytes < 0)) {
      val id = tag(bytes, off)
      // chunk size is UNSIGNED in RIFF: a hostile blob with 0xFFFFFFF8 would
      // read as -8 signed and leave `off` unchanged (infinite loop); and any
      // size must keep the chunk inside the buffer or the fmt field reads
      // below would overrun
      val size = i32le(bytes, off + 4).toLong & 0xffffffffL
      if (id == "fmt " && size >= 16) {
        // the fmt fields are actually READ — bound them (reads up to off+23)
        require(off + 24 <= bytes.length, "corrupt WAV: truncated fmt chunk")
        channels = u16le(bytes, off + 10)
        rate = i32le(bytes, off + 12)
        byteRate = i32le(bytes, off + 16)
        bits = u16le(bytes, off + 22)
      } else if (id == "data") dataBytes = size
      // payloads are never read (a headers-only blob with the full declared
      // data size is fine); Long arithmetic so a hostile size can only end
      // the walk, never wrap negative or stall
      val next = off.toLong + 8L + size + (size & 1L) // chunks are word-aligned
      off = if (next > bytes.length) bytes.length else next.toInt
    }
    require(channels > 0 && byteRate > 0, "WAV without fmt chunk")
    require(dataBytes >= 0, "WAV without data chunk")
    (channels, rate, bits, dataBytes * 1000L / byteRate)
  }
}

object MultimodalOps {
  case class MediaRow(media_id: Long, media: Array[Byte])
  case class AudioMeta(media_id: Long, channels: Int, sample_rate: Int,
                       bits: Int, duration_ms: Long)
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

  /** audio-as-binary → (channels, sample rate, bit depth, duration) via the
    * pure-JVM [[AudioHeaderDecoder]]; partition-wise like [[decodeImageMeta]]. */
  def decodeAudioMeta(media: Dataset[MediaRow]): Dataset[AudioMeta] = {
    implicit val enc = Encoders.product[AudioMeta]
    media.mapPartitions { iter =>
      iter.map { r =>
        val (ch, rate, bits, durMs) = AudioHeaderDecoder.audioMeta(r.media)
        AudioMeta(r.media_id, ch, rate, bits, durMs)
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
