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

/** REAL pure-JVM ISO-BMFF (MP4/MOV) box walker — the video analog of
  * [[AudioHeaderDecoder]] (reference flink-core DeserializationSchema
  * surface: bytes in, typed rows out; the container walk itself needs no
  * codec). Reads `moov/mvhd` timescale + duration and the first video
  * track's `tkhd` pixel dimensions (16.16 fixed point; audio tracks carry
  * 0×0 and are skipped). Frame/sample DECODE stays behind [[BinaryDecoder]]
  * exactly as pixel decode does for images.
  *
  * Hostile-input discipline (the WAV parser's rules): box sizes are
  * UNSIGNED 32-bit; `size == 1` reads a 64-bit largesize (rejected if it
  * wraps negative), `size == 0` means to-end-of-container; every declared
  * size is bounds-checked against the enclosing box before any field read,
  * so a corrupt blob raises a named error and can never overrun or stall. */
object VideoHeaderDecoder {
  private def u32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)
  private def u64(b: Array[Byte], off: Int): Long =
    (u32(b, off) << 32) | u32(b, off + 4)
  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  private val TopLevel = Set("ftyp", "moov", "mdat", "free", "skip", "wide", "pdin", "moof")

  /** Walk the boxes in [start, end): f(type, payloadStart, payloadEnd). */
  private def walk(b: Array[Byte], start: Int, end: Int)
                  (f: (String, Int, Int) => Unit): Unit = {
    var off = start
    while (off + 8 <= end) {
      val size32 = u32(b, off)
      val typ = tag(b, off + 4)
      var header = 8
      val size: Long =
        if (size32 == 1L) {
          require(off + 16 <= end, s"corrupt MP4: truncated largesize box '$typ'")
          header = 16
          val s = u64(b, off + 8)
          require(s >= 0, s"corrupt MP4: largesize wraps negative in '$typ'")
          s
        } else if (size32 == 0L) (end - off).toLong // to end of container
        else size32
      require(size >= header, s"corrupt MP4: box '$typ' smaller than its header")
      require(off + size <= end, s"corrupt MP4: box '$typ' overruns its container")
      f(typ, off + header, (off + size).toInt)
      off = (off + size).toInt
    }
  }

  /** (widthPx, heightPx, timescale, durationMs) of an MP4/MOV blob. */
  def videoMeta(bytes: Array[Byte]): (Int, Int, Long, Long) = {
    require(bytes.length >= 8 && TopLevel(tag(bytes, 4)),
      "not an ISO-BMFF container")
    var timescale = -1L; var duration = -1L; var w = -1; var h = -1
    walk(bytes, 0, bytes.length) { (typ, ps, pe) =>
      if (typ == "moov") walk(bytes, ps, pe) { (t2, ps2, pe2) =>
        if (t2 == "mvhd") {
          require(pe2 - ps2 >= 4, "corrupt MP4: truncated mvhd")
          if ((bytes(ps2) & 0xff) == 1) { // v1: 64-bit times
            require(pe2 - ps2 >= 32, "corrupt MP4: truncated mvhd v1")
            timescale = u32(bytes, ps2 + 20)
            duration = u64(bytes, ps2 + 24)
          } else {
            require(pe2 - ps2 >= 20, "corrupt MP4: truncated mvhd v0")
            timescale = u32(bytes, ps2 + 12)
            duration = u32(bytes, ps2 + 16)
          }
        } else if (t2 == "trak") walk(bytes, ps2, pe2) { (t3, ps3, pe3) =>
          if (t3 == "tkhd" && w < 0) {
            require(pe3 - ps3 >= 4, "corrupt MP4: truncated tkhd")
            val (wOff, need) = if ((bytes(ps3) & 0xff) == 1) (88, 96) else (76, 84)
            require(pe3 - ps3 >= need, "corrupt MP4: truncated tkhd")
            val tw = (u32(bytes, ps3 + wOff) >> 16).toInt  // 16.16 fixed
            val th = (u32(bytes, ps3 + wOff + 4) >> 16).toInt
            if (tw > 0 && th > 0) { w = tw; h = th }
          }
        }
      }
    }
    require(timescale > 0, "MP4 without moov/mvhd")
    require(duration >= 0, "corrupt MP4: negative duration")
    (w, h, timescale, duration * 1000L / timescale)
  }
}

object MultimodalOps {
  case class MediaRow(media_id: Long, media: Array[Byte])
  case class AudioMeta(media_id: Long, channels: Int, sample_rate: Int,
                       bits: Int, duration_ms: Long)
  case class ImageMeta(media_id: Long, width: Int, height: Int, format: String)
  case class Frame(media_id: Long, frame_no: Int, byte_offset: Long)
  case class Features(media_id: Long, features: Array[Float])
  case class VideoMeta(media_id: Long, width: Int, height: Int,
                       timescale: Long, duration_ms: Long)

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

  /** video-as-binary → (dimensions, timescale, duration) via the pure-JVM
    * [[VideoHeaderDecoder]] ISO-BMFF walk; partition-wise like
    * [[decodeImageMeta]]. Width/height are -1 when the file has no video
    * track (audio-only MP4). */
  def decodeVideoMeta(media: Dataset[MediaRow]): Dataset[VideoMeta] = {
    implicit val enc = Encoders.product[VideoMeta]
    media.mapPartitions { iter =>
      iter.map { r =>
        val (w, h, ts, durMs) = VideoHeaderDecoder.videoMeta(r.media)
        VideoMeta(r.media_id, w, h, ts, durMs)
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
