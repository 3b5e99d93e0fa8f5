package graft

import java.nio.ByteBuffer
import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.{ImageHeaderDecoder, MultimodalOps, StubDecoder}
import graft.multimodal.MultimodalOps.MediaRow

/** §2.7 — binary-column plumbing with the stub decoder (no native codecs in
  * this container; the partition/schema/batch shape is the real thing). */
class MultimodalSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def fakeMedia(id: Long, w: Int, h: Int, fmt: Int, payload: Int): MediaRow = {
    val bb = ByteBuffer.allocate(12 + payload)
    bb.putInt(w).putInt(h).putInt(fmt)
    (0 until payload).foreach(i => bb.put(((id + i) % 251).toByte))
    MediaRow(id, bb.array())
  }

  test("decodeImageMeta: binary header → typed (width,height,format)") {
    val ds = Seq(fakeMedia(1, 640, 480, 0, 100), fakeMedia(2, 1920, 1080, 1, 50)).toDS()
    val metas = MultimodalOps.decodeImageMeta(ds, StubDecoder).collect().sortBy(_.media_id)
    assert(metas.map(m => (m.width, m.height, m.format)).toSeq ==
      Seq((640, 480, "jpeg"), (1920, 1080, "png")))
  }

  test("frameSample: one row per sampled frame, deterministic offsets") {
    val ds = Seq(fakeMedia(1, 10, 10, 2, 100)).toDS()
    val frames = MultimodalOps.frameSample(ds, StubDecoder, everyN = 40).collect()
    assert(frames.map(_.byte_offset).toSeq == Seq(12L, 52L, 92L))
    assert(frames.map(_.frame_no).toSeq == Seq(0, 1, 2))
  }

  test("featureExtract: binary → fixed-dim float vector feeding Similarity") {
    val ds = Seq(fakeMedia(1, 10, 10, 2, 64), fakeMedia(2, 10, 10, 2, 64)).toDS()
    val feats = MultimodalOps.featureExtract(ds, StubDecoder, dim = 8).collect()
    assert(feats.forall(_.features.length == 8))
    // deterministic: same input ⇒ same features
    val again = MultimodalOps.featureExtract(ds, StubDecoder, dim = 8).collect()
    assert(feats.sortBy(_.media_id).map(_.features.toSeq).toSeq ==
      again.sortBy(_.media_id).map(_.features.toSeq).toSeq)
  }

  test("ImageHeaderDecoder parses real JPEG/PNG/GIF headers (no stub)") {
    // JPEG: SOI, APP0 (len 16), SOF0 (len 17): precision 8, height 480, width 640
    val jpeg = Array[Int](
      0xff, 0xd8,
      0xff, 0xe0, 0x00, 0x10, 'J', 'F', 'I', 'F', 0, 1, 2, 0, 0, 1, 0, 1, 0, 0,
      0xff, 0xc0, 0x00, 0x11, 0x08, 0x01, 0xe0, 0x02, 0x80,
      0x03, 0x01, 0x22, 0x00, 0x02, 0x11, 0x01, 0x03, 0x11, 0x01
    ).map(_.toByte)
    assert(ImageHeaderDecoder.imageMeta(jpeg) == ((640, 480, "jpeg")))
    // PNG: signature + IHDR chunk (width 320, height 200)
    val png = (Array[Int](0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a,
      0x00, 0x00, 0x00, 0x0d, 'I', 'H', 'D', 'R',
      0x00, 0x00, 0x01, 0x40, 0x00, 0x00, 0x00, 0xc8,
      0x08, 0x06, 0x00, 0x00, 0x00)).map(_.toByte)
    assert(ImageHeaderDecoder.imageMeta(png) == ((320, 200, "png")))
    // GIF89a: little-endian logical screen 1024 x 768
    val gif = (Array[Int]('G', 'I', 'F', '8', '9', 'a',
      0x00, 0x04, 0x00, 0x03, 0xf7, 0x00, 0x00)).map(_.toByte)
    assert(ImageHeaderDecoder.imageMeta(gif) == ((1024, 768, "gif")))
    // and it drives the same partition-wise pipeline as the stub
    val ds = Seq(MediaRow(1L, jpeg), MediaRow(2L, png), MediaRow(3L, gif)).toDS()
    val metas = MultimodalOps.decodeImageMeta(ds, ImageHeaderDecoder)
      .collect().sortBy(_.media_id).map(m => (m.width, m.height, m.format)).toSeq
    assert(metas == Seq((640, 480, "jpeg"), (320, 200, "png"), (1024, 768, "gif")))
  }

  test("AudioHeaderDecoder parses a real RIFF/WAVE fmt chunk (no stub)") {
    import graft.multimodal.AudioHeaderDecoder
    // 44.1 kHz stereo 16-bit PCM, 2 s of audio: data = 176400 B/s × 2
    def le16(v: Int) = Array[Int](v & 0xff, (v >> 8) & 0xff)
    def le32(v: Int) = Array[Int](v & 0xff, (v >> 8) & 0xff, (v >> 16) & 0xff, (v >> 24) & 0xff)
    val header: Array[Int] =
      Array[Int]('R', 'I', 'F', 'F') ++ le32(36 + 8) ++ Array[Int]('W', 'A', 'V', 'E') ++
        // an extra LIST chunk first: the walk must skip unknown chunks
        Array[Int]('L', 'I', 'S', 'T') ++ le32(4) ++ Array[Int]('I', 'N', 'F', 'O') ++
        Array[Int]('f', 'm', 't', ' ') ++ le32(16) ++
        le16(1) ++ le16(2) ++ le32(44100) ++ le32(176400) ++ le16(4) ++ le16(16) ++
        Array[Int]('d', 'a', 't', 'a') ++ le32(352800)
    val wav = header.map(_.toByte) ++ Array.fill[Byte](8)(0) // truncated payload is fine
    assert(AudioHeaderDecoder.audioMeta(wav) == ((2, 44100, 16, 2000L)))
    // partition-wise pipeline
    val ds = Seq(MediaRow(7L, wav)).toDS()
    val m = MultimodalOps.decodeAudioMeta(ds).collect().head
    assert(m.media_id == 7L && m.channels == 2 && m.sample_rate == 44100 &&
      m.bits == 16 && m.duration_ms == 2000L)
  }

  test("AudioHeaderDecoder rejects hostile chunk sizes instead of looping") {
    import graft.multimodal.AudioHeaderDecoder
    def le32(v: Int) = Array[Int](v & 0xff, (v >> 8) & 0xff, (v >> 16) & 0xff, (v >> 24) & 0xff)
    // a chunk declaring size = -8 (0xFFFFFFF8): signed arithmetic would leave
    // the walk offset unchanged forever (executor-task hang); unsigned reads
    // make it a fast failed parse ("WAV without fmt chunk")
    val evil = (Array[Int]('R', 'I', 'F', 'F') ++ le32(36) ++
      Array[Int]('W', 'A', 'V', 'E') ++
      Array[Int]('J', 'U', 'N', 'K') ++ le32(-8) ++ Array.fill(24)(0)).map(_.toByte)
    val ex = intercept[IllegalArgumentException](AudioHeaderDecoder.audioMeta(evil))
    assert(ex.getMessage.contains("fmt"))
    // a truncated fmt chunk must fail with a named error, not read past the
    // end: JUNK padding pushes fmt to offset 40, its 16 declared bytes end
    // at 64 but the blob stops at 48
    val cut = (Array[Int]('R', 'I', 'F', 'F') ++ le32(40) ++
      Array[Int]('W', 'A', 'V', 'E') ++
      Array[Int]('J', 'U', 'N', 'K') ++ le32(20) ++ Array.fill(20)(0) ++
      Array[Int]('f', 'm', 't', ' ') ++ le32(16)).map(_.toByte)
    val ex2 = intercept[IllegalArgumentException](AudioHeaderDecoder.audioMeta(cut))
    assert(ex2.getMessage.contains("truncated fmt"))
  }

  test("VideoHeaderDecoder parses a real ISO-BMFF moov/mvhd + tkhd (no stub)") {
    import graft.multimodal.VideoHeaderDecoder
    def be32(v: Long) = Array[Int](((v >> 24) & 0xff).toInt, ((v >> 16) & 0xff).toInt,
      ((v >> 8) & 0xff).toInt, (v & 0xff).toInt)
    def box(typ: String, payload: Array[Int]): Array[Int] =
      be32(payload.length + 8L) ++ typ.map(_.toInt).toArray ++ payload
    // mvhd v0: timescale 600, duration 3000 ticks -> 5000 ms
    val mvhd = box("mvhd", Array.fill(4)(0) ++ be32(0) ++ be32(0) ++ be32(600) ++ be32(3000))
    // tkhd v0 is 84 bytes; width/height are 16.16 fixed at offsets 76/80
    def tkhd(w: Int, h: Int) = box("tkhd",
      Array.fill(76)(0) ++ be32(w.toLong << 16) ++ be32(h.toLong << 16))
    // an AUDIO track (0x0) precedes the video track: the walk must skip it
    val moov = box("moov", mvhd ++ box("trak", tkhd(0, 0)) ++ box("trak", tkhd(640, 480)))
    val ftyp = box("ftyp", "isomiso2".map(_.toInt).toArray)
    val mp4 = (ftyp ++ moov).map(_.toByte)
    assert(VideoHeaderDecoder.videoMeta(mp4) == ((640, 480, 600L, 5000L)))
    // size==1 largesize boxes and size==0 (to-end) boxes parse too
    val bigFree = be32(1) ++ "free".map(_.toInt).toArray ++
      Array[Int](0, 0, 0, 0) ++ be32(20) ++ Array.fill(4)(0)
    val tailMdat = be32(0) ++ "mdat".map(_.toInt).toArray ++ Array.fill(6)(0)
    val mp4b = (ftyp ++ bigFree ++ moov ++ tailMdat).map(_.toByte)
    assert(VideoHeaderDecoder.videoMeta(mp4b) == ((640, 480, 600L, 5000L)))
    // partition-wise pipeline
    val ds = Seq(MediaRow(9L, mp4)).toDS()
    val m = MultimodalOps.decodeVideoMeta(ds).collect().head
    assert(m.media_id == 9L && m.width == 640 && m.height == 480 &&
      m.timescale == 600L && m.duration_ms == 5000L)
  }

  test("VideoHeaderDecoder rejects hostile box sizes with named errors") {
    import graft.multimodal.VideoHeaderDecoder
    def be32(v: Long) = Array[Int](((v >> 24) & 0xff).toInt, ((v >> 16) & 0xff).toInt,
      ((v >> 8) & 0xff).toInt, (v & 0xff).toInt)
    // a box declaring a size past the end of the buffer must not read past it
    val overrun = (be32(4096) ++ "moov".map(_.toInt).toArray ++ Array.fill(8)(0)).map(_.toByte)
    val e1 = intercept[IllegalArgumentException](VideoHeaderDecoder.videoMeta(overrun))
    assert(e1.getMessage.contains("overruns"))
    // size==1 promises a 64-bit largesize that isn't there
    val cutLarge = (be32(1) ++ "mdat".map(_.toInt).toArray ++ Array[Int](0, 0)).map(_.toByte)
    val e2 = intercept[IllegalArgumentException](VideoHeaderDecoder.videoMeta(cutLarge))
    assert(e2.getMessage.contains("truncated largesize"))
    // a truncated mvhd must fail by name, not read out of bounds
    def box(typ: String, payload: Array[Int]): Array[Int] =
      be32(payload.length + 8L) ++ typ.map(_.toInt).toArray ++ payload
    val cutMvhd = box("moov", box("mvhd", Array.fill(8)(0))).map(_.toByte)
    val e3 = intercept[IllegalArgumentException](VideoHeaderDecoder.videoMeta(cutMvhd))
    assert(e3.getMessage.contains("truncated mvhd"))
    // garbage is named as not-a-container
    val junk = Array.fill[Byte](32)(0x41)
    val e4 = intercept[IllegalArgumentException](VideoHeaderDecoder.videoMeta(junk))
    assert(e4.getMessage.contains("ISO-BMFF"))
  }

  test("mediaStats: builtin-only size + magic sniffing") {
    val df = Seq(fakeMedia(1, 640, 480, 0, 100)).toDS().toDF()
    val r = MultimodalOps.mediaStats(df, "media").select("n_bytes", "header_hex").head()
    assert(r.getInt(0) == 112)
    assert(r.getString(1) == "00000280") // 640 big-endian
  }
}
