package graft

import java.nio.ByteBuffer
import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.{MultimodalOps, StubDecoder}
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

  test("mediaStats: builtin-only size + magic sniffing") {
    val df = Seq(fakeMedia(1, 640, 480, 0, 100)).toDS().toDF()
    val r = MultimodalOps.mediaStats(df, "media").select("n_bytes", "header_hex").head()
    assert(r.getInt(0) == 112)
    assert(r.getString(1) == "00000280") // 640 big-endian
  }
}
