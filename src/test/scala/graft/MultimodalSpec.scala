package graft

import graft.operators.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** Real-codec multimodal path: ImageIO PNG encode/decode round trips
  * inside the distributed batch operators, with graceful degradation on
  * corrupt payloads. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("decode round-trips generated PNGs exactly") {
    val imgs = Seq(
      (1L, Multimodal.encodeGrayPng(5, 3, (x, y) => x * 10 + y)),
      (2L, Multimodal.encodeGrayPng(2, 2, (_, _) => 255)))
      .toDS()
    val got = Multimodal.decodeImages(imgs).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))
    // 5×3 raster p-th pixel value x*10+y, checksum Σ(p+1)·v mod M
    val exp1 = (0 until 15).map { p =>
      val (y, x) = (p / 5, p % 5)
      (p + 1).toLong * (x * 10 + y)
    }.sum % 1000000007L
    val exp2 = (1 to 4).map(_.toLong * 255).sum % 1000000007L
    assert(got.toSeq == Seq((1L, 5L, 3L, exp1, true),
      (2L, 2L, 2L, exp2, true)))
  }

  test("resize samples (2x, 2y) pixels and survives re-encode") {
    // 4×4 image with pixel = y*4+x; half-scale keeps (0,0),(2,0),(0,2),(2,2)
    val imgs = Seq((7L, Multimodal.encodeGrayPng(4, 4,
      (x, y) => y * 4 + x))).toDS()
    val r = Multimodal.resizeHalfImages(imgs).head()
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      (4L, 4L, 2L, 2L))
    // resized raster row-major: 0, 2, 8, 10 → Σ(i+1)·v
    val exp = Seq(0L, 2L, 8L, 10L).zipWithIndex
      .map { case (v, i) => (i + 1) * v }.sum % 1000000007L
    assert(r.getLong(5) == exp)
    assert(r.getLong(6) > 0, "re-encoded PNG must have bytes")
    assert(r.getBoolean(7))
  }

  test("undecodable payloads degrade to ok=false, not a task failure") {
    val junk = Seq((1L, Array[Byte](1, 2, 3)),
      (2L, Multimodal.encodeGrayPng(2, 2, (_, _) => 9))).toDS()
    val got = Multimodal.decodeImages(junk).orderBy("id").collect()
    assert(!got(0).getBoolean(4) && got(0).getLong(1) == -1L)
    assert(got(1).getBoolean(4))
  }

  test("WAV decode: real codec round-trip + corrupt-byte degradation") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val samples = Array.tabulate(100)(i => ((i * 523) % 3001 - 1500).toShort)
    val wav = graft.operators.Multimodal.encodePcmWav(16000, samples)
    val bad = "not a wav".getBytes
    val out = graft.operators.Multimodal.decodeAudio(
      Seq((1L, wav), (2L, bad)).toDS()).orderBy("id").collect()
    val good = out(0)
    assert(good.getBoolean(7))
    assert(good.getLong(1) == 16000L)
    assert(good.getLong(2) == 100L)
    assert(good.getLong(3) == 100L * 1000 / 16000)
    val expectedPeak = samples.map(s => math.abs(s.toLong)).max
    assert(good.getLong(4) == expectedPeak)
    val M = 1000000007L
    val expectedEnergy = samples.map(s => s.toLong * s.toLong).sum % M
    assert(good.getLong(5) == expectedEnergy)
    assert(!out(1).getBoolean(7), "corrupt bytes must degrade to ok=false")
  }

  test("GIF multi-frame round trip: lossless gray frames, stride sampling, corrupt degradation") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val gif = graft.operators.Multimodal.encodeGrayGif(6, 5, 7,
      (f, x, y) => (f * 7 + y * 6 + x) % 256)
    val out = graft.operators.Multimodal.sampleFrames(
      Seq((1L, gif), (2L, "junk".getBytes)).toDS(), stride = 2)
      .orderBy("id", "frame_no").collect()
    val good = out.filter(_.getLong(0) == 1L)
    assert(good.forall(_.getBoolean(6)))
    assert(good.map(_.getLong(2)).toSeq == Seq(0L, 2L, 4L, 6L))
    assert(good.forall(r => r.getLong(1) == 7L && r.getLong(3) == 6L &&
      r.getLong(4) == 5L))
    // checksum matches the closed-form pixel rule per frame
    val M = 1000000007L
    def expected(f: Long): Long =
      (0 until 30).map(p => (p + 1).toLong * ((f * 7 + p) % 256)).sum % M
    good.foreach(r => assert(r.getLong(5) == expected(r.getLong(2)),
      s"frame ${r.getLong(2)}"))
    val bad = out.filter(_.getLong(0) == 2L)
    assert(bad.length == 1 && !bad(0).getBoolean(6))
  }
}
