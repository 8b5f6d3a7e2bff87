package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Multimodal.RealCodecs

/** The codecs are REAL (JDK ImageIO / javax.sound.sampled) — these are
  * byte-level round-trips, no Spark involved.
  */
class MultimodalCodecSpec extends AnyFunSuite {

  test("PNG round-trip recovers dimensions and channel count") {
    val payload = "the quick brown fox".getBytes("UTF-8")
    val png = RealCodecs.encodePng(23, 11, payload)
    // PNG magic bytes: a real encoded stream, not a fake
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P' && png(2) == 'N' && png(3) == 'G')
    assert(RealCodecs.decodeImage(png) == ((23, 11, 3)))
  }

  test("PNG round-trip preserves pixel content losslessly") {
    val payload = Array.tabulate[Byte](64)(i => (i * 7).toByte)
    val png = RealCodecs.encodePng(4, 4, payload)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    // first pixel's three samples are payload[0..2] (PNG is lossless)
    val r = img.getRaster
    assert(r.getSample(0, 0, 0) == (payload(0) & 0xff))
    assert(r.getSample(0, 0, 1) == (payload(1) & 0xff))
    assert(r.getSample(0, 0, 2) == (payload(2) & 0xff))
  }

  test("encodePng survives an empty payload (black image, not an index error)") {
    val png = RealCodecs.encodePng(5, 3, Array.emptyByteArray)
    assert(RealCodecs.decodeImage(png) == ((5, 3, 3)))
  }

  test("audio sample wrap matches the oracle's modular formula for all BMP codes") {
    // Spark synthesizes ((code-64)*256).toShort; the DuckDB oracle
    // computes ((code-64)*256 + 32768) % 65536 - 32768. These must be
    // the same function or non-ASCII text diverges the hash.
    for (code <- Seq(0, 32, 64, 127, 128, 233, 0x7ff, 0xffff)) {
      val spark = (((code - 64) * 256).toShort).toInt
      val oracle = ((code - 64) * 256 + 32768) % 65536 - 32768
      assert(spark == oracle, s"code=$code spark=$spark oracle=$oracle")
    }
  }

  test("mm_phash_neardups: MIH candidates lose nothing vs brute-force hamming ≤ 6 (sf0.1)") {
    // The multi-index-hashing guarantee, pinned on real data: the op's
    // banded probe join must return EXACTLY the pairs a brute-force
    // all-pairs scan over its own 64-bit signatures accepts at radius
    // 6 — any candidate-stage miss (band split bug, probe-mask bug,
    // dedup bug) shows up as a set difference. 5000 docs = 12.5M
    // brute-force pairs, in-memory.
    val spark = graft.SparkTestSession.spark
    val dir = "/root/testdata/sf0.1"
    val got = graft.SparkEntry.queries("mm_phash_neardups")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val sigs = Multimodal.phashFrame(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val truth = scala.collection.mutable.Set[(Long, Long, Int)]()
    var nearMisses = 0 // pairs at hamming 7-8: the radius boundary bites
    var i = 0
    while (i < sigs.length) {
      val (a, la, ha) = sigs(i)
      var j = i + 1
      while (j < sigs.length) {
        val (b, lb, hb) = sigs(j)
        val d = java.lang.Long.bitCount(la ^ lb) + java.lang.Long.bitCount(ha ^ hb)
        if (d <= 6) truth += ((math.min(a, b), math.max(a, b), d))
        else if (d <= 8) nearMisses += 1
        j += 1
      }
      i += 1
    }
    assert(truth.nonEmpty, "pin must be non-vacuous on the shipped fixture")
    assert(nearMisses > 0, "fixture must carry pairs just OUTSIDE the radius")
    assert(got == truth)
  }

  test("decodeImage rejects non-image payloads") {
    intercept[IllegalArgumentException] {
      RealCodecs.decodeImage("not an image".getBytes)
    }
  }

  test("WAV 16-bit PCM round-trip recovers the sample values") {
    val samples = Array.tabulate[Short](256)(i =>
      (math.sin(i / 16.0) * 12000).toShort)
    val wav = RealCodecs.encodeWav(samples)
    assert(new String(wav, 0, 4, "US-ASCII") == "RIFF")
    assert(RealCodecs.decodeAudio(wav).toSeq == samples.toSeq)
  }

  test("sampleFrames decodes exactly every k-th container frame") {
    val frames = (0 until 5).map(j =>
      RealCodecs.encodePng(10 + j, 6 + j, Array[Byte](1, 2, 3)))
    val container = RealCodecs.encodeFrameContainer(frames)
    val got = RealCodecs.sampleFrames(container, 2).toSeq
    assert(got == Seq((0, 10, 6), (2, 12, 8), (4, 14, 10)))
    // k=1 decodes everything; a bigger k than frames yields frame 0 only
    assert(RealCodecs.sampleFrames(container, 1).size == 5)
    assert(RealCodecs.sampleFrames(container, 99).toSeq == Seq((0, 10, 6)))
  }

  test("sampleFrames rejects a truncated container (fails fast, not garbage)") {
    val container = RealCodecs.encodeFrameContainer(
      Seq(RealCodecs.encodePng(8, 4, Array[Byte](9))))
    intercept[java.io.EOFException] {
      RealCodecs.sampleFrames(container.dropRight(10), 1).toSeq
    }
  }
}
