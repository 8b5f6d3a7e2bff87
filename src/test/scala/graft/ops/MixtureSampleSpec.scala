package graft.ops

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkTestSession}

/** pipe_mixture_sample's contract beyond the oracle rows: the hash
  * gate must be EXACTLY md5 arithmetic (bit-reproducibility across
  * runs/engines IS the op's reason to exist — an RNG would give the
  * same mixture in expectation but a different corpus every run), and
  * the fixture must exercise both sampling directions so the weight
  * table provably bites. */
class MixtureSampleSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.01"

  private def md5Ppm(docId: Long): Long = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(docId.toString.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString.substring(0, 8)
    java.lang.Long.parseLong(hex, 16) % 1000000L
  }

  test("copy counts are exact md5 arithmetic and the gate bites both ways") {
    // (doc_id, lang, source, n_tokens, weight_ppm, hash_ppm, n_copies)
    val rows = SparkEntry.queries("pipe_mixture_sample")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (docId, wp, hp, nc) =
        (r.getLong(0), r.getLong(4), r.getLong(5), r.getLong(6))
      assert(hp == md5Ppm(docId), s"doc $docId: hash_ppm $hp != md5 recompute")
      val expect = wp / 1000000L + (if (hp < wp % 1000000L) 1L else 0L)
      assert(nc == expect, s"doc $docId: n_copies $nc != $expect (wp=$wp hp=$hp)")
    }
    // sf0.01's domain weights span ~0.32x to ~10.4x (measured), so the
    // apply stage must produce hard evidence of BOTH directions:
    assert(rows.exists(_.getLong(6) >= 2L),
      "no upsampled doc (n_copies >= 2) — the weight table never amplified")
    assert(rows.exists(_.getLong(6) == 0L),
      "no downsampled doc (n_copies == 0) — the hash gate never dropped")
    // and the expectation identity: summed over a domain, copies of a
    // weight-w domain average w per doc in the limit; at fixture size
    // assert only the sign — an upweighted (wp >= 2e6) domain yields
    // MORE copies than docs, a downweighted (wp < 5e5) one FEWER
    val byDomain = rows.groupBy(r => (r.getString(1), r.getString(2)))
    byDomain.foreach { case ((lang, source), rs) =>
      val wp = rs.head.getLong(4)
      val copies = rs.map(_.getLong(6)).sum
      if (wp >= 2000000L)
        assert(copies > rs.length,
          s"$lang/$source wp=$wp: $copies copies for ${rs.length} docs")
      if (wp < 500000L)
        assert(copies < rs.length,
          s"$lang/$source wp=$wp: $copies copies for ${rs.length} docs")
    }
  }
}
