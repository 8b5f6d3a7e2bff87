package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkTestSession}

/** ANN-quality invariants that the oracle rows can't express. */
class SimilaritySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.01"

  test("multi-probe LSH verified pairs are a superset of the plain LSH pairs") {
    def pairs(name: String): Set[(Long, Long)] =
      SparkEntry.queries(name)(spark, dir)
        .select("vec_a", "vec_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val plain = pairs("ss_lsh_neardups")
    val multi = pairs("ss_lsh_multiprobe")
    assert(plain.subsetOf(multi),
      s"multiprobe lost pairs: ${plain.diff(multi).take(5)}")
    // the fixture has pairs straddling exactly one hyperplane — the
    // probe expansion must actually find some of them
    assert(multi.size > plain.size,
      s"multiprobe recalled nothing beyond plain (${multi.size} pairs)")
  }

  test("occupied-cell probe prefilter drops nothing at a large bucket domain") {
    // 11 planes/band → 2048-cell domain, far sparser than the ~500-doc
    // sf0.01 corpus can fill: most one-bit-flip probes target empty
    // cells, which is exactly the regime the prefilter exists for. The
    // candidate set must be IDENTICAL with and without it.
    val g = SignLshGeometry(bands = 2, planesPerBand = 11, dims = 64)
    val v = Similarity.varr(spark, dir)
    def pairSet(pf: Boolean): Set[(Long, Long)] =
      Similarity.lshMultiprobeCandidates(v, g, prefilter = Some(pf))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val unfiltered = pairSet(false)
    val filtered = pairSet(true)
    assert(filtered == unfiltered,
      s"prefilter changed candidates: lost=${unfiltered.diff(filtered).take(5)} " +
        s"gained=${filtered.diff(unfiltered).take(5)}")
    // auto mode at this domain must engage the prefilter (same result)
    assert(Similarity.lshMultiprobeCandidates(v, g)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet == unfiltered)
  }
}
