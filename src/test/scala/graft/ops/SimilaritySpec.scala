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
}
