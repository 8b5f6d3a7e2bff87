package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkTestSession}

/** Edge cases of the dedup suite on synthetic corpora (the fixtures
  * always contain near-duplicates; these paths only show up when they
  * don't).
  */
class DedupEdgeSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def corpusDir(texts: Seq[String]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-dedup-edge-").toString
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "test", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("dd_dup_clusters on a corpus with zero near-duplicates returns empty") {
    val dir = corpusDir(Seq(
      "alpha beta gamma delta epsilon zeta eta theta",
      "one two three four five six seven eight nine",
      "red orange yellow green blue indigo violet colors"))
    val out = SparkEntry.queries("dd_dup_clusters")(spark, dir)
    assert(out.count() == 0) // no pairs -> no clustered nodes, no NPE
  }

  test("dd_minhash_neardups clusters verbatim duplicates") {
    val dup = "the quick brown fox jumps over the lazy dog again and again"
    val dir = corpusDir(Seq(dup, dup,
      "completely different words that share nothing with the others at all"))
    val pairs = SparkEntry.queries("dd_minhash_neardups")(spark, dir)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet == Set((0L, 1L)))
    val clusters = SparkEntry.queries("dd_dup_clusters")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(clusters == Set((0L, 0L), (1L, 0L)))
  }
}
