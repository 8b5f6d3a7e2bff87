package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkTestSession}

/** Edge cases of the text suite that the parquet fixtures never hit:
  * docs too short to produce a trigram and NULL text. Spark's
  * sequence(start, stop) descends when start > stop, so the trigram
  * explode must route length<=2 / NULL docs through an explicit
  * empty-array branch — otherwise they emit phantom [i=1, i=0] rows
  * that poison the trained profile (round-3 advisor finding).
  */
class TextEdgeSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def corpusDir(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-text-edge-").toString
    rows
      .map { case (id, t) =>
        (id, t, "en", "test", Option(t).map(_.length.toLong).getOrElse(0L))
      }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("tx_trigram_langid: short and NULL docs yield no phantom trigrams") {
    val dir = corpusDir(Seq(
      0L -> "the cat sat on the mat near the hat and the rat",
      1L -> "ab", // length 2: sequence(1, 0) would descend without the guard
      2L -> "x", // length 1
      3L -> "", // empty
      4L -> null, // NULL text
      5L -> "the dog ran to the log by the bog with the cog"))
    val out = SparkEntry.queries("tx_trigram_langid")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSeq
    // Docs 1-4 cannot vote (zero trigrams) -> 'und' with 0 hits.
    for (id <- 1L to 4L)
      assert(out.contains((id, "und", 0L)), s"doc $id should be und/0")
    // The long docs vote for the corpus-trained 'en' profile.
    assert(out.filter(r => r._1 == 0L || r._1 == 5L).forall(_._2 == "en"))
    // No phantom rows inflate the result cardinality.
    assert(out.size == 6)
  }
}
