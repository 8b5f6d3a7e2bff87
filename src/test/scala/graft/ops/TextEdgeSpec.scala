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

  test("tx_bm25_search: rare query terms outrank common-term matches") {
    // Query doc 100 carries the rare term "xenon" (df=1 in the corpus)
    // and the ubiquitous "the" (df=4). The doc matching "xenon" must
    // outrank docs matching only "the" — the IDF property that
    // separates BM25 from raw term counting. Doc 3 repeats "the" 6×;
    // tf saturation (k1) must keep it below the single rare-term hit.
    val dir = corpusDir(Seq(
      100L -> "xenon the lamp", // the query (doc_id % 100 == 0)
      1L -> "xenon gas glows brightly inside the sealed tube",
      2L -> "the cat sat on a mat",
      3L -> "the the the the the the end",
      4L -> "a dog ran to the park"))
    val out = SparkEntry.queries("tx_bm25_search")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(out.head == ((100L, 1, 1L))) // rare-term doc ranks first
    // every corpus doc contains "the", so all 4 score > 0
    assert(out.length == 4)
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

  test("tx_cdc_chunks: boundaries re-synchronize after a front insertion") {
    // the property that distinguishes content-defined chunking from
    // tx_chunk_windows' fixed grid: prepend words to a document and
    // every chunk past the first window must keep its digest
    val words = (0 until 120).map(i => s"w${i * 7 % 53}")
    val original = words.mkString(" ")
    val shifted = ("zz yy xx " + original)
    val dir = corpusDir(Seq(0L -> original, 1L -> shifted))
    val chunks = SparkEntry.queries("tx_cdc_chunks")(spark, dir)
      .select("doc_id", "digest").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val d0 = chunks.filter(_._1 == 0L).map(_._2).toSet
    val d1 = chunks.filter(_._1 == 1L).map(_._2).toSet
    assert(d0.size > 1, s"fixture too short to chunk: ${d0.size} chunks")
    val common = d0.intersect(d1)
    // all but the (shifted) first chunk must survive the insertion
    assert(common.size >= d0.size - 1,
      s"CDC failed to re-sync: only ${common.size} of ${d0.size} digests survived")
  }

  test("tx_cdc_chunks: chunks partition every document exactly") {
    val dir = corpusDir(Seq(
      0L -> "the cat sat on the mat near the hat and the rat",
      1L -> "ab", 2L -> "", 3L -> null))
    val rows = SparkEntry.queries("tx_cdc_chunks")(spark, dir)
      .select("doc_id", "chunk_idx", "start_word", "n_words").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    // per doc: chunk_idx dense from 0, chunks tile [1, n] with no gaps
    rows.groupBy(_._1).foreach { case (id, cs) =>
      val sorted = cs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == sorted.indices.toSeq, s"doc $id gaps")
      var next = 1L
      sorted.foreach { case (_, _, start, n) =>
        assert(start == next, s"doc $id chunk starts at $start, expected $next")
        next += n
      }
    }
    // empty/NULL text still yields exactly one (degenerate) chunk
    assert(rows.count(_._1 == 2L) == 1 && rows.count(_._1 == 3L) == 1)
  }
  test("tx_chunk_scrub: grid-aligned shared passages are removed from every copy") {
    // shared 24-word boilerplate prefix, grid-aligned at chunk 0 in
    // both carriers; the scrub must strip it from BOTH docs and
    // reassemble each remainder in order. Docs 4/5 are full dups —
    // every chunk shared — so both scrub to empty. Doc 3 shares
    // nothing and must round-trip byte-identical (the rewrite path
    // itself must not perturb untouched text).
    val pre = (0 until 24).map(i => s"b$i").mkString(" ")
    val tail1 = (0 until 24).map(i => s"x$i").mkString(" ")
    val tail2 = (0 until 10).map(i => s"y$i").mkString(" ")
    val solo = (0 until 30).map(i => s"z$i").mkString(" ")
    val dup = (0 until 40).map(i => s"d$i").mkString(" ")
    val dir = corpusDir(Seq(
      1L -> s"$pre $tail1",
      2L -> s"$pre $tail2",
      3L -> solo,
      4L -> dup,
      5L -> dup))
    val out = SparkEntry.queries("tx_chunk_scrub")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((1L, 1L, tail1)))
    assert(out(2L) == ((1L, 1L, tail2)))
    assert(out(3L) == ((2L, 0L, solo)))
    assert(out(4L) == ((0L, 2L, "")))
    assert(out(5L) == ((0L, 2L, "")))
  }

  test("tx_novelty: first occurrence wins by doc_id, exact dup scores zero") {
    // doc 0: 6 words -> 2 distinct 5-grams, all first here (ppm 1e6).
    // doc 1: exact copy of doc 0 -> same grams, zero novel.
    // doc 2: shares doc 0's first 5 words (1 old gram) + 1 new gram.
    // doc 3: 4 words -> no grams, NO row (the ng5 convention).
    val d0 = "a1 a2 a3 a4 a5 a6"
    val dir = corpusDir(Seq(
      0L -> d0, 1L -> d0,
      2L -> "a1 a2 a3 a4 a5 b6",
      3L -> "c1 c2 c3 c4"))
    val out = SparkEntry.queries("tx_novelty")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out.keySet == Set(0L, 1L, 2L))
    assert(out(0L) == ((2L, 2L, 1000000L)))
    assert(out(1L) == ((2L, 0L, 0L)))
    assert(out(2L) == ((2L, 1L, 500000L)))
  }

  test("tx_fuzzy_decontaminate catches a paraphrase the exact 5-gram rule provably misses") {
    // bench doc 0 = 25 words; corpus doc 1 = the same text with every
    // 5th word substituted, so NO five consecutive words survive and
    // the exact rule sees ZERO shared 5-grams — while 3-shingle
    // Jaccard is 10/36 ≈ 0.28 (five 4-word runs × 2 shared trigrams)
    // and the md5-deterministic LSH bands collide for THIS text (band
    // collision is probabilistic over texts, fixed per text — the
    // word stems were searched for a colliding instance, which is the
    // honest way to pin a probabilistic index).
    val bench = (1 to 25).map(i => s"b2w$i").mkString(" ")
    val para = (1 to 25)
      .map(i => if (i % 5 == 0) s"sub${i / 5 - 1}" else s"b2w$i").mkString(" ")
    val dir = corpusDir(Seq(0L -> bench, 1L -> para,
      2L -> "totally unrelated filler content words here nothing shared at all"))
    val exact = SparkEntry.queries("tx_decontaminate")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getInt(r.fieldIndex("contaminated"))).toMap
    assert(exact == Map(1L -> 0, 2L -> 0),
      s"exact 5-gram rule must MISS the paraphrase: $exact")
    val fuzzy = SparkEntry.queries("tx_fuzzy_decontaminate")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(r.fieldIndex("bench_id")),
        r.getLong(r.fieldIndex("jaccard_x1000")),
        r.getInt(r.fieldIndex("contaminated"))))).toMap
    assert(fuzzy(1L) == ((0L, 277L, 1)),
      s"fuzzy decon must catch the paraphrase: ${fuzzy(1L)}")
    assert(fuzzy(2L) == ((-1L, 0L, 0)), fuzzy(2L).toString)
  }

  test("tx_ccnet_buckets: equal scores share a bucket (cutoff, not rank, semantics)") {
    // Six docs, one lang, exactly TWO distinct scores: docs 0-2 are
    // identical (their bigrams occur 3x corpus-wide), docs 3-5 use
    // disjoint vocabularies (every bigram unique, score 1000).
    // Rank-based thirds would scatter each tied triple across
    // head/middle/tail; cutoff semantics must give the high-score
    // triple 'head' (0 better) and the low triple 'middle'
    // (3 better: 9 < 12), with NO doc in 'tail'.
    val rep = "r1 r2 r3 r4 r5"
    val dir = corpusDir(Seq(
      0L -> rep, 1L -> rep, 2L -> rep,
      3L -> "s1 s2 s3 s4 s5",
      4L -> "t1 t2 t3 t4 t5",
      5L -> "u1 u2 u3 u4 u5"))
    val out = SparkEntry.queries("tx_ccnet_buckets")(spark, dir).collect()
      .map(r => r.getLong(r.fieldIndex("doc_id")) ->
        r.getString(r.fieldIndex("bucket"))).toMap
    assert(out == Map(0L -> "head", 1L -> "head", 2L -> "head",
      3L -> "middle", 4L -> "middle", 5L -> "middle"), out.toString)
  }
}
