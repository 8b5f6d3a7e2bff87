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

  test("dd_containment catches a quote-inclusion pair symmetric Jaccard rejects") {
    // contained (12 words, 10 shingles) is a verbatim prefix of
    // container (26 words): C = 10/10 = 1.0 but J = 10/24 ≈ 0.42 < 0.5.
    // The tail words were chosen so the shared minhash structure
    // produces a band collision (md5 is deterministic, so this fixture
    // collides forever); Jaccard-rule dd_minhash_neardups must reject
    // the SAME candidate that dd_containment accepts with
    // jaccard_pass = 0 — the operator's distinctive class, as a test.
    val contained = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
    val container = contained +
      " quebec victor flint amber papa six uniform four cedar dune ember birch oscar whiskey"
    val dir = corpusDir(Seq(contained, container,
      "completely different words that share nothing with the others at all"))
    val rows = SparkEntry.queries("dd_containment")(spark, dir).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getLong(r.fieldIndex("contained_doc")) == 0L)
    assert(r.getLong(r.fieldIndex("container_doc")) == 1L)
    assert(r.getLong(r.fieldIndex("n_common")) == 10L)
    assert(r.getLong(r.fieldIndex("n_contained")) == 10L)
    assert(r.getLong(r.fieldIndex("n_container")) == 24L)
    assert(r.getInt(r.fieldIndex("jaccard_pass")) == 0)
    assert(SparkEntry.queries("dd_minhash_neardups")(spark, dir).count() == 0)
  }

  test("dd_containment_index catches a high-C pair the shared whole-doc index misses") {
    // contained (12 words, 10 shingles) sits verbatim at word offset 8
    // of container (26 words, 24 shingles): C = 10/10 = 1.0,
    // J = 10/24 ≈ 0.42. The prefix and tail words were chosen (against
    // the real md5 band math, deterministic forever) so that:
    //  (a) the WHOLE-doc signatures of the two docs share NO band —
    //      dd_containment's shared index never forms the candidate,
    //      so the quote is invisible to it even though its verify
    //      rule would accept it (the documented miss class);
    //  (b) the container's 16-word window at offset 8 covers the
    //      quote, and that window's signature DOES band-collide with
    //      the contained doc's whole-doc signature — the
    //      containment-targeted index forms the candidate and the
    //      same exact verify accepts it.
    val contained = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
    val container = "zeta omega rho tau sigma iota nadir vertex " + contained +
      " quartz maple onyx cedar amber stone"
    val dir = corpusDir(Seq(contained, container,
      "completely different words that share nothing with the others at all"))
    // the shared-index op misses the pair entirely (no candidate)
    assert(SparkEntry.queries("dd_containment")(spark, dir).count() == 0)
    // the window index catches it, same acceptance rule
    val rows = SparkEntry.queries("dd_containment_index")(spark, dir).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getLong(r.fieldIndex("contained_doc")) == 0L)
    assert(r.getLong(r.fieldIndex("container_doc")) == 1L)
    assert(r.getLong(r.fieldIndex("n_common")) == 10L)
    assert(r.getLong(r.fieldIndex("n_contained")) == 10L)
    assert(r.getLong(r.fieldIndex("n_container")) == 24L)
    assert(r.getInt(r.fieldIndex("jaccard_pass")) == 0)
  }

  test("dd_containment_index32 catches a mid-stratum quote BOTH lower rungs provably miss") {
    // quote: 32 words = 30 shingles — inside the L32 probe stratum
    // (15 ≤ n_sh ≤ 30, at its upper edge) and OUTSIDE the L16 stratum
    // (n_sh ≤ 14), so the L16 rung cannot even probe with it: its miss
    // is STRUCTURAL, not hash luck. The quote sits at word offset 16 —
    // a stride-16-aligned window start — so the container's L32 window
    // at shingle offset 16 spans words 16..47: exactly the quote.
    // That window's shingle set EQUALS the quote's whole-doc shingle
    // set, hence identical minhash signatures, hence all four bands
    // collide — the L32 catch is structural too. Only the
    // dd_containment miss leans on the (deterministic-forever) md5
    // band math: whole-doc J = 30/246 ≈ 0.12, and the 200-word tail
    // was checked against the real signatures to share no band.
    val quote = "alpha bravo charlie delta echo foxtrot golf hotel india juliet " +
      "kilo lima mike november oscar papa quebec romeo sierra tango " +
      "uniform victor whiskey xray yankee zulu amber birch cedar dune ember flint"
    assert(quote.split(" ").length == 32)
    val prefix = "zeta omega rho tau sigma iota nadir vertex quartz maple onyx jade slate frost glade moss"
    assert(prefix.split(" ").length == 16)
    val tail = (1 to 200).map(i => s"filler$i").mkString(" ")
    val container = s"$prefix $quote $tail"
    val dir = corpusDir(Seq(quote, container,
      "completely different words that share nothing with the others at all"))
    // the symmetric whole-doc index misses: J ≈ 0.12, no shared band
    assert(SparkEntry.queries("dd_containment")(spark, dir).count() == 0)
    // the L16 rung misses structurally: 30 shingles is out of stratum
    assert(SparkEntry.queries("dd_containment_index")(spark, dir).count() == 0)
    // the L32 rung catches, same acceptance rule, C = 30/30 = 1.0
    val rows = SparkEntry.queries("dd_containment_index32")(spark, dir).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getLong(r.fieldIndex("contained_doc")) == 0L)
    assert(r.getLong(r.fieldIndex("container_doc")) == 1L)
    assert(r.getLong(r.fieldIndex("n_common")) == 30L)
    assert(r.getLong(r.fieldIndex("n_contained")) == 30L)
    assert(r.getLong(r.fieldIndex("n_container")) == 246L)
    assert(r.getInt(r.fieldIndex("jaccard_pass")) == 0)
  }

  test("dd_containment_index64 catches a mid-stratum quote ALL lower rungs provably miss") {
    // quote: 64 words = 62 shingles — inside the L64 probe stratum
    // (31 ≤ n_sh ≤ 62, at its upper edge) and OUTSIDE both lower
    // strata (L16 probes n_sh ≤ 14, L32 probes 15–30), so neither
    // lower rung can even probe with it: their misses are STRUCTURAL,
    // not hash luck. The quote sits at word offset 32 — a
    // stride-32-aligned window start — so the container's L64 window
    // at shingle offset 32 spans words 32..95: exactly the quote.
    // That window's shingle set EQUALS the quote's whole-doc shingle
    // set, hence identical minhash signatures, hence all four bands
    // collide — the L64 catch is structural too. Only the
    // dd_containment miss leans on the (deterministic-forever) md5
    // band math: whole-doc J = 62/494 ≈ 0.13, and the 400-word tail
    // was checked against the real signatures to share no band.
    val quote = (1 to 64).map(i => s"qw$i").mkString(" ")
    val prefix = (1 to 32).map(i => s"pz$i").mkString(" ")
    val tail = (1 to 400).map(i => s"fz$i").mkString(" ")
    val container = s"$prefix $quote $tail"
    assert(container.split(" ").length == 496)
    val dir = corpusDir(Seq(quote, container,
      "completely different words that share nothing with the others at all"))
    // the symmetric whole-doc index misses: J ≈ 0.13, no shared band
    assert(SparkEntry.queries("dd_containment")(spark, dir).count() == 0)
    // the lower rungs miss structurally: 62 shingles is out of stratum
    assert(SparkEntry.queries("dd_containment_index")(spark, dir).count() == 0)
    assert(SparkEntry.queries("dd_containment_index32")(spark, dir).count() == 0)
    // the L64 rung catches, same acceptance rule, C = 62/62 = 1.0
    val rows = SparkEntry.queries("dd_containment_index64")(spark, dir).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getLong(r.fieldIndex("contained_doc")) == 0L)
    assert(r.getLong(r.fieldIndex("container_doc")) == 1L)
    assert(r.getLong(r.fieldIndex("n_common")) == 62L)
    assert(r.getLong(r.fieldIndex("n_contained")) == 62L)
    assert(r.getLong(r.fieldIndex("n_container")) == 494L)
    assert(r.getInt(r.fieldIndex("jaccard_pass")) == 0)
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
  test("dd_leakage_safe_split: no verified near-dup pair straddles splits") {
    val dir = "/root/testdata/sf0.01"
    val split = SparkEntry.queries("dd_leakage_safe_split")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    // structural guarantee: both ends of every verified pair carry the
    // same cluster hence the same split verdict
    val pairs = SparkEntry.queries("dd_minhash_neardups")(spark, dir)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(split(a)._2 == split(b)._2, s"pair ($a,$b) straddles splits")
      assert(split(a)._1 == split(b)._1, s"pair ($a,$b) in different clusters")
    }
    // the hash actually partitions: all three splits populated, train
    // dominates (12/16 buckets)
    val by = split.values.groupBy(_._2).view.mapValues(_.size).toMap
    assert(by.keySet == Set("train", "val", "test"), by.toString)
    assert(by("train") > by("val") && by("train") > by("test"))
  }

  test("dd_dup_spans: positions, maximal-span merge rule, exact coverage") {
    // P is an 8-word phrase (= one gram exactly); every gram that
    // overlaps P only partially includes a per-doc-unique filler word,
    // so P's start positions are the ONLY duplicated gram positions.
    val P = "p1 p2 p3 p4 p5 p6 p7 p8"
    val dir = corpusDir(Seq(
      s"u01 u02 $P u03 u04", // P at pos 2 of 12 words
      s"v01 v02 v03 $P", // P at pos 3 of 11 words
      "z01 z02 z03 z04 z05 z06 z07 z08 z09 z10", // 10 unique words, no dups
      s"$P w01 w02 $P", // P at 0 and 10: gap 10 > W -> TWO spans
      s"$P $P", // P at 0 and 8: gap 8 <= W -> ONE merged span
      s"$P x99 $P")) // P at 0 and 9: gap 9 = W + 1, the SMALLEST gap
    // that must split — an off-by-one in the `pos - prev > W` break
    // rule (> vs >=) flips exactly this fixture
    val spans = SparkEntry.queries("dd_dup_spans")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4)))
      .toSet
    assert(spans == Set(
      (0L, 2, 9, 8, 1L),
      (1L, 3, 10, 8, 1L),
      (3L, 0, 7, 8, 1L), (3L, 10, 17, 8, 1L),
      (4L, 0, 15, 16, 2L),
      (5L, 0, 7, 8, 1L), (5L, 9, 16, 8, 1L)))
    val cov = SparkEntry.queries("dd_dup_span_coverage")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(cov(2L) == ((10L, 0L, 0L, 0L))) // zero-span doc surfaces
    assert(cov(3L) == ((18L, 16L, 2L, 888888L))) // 16/18 words, floor ppm
    assert(cov(4L) == ((16L, 16L, 1L, 1000000L))) // fully duplicated
    assert(cov(5L) == ((17L, 16L, 2L, 941176L))) // word 8 NOT covered
  }

  test("dd_dup_span_apply: length floor, trim arithmetic, drop at exactly the threshold") {
    val P = "p1 p2 p3 p4 p5 p6 p7 p8" // 8 words = one gram = one 8-word span
    val Q = (1 to 16).map(i => s"qq$i").mkString(" ") // a 16-word cut-eligible span
    val docA = s"$P ax1 ax2 $P " + (1 to 10).map(i => s"ay$i").mkString(" ")
    val docB = (1 to 12).map(i => s"bx$i").mkString(" ") + s" $Q " +
      (1 to 12).map(i => s"by$i").mkString(" ")
    val docC = (1 to 16).map(i => s"cx$i").mkString(" ") + s" $Q"
    val docD = (1 to 10).map(i => s"dx$i").mkString(" ")
    val docE = s"$P " + (1 to 21).map(i => s"ex$i").mkString(" ") + s" $Q"
    val dir = corpusDir(Seq(docA, docB, docC, docD, docE))
    val rows = SparkEntry.queries("dd_dup_span_apply")(spark, dir)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getLong(5))))
      .toMap
    // A (28 words): two 8-word spans, both below the 16-word floor — intact
    assert(rows(0L) == ((28L, 0L, 0L, "keep", 28L)))
    // B (40 words): one 16-word span, 40% coverage < 50% — trimmed
    assert(rows(1L) == ((40L, 16L, 1L, "trim", 24L)))
    // C (32 words): one 16-word span, coverage EXACTLY 50% — the drop
    // boundary is inclusive (≥), so the doc drops whole
    assert(rows(2L) == ((32L, 16L, 1L, "drop", 0L)))
    // D: no duplicated grams at all
    assert(rows(3L) == ((10L, 0L, 0L, "keep", 10L)))
    // E (45 words): an 8-word span (ignored, below floor) AND a
    // 16-word span (cut) in the same doc — the floor is per SPAN
    assert(rows(4L) == ((45L, 16L, 1L, "trim", 29L)))
  }

  test("dd_span_index_merge: a batch quote creates a span inside an OLD doc") {
    // The threshold-after-merge class: P occurs ONCE among yesterday's
    // docs (a singleton gram — no span in any per-side verdict) and
    // once in the delta batch (doc_id >= (max*4) div 5 = 3). The
    // merged gram counts cross the >= 2 dup threshold, so the read
    // view must emit the span in BOTH docs — including old doc 0,
    // whose text the maintenance path never rescans (its gram rows
    // are the memoized artifact). A store persisting per-side dup
    // VERDICTS instead of occurrences would return nothing here.
    val P = "m1 m2 m3 m4 m5 m6 m7 m8"
    val dir = corpusDir(Seq(
      s"a01 a02 $P a03 a04", // OLD: P at pos 2 — singleton among old docs
      "b01 b02 b03 b04 b05 b06 b07 b08 b09", // OLD: unique words
      "c01 c02 c03 c04 c05 c06 c07 c08 c09", // OLD: unique words
      "d01 d02 d03 d04 d05 d06 d07 d08 d09", // BATCH: unique words
      s"e01 $P e02 e03 e04")) // BATCH: P at pos 1 — the new quote
    val merged = SparkEntry.queries("dd_span_index_merge")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4)))
      .toSet
    assert(merged == Set(
      (0L, 2, 9, 8, 1L), // the OLD doc's span, created by the batch
      (4L, 1, 8, 8, 1L)))
    // and the maintained view is row-identical to the from-scratch
    // rebuild (what the oracle replays at the fixture SF)
    val rebuilt = SparkEntry.queries("dd_dup_spans")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4)))
      .toSet
    assert(merged == rebuilt)
  }

  test("dd_quality_kept keeps the best copy where dd_kept_corpus keeps the min id") {
    // doc 1 is doc 0 plus a stopword-rich tail: same cluster (J =
    // 18/22 ≈ 0.82), but the HIGHER id carries the higher stopword
    // ratio — the quality keeper must flip the verdict the min-id
    // policy gives. Both policies agree the singleton doc 2 is kept.
    val base = (1 to 20).map(i => s"qk$i").mkString(" ")
    val dir = corpusDir(Seq(
      base,
      s"$base the of and to",
      "entirely unrelated filler words that cluster with nothing else here"))
    def verdicts(q: String): Map[Long, Long] =
      SparkEntry.queries(q)(spark, dir).collect()
        .map(r => r.getLong(r.fieldIndex("doc_id")) ->
          r.getLong(r.fieldIndex("kept"))).toMap
    val minId = verdicts("dd_kept_corpus")
    assert(minId == Map(0L -> 1L, 1L -> 0L, 2L -> 1L),
      s"fixture must cluster docs 0 and 1 under the min-id policy: $minId")
    val quality = verdicts("dd_quality_kept")
    assert(quality == Map(0L -> 0L, 1L -> 1L, 2L -> 1L),
      s"quality keeper must prefer the stopword-richer copy: $quality")
  }

  test("dd_quality_kept emits a verdict for a NULL-text doc (no silently lost docs)") {
    // An apply stage that silently drops docs is a policy hole: a
    // NULL text must still receive a (cluster_id, kept) row. It
    // tokenizes as '' (ONE empty token, gramRows' convention), is its
    // own singleton cluster, and is kept.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-dedup-edge-").toString
    Seq(
      (0L, Option("alpha beta gamma delta epsilon"), "en", "test", 29L),
      (1L, Option.empty[String], "en", "test", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("dd_quality_kept")(spark, dir).collect()
      .map(r => r.getLong(r.fieldIndex("doc_id")) ->
        ((r.getLong(r.fieldIndex("cluster_id")),
          r.getInt(r.fieldIndex("stop_pct")),
          r.getInt(r.fieldIndex("n_tokens")),
          r.getLong(r.fieldIndex("kept"))))).toMap
    assert(out.keySet == Set(0L, 1L), s"NULL-text doc lost: $out")
    assert(out(1L) == ((1L, 0, 1, 1L)), out(1L).toString)
  }
}
