package graft.ops

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkTestSession}

/** The corpus-size-conditional oracle machinery (QuerySpec.oracleGen):
  * the similarity / semantic-dedup SQL twins are GENERATED from the
  * same sizing rules the Spark side uses (scaledGeometry, scaledK,
  * trainSampleThreshold), so EXACT parity holds at any SF — the
  * round-6 ADVICE flagged that frozen DefaultGeometry twins broke
  * parity for any fixture above ~2,250 embeddings. Cross-engine EXACT
  * evidence above the regime lives in docs/oracle_scale_check_sf1.txt
  * (the driver-style DuckDB gate run on the derived 10× fixture,
  * n=20,000 — the shipped sf0.1's 2,000 embeddings sit exactly AT the
  * regime boundary, inside it, so only a derived fixture exercises
  * the generators); these tests pin the
  * in-JVM half: which specs are conditional, that the static strings
  * are the generators at the pinned regime, that the generated SQL
  * embeds the scaled constants, and that the SAMPLED trainer is an
  * exact replay of the reference Lloyd math.
  */
class OracleScaleSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  /** Every spec whose oracle depends on the embeddings-corpus size —
    * kept in sync BY HAND so a silently dropped generator fails here. */
  private val conditional = Set(
    "ss_lsh_neardups", "ss_lsh_multiprobe", "ss_ivf_trained",
    "ss_ivf_nprobe", "ss_nprobe_recall", "ss_cells_assign",
    "ss_recall_eval", "ss_knn_graph", "ss_knn_pagerank", "ss_graph_search",
    "ss_graph_recall", "ss_ivfadc_topk", "ss_ivfadc_residual",
    "ss_residual_recall", "ss_cluster_profile",
    "pipe_index_manifest", "dd_semantic_neardups", "dd_semdedup",
    "ss_imi_cells", "ss_imi_topk", "ss_imi_seqscan", "ss_imi_recall")

  test("exactly the geometry/k-dependent specs carry an oracle generator") {
    val gens = SparkEntry.allSpecs.filter(_.oracleGen.isDefined).map(_.name).toSet
    assert(gens == conditional,
      s"missing: ${conditional -- gens}; unexpected: ${gens -- conditional}")
  }

  test("static oracle strings are the generators pinned at OracleRegimeN") {
    SparkEntry.allSpecs.filter(_.oracleGen.isDefined).foreach { q =>
      assert(q.oracle.contains(q.oracleGen.get(QuerySpec.OracleRegimeN)),
        s"${q.name}: static oracle drifted from gen(OracleRegimeN)")
      // and the regime really is the default one — geometry AND k AND
      // sampling all inactive at the pinned n
      assert(Similarity.scaledGeometry(QuerySpec.OracleRegimeN) ==
        Similarity.DefaultGeometry)
      assert(Similarity.scaledK(QuerySpec.OracleRegimeN) == 8)
      assert(Similarity.trainSampleThreshold(QuerySpec.OracleRegimeN, 8).isEmpty)
    }
  }

  test("trainSampleThreshold: inactive in-regime, binds above, both-engine-safe hex") {
    assert(Similarity.trainSampleThreshold(2000, 8).isEmpty)
    assert(Similarity.trainSampleThreshold(4000, 16).isEmpty) // floor
    // occupancy regime: k = n/250 ⇒ fraction 64/250 = 0.256 at any n
    // ⇒ ceil(0.256 · 65536) = 16778 = 0x418a
    assert(Similarity.trainSampleThreshold(20000, 80).contains("418a"))
    assert(Similarity.trainSampleThreshold(200000, 800).contains("418a"))
    // past the k cap the fraction shrinks — training cost plateaus
    val atCap = Similarity.trainSampleThreshold(100000000L, 65536)
    assert(atCap.isDefined && atCap.get < "418a")
    // fixed-width lowercase hex: lexicographic == numeric in both engines
    assert(Similarity.trainSampleThreshold(20000, 80).get.length == 4)
  }

  test("above-regime generated SQL embeds the scaled geometry, k, and sample") {
    val byName = SparkEntry.allSpecs.map(q => q.name -> q).toMap
    val cells20k = byName("ss_ivf_trained").oracleGen.get(20000)
    assert(cells20k.contains("vec_id < 80"), "scaled k missing") // k = 20000/250
    assert(cells20k.contains("substr(md5('km:' || CAST(vec_id AS VARCHAR)), 1, 4) < '418a'"),
      "training-sample predicate missing")
    assert(cells20k.contains("kqv"), "sampled Lloyd rounds must read kqv")
    // the FINAL (serving) assignment must stay over the full corpus:
    // the last assign CTE joins qv, not kqv
    assert(cells20k.contains("FROM qv v JOIN c2 c"), "final assignment not full-corpus")
    val lsh20k = byName("ss_lsh_neardups").oracleGen.get(20000)
    val g = Similarity.scaledGeometry(20000)
    assert(g.bands == 5 && g.planesPerBand == 10)
    assert(lsh20k.contains(s"range(${g.bands * g.planesPerBand})"),
      "scaled plane count missing")
    assert(lsh20k.contains(s"a.p // ${g.planesPerBand}"), "scaled band split missing")
    // and the regime string differs — the generator is really conditional
    assert(lsh20k != byName("ss_lsh_neardups").oracle.get)
  }

  test("assignment ALGORITHM dispatches flat → IMI across FlatAssignMaxK") {
    val byName = SparkEntry.allSpecs.map(q => q.name -> q).toMap
    val gen = byName("ss_cells_assign").oracleGen.get
    // below the boundary (k = 8 at the pinned regime, k = 64 right at
    // the edge): the flat exhaustive chain, byte-identical to the
    // static oracle at OracleRegimeN
    assert(Similarity.scaledK(QuerySpec.OracleRegimeN) <= Similarity.FlatAssignMaxK)
    assert(gen(QuerySpec.OracleRegimeN).contains("FROM cells"))
    assert(!gen(QuerySpec.OracleRegimeN).contains("imicells"))
    assert(Similarity.scaledK(16000) == 64) // edge: still flat
    assert(gen(16000).contains("FROM cells") && !gen(16000).contains("imicells"))
    // above the boundary (k = 80 at the 10× fixture, k = 800 at sf10):
    // the IMI two-level chain with the joint-cell encoding
    assert(Similarity.scaledK(20000) == 80)
    val g20k = gen(20000)
    assert(g20k.contains("imicells"), "above-boundary gen must route IMI")
    assert(g20k.contains("cell1 * 65536 + cell2"), "joint-cell encoding missing")
    assert(!g20k.contains("FROM cells "), "flat chain must not leak above boundary")
    // per-level k′ = ⌈√k⌉ keeps assignment work n·2k′ ≪ n·k
    assert(Similarity.imiLevelK(20000) == 9)
    assert(Similarity.imiLevelK(200000) == 29)
  }

  test("sampled trainer replays the reference Lloyd math exactly") {
    graft.GraftExtensions.register(spark)
    val dims = 16
    val k = 24
    val thr = "2000" // ~12.5% sample of 6000 = ~750 rows ≫ k
    val v = spark.range(6000).select(col("id").as("vec_id"),
      expr(s"transform(sequence(0, ${dims - 1}), d -> " +
        "CAST((id * 2654435761 + d * 40503) % 1001 - 500 AS BIGINT))").as("qe"))
      .cache()
    v.count()
    val got = Similarity.kmeansModelUncached(v, "qe", dims, k, Some(thr))

    // driver-side reference replay: same init (first-k of the FULL
    // corpus), same md5 sample, argmin(n2c - 2·dot, cid), floorDiv means
    def vecOf(id: Long) = (0 until dims)
      .map(d => (id * 2654435761L + d * 40503L) % 1001 - 500).toArray
    def md5hex4(s: String) = MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString.substring(0, 4)
    val sample = (0L until 6000L).filter(id => md5hex4(s"km:$id") < thr)
    assert(sample.size > 600 && sample.size < 900, s"sample=${sample.size}")
    var cents: Seq[(Long, Array[Long])] =
      (0L until k.toLong).map(id => (id, vecOf(id)))
    for (_ <- 1 to 2) { // KmeansRounds
      val assigned = sample.map { id =>
        val q = vecOf(id)
        val best = cents.map { case (cid, ce) =>
          val n2c = ce.map(x => x * x).sum
          val dot = ce.zip(q).map { case (a, b) => a * b }.sum
          ((n2c - 2 * dot, cid), cid)
        }.minBy(_._1)._2
        (best, q)
      }
      cents = assigned.groupBy(_._1).map { case (cid, rows) =>
        val arr = new Array[Long](dims)
        for (d <- 0 until dims)
          arr(d) = Math.floorDiv(rows.map(_._2(d)).sum, rows.size.toLong)
        (cid, arr)
      }.toSeq.sortBy(_._1)
    }
    assert(got.map(_._1) == cents.map(_._1), "cell-id sets differ")
    got.zip(cents).foreach { case ((gc, ga), (rc, ra)) =>
      assert(gc == rc && ga.sameElements(ra), s"centroid $gc differs")
    }
    // sampling really changed the model vs full training (sanity that
    // the sampled path was exercised, not a no-op)
    val full = Similarity.kmeansModelUncached(v, "qe", dims, k, None)
    assert(!full.zip(got).forall { case ((_, a), (_, b)) => a.sameElements(b) })
  }
}
