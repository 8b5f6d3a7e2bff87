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

  test("hard negatives exclude the query's label and sit below the brute optimum") {
    val qLabel = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter("vec_id < 10").select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val nLabel = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    def cosOf(r: org.apache.spark.sql.Row, dotIdx: Int, nqIdx: Int, nvIdx: Int) =
      r.getLong(dotIdx).toDouble /
        math.sqrt(r.getLong(nqIdx).toDouble * r.getLong(nvIdx).toDouble)
    val hard = SparkEntry.queries("ss_hard_negatives")(spark, dir).collect()
    assert(hard.length == qLabel.size * 5, "5 rows per query")
    // the defining predicate: no mined negative shares its query's label
    hard.foreach { r =>
      assert(r.getInt(3) != qLabel(r.getLong(0)),
        s"query ${r.getLong(0)} mined a same-label 'negative' ${r.getLong(2)}")
    }
    // (query_id, rk, neighbor_id, dot, n2_q, n2_v) in both queries:
    // the best different-label cosine can never beat the best
    // unrestricted cosine, and must EQUAL it whenever the brute top-1
    // is already cross-label
    val brute1 = SparkEntry.queries("ss_brute_topk")(spark, dir).collect()
      .filter(_.getInt(1) == 1)
      .map(r => r.getLong(0) -> (r.getLong(2), cosOf(r, 3, 4, 5))).toMap
    val hard1 = hard.filter(_.getInt(1) == 1)
      .map(r => r.getLong(0) -> (r.getLong(2), cosOf(r, 4, 5, 6))).toMap
    qLabel.keys.foreach { q =>
      val (bn, bc) = brute1(q); val (hn, hc) = hard1(q)
      assert(hc <= bc + 1e-12, s"query $q: hard-neg cos $hc beats brute $bc")
      if (nLabel(bn) != qLabel(q))
        assert(hn == bn, s"query $q: brute top-1 $bn is cross-label but hard-neg picked $hn")
    }
    // the predicate must BITE somewhere: at least one query's brute
    // TOP-5 contains a same-label neighbor (so the mined set really
    // differs from ss_brute_topk — at sf0.01 this happens at ranks
    // 2-5 of queries 1/3/7, verified against the oracle)
    val brute5 = SparkEntry.queries("ss_brute_topk")(spark, dir).collect()
    assert(brute5.exists(r => nLabel(r.getLong(2)) == qLabel(r.getLong(0))),
      "fixture has no same-label brute top-5 row — the label filter never bites")
  }

  test("filtered top-k: label predicate holds, post-filter marks are consistent and lossy") {
    val qLabel = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter("vec_id < 10").select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val nLabel = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // (query_id, rk, neighbor_id, dot, n2_q, n2_v, in_post)
    val rows = SparkEntry.queries("ss_filtered_topk")(spark, dir).collect()
    assert(rows.length == qLabel.size * 5, "5 rows per query (classes are large)")
    // the defining predicate: every served neighbor is in-filter
    rows.foreach { r =>
      assert(nLabel(r.getLong(2)) == qLabel(r.getLong(0)),
        s"query ${r.getLong(0)} served out-of-filter neighbor ${r.getLong(2)}")
    }
    def cosOf(r: org.apache.spark.sql.Row) =
      r.getLong(3).toDouble / math.sqrt(r.getLong(4).toDouble * r.getLong(5).toDouble)
    // pre-filter is a ranking: cosine non-increasing in rk per query
    rows.groupBy(_.getLong(0)).values.foreach { qs =>
      val byRk = qs.sortBy(_.getInt(1)).map(cosOf).toSeq
      byRk.zip(byRk.drop(1)).foreach { case (a, b) =>
        assert(a >= b - 1e-12, "cosine must be non-increasing in rank")
      }
    }
    // consistency with the unfiltered optimum: a same-label row of
    // brute's top-5 is inside the post-filter shortlist (depth 10 ≥ 5)
    // AND inside the true same-label top-5, so it must appear here
    // with in_post = 1
    val served = rows.map(r => (r.getLong(0), r.getLong(2)) -> r.getInt(6)).toMap
    SparkEntry.queries("ss_brute_topk")(spark, dir).collect()
      .filter(r => nLabel(r.getLong(2)) == qLabel(r.getLong(0)))
      .foreach { r =>
        val k = (r.getLong(0), r.getLong(2))
        assert(served.get(k).contains(1),
          s"brute same-label row $k missing or unmarked in filtered results")
      }
    // the measurement must BITE: at ~1/10 selectivity a 10-deep
    // unfiltered shortlist cannot contain all 5 true in-filter
    // neighbors for every query — some in_post = 0 row exists
    assert(rows.exists(_.getInt(6) == 0),
      "post-filter missed nothing — the recall measurement is vacuous on this fixture")
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

  test("IMI seqscan dominates the single-cell probe at every rank") {
    // the multi-sequence scan's first visited cell is provably the
    // query's own joint cell (min(s1+s2) decomposes per level), so its
    // candidate set is a superset of ss_imi_topk's — black-box form:
    // per query, the rank-r cosine can only be ≥ the single-probe's,
    // and the result list can only be longer
    def byQuery(name: String): Map[Long, Seq[(Long, Double)]] =
      SparkEntry.queries(name)(spark, dir)
        .join(Similarity.varr(spark, dir).select("vec_id", "n2")
          .withColumnRenamed("vec_id", "neighbor_id").withColumnRenamed("n2", "n2_v"),
          "neighbor_id")
        .join(Similarity.varr(spark, dir).select("vec_id", "n2")
          .withColumnRenamed("vec_id", "query_id").withColumnRenamed("n2", "n2_q"),
          "query_id")
        .select("query_id", "rk", "neighbor_id", "dot", "n2_q", "n2_v").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          r.getLong(3).toDouble / math.sqrt(r.getLong(4).toDouble * r.getLong(5).toDouble)))
        .groupBy(_._1)
        .map { case (q, rows) =>
          q -> rows.sortBy(_._2).map(t => (t._3, t._4)).toSeq }
    val single = byQuery("ss_imi_topk")
    val seq = byQuery("ss_imi_seqscan")
    assert(seq.nonEmpty)
    single.foreach { case (q, srows) =>
      val qrows = seq.getOrElse(q, Seq.empty)
      assert(qrows.size >= srows.size,
        s"q=$q: seqscan returned fewer rows (${qrows.size} < ${srows.size})")
      srows.zip(qrows).zipWithIndex.foreach { case (((_, sc), (_, qc)), i) =>
        assert(qc >= sc - 1e-12,
          s"q=$q rank ${i + 1}: seqscan cos $qc < single-probe cos $sc")
      }
    }
    // and the budget must actually widen the scan somewhere on the
    // fixture: at least one query sees a strictly better neighbor set
    assert(single.exists { case (q, srows) =>
      seq.getOrElse(q, Seq.empty).map(_._1) != srows.map(_._1)
    }, "seqscan never improved on the single-cell probe — budget too small to matter?")
  }

  test("seqscan keeps the query's own cell on an exact s1+s2 tie that exhausts the budget") {
    // the ADVICE-flagged dominance hole: scan order tie-breaks equal
    // s1+s2 on (cell1, cell2), so a TIED foreign cell with smaller ids
    // is visited first — if it holds ≥ budget members, the own cell's
    // prev ≥ budget and the budget filter alone would drop it,
    // breaking "seqscan ⊇ single-cell probe". The own-cell OR-arm must
    // keep it; a non-own cell in the same position must still drop.
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val budget = 5L
    // query 1: own cell (1,1); foreign cell (0,0) ties at s1+s2=10 and
    // holds exactly `budget` members. query 2: same geometry but its
    // own cell is (0,0), so for IT the (1,1) row must drop.
    val scores = Seq(
      (1L, 0L, 0L, 4L, 6L), (1L, 1L, 1L, 7L, 3L),
      (2L, 0L, 0L, 4L, 6L), (2L, 1L, 1L, 7L, 3L)
    ).toDF("qid", "cell1", "cell2", "s1", "s2")
    val pop = Seq((0L, 0L, budget), (1L, 1L, 3L)).toDF("cell1", "cell2", "cnt")
    val own = Seq((1L, 1L, 1L), (2L, 0L, 0L)).toDF("qid", "cell1", "cell2")
    val kept = Similarity.seqscanKeptCells(scores, pop, own, budget)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(kept.contains((1L, 0L, 0L)), "first-visited tied cell must be kept")
    assert(kept.contains((1L, 1L, 1L)),
      "own cell dropped on an exact s1+s2 tie — dominance invariant broken")
    assert(kept.contains((2L, 0L, 0L)))
    assert(!kept.contains((2L, 1L, 1L)),
      "non-own cell past the budget must still drop")
  }

  test("graph-search results are reachable within the beam's hop budget") {
    // independent BFS over the materialized edge list: every neighbor
    // the beam returns must lie within 3 hops of its query in the
    // directed k-NN graph (the beam can only prune, never teleport)
    val edges = SparkEntry.queries("ss_knn_graph")(spark, dir)
      .select("vec_id", "neighbor_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val results = SparkEntry.queries("ss_graph_search")(spark, dir)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(results.nonEmpty)
    results.groupBy(_._1).foreach { case (qid, rows) =>
      var reach = Set(qid)
      for (_ <- 1 to 3)
        reach = reach ++ reach.flatMap(n => edges.getOrElse(n, Set.empty[Long]))
      rows.map(_._2).foreach { nb =>
        assert(reach.contains(nb), s"query $qid returned unreachable node $nb")
      }
    }
  }

  test("broadcast-table centroid assignment is bit-equal to the literal argmin") {
    // the large-k transport (ss_cells_assign's flat branch) must agree with the
    // literal-expression path (ss_ivf_trained's assignment) on every
    // vector, ties included
    val v = Similarity.varr(spark, dir).cache()
    v.count()
    val literal = SparkEntry.queries("ss_ivf_trained")(spark, dir)
      .select("neighbor_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bcast = Similarity.trainedCellsBroadcast(v)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bcast.size > literal.size) // broadcast path assigns ALL vectors
    literal.foreach { case (id, cell) =>
      assert(bcast(id) == cell, s"vec $id: literal=$cell broadcast=${bcast(id)}")
    }
  }

  test("large-k training: broadcast assignment bit-equal to literal argmin at k=64 and k=256") {
    import org.apache.spark.sql.functions._
    graft.GraftExtensions.register(spark)
    // deterministic synthetic corpus big enough that k=256 init ids
    // exist and cells stay non-trivially occupied
    val v = spark.range(4096).select(col("id").as("vec_id"),
      expr("transform(sequence(0, 63), d -> " +
        "CAST((id * 37 + d * 101) % 997 - 498 AS BIGINT))").as("qe"))
      .withColumn("n2", expr("graft_dot(qe, qe)"))
      .cache()
    v.count()
    for (k <- Seq(64, 256)) {
      // trains THROUGH the broadcast dispatch (k > LiteralAssignMaxK);
      // Lloyd rounds may drop cells that end a round empty, so the
      // model can be slightly smaller than k
      val model = Similarity.kmeansModel(v, "qe", 64, k)
      assert(model.size <= k && model.size > k / 2, s"k=$k model=${model.size}")
      val bcast = Similarity.assignWinnersBroadcast(v, "qe", model)
        .select(col("vec_id"), col("cell")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // literal argmin over the same model — ties included
      val literal = v.select(col("vec_id"),
          Similarity.assignCellOn("qe", model).as("cell")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(bcast.size == 4096)
      assert(bcast == literal, {
        val bad = literal.collectFirst {
          case (id, c) if bcast(id) != c => (id, c, bcast(id)) }
        s"k=$k first divergence (vec, literal, broadcast): $bad"
      })
      // the model actually uses many cells at this k
      assert(bcast.values.toSet.size > k / 2, s"k=$k degenerate assignment")
    }
  }

  test("scaled geometry keeps near-identical pairs (planted-pair recall at n=20k)") {
    import org.apache.spark.sql.functions._
    graft.GraftExtensions.register(spark)
    // 20k synthetic corpus (the sf1 regime: geometry (5 bands, 10
    // planes)); vectors 2i/2i+1 for i < 100 are planted near-identical
    // pairs (8 of 64 dims nudged ⇒ cos ≈ 0.95). Sign-LSH collision
    // theory at cos 0.95 / 10 planes / 5 bands predicts ~88% pair
    // recall — the scaled geometry sacrifices BORDERLINE similarity
    // (cos 0.35-0.5, measured ~5%) to hold the per-vector candidate
    // budget, but near-identical pairs — the mass a dedup pipeline
    // exists for — must survive. Floor at 0.6 for seed robustness.
    val base = spark.range(20000).select(col("id").as("vec_id"),
      expr("transform(sequence(0, 63), d -> " +
        "CAST((id * 2654435761 + d * 40503) % 1001 - 500 AS BIGINT))").as("qe"))
    val v = base.select(col("vec_id"),
        when(col("vec_id") < 200 && col("vec_id") % 2 === 1,
          expr("transform(sequence(0, 63), d -> " +
            "CAST(((vec_id - 1) * 2654435761 + d * 40503) % 1001 - 500 " +
            "+ IF(d < 8, 180, 0) AS BIGINT))"))
          .otherwise(col("qe")).as("qe"))
      .withColumn("n2", expr("graft_dot(qe, qe)"))
      .cache()
    assert(v.count() == 20000)
    val g = Similarity.scaledGeometry(20000)
    assert(g != Similarity.DefaultGeometry) // really the scale regime
    // planted pairs really are near-identical
    val planted = (0 until 100).map(i => (2L * i, 2L * i + 1))
    val cosCheck = v.filter(col("vec_id") < 200)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    planted.foreach { case (a, b) =>
      val (va, vb) = (cosCheck(a), cosCheck(b))
      val dot = va.zip(vb).map { case (x, y) => x * y }.sum.toDouble
      val cos = dot / math.sqrt(va.map(x => x * x).sum.toDouble *
        vb.map(x => x * x).sum.toDouble)
      assert(cos > 0.9 && cos < 0.999, s"pair ($a,$b) cos=$cos")
    }
    val cand = Similarity.lshCandidates(v, g)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recalled = planted.count(cand.contains)
    info(s"planted-pair recall at $g: $recalled/100")
    assert(recalled >= 60, s"near-identical recall collapsed: $recalled/100")
  }

  test("IMI: 16×16 two-level assignment beats flat k=256 at equal cell count") {
    import org.apache.spark.sql.functions._
    graft.GraftExtensions.register(spark)
    // 20k synthetic corpus: flat IVF needs 256 dots of 64 dims per
    // vector for 256 cells; the two-level quantizer reaches the same
    // 256 joint cells with 2 × 16 dots of 32 dims — 16× less multiply
    // work. Measure the ASSIGNMENT passes (models pre-trained) — the
    // recurring cost every index build and every re-encode pays.
    val v = spark.range(20000).select(col("id").as("vec_id"),
      expr("transform(sequence(0, 63), d -> " +
        "CAST((id * 2654435761 + d * 40503) % 1001 - 500 AS BIGINT))").as("qe"))
      .cache()
    v.count()
    val flatModel = Similarity.kmeansModel(v, "qe", 64, 256)
    val vs = v.select(col("vec_id"),
      expr("slice(qe, 1, 32)").as("impart0"),
      expr("slice(qe, 33, 32)").as("impart1")).cache()
    vs.count()
    val m0 = Similarity.kmeansModel(vs, "impart0", 32, 16)
    val m1 = Similarity.kmeansModel(vs, "impart1", 32, 16)
    // STRUCTURAL assertion — the composition's whole point, derived
    // from the actually-trained models (Lloyd can drop empty cells, so
    // the counts are measured, not assumed): per-vector multiply work
    // is Σ(model cells × subspace dims). Wall-clock at this fixture
    // size is fixed-overhead-dominated and host-noise-prone (the
    // repo's own notes measure ~1.35× in-window spread), so timing
    // below is informational with a generous slack + retry, never a
    // raw tImi < tFlat assert.
    val flatMults = flatModel.size.toLong * 64
    val imiMults = (m0.size.toLong + m1.size.toLong) * 32
    info(s"per-vector multiplies: flat=$flatMults imi=$imiMults " +
      f"(${flatMults.toDouble / imiMults}%.1f× — theory 16× at full models)")
    assert(imiMults * 8 <= flatMults,
      s"two-level multiply work ($imiMults) not ≥8× under flat ($flatMults)")
    def timed(f: => Long): (Long, Double) = {
      val t0 = System.nanoTime(); val n = f; (n, (System.nanoTime() - t0) / 1e9)
    }
    // warm both paths once (codegen/JIT), then measure; retry because
    // a GC pause or host-noise spike can transiently invert the 16×
    // theoretical advantage at this small fixture size
    Similarity.assignCellsBroadcast(v, "qe", flatModel).count()
    vs.select(Similarity.assignCellOn("impart0", m0),
      Similarity.assignCellOn("impart1", m1)).count()
    val attempts = (1 to 3).iterator.map { i =>
      val (nFlat, tFlat) = timed(
        Similarity.assignCellsBroadcast(v, "qe", flatModel).count())
      val (nImi, tImi) = timed(vs.select(
        Similarity.assignCellOn("impart0", m0).as("c1"),
        Similarity.assignCellOn("impart1", m1).as("c2")).count())
      assert(nFlat == 20000 && nImi == 20000)
      info(f"attempt $i: flat k=256 assignment $tFlat%.2f s; IMI 16×16 " +
        f"$tImi%.2f s (${tFlat / tImi}%.1f×)")
      tImi < tFlat * 1.25
    }
    assert(attempts.exists(identity),
      "IMI assignment slower than flat×1.25 on all 3 attempts — " +
        "beyond host noise, investigate")
    // and the joint cells really use the k² space (more occupied joint
    // cells than either level alone could provide)
    val joint = vs.select(
      (Similarity.assignCellOn("impart0", m0) * 16 +
        Similarity.assignCellOn("impart1", m1)).as("jc"))
      .distinct().count()
    assert(joint > 16, s"only $joint joint cells — degenerate split")
  }

  test("large-k plan: broadcast transport, no centroid literal at k=256") {
    import org.apache.spark.sql.functions._
    graft.GraftExtensions.register(spark)
    val v = spark.range(4096).select(col("id").as("vec_id"),
      expr("transform(sequence(0, 63), d -> " +
        "CAST((id * 53 + d * 7) % 991 - 495 AS BIGINT))").as("qe"))
    val model = Similarity.kmeansModel(v, "qe", 64, 256)
    val plan = Similarity.assignWinnersBroadcast(v, "qe", model)
      .queryExecution.executedPlan.toString
    // every vector meets every centroid (a model fan-out has no
    // selective key), so the right plan is a broadcast of the k-row
    // model — Spark constant-folds the fan-out into a
    // BroadcastNestedLoopJoin over the broadcast model table
    assert(plan.contains("BroadcastExchange"), plan.take(2000))
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"), plan.take(2000))
    // the k·dims model must travel as broadcast DATA, not plan text:
    // a literal-argmin plan at k=256 carries 16k array literals
    assert(plan.length < 100000, s"plan is ${plan.length} chars — model inlined?")
    assert(!plan.contains("named_struct"), "literal argmin leaked into the broadcast path")
  }

  test("training memos are keyed per fixture — no cross-dir leakage") {
    // the model/index memos key on the input's parquet content; a key
    // collision would serve one fixture's trained model to another.
    // Assert the MODEL-dependent output, not just its shape: for each
    // fixture, the (possibly memo-served) assignment must be identical
    // to a guaranteed-fresh retraining after clearMemos(). If fixture
    // A's centroids were ever wrongly served for fixture B, B's served
    // map would disagree with B's fresh map on some vector.
    def assignments(d: String): Map[Long, Long] =
      SparkEntry.queries("ss_cells_assign")(spark, d)
        .select("vec_id", "cell").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // warm both memos in an interleaved order first
    val servedA = assignments("/root/testdata/sf0.001")
    val servedB = assignments("/root/testdata/sf0.01")
    Similarity.clearMemos()
    val freshA = assignments("/root/testdata/sf0.001")
    Similarity.clearMemos()
    val freshB = assignments("/root/testdata/sf0.01")
    assert(servedA == freshA, "sf0.001: memo-served model != freshly trained model")
    assert(servedB == freshB, "sf0.01: memo-served model != freshly trained model")
    // and the two fixtures' models genuinely differ (the test would be
    // vacuous if both corpora trained to identical assignments)
    val common = servedA.keySet.intersect(servedB.keySet)
    assert(common.exists(id => servedA(id) != servedB(id)),
      "fixtures trained to identical assignments — leakage undetectable")
  }

  test("regenerating a fixture at the same path retrains — no stale model served") {
    // the ADVICE scenario: the driver rewrites a fixture in place
    // between rounds within one JVM. The memo key folds in a file
    // snapshot (path+len+mtime), so the rewrite must produce a fresh
    // training; serving the pre-rewrite model would disagree with a
    // from-scratch training on the new content.
    val tmp = java.nio.file.Files.createTempDirectory("graft-regen").toString
    def writeFrom(src: String, scaleMod: Int): Unit = {
      spark.read.parquet(s"$src/embeddings.parquet")
        .selectExpr("vec_id", s"transform(embedding, x -> x * (1.0f + CAST(vec_id % $scaleMod AS FLOAT))) AS embedding", "label")
        .coalesce(1).write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
      // drop Spark's own data cache for the rewritten path — the
      // production regeneration happens across JVMs; this test isolates
      // the MEMO's staleness behavior, not the CacheManager's
      spark.catalog.clearCache()
    }
    def served(): Map[Long, Long] =
      SparkEntry.queries("ss_cells_assign")(spark, tmp)
        .select("vec_id", "cell").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    writeFrom("/root/testdata/sf0.001", 2)
    val before = served()
    writeFrom("/root/testdata/sf0.001", 5) // same path, new content
    val after = served() // must train on the NEW content
    Similarity.clearMemos()
    val freshAfter = served() // ground truth for the new content
    assert(after == freshAfter,
      "post-regeneration memo served a model differing from fresh training")
    assert(before != after,
      "shifted fixture trained to identical assignments — staleness undetectable")
  }

  test("the broadcast assignment plans broadcast joins and no multi-MB literal") {
    val v = Similarity.varr(spark, dir)
    val plan = Similarity.trainedCellsBroadcast(v)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"), plan)
    // the literal path's signature is a giant array(...L, ...L) in the
    // plan text; the broadcast path must not embed the model that way
    assert(plan.length < 200 * 1024, s"plan is ${plan.length} chars — model leaked into the plan")
  }
  test("binary quantization packs sign bits faithfully and Hamming is exact") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // dims 0..63 with a known sign pattern: positive exactly where
    // i % 3 == 0 -> expected half-words are the literal bit sums
    val emb = (0 until 64).map(i => if (i % 3 == 0) 0.5f else -0.5f).toArray
    val flip = emb.map(x => -x) // complement signature: Hamming = 64
    val v = Seq((0L, emb, 0), (1L, flip, 0), (2L, emb, 0))
      .toDF("vec_id", "embedding", "label")
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))").as("qe"))
    val bq = Similarity.bqFrame(v).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val expH1 = (0 until 32).filter(_ % 3 == 0).map(1L << _).sum
    val expH2 = (32 until 64).filter(_ % 3 == 0).map(i => 1L << (i - 32)).sum
    assert(bq(0L) == ((expH1, expH2)))
    assert(bq(2L) == ((expH1, expH2))) // identical vector, identical signature
    val (f1, f2) = bq(1L)
    assert(java.lang.Long.bitCount(f1 ^ expH1) + java.lang.Long.bitCount(f2 ^ expH2) == 64)
  }

  test("MRL prefix shortlist misses a suffix-only neighbor; rerank reorders inside it") {
    // Constructed failure mode of the Matryoshka two-stage scan: the
    // exact full-dim top-1 carries ALL its similarity in the suffix
    // dims, while 30 distractors share the query's 16-dim prefix
    // exactly — so the prefix stage ranks every distractor above the
    // true neighbor and the 25-deep shortlist provably excludes it.
    // The recall gate must measure exactly 4/5, not hide it.
    import spark.implicits._
    val dims = 64
    def vec(entries: (Int, Float)*): Array[Float] = {
      val a = Array.fill(dims)(0.0f)
      entries.foreach { case (i, v) => a(i) = v }
      a
    }
    // query: 1.0 at dim 0 (prefix) and dim 16 (suffix)
    val q = (0L, vec(0 -> 1.0f, 16 -> 1.0f), 0)
    // true top-1: suffix-aligned with q (cos = 0.707), prefix
    // orthogonal to q but non-zero (a zero prefix norm would make the
    // prefix cosine 0/0)
    val t = (100L, vec(1 -> 0.1f, 16 -> 1.0f), 0)
    // 30 distractors: q's prefix verbatim, mutually orthogonal
    // suffixes (cos vs q = 0.5, prefix cos = 1.0)
    val ds = (0 until 30).map(j =>
      (101L + j, vec(0 -> 1.0f, (17 + j % 47) -> 1.0f), 0))
    val dir = java.nio.file.Files.createTempDirectory("graft-mrl").toString
    (Seq(q, t) ++ ds).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val top = SparkEntry.queries("ss_mrl_topk")(spark, dir).collect()
    val neighbors = top.map(r => r.getLong(r.fieldIndex("neighbor_id"))).toSet
    assert(!neighbors.contains(100L),
      "suffix-only true neighbor leaked into the prefix shortlist — fixture broken")
    assert(top.map(r => r.getLong(r.fieldIndex("neighbor_id"))).take(5).toSeq ==
      Seq(101L, 102L, 103L, 104L, 105L)) // full-cos ties break by vec_id
    // the width CURVE: at w = 16 the suffix-only neighbor is provably
    // excluded (4/5); widening the prefix past dim 16 pulls its
    // similarity INSIDE the prefix, so w = 32 and w = 48 recover it
    // (5/5) — recall is monotone in width on this fixture, and the
    // w = 16 row is exactly the retired single-point ss_mrl_recall
    // measurement.
    val curve = SparkEntry.queries("ss_mrl_width_recall")(spark, dir).collect()
      .map(r => r.getInt(r.fieldIndex("prefix_dims")) ->
        ((r.getLong(r.fieldIndex("n_truth")),
          r.getLong(r.fieldIndex("n_recalled")),
          r.getLong(r.fieldIndex("recall_ppm"))))).toMap
    assert(curve(16) == ((5L, 4L, 800000L)), curve.toString)
    assert(curve(32) == ((5L, 5L, 1000000L)), curve.toString)
    assert(curve(48) == ((5L, 5L, 1000000L)), curve.toString)
  }
}
