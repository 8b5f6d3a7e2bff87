package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import Tables._
import QuerySpec.{sql, sqlN}

/** MinHash-LSH geometry: `bands` bands of `rowsPerBand` signature rows
  * (k = bands × rowsPerBand permutations), plus the hot-bucket cap.
  * The similarity threshold an (b, r) choice targets is ≈ (1/b)^(1/r).
  *
  * The fixture default (4 × 2, cap 10 000) is tuned to the synthetic
  * corpus; a production 100 TB corpus would run e.g. 16 × 8 with the
  * same code — the builders below take the geometry as an argument,
  * and the registered queries pin the default so the generated oracle
  * SQL stays in lock-step with the DataFrame side. */
final case class LshGeometry(bands: Int, rowsPerBand: Int, maxBucketSize: Long = 10000L) {
  val k: Int = bands * rowsPerBand
  /** md5 digests needed: each 32-hex digest yields four 8-hex hashes. */
  val digests: Int = (k + 3) / 4
}

/** Document deduplication for training-data pipelines, designed for
  * 100 TB: every variant is a hash-partitioned aggregation or a
  * bucket-join — never an all-pairs comparison (except the explicitly
  * sampled exact-Jaccard baseline).
  *
  * Execution shape: per-document quantities (shingle set, all K
  * MinHash values) are single codegen'd array expressions
  * (`array_distinct`/`transform`/`array_min`) computed where the row
  * lives, and the exact-Jaccard verify is `array_intersect` on the two
  * candidates' shingle arrays — the corpus is never exploded into
  * (doc_id, shingle) rows, so no shingle-count-sized shuffle exists.
  * The only wide exchanges are the (band, bkey) candidate join and the
  * per-pair id joins. (An earlier revision exploded shingles and
  * computed signatures/overlaps as shuffle aggregations; same outputs,
  * ~4× the wall time at sf0.1, and the explode multiplies shuffle
  * volume by average shingle count — fatal at corpus scale.)
  *
  * Cross-engine determinism notes (DuckDB oracle parity):
  *  - "random" hash permutations are 8-hex-char slices of
  *    `md5(seed || ':' || shingle)` with the LEXICOGRAPHIC min as the
  *    MinHash — a valid random permutation via hash ordering, identical
  *    in any engine with md5;
  *  - outputs are integers/hex-strings only, no floating point.
  *
  * Cache lifecycle: the pipeline caches (MEMORY_AND_DISK — Dataset
  * `cache()`'s default, so eviction spills instead of recomputing the
  * whole shingle pipeline) and eagerly materializes two shared
  * relations, and deliberately does NOT unpersist them: the dd_*
  * queries share identical sub-plans through the CacheManager, and the
  * operator surface assumes the short-lived driver session of
  * Verify/Bench. A long-lived service embedding these builders should
  * call `spark.catalog.clearCache()` between corpus versions.
  */
object Dedup {

  val DefaultGeometry: LshGeometry = LshGeometry(bands = 4, rowsPerBand = 2)

  /** (doc_id, shs: array<string>, n_sh): the distinct shingle SET per
    * doc as one map-side array column (native
    * [[graft.functions.WordShingleArray]] — one eval per row, no
    * interpreted per-shingle lambda); docs too short to shingle are
    * dropped (they have no (doc_id, shingle) pair in the oracle's
    * exploded view either). */
  private def shArr(s: SparkSession, dir: String): DataFrame = {
    graft.GraftExtensions.register(s)
    t(s, dir, "documents")
      .selectExpr("doc_id", "graft_shingle_array(text, 3) AS shs")
      .filter(size(col("shs")) > 0)
      .withColumn("n_sh", size(col("shs")).cast("long"))
  }

  /** DuckDB twin of the exploded view of [[shArr]] as a CTE body.
    * DuckDB lists are 1-based where Spark arrays are 0-based, so i runs
    * 1..len-2 here vs 0..size-3 in the Spark shingler — same word triples.
    * `range(a,b)` is end-exclusive; the greatest() guard empties it for
    * docs <3 words, matching Spark's empty array. */
  private val shinglesSql =
    """SELECT DISTINCT doc_id, words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS sh
      |FROM (SELECT doc_id, words,
      |             unnest(range(1, greatest(len(words) - 1, 1))) AS i
      |      FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents))""".stripMargin

  /** K hash functions from K/4 md5 digests: each 32-hex digest yields
    * four disjoint 8-hex (32-bit) slices — independent uniform hashes
    * at a quarter of the md5 cost (md5 dominates the signature stage's
    * CPU at scale).
    *
    * Signature stage shape: explode the per-doc shingle array (already
    * deduplicated map-side by array_distinct — no DISTINCT shuffle),
    * compute the K/4 digests once per shingle in a codegen'd
    * projection, then hash-aggregate per-doc minima. The min-agg is
    * map-side combined, so the one shuffle carries O(docs × K) partial
    * minima, not O(shingles) rows. (A lambda formulation —
    * array_min(transform(md5...)) — avoids even that shuffle, but
    * higher-order functions are interpreted, not codegen'd: per-shingle
    * md5 through a lambda measured ~5× slower than this codegen'd
    * explode+combine at sf0.1, and the combined shuffle is tiny.) */
  private[ops] def signatures(sh: DataFrame, g: LshGeometry = DefaultGeometry): DataFrame =
    signaturesBy(sh, Seq("doc_id"), g)

  /** [[signatures]] generalized to any grouping key — the SAME md5
    * slicing and min-agg, keyed per doc (whole-doc signatures) or per
    * (doc, window) (dd_containment_index's window signatures), so the
    * two index families share one hash kernel by construction. */
  private def signaturesBy(sh: DataFrame, keys: Seq[String],
      g: LshGeometry): DataFrame = {
    val digs = sh
      .select(keys.map(col) :+ explode(col("shs")).as("x"): _*)
      .select(keys.map(col) ++ (0 until g.digests).map(seed =>
        md5(concat(lit(s"$seed:"), col("x"))).as(s"d$seed")): _*)
    val mins = (0 until g.k).map { k =>
      min(substring(col(s"d${k / 4}"), (k % 4) * 8 + 1, 8)).as(s"h$k")
    }
    digs.groupBy(keys.map(col): _*).agg(mins.head, mins.tail: _*)
  }

  /** The `bands` (band, bkey) struct columns over a signature frame
    * with h0..h{k-1} in scope — shared by [[bandRows]] and the window
    * index. */
  private def bandStructCols(g: LshGeometry): Seq[Column] =
    (0 until g.bands).map { b =>
      struct(lit(b).as("band"),
        md5(concat((0 until g.rowsPerBand)
          .map(r => col(s"h${g.rowsPerBand * b + r}")): _*)).as("bkey"))
    }

  private def minhashAggSql(g: LshGeometry = DefaultGeometry): String =
    (0 until g.k)
      .map(k => s"min(substr(md5('${k / 4}:' || sh), ${(k % 4) * 8 + 1}, 8)) AS h$k")
      .mkString(", ")

  /** CTE chain ending in `bkept(doc_id, band, bkey)` — the
    * hot-bucket-capped band-key table (the "signature index" a
    * production incremental pipeline would persist). */
  private def bucketCtesSqlFor(g: LshGeometry): String = {
    val bandSelects = (0 until g.bands)
      .map { b =>
        val hs = (0 until g.rowsPerBand).map(r => s"h${g.rowsPerBand * b + r}").mkString(" || ")
        s"SELECT doc_id, $b AS band, md5($hs) AS bkey FROM sig"
      }
      .mkString("\nUNION ALL\n")
    s"""sh AS ($shinglesSql),
       |sig AS (SELECT doc_id, ${minhashAggSql(g)} FROM sh GROUP BY doc_id),
       |bands AS ($bandSelects),
       |bkept AS (
       |  SELECT bands.* FROM bands
       |  JOIN (SELECT band, bkey, COUNT(*) AS bn FROM bands GROUP BY band, bkey) s
       |    ON s.band = bands.band AND s.bkey = bands.bkey
       |  WHERE s.bn <= ${g.maxBucketSize})""".stripMargin
  }

  /** Exact-Jaccard verify tail over a CTE `cand(doc_a, doc_b)`, ending
    * in `pairs(doc_a, doc_b, n_common, n_union)` — ONE definition shared
    * by the full and incremental variants so they can never drift. */
  private val pairVerifyTailSql =
    """counts AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
      |common AS (
      |  SELECT c.doc_a, c.doc_b, COUNT(*) AS n_common
      |  FROM cand c
      |  JOIN sh sa ON sa.doc_id = c.doc_a
      |  JOIN sh sb ON sb.doc_id = c.doc_b AND sb.sh = sa.sh
      |  GROUP BY c.doc_a, c.doc_b),
      |pairs AS (
      |  SELECT m.doc_a, m.doc_b,
      |         CAST(m.n_common AS BIGINT) AS n_common,
      |         CAST(ca.n_sh + cb.n_sh - m.n_common AS BIGINT) AS n_union
      |  FROM common m
      |  JOIN counts ca ON ca.doc_id = m.doc_a
      |  JOIN counts cb ON cb.doc_id = m.doc_b
      |  WHERE m.n_common * 2 >= (ca.n_sh + cb.n_sh - m.n_common))""".stripMargin

  /** CTE chain ending in `pairs(doc_a, doc_b, n_common, n_union)` —
    * the verified near-dup pairs, shared by the pair query and the
    * clustering query. */
  private[ops] def neardupCtesSqlFor(g: LshGeometry): String =
    s"""${bucketCtesSqlFor(g)},
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bkept a JOIN bkept b ON a.band = b.band AND a.bkey = b.bkey
       |  WHERE a.doc_id < b.doc_id),
       |$pairVerifyTailSql""".stripMargin

  /** Incremental variant: the candidate join's LEFT side is only the
    * delta batch's band keys (doc_id past the 80th-percentile-of-max
    * threshold — the stand-in for "today's crawl"), probed against the
    * full band-key index. Pairs within the old corpus are NOT
    * re-derived; verify tail unchanged. */
  private[ops] def incrementalNeardupCtesSqlFor(g: LshGeometry): String =
    s"""${bucketCtesSqlFor(g)},
       |thr AS (SELECT (MAX(doc_id) * 4) // 5 AS t FROM documents),
       |cand AS (
       |  SELECT DISTINCT LEAST(a.doc_id, b.doc_id) AS doc_a,
       |                  GREATEST(a.doc_id, b.doc_id) AS doc_b
       |  FROM (SELECT * FROM bkept WHERE doc_id >= (SELECT t FROM thr)) a
       |  JOIN bkept b ON a.band = b.band AND a.bkey = b.bkey
       |  WHERE a.doc_id <> b.doc_id),
       |$pairVerifyTailSql""".stripMargin

  private[ops] val neardupCtesSql: String = neardupCtesSqlFor(DefaultGeometry)

  /** Spark twin of [[neardupCtesSql]]'s `pairs`: shingle → minhash →
    * banded LSH bucket-join → exact-Jaccard verify (≥ 0.5). Signatures
    * and bands are map-side; the verify is `array_intersect` on the two
    * shingle arrays, not an exploded shingle join. Oversize buckets are
    * dropped before the self-join ([[Skew.dropOversizeGroups]]) — the
    * hot-bucket guard that keeps a degenerate bucket (boilerplate text)
    * from going quadratic on one reducer at corpus scale. */
  /** Hot-bucket-capped (doc_id, band, bkey) assignments — the Spark
    * twin of the `bkept` CTE (the persistable "signature index").
    *
    * Self-joined downstream: cache + EAGER count() — the two join
    * sides build their shuffle maps concurrently, and a cold cache
    * would let both race through the full shingle+minhash pipeline
    * before either populates it. cache() (not localCheckpoint) keeps
    * the plan canonical, so the OTHER dd_* queries' identical
    * sub-plans hit the CacheManager instead of recomputing. */
  /** UNCAPPED (doc_id, band, bkey) rows — the raw signature index.
    * The hot-bucket cap is applied at READ time over the index's own
    * bucket counts (see [[keptBands]]), never baked into the stored
    * rows: an incrementally-maintained index must re-evaluate the cap
    * on MERGED counts (a bucket can cross the cap only once a batch
    * lands), which a pre-capped store cannot do. */
  private def bandRows(sh: DataFrame, g: LshGeometry): DataFrame =
    signatures(sh, g)
      .select(col("doc_id"), explode(array(bandStructCols(g): _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bkey").as("bkey"))

  private def keptBands(sh: DataFrame, g: LshGeometry): DataFrame = {
    val bands = bandRows(sh, g).cache()
    bands.count()
    Skew.dropOversizeGroups(bands, Seq("band", "bkey"), g.maxBucketSize)
  }

  /** Exact-Jaccard verify tail over any `cand(doc_a, doc_b)` relation —
    * the Spark twin of [[pairVerifyTailSql]]. */
  private def verifiedNeardupPairs(sh: DataFrame, cand: DataFrame): DataFrame = {
    val sa = sh.select(col("doc_id").as("doc_a"), col("shs").as("shs_a"), col("n_sh").as("n_a"))
    val sb = sh.select(col("doc_id").as("doc_b"), col("shs").as("shs_b"), col("n_sh").as("n_b"))
    val pairs = cand.join(sa, Seq("doc_a")).join(sb, Seq("doc_b"))
      .withColumn("n_common", size(array_intersect(col("shs_a"), col("shs_b"))).cast("long"))
      .filter(col("n_common") * 2 >= col("n_a") + col("n_b") - col("n_common"))
      .select(col("doc_a"), col("doc_b"), col("n_common"),
        (col("n_a") + col("n_b") - col("n_common")).as("n_union"))
      .cache()
    pairs.count() // eager: downstream fan-outs (sym union) read warm
    pairs
  }

  /** The full-corpus LSH candidate set: (doc_a < doc_b) pairs sharing
    * at least one kept band bucket — ONE definition shared by the
    * Jaccard near-dup verify and the containment verify, so the two
    * acceptance rules always score the identical candidate stream. */
  private def candidatePairs(sh: DataFrame, g: LshGeometry): DataFrame = {
    val kept = keptBands(sh, g)
    val a = kept.select(col("doc_id").as("doc_a"), col("band"), col("bkey"))
    val b = kept.select(col("doc_id").as("doc_b"), col("band"), col("bkey"))
    a.join(b, Seq("band", "bkey")).filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
  }

  private[ops] def neardupPairs(s: SparkSession, dir: String,
      g: LshGeometry = DefaultGeometry): DataFrame = {
    val sh = shArr(s, dir).cache() // band side + both verify sides
    verifiedNeardupPairs(sh, candidatePairs(sh, g))
  }

  /** One rung of the containment-index LADDER: `words`-word windows at
    * stride `stride` (= words/2) indexed over EVERY doc, probed by the
    * whole-doc signatures of docs whose shingle count lies in
    * [loSh, hiSh] — the stratum that fits inside one window of this
    * scale. Adjacent rungs tile the doc-size axis: a doc probes
    * exactly the rung whose window can cover it, so each doc probes
    * ONE rung and each rung's index is 2× rows (stride L/2),
    * independent of how many rungs run. The L − S + 1 rule gives the
    * any-offset coverage guarantee (≤ 9 words at L = 16, ≤ 17 at
    * L = 32); longer quotes within the stratum are covered at
    * stride-aligned offsets and still collide with probability
    * tracking J(quote, window) ≥ C − ε in between. */
  private final case class ContainmentRung(words: Int, stride: Int, loSh: Int, hiSh: Int) {
    /** shingles per full window (a w-word window has w − 2 3-gram starts) */
    def spanSh: Int = words - 2
  }
  private val Rung16 = ContainmentRung(16, 8, 1, 14)
  private val Rung32 = ContainmentRung(32, 16, 15, 30)
  private val Rung64 = ContainmentRung(64, 32, 31, 62)

  /** DuckDB CTE chain ending in `chkept(doc_id, band, bkey)` — one
    * rung's hot-bucket-capped window-signature index (the twin of
    * [[windowBandRows]] + the read-time cap). Shared by the
    * containment-index queries and the merge op's rebuild oracle. */
  private def windowIndexCtesSqlFor(r: ContainmentRung, g: LshGeometry): String = {
    val chBandSelects = (0 until g.bands)
      .map { b =>
        val hs = (0 until g.rowsPerBand)
          .map(x => s"h${g.rowsPerBand * b + x}").mkString(" || ")
        s"SELECT doc_id, $b AS band, md5($hs) AS bkey FROM chsig"
      }
      .mkString("\nUNION ALL\n")
    s"""cw AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
       |       WHERE len(string_split(text, ' ')) >= 3),
       |choff AS (SELECT doc_id, w, unnest(range(0, len(w) - 2, ${r.stride})) AS off
       |          FROM cw),
       |chsh AS (SELECT DISTINCT doc_id, off,
       |           w[CAST(i + 1 AS INT)] || ' ' ||
       |           w[CAST(i + 2 AS INT)] || ' ' ||
       |           w[CAST(i + 3 AS INT)] AS sh
       |         FROM choff,
       |              UNNEST(range(off, least(off + ${r.spanSh}, len(w) - 2))) t(i)),
       |chsig AS (SELECT doc_id, off, ${minhashAggSql(g)}
       |          FROM chsh GROUP BY doc_id, off),
       |chbands AS ($chBandSelects),
       |chidx AS (SELECT DISTINCT doc_id, band, bkey FROM chbands),
       |chkept AS (
       |  SELECT chidx.* FROM chidx
       |  JOIN (SELECT band, bkey, COUNT(*) AS bn FROM chidx
       |        GROUP BY band, bkey) s
       |    ON s.band = chidx.band AND s.bkey = chidx.bkey
       |  WHERE s.bn <= ${g.maxBucketSize})""".stripMargin
  }

  /** One rung's full oracle: whole-doc index (probe side) + window
    * index + candidate join + the shared exact-containment verify. */
  private def containmentIndexSqlFor(r: ContainmentRung, g: LshGeometry): String =
    s"""WITH ${bucketCtesSqlFor(g)},
       |counts AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
       |${windowIndexCtesSqlFor(r, g)},
       |probe AS (SELECT b.* FROM bkept b
       |          JOIN counts c ON c.doc_id = b.doc_id
       |            AND c.n_sh BETWEEN ${r.loSh} AND ${r.hiSh}),
       |cand AS (SELECT DISTINCT LEAST(p.doc_id, x.doc_id) AS doc_a,
       |                GREATEST(p.doc_id, x.doc_id) AS doc_b
       |         FROM probe p JOIN chkept x
       |           ON x.band = p.band AND x.bkey = p.bkey
       |         WHERE p.doc_id <> x.doc_id),
       |common AS (
       |  SELECT c.doc_a, c.doc_b, COUNT(*) AS n_common
       |  FROM cand c
       |  JOIN sh sa ON sa.doc_id = c.doc_a
       |  JOIN sh sb ON sb.doc_id = c.doc_b AND sb.sh = sa.sh
       |  GROUP BY c.doc_a, c.doc_b),
       |cont AS (
       |  SELECT m.doc_a, m.doc_b, m.n_common, ca.n_sh AS n_a, cb.n_sh AS n_b
       |  FROM common m
       |  JOIN counts ca ON ca.doc_id = m.doc_a
       |  JOIN counts cb ON cb.doc_id = m.doc_b
       |  WHERE 5 * m.n_common >= 4 * LEAST(ca.n_sh, cb.n_sh))
       |SELECT CASE WHEN n_a <= n_b THEN doc_a ELSE doc_b END AS contained_doc,
       |       CASE WHEN n_a <= n_b THEN doc_b ELSE doc_a END AS container_doc,
       |       CAST(n_common AS BIGINT) AS n_common,
       |       CAST(LEAST(n_a, n_b) AS BIGINT) AS n_contained,
       |       CAST(GREATEST(n_a, n_b) AS BIGINT) AS n_container,
       |       CAST(CASE WHEN 2 * n_common >= n_a + n_b - n_common
       |                 THEN 1 ELSE 0 END AS INT) AS jaccard_pass
       |FROM cont ORDER BY contained_doc, container_doc""".stripMargin

  /** (doc_id, grams): the per-position word-3-gram stream — ONE text
    * tokenization shared by every ladder rung. The rungs differ only
    * in stride/span over THIS array (grams(i) = the 3-gram starting at
    * word i), so the split + concat work — a third of each rung's
    * from-scratch map cost — need not be repeated per rung. */
  private def gramArrOf(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"),
        expr("transform(sequence(0, size(w) - 3), " +
          "i -> concat_ws(' ', w[i], w[i+1], w[i+2]))").as("grams"))

  /** [[gramArrOf]], memoized per fixture (TrainMemo): the three
    * containment rungs and the merge op all build their window indexes
    * from the one materialized gram pass instead of re-tokenizing the
    * corpus three times. DISK_ONLY, not localCheckpoint's
    * MEMORY_AND_DISK: the per-doc gram array is a RAW TEXT derivative
    * (~3× text bytes) — at 100 TB it must never compete with executor
    * memory the way a compact index artifact (chidx/chwin band rows)
    * legitimately does; on local disk it costs what a shuffle spill
    * costs and is recomputed from lineage if a block is lost. The
    * entry is unpublished, so cap eviction reclaims it; inputs
    * without a file identity build uncached, like every other memo
    * site. */
  private def memoGramArr(s: SparkSession, docs: DataFrame): DataFrame =
    TrainMemo.memoKeyOf(docs) match {
      case Some(k) => TrainMemo.getOrTrain(
        s"grams3:${TrainMemo.sessionKeyOf(s)}:$k") {
        val g = gramArrOf(docs)
          .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
        g.count() // materialize now — consumers time index work, not this pass
        g
      }
      case None => gramArrOf(docs)
    }

  /** (doc_id, off, shs): one rung's window shingle SETS over the
    * shared gram stream — slice [off, off+span) of `grams`, deduped
    * map-side (the window analogue of [[shArr]]). */
  private def windowShingleArr(grams: DataFrame, r: ContainmentRung): DataFrame =
    grams
      .select(col("doc_id"), col("grams"),
        explode(expr(s"sequence(0, size(grams) - 1, ${r.stride})")).as("off"))
      .select(col("doc_id"), col("off"),
        expr(s"array_distinct(slice(grams, off + 1, " +
          s"least(${r.spanSh}, size(grams) - off)))").as("shs"))

  /** One rung's UNCAPPED window band rows (doc_id, band, bkey) over a
    * gram stream ([[gramArrOf]] shape), deduped per doc — the
    * persistable window-index artifact. Like [[bandRows]], the
    * hot-bucket cap is applied at READ time over merged counts
    * ([[Skew.dropOversizeGroups]]), never baked in. */
  private def windowBandRows(grams: DataFrame, r: ContainmentRung,
      g: LshGeometry): DataFrame =
    signaturesBy(windowShingleArr(grams, r), Seq("doc_id", "off"), g)
      .select(col("doc_id"), explode(array(bandStructCols(g): _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bkey").as("bkey"))
      .distinct()

  /** The exact-containment verify + output shape over a candidate
    * relation — ONE definition shared by dd_containment and every
    * ladder rung, so the acceptance rule cannot drift between the
    * symmetric-index and window-index paths. */
  private def containmentVerified(sh: DataFrame, cand: DataFrame): DataFrame = {
    val sa = sh.select(col("doc_id").as("doc_a"), col("shs").as("shs_a"),
      col("n_sh").as("n_a"))
    val sb = sh.select(col("doc_id").as("doc_b"), col("shs").as("shs_b"),
      col("n_sh").as("n_b"))
    cand.join(sa, Seq("doc_a")).join(sb, Seq("doc_b"))
      .withColumn("n_common",
        size(array_intersect(col("shs_a"), col("shs_b"))).cast("long"))
      .filter(col("n_common") * 5 >= least(col("n_a"), col("n_b")) * 4)
      .select(
        when(col("n_a") <= col("n_b"), col("doc_a")).otherwise(col("doc_b"))
          .as("contained_doc"),
        when(col("n_a") <= col("n_b"), col("doc_b")).otherwise(col("doc_a"))
          .as("container_doc"),
        col("n_common"),
        least(col("n_a"), col("n_b")).as("n_contained"),
        greatest(col("n_a"), col("n_b")).as("n_container"),
        when(col("n_common") * 2 >= col("n_a") + col("n_b") - col("n_common"), 1)
          .otherwise(0).cast("int").as("jaccard_pass"))
      .orderBy(col("contained_doc"), col("container_doc"))
  }

  /** [[containmentVerified]] behind band-positive pruning (the
    * tx_fuzzy_decontaminate shape): the candidate pairs materialize
    * once, then ONLY band-colliding docs' shingle sets feed the verify
    * joins — the pruned side is bounded by candidate count, and the
    * semi-join's build side (bare doc_ids) broadcasts, so no
    * full-corpus shingle-ARRAY relation crosses the verify exchange.
    * Without this, `cand ⋈ sa ⋈ sb` shuffles every doc's array twice
    * per consumer; at 100 TB that exchange dwarfs the candidate volume
    * it exists to score, and in a many-query session the array
    * shuffles are exactly what churns against the resident caches
    * (the r14 full-family sf10 runs measured the containment verifies
    * swinging 2-3× run-to-run from that contention). Both
    * localCheckpoints are candidate-bounded and GC-reclaimed
    * (ContextCleaner) when the run's frames drop. */
  private def containmentVerifiedPruned(sh: DataFrame, cand: DataFrame): DataFrame = {
    val candCp = cand.localCheckpoint()
    val posIds = candCp.select(col("doc_a").as("doc_id"))
      .unionAll(candCp.select(col("doc_b").as("doc_id")))
      .distinct()
    val shPos = sh.join(posIds, Seq("doc_id"), "left_semi").localCheckpoint()
    containmentVerified(shPos, candCp)
  }

  /** One rung end-to-end: window index (capped at read), probed by the
    * rung's whole-doc-signature stratum, shared containment verify. */
  private def containmentIndexFrame(s: SparkSession, dir: String,
      r: ContainmentRung, g: LshGeometry = DefaultGeometry): DataFrame = {
    val sh = shArr(s, dir).cache() // probe counts + both verify sides
    val probe = keptBands(sh, g)
      .join(sh.filter(col("n_sh").between(r.loSh, r.hiSh))
        .select(col("doc_id")), Seq("doc_id"))
    // the rung's UNCAPPED band rows are a compact derived index
    // (doc_id, band, bkey — no text), built once per (rung, fixture)
    // and memoized the way trained k-means cells are: a warm serving
    // run probes the artifact instead of re-running the gram/minhash
    // pass; cold_total discloses the one-time build. The hot-bucket
    // cap stays at READ time so the artifact composes with merges.
    val d = t(s, dir, "documents")
    val uncapped = TrainMemo.memoKeyOf(d) match {
      case Some(k) => TrainMemo.getOrTrain(
        s"chwin:${r.words}:${TrainMemo.sessionKeyOf(s)}:$k")(
        TrainMemo.checkpointReleasing(windowBandRows(memoGramArr(s, d), r, g)))
      case None => windowBandRows(memoGramArr(s, d), r, g)
    }
    val chkept = Skew.dropOversizeGroups(uncapped, Seq("band", "bkey"),
      g.maxBucketSize)
    val cand = probe
      .join(chkept.select(col("doc_id").as("cid"), col("band"), col("bkey")),
        Seq("band", "bkey"))
      .filter(col("doc_id") =!= col("cid"))
      .select(least(col("doc_id"), col("cid")).as("doc_a"),
        greatest(col("doc_id"), col("cid")).as("doc_b"))
      .distinct()
    containmentVerifiedPruned(sh, cand)
  }

  /** Window-index MAINTENANCE — [[mergeBandIndex]]'s delta pattern for
    * one ladder rung's window-signature index: the "yesterday" docs'
    * window band rows are built once per fixture and memoized (the
    * persisted artifact), the delta batch contributes only ITS
    * windows (doc sets are disjoint, so the merge is a blind unionAll
    * — old docs' TEXT is never rescanned once their artifact exists),
    * the merged index is published under the rung's fixture key, and
    * the returned READ view re-applies the hot-bucket cap over MERGED
    * counts — row-identical to a full from-scratch rebuild, which is
    * exactly what the oracle replays. */
  private[ops] def mergeWindowIndex(s: SparkSession, dir: String,
      r: ContainmentRung, g: LshGeometry = DefaultGeometry): DataFrame = {
    val d = t(s, dir, "documents")
    // ONE long, collected: a literal predicate pushes into the batch
    // side's parquet scan (the crossJoin(broadcast(thr)) form never
    // could), and the old/batch split stops replicating the aggregate
    // subtree per reference (the ZGeom rationale, Pipeline.scala)
    val thr = longAt(d.agg(expr("(MAX(doc_id) * 4) div 5")).head)
    // old half slices the memoized gram pass ONCE (cold build only);
    // the batch half re-tokenizes its 20% straight off the parquet
    // scan with the literal filter pushed down — reading the full
    // DISK_ONLY gram memo back just to keep 20% of it cost a
    // corpus-sized disk read PER RUN (measured: dominant share of the
    // 2× sf10 warm regression this round inherited). Filter commutes
    // with the per-doc map, so the rows are identical either way.
    val gBatch = gramArrOf(d.filter(col("doc_id") >= lit(thr)))
    val key = TrainMemo.memoKeyOf(d)
    val oldIndex = key match {
      case Some(k) => TrainMemo.getOrTrain(
        s"chidx_old:${r.words}:${TrainMemo.sessionKeyOf(s)}:$k")(
        TrainMemo.checkpointReleasing(windowBandRows(
          memoGramArr(s, d).filter(col("doc_id") < lit(thr)), r, g)))
      case None => windowBandRows(
        gramArrOf(d.filter(col("doc_id") < lit(thr))), r, g)
    }
    val artifact = key match {
      case Some(k) =>
        // APPEND-style publish: only the BATCH's band rows are newly
        // checkpointed; the artifact is oldIndex's existing checkpoint
        // blocks ∪ the batch blocks. The previous revision
        // localCheckpoint'ed the whole UNION — re-materializing the
        // 80% old side into fresh blocks on every merge, a full-index
        // write per batch where production maintenance appends
        // batch-sized files (dd_containment_index_merge measured
        // 37.3 s warm isolated at sf10 before, see OPTIMIZATION_r14).
        // Rows identical: unionAll order (old, batch) is unchanged.
        val batchCp = windowBandRows(gBatch, r, g).localCheckpoint()
        val merged = oldIndex.unionAll(batchCp)
        TrainMemo.publish(s"chidx:${r.words}:${TrainMemo.sessionKeyOf(s)}:$k", merged)
        merged
      case None => oldIndex.unionAll(windowBandRows(gBatch, r, g))
    }
    Skew.dropOversizeGroups(artifact, Seq("band", "bkey"), g.maxBucketSize)
  }

  /** Incremental (daily-crawl) variant: only the DELTA batch's band
    * keys (doc_id ≥ 80% of max — the "new docs" predicate) probe the
    * full band-key index; old-vs-old pairs are never re-derived. At
    * 100 TB this is the primitive that turns corpus dedup from a full
    * recompute into a join proportional to the batch: the `kept` index
    * is what a production pipeline persists between crawls, and the
    * probe side carries batch×bands rows only. Verify tail unchanged. */
  /** The maintained band index's memo key for a fixture, or None for
    * inputs with no file identity. */
  private def indexKeyOf(s: SparkSession, sh: DataFrame): Option[String] =
    TrainMemo.memoKeyOf(sh).map(k => s"bandidx:${TrainMemo.sessionKeyOf(s)}:$k")

  /** The other half of the daily-crawl loop ([[incrementalNeardupPairs]]
    * is the read side): MERGE the delta batch into the persisted band
    * index and publish the result as the new serving artifact.
    *
    *  - the "yesterday" index (docs below the batch threshold) is
    *    built once per fixture and memoized — the artifact a
    *    production pipeline persists between crawls;
    *  - the batch contributes only ITS band rows (work proportional to
    *    the batch, never the corpus — doc sets are disjoint, so the
    *    merge is a blind unionAll with no dedup shuffle);
    *  - the merged index is published under the fixture's index key
    *    (TrainMemo.publish — replaces and unpersists the previous
    *    artifact, so a second merge or a regenerated fixture can never
    *    serve a stale index);
    *  - the returned READ view re-applies the hot-bucket cap over the
    *    MERGED counts, so it is row-identical to a full from-scratch
    *    rebuild (the oracle replays exactly that) — including buckets
    *    the batch pushed over the cap, which a pre-capped store would
    *    get wrong. */
  private[ops] def mergeBandIndex(s: SparkSession, dir: String,
      g: LshGeometry = DefaultGeometry): DataFrame = {
    val sh = shArr(s, dir).cache()
    // ONE long, collected (literal split, no replicated agg subtree)
    val thr = longAt(t(s, dir, "documents")
      .agg(expr("(MAX(doc_id) * 4) div 5")).head)
    val shOld = sh.filter(col("doc_id") < lit(thr))
    val shBatch = sh.filter(col("doc_id") >= lit(thr))
    val oldIndex = TrainMemo.memoKeyOf(sh) match {
      case Some(k) => TrainMemo.getOrTrain(
        s"bandidx_old:${TrainMemo.sessionKeyOf(s)}:$k")(
        TrainMemo.checkpointReleasing(bandRows(shOld, g)))
      case None => bandRows(shOld, g)
    }
    val artifact = indexKeyOf(s, sh) match {
      case Some(key) =>
        // append-style publish: checkpoint the BATCH band rows only
        // and union with the old index's existing checkpoint blocks —
        // never re-materialize the 80% old side per merge (see
        // mergeWindowIndex's comment; rows identical, order unchanged)
        val batchCp = bandRows(shBatch, g).localCheckpoint()
        val merged = oldIndex.unionAll(batchCp)
        TrainMemo.publish(key, merged)
        merged
      case None => oldIndex.unionAll(bandRows(shBatch, g))
    }
    Skew.dropOversizeGroups(artifact, Seq("band", "bkey"), g.maxBucketSize)
  }

  private[ops] def incrementalNeardupPairs(s: SparkSession, dir: String,
      g: LshGeometry = DefaultGeometry): DataFrame = {
    val sh = shArr(s, dir).cache()
    // probe the PUBLISHED index artifact when maintenance has run for
    // this fixture (deterministic build ⇒ row-identical to a fresh
    // derivation, so consumers and their oracles cannot tell — only
    // the work changes); fall back to deriving in place
    val kept = indexKeyOf(s, sh).flatMap(TrainMemo.get[DataFrame])
      .map(idx => Skew.dropOversizeGroups(idx, Seq("band", "bkey"), g.maxBucketSize))
      .getOrElse(keptBands(sh, g))
    // ONE long, collected (literal split — see mergeWindowIndex)
    val thr = longAt(t(s, dir, "documents")
      .agg(expr("(MAX(doc_id) * 4) div 5")).head)
    val batch = kept.filter(col("doc_id") >= lit(thr))
    val a = batch.select(col("doc_id").as("id_a"), col("band"), col("bkey"))
    val b = kept.select(col("doc_id").as("id_b"), col("band"), col("bkey"))
    val cand = a.join(b, Seq("band", "bkey")).filter(col("id_a") =!= col("id_b"))
      .select(least(col("id_a"), col("id_b")).as("doc_a"),
        greatest(col("id_a"), col("id_b")).as("doc_b"))
      .distinct()
    verifiedNeardupPairs(sh, cand)
  }

  // ---- duplicate-SPAN machinery (exact-substring dedup, Lee et al.
  // 2022 "Deduplicating Training Data Makes Language Models Better"):
  // the near-dup/containment family answers "which DOCS overlap"; this
  // answers "which BYTES are duplicated" — the signal that paper cuts
  // from training data. Their single-node suffix array does not
  // distribute; the standard cluster form is a hashed fixed-width gram
  // index: every W-word gram occurrence (pos, md5(gram)) is emitted,
  // grams whose hash occurs ≥ 2 times corpus-wide (any mix of cross-
  // and within-doc) mark their positions duplicated, and per doc the
  // marked positions coalesce into MAXIMAL spans (a new span starts
  // when the gap to the previous duplicated gram start exceeds W —
  // at gap ≤ W the two grams' word ranges overlap or touch, so the
  // covered words stay contiguous) — spans never overlap and summing
  // their widths is exact word coverage. Scale: the only
  // corpus-sized exchanges are the groupBy on the 128-bit gram hash
  // (map-side partial counts) and the join of occurrences back to the
  // (rare) duplicated hashes — each O(total words), the same price the
  // suffix array pays in sort form; the island window runs per doc
  // over DUPLICATED positions only. Hot grams (boilerplate shared by
  // millions of docs) cost a counter in the aggregate and fan out only
  // to each doc's own positions (the dup-hash side is deduped), so
  // there is no pair blowup anywhere. Grouping on md5 keeps shuffle
  // rows narrow and both engines hash the identical gram string, so
  // any collision (~2⁻¹²⁸) would be shared — parity is unconditional.
  private val SpanW = 8

  /** Apply-stage knobs (dd_dup_span_apply): a span must cover at least
    * [[MinCutSpan]] words to be cut — an isolated single-gram island
    * (exactly [[SpanW]] words) is boilerplate-sized, not passage-sized,
    * the same reason Lee 2022 only removes substrings past a length
    * floor — and a doc whose CUT coverage reaches [[DropPpm]] is
    * dropped whole rather than trimmed into an incoherent remnant. */
  private val MinCutSpan = 16
  private val DropPpm = 500000L

  /** (doc_id, pos, gh): every W-word gram occurrence. Generate +
    * project stay in one codegen stage; md5 runs OUTSIDE a lambda
    * (measured ~5× faster than transform-embedded md5, see the
    * signature-stage note above). `extra` threads caller columns
    * (e.g. the stream's `ts`) through unchanged — the streaming
    * first-pass ([[graft.streaming.StreamOps.dupGramCandidates]])
    * shares THIS kernel so stream and batch gram math cannot drift. */
  private[graft] def gramRows(docs: DataFrame,
      extra: Seq[org.apache.spark.sql.Column] = Nil): DataFrame =
    docs
      .select(extra :+ col("doc_id") :+
        split(coalesce(col("text"), lit("")), " ").as("w"): _*)
      .filter(size(col("w")) >= SpanW)
      .select(extra :+ col("doc_id") :+ col("w") :+
        explode(expr(s"sequence(0, size(w) - $SpanW)")).as("pos"): _*)
      .select(extra :+ col("doc_id") :+ col("pos").cast("int").as("pos") :+
        md5(expr(s"concat_ws(' ', slice(w, pos + 1, $SpanW))")).as("gh"): _*)

  /** Duplicated gram positions coalesced into maximal per-doc spans.
    *
    * The gram index `g` feeds BOTH the dup-hash aggregate and the
    * occurrence join as different subtrees (exchange reuse cannot
    * collapse them), so it is cached for the duration of the build;
    * and because all three span consumers (dd_dup_spans, the coverage
    * report, the apply stage) start from this exact frame, the
    * doc×island-sized result is memoized per fixture — the
    * corpus-sized explode+md5 scan is paid once per fixture per JVM
    * instead of twice per query × three queries. */
  private def dupSpanFrame(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    def build: DataFrame = dupSpanBuild(docs)
    TrainMemo.memoKeyOf(docs) match {
      case Some(k) => TrainMemo.getOrTrain(
        s"dupspans:${TrainMemo.sessionKeyOf(s)}:$k")(
        TrainMemo.checkpointReleasing(build))
      case None => build
    }
  }

  private def dupSpanBuild(docs: DataFrame): DataFrame =
    spansFromGrams(TrainMemo.trackedCache(gramRows(docs)))

  /** Islands of duplicated gram positions from a gram-occurrence frame
    * `(doc_id, pos, gh)` — the tail shared by the from-scratch build
    * and the merge-maintained path ([[mergeSpanIndex]]), so the dup
    * threshold / gap rule / island grouping cannot drift between them. */
  private def spansFromGrams(g: DataFrame): DataFrame = {
    val dup = g.groupBy(col("gh")).count()
      .filter(col("count") >= 2).select(col("gh"))
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    g.join(dup, Seq("gh"))
      .select(col("doc_id"), col("pos"))
      .withColumn("prev", lag(col("pos"), 1).over(byDoc))
      .withColumn("brk",
        when(col("prev").isNull || col("pos") - col("prev") > lit(SpanW), 1)
          .otherwise(0))
      .withColumn("island", sum(col("brk")).over(byDoc))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + lit(SpanW - 1)).as("span_end"),
        (max(col("pos")) + lit(SpanW) - min(col("pos"))).as("dup_words"),
        count(lit(1)).cast("long").as("n_grams"))
  }

  /** Gram-index MAINTENANCE — [[mergeBandIndex]]'s delta pattern for
    * the exact-substring (Lee 2022) gram index, the 5th incrementally
    * maintained serving artifact (band index, window index, layout
    * stats, histograms, now duplicate-span grams):
    *
    *  - the "yesterday" docs' gram occurrences `(doc_id, pos, gh)` are
    *    built once per fixture and memoized — the persisted artifact;
    *    old TEXT is never re-exploded or re-hashed once it exists
    *    (the explode+md5 over corpus words is the expensive scan, the
    *    distributed analog of rebuilding the suffix array);
    *  - the delta batch contributes only ITS gram rows (doc sets are
    *    disjoint ⇒ blind unionAll, no dedup shuffle);
    *  - the dup threshold (count ≥ 2) is applied over MERGED counts —
    *    the cap-after-merge analog: a batch doc quoting yesterday's
    *    text pushes grams that were singletons yesterday over the
    *    threshold, creating spans in OLD docs too. A store that
    *    persisted per-side dup VERDICTS instead of occurrences would
    *    miss exactly those; this is why the artifact is the index, not
    *    the report. Row-identical to the from-scratch rebuild, which
    *    is what the oracle replays. */
  private[ops] def mergeSpanIndex(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    // ONE long, collected: the literal predicate pushes into the batch
    // scan and the split stops replicating the aggregate subtree
    val thr = longAt(d.agg(expr("(MAX(doc_id) * 4) div 5")).head)
    val dOld = d.filter(col("doc_id") < lit(thr))
    val dBatch = d.filter(col("doc_id") >= lit(thr))
    val key = TrainMemo.memoKeyOf(d)
    val oldGrams = key match {
      case Some(k) => TrainMemo.getOrTrain(
        s"spangrams_old:${TrainMemo.sessionKeyOf(s)}:$k")(
        TrainMemo.checkpointReleasing(gramRows(dOld)))
      case None => gramRows(dOld)
    }
    val artifact = key match {
      case Some(k) =>
        // append-style publish: checkpoint the BATCH gram rows only and
        // union with the old side's existing checkpoint blocks. The
        // previous revision localCheckpoint'ed the whole union — a
        // full-corpus gram-index rewrite PER MERGE (dd_span_index_merge
        // measured 28.1 s warm isolated at sf10 before; the old side is
        // 80% of those bytes). Rows identical, order unchanged.
        val batchCp = gramRows(dBatch).localCheckpoint()
        val merged = oldGrams.unionAll(batchCp)
        TrainMemo.publish(s"spangrams:${TrainMemo.sessionKeyOf(s)}:$k", merged)
        merged
      case None => oldGrams.unionAll(gramRows(dBatch))
    }
    spansFromGrams(artifact)
  }

  /** DuckDB CTE chain ending in `isl(doc_id, pos, island)` — the twin
    * of [[dupSpanFrame]] up to the island grouping, shared by both
    * span queries so the gram/threshold/gap rules cannot drift. */
  private val dupSpanCtesSql: String =
    s"""dw AS (SELECT doc_id, string_split(COALESCE(text, ''), ' ') AS w
       |       FROM documents
       |       WHERE len(string_split(COALESCE(text, ''), ' ')) >= $SpanW),
       |dg AS (SELECT doc_id, CAST(i AS INT) AS pos,
       |         md5(array_to_string(
       |           w[CAST(i + 1 AS INT):CAST(i + $SpanW AS INT)], ' ')) AS gh
       |       FROM dw, UNNEST(range(0, len(w) - ${SpanW - 1})) t(i)),
       |dd AS (SELECT gh FROM dg GROUP BY gh HAVING COUNT(*) >= 2),
       |dp AS (SELECT dg.doc_id, dg.pos FROM dg JOIN dd ON dd.gh = dg.gh),
       |dl AS (SELECT doc_id, pos,
       |         LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
       |       FROM dp),
       |isl AS (SELECT doc_id, pos,
       |          SUM(CASE WHEN prev IS NULL OR pos - prev > $SpanW
       |                   THEN 1 ELSE 0 END)
       |            OVER (PARTITION BY doc_id ORDER BY pos) AS island
       |        FROM dl)""".stripMargin

  private val headSpecs: Seq[QuerySpec] = Seq(

    // ---- exact dedup: canonical id per content hash (one shuffle) ----
    sql("dd_exact_canonical",
      """SELECT doc_id,
        |       MIN(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id
        |FROM documents
        |ORDER BY doc_id""") { (s, dir) =>
      // canonical id via groupBy(hash) + join back, not a window
      // partitioned by md5(text): a window partition = the largest
      // duplicate cluster (millions of rows at web scale) through one
      // task; the aggregate takes map-side partials and the join-back
      // is AQE-splittable. Null-safe join: md5(NULL) is NULL and the
      // window shape groups null-text docs together, so the join must
      // too (<=> keeps the two formulations identical row-for-row).
      val d = t(s, dir, "documents").select(col("doc_id"), md5(col("text")).as("h"))
      val canon = d.groupBy(col("h")).agg(min(col("doc_id")).as("canonical_id"))
      d.join(canon, d("h") <=> canon("h"))
        .select(col("doc_id"), col("canonical_id"))
        .orderBy(col("doc_id"))
    },

    // ---- MinHash signatures over word-3-gram shingles: pure map ----
    sql("dd_minhash_signatures",
      s"""WITH sh AS ($shinglesSql)
         |SELECT doc_id, ${minhashAggSql()}
         |FROM sh GROUP BY doc_id ORDER BY doc_id""") { (s, dir) =>
      signatures(shArr(s, dir)).orderBy(col("doc_id"))
    },

    // ---- full near-dup pipeline: shingle -> minhash -> LSH band
    // bucket-join -> exact Jaccard verification. The bucket join is the
    // 100 TB path: candidates only ever meet inside a band bucket. ----
    sql("dd_minhash_neardups",
      s"""WITH $neardupCtesSql
         |SELECT doc_a, doc_b, n_common, n_union
         |FROM pairs ORDER BY doc_a, doc_b""") { (s, dir) =>
      neardupPairs(s, dir)
        .select(col("doc_a"), col("doc_b"), col("n_common"), col("n_union"))
        .orderBy(col("doc_a"), col("doc_b"))
    },

    // ---- FUZZY benchmark decontamination — the near-dup face of
    // tx_decontaminate (Text.scala). The exact 5-gram ops catch only
    // verbatim leaks: a paraphrased or lightly edited benchmark item
    // shares ZERO word 5-grams with its source yet still teaches the
    // model the answer (the contamination class GPT-3's appendix and
    // Lee 2022 both flag as the exact-match blind spot). Here the
    // corpus⋈benchmark join runs through the SAME shingle → minhash →
    // banded-LSH machinery as dd_minhash_neardups (one shared
    // signature/band kernel — the two candidate streams cannot
    // drift), with the benchmark split (doc_id ≡ 0 mod 10, the fixed
    // convention of the exact ops) on the build side. Acceptance is
    // verified 3-shingle Jaccard ≥ 0.2 — a SCREEN threshold: decon
    // prioritizes recall, and the pinned paraphrase class lands at
    // J ≈ 0.2-0.3 because killing every shared 5-gram forces an edit
    // at least once per 4 words (equal runs ≤ 4 words contribute ≤ 2
    // shared trigrams each) — J ≥ 0.5 would structurally miss it.
    // Scale shape: the benchmark is a FIXED external artifact (tiny
    // vs the corpus), so its band-key table and shingle arrays are
    // the broadcast sides; the corpus pays one signature pass (map-
    // side, shared kernel) and only band-positive docs reach the
    // verify join. The per-doc best-match window partitions
    // by doc_id over candidate rows — bounded by benchmark size. ----
    sql("tx_fuzzy_decontaminate",
      s"""WITH ${bucketCtesSqlFor(DefaultGeometry)},
         |cand AS (
         |  SELECT DISTINCT c.doc_id, b.doc_id AS bench_id
         |  FROM bkept c JOIN bkept b ON c.band = b.band AND c.bkey = b.bkey
         |  WHERE c.doc_id % 10 != 0 AND b.doc_id % 10 = 0),
         |counts AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
         |common AS (
         |  SELECT c.doc_id, c.bench_id, COUNT(*) AS n_common
         |  FROM cand c
         |  JOIN sh sa ON sa.doc_id = c.doc_id
         |  JOIN sh sb ON sb.doc_id = c.bench_id AND sb.sh = sa.sh
         |  GROUP BY c.doc_id, c.bench_id),
         |verified AS (
         |  SELECT m.doc_id, m.bench_id, m.n_common,
         |         ca.n_sh + cb.n_sh - m.n_common AS n_union
         |  FROM common m
         |  JOIN counts ca ON ca.doc_id = m.doc_id
         |  JOIN counts cb ON cb.doc_id = m.bench_id
         |  WHERE 5 * m.n_common >= ca.n_sh + cb.n_sh - m.n_common),
         |best AS (
         |  SELECT doc_id, bench_id, n_common, n_union,
         |         ROW_NUMBER() OVER (PARTITION BY doc_id
         |           ORDER BY n_common * 1000000 // n_union DESC,
         |                    n_union, bench_id) AS r
         |  FROM verified)
         |SELECT d.doc_id,
         |       CAST(COALESCE(b.bench_id, -1) AS BIGINT) AS bench_id,
         |       CAST(COALESCE(b.n_common, 0) AS BIGINT) AS n_common,
         |       CAST(COALESCE(b.n_union, 0) AS BIGINT) AS n_union,
         |       CAST(COALESCE(b.n_common * 1000 // b.n_union, 0) AS BIGINT)
         |         AS jaccard_x1000,
         |       CAST(CASE WHEN b.doc_id IS NULL THEN 0 ELSE 1 END AS INT)
         |         AS contaminated
         |FROM documents d
         |LEFT JOIN (SELECT * FROM best WHERE r = 1) b ON b.doc_id = d.doc_id
         |WHERE d.doc_id % 10 != 0
         |ORDER BY d.doc_id""") { (s, dir) =>
      // NOT cached: a full-corpus shingle-array cache is the memory
      // hazard at 100 TB — recomputing the map-side shingle pass per
      // consumer is cheaper than spilling it. The band kernel must
      // still run over the COMBINED stream (the oversize-bucket drop
      // counts corpus+bench occupants together; banding the sides
      // separately would change which buckets are dropped), and
      // keptBands caches only its band rows, which it materializes
      // for that count anyway.
      val sh = shArr(s, dir)
      val kept = keptBands(sh, DefaultGeometry)
      // Benchmark side: under the production convention this is a
      // FIXED eval suite, but this fixture's doc_id % 10 == 0 split is
      // 10% of the corpus — a broadcast would grow linearly with it.
      // Plain equi-joins instead: AQE broadcasts a genuinely small
      // benchmark at runtime and shuffles a fixture-sized one.
      val benchBands = kept.filter(col("doc_id") % 10 === 0)
        .select(col("doc_id").as("bench_id"), col("band"), col("bkey"))
      val cand = kept.filter(col("doc_id") % 10 =!= 0)
        .join(benchBands, Seq("band", "bkey"))
        .select(col("doc_id"), col("bench_id")).distinct()
      // band-positive refinement (round-13 demand: the sf10 tail back
      // without the corpus-sized cache): materialize the candidate
      // PAIRS once, then re-materialize ONLY band-colliding docs'
      // shingle sets — one shared artifact for both verify sides,
      // bounded by candidate count, never corpus-sized. The cold run
      // pays exactly two corpus map passes (the band kernel and this
      // pruned re-shingle); the former session-lifetime `.cache()` of
      // the bench-side arrays (10% of the corpus under this fixture's
      // % 10 split) is gone. Both localCheckpoints are
      // candidate-bounded and GC-reclaimed (ContextCleaner) when the
      // run's frames go out of scope.
      val candCp = cand.localCheckpoint()
      val posIds = candCp.select(col("doc_id"))
        .unionAll(candCp.select(col("bench_id").as("doc_id")))
        .distinct()
      val shPos = sh.join(posIds, Seq("doc_id"), "left_semi").localCheckpoint()
      val sa = shPos.select(col("doc_id"), col("shs").as("shs_a"),
        col("n_sh").as("n_a"))
      val sb = shPos.filter(col("doc_id") % 10 === 0)
        .select(col("doc_id").as("bench_id"), col("shs").as("shs_b"),
          col("n_sh").as("n_b"))
      val verified = candCp
        .join(sa, Seq("doc_id"))
        .join(sb, Seq("bench_id"))
        .withColumn("n_common",
          size(array_intersect(col("shs_a"), col("shs_b"))).cast("long"))
        .withColumn("n_union", col("n_a") + col("n_b") - col("n_common"))
        .filter(col("n_common") * 5 >= col("n_union"))
      val best = verified
        .withColumn("r", row_number().over(
          Window.partitionBy(col("doc_id"))
            .orderBy(expr("n_common * 1000000 div n_union").desc,
              col("n_union"), col("bench_id"))))
        .filter(col("r") === 1)
        .select(col("doc_id").as("bid"), col("bench_id"), col("n_common"),
          col("n_union"))
      t(s, dir, "documents").filter(col("doc_id") % 10 =!= 0)
        .join(best, col("doc_id") === col("bid"), "left")
        .select(col("doc_id"),
          coalesce(col("bench_id"), lit(-1L)).cast("long").as("bench_id"),
          coalesce(col("n_common"), lit(0L)).cast("long").as("n_common"),
          coalesce(col("n_union"), lit(0L)).cast("long").as("n_union"),
          coalesce(expr("n_common * 1000 div n_union"), lit(0L))
            .cast("long").as("jaccard_x1000"),
          when(col("bid").isNull, 0).otherwise(1).cast("int").as("contaminated"))
        .orderBy(col("doc_id"))
    },

    // ---- asymmetric CONTAINMENT dedup (Broder's containment
    // coefficient C(A,B) = |A∩B| / min(|A|,|B|)): the quote/expansion
    // duplicate class symmetric Jaccard structurally misses — a short
    // doc wholly embedded in a much longer one has J ≈ |A|/|B| → 0
    // while C ≈ 1. Same candidate stream as dd_minhash_neardups (ONE
    // shared candidatePairs definition / `cand` CTE, so the two
    // acceptance rules can never drift); only the acceptance changes:
    // 5·|A∩B| ≥ 4·min(|A|,|B|) (C ≥ 0.8, exact integer arithmetic).
    // `jaccard_pass` marks which survivors the symmetric rule would
    // ALSO have accepted — rows with jaccard_pass = 0 are the pairs
    // only this operator catches.
    //
    // Honest scale note: candidates here still come from the symmetric
    // MinHash index, whose collision probability tracks J, not C — a
    // containment pair with a large size ratio collides with
    // probability ~(|A|/|B|)^rowsPerBand per band and can be missed at
    // the index stage even though the verify would accept it. That is
    // the documented trade (the index is shared with the Jaccard
    // family, zero extra state); dd_containment_index below is the
    // containment-TARGETED index that closes exactly this miss class
    // (DedupEdgeSpec pins a pair this op provably misses and that one
    // catches). ----
    sql("dd_containment",
      s"""WITH $neardupCtesSql,
         |cont AS (
         |  SELECT m.doc_a, m.doc_b, m.n_common, ca.n_sh AS n_a, cb.n_sh AS n_b
         |  FROM common m
         |  JOIN counts ca ON ca.doc_id = m.doc_a
         |  JOIN counts cb ON cb.doc_id = m.doc_b
         |  WHERE 5 * m.n_common >= 4 * LEAST(ca.n_sh, cb.n_sh))
         |SELECT CASE WHEN n_a <= n_b THEN doc_a ELSE doc_b END AS contained_doc,
         |       CASE WHEN n_a <= n_b THEN doc_b ELSE doc_a END AS container_doc,
         |       CAST(n_common AS BIGINT) AS n_common,
         |       CAST(LEAST(n_a, n_b) AS BIGINT) AS n_contained,
         |       CAST(GREATEST(n_a, n_b) AS BIGINT) AS n_container,
         |       CAST(CASE WHEN 2 * n_common >= n_a + n_b - n_common
         |                 THEN 1 ELSE 0 END AS INT) AS jaccard_pass
         |FROM cont ORDER BY contained_doc, container_doc""") { (s, dir) =>
      val sh = shArr(s, dir).cache()
      containmentVerifiedPruned(sh, candidatePairs(sh, DefaultGeometry))
    },

    // ---- containment-TARGETED candidate index LADDER: the window
    // (passage) signature indexes that close dd_containment's
    // documented miss class. A short doc A quoted verbatim inside a
    // long doc B collides in the shared whole-doc index with
    // probability tracking J(A,B) ≈ |A|/|B| → 0 — but some window of
    // B covers the quote, and J(A, window) tracks C, not J, so
    // indexing every doc's window signatures and probing them with a
    // size stratum's whole-doc signatures makes the candidate
    // probability track the containment coefficient. Three rungs are
    // registered (the machinery is ONE parameterized definition —
    // windowIndexCtesSqlFor / containmentIndexFrame):
    //   L = 16, stride 8,  probed by n_sh ≤ 14       (docs ≤ 16 words)
    //   L = 32, stride 16, probed by 15 ≤ n_sh ≤ 30  (docs 17–32 words)
    //   L = 64, stride 32, probed by 31 ≤ n_sh ≤ 62  (docs 33–64 words)
    // Each rung's index is 2× rows (stride L/2), independent of rung
    // count, and each doc PROBES exactly one rung — the ladder's cost
    // is additive in indexes, not multiplicative in probes. The
    // L − S + 1 rule gives any-offset coverage for quotes ≤ 9 words
    // (L16) / ≤ 17 (L32) / ≤ 33 (L64); longer in-stratum quotes are
    // covered at stride-aligned offsets (DedupEdgeSpec pins, per rung,
    // a quote every LOWER rung structurally cannot see — its doc is
    // outside their probe strata — and that rung catches). Above the
    // ladder (docs > 64 words) the symmetric whole-doc index takes
    // over: a contained quote there is ≥ 65 words, so J(quote,
    // container) ≥ 65/|container| no longer vanishes for the
    // container sizes the fixtures carry — and a rung 4 (L = 128) is
    // the same one-line ContainmentRung instance if a corpus's
    // containment mass ever concentrates above 64 words. Hash kernel,
    // band math, hot-bucket cap and verify tail are the literal
    // shared definitions. ----
    sql("dd_containment_index",
      containmentIndexSqlFor(Rung16, DefaultGeometry)) { (s, dir) =>
      containmentIndexFrame(s, dir, Rung16)
    },

    sql("dd_containment_index32",
      containmentIndexSqlFor(Rung32, DefaultGeometry)) { (s, dir) =>
      containmentIndexFrame(s, dir, Rung32)
    },

    sql("dd_containment_index64",
      containmentIndexSqlFor(Rung64, DefaultGeometry)) { (s, dir) =>
      containmentIndexFrame(s, dir, Rung64)
    },

    // ---- duplicate-group clustering: connected components over the
    // near-dup pair graph via iterative min-label propagation
    // (Pregel-style: the driver controls O(log diameter) supersteps,
    // each one distributed join+aggregate — no giant-component
    // collect). Oracle: recursive-CTE transitive closure in DuckDB. ----
    sql("dd_dup_clusters",
      s"""WITH RECURSIVE $neardupCtesSql,
         |sym AS (SELECT doc_a AS a, doc_b AS b FROM pairs
         |        UNION ALL SELECT doc_b, doc_a FROM pairs),
         |reach AS (SELECT a, b FROM sym
         |          UNION SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a)
         |SELECT a AS doc_id, CAST(LEAST(a, MIN(b)) AS BIGINT) AS cluster_id
         |FROM reach GROUP BY a ORDER BY doc_id""") { (s, dir) =>
      clusterLabels(s, dir)
        .select(col("node").as("doc_id"), col("label").cast("long").as("cluster_id"))
        .orderBy(col("doc_id"))
    },

    // ---- dedup APPLY stage: the kept corpus. Each near-dup cluster
    // keeps its minimum doc_id (= the converged min-label), every other
    // clustered doc is removable; unclustered docs are kept by
    // definition. This is the output a curation pipeline actually
    // writes — the per-doc keep/drop verdict — via one left join of the
    // corpus against the (clustered-docs-only) label table. ----
    sql("dd_kept_corpus",
      s"""WITH RECURSIVE $neardupCtesSql,
         |sym AS (SELECT doc_a AS a, doc_b AS b FROM pairs
         |        UNION ALL SELECT doc_b, doc_a FROM pairs),
         |reach AS (SELECT a, b FROM sym
         |          UNION SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a),
         |clusters AS (SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id
         |             FROM reach GROUP BY a)
         |SELECT d.doc_id,
         |       CAST(COALESCE(c.cluster_id, d.doc_id) AS BIGINT) AS cluster_id,
         |       CAST(CASE WHEN c.cluster_id IS NULL OR c.cluster_id = d.doc_id
         |                 THEN 1 ELSE 0 END AS BIGINT) AS kept
         |FROM documents d LEFT JOIN clusters c ON c.doc_id = d.doc_id
         |ORDER BY d.doc_id""") { (s, dir) =>
      val clusters = clusterLabels(s, dir)
        .select(col("node").as("doc_id"), col("label").cast("long").as("cid"))
      t(s, dir, "documents").select(col("doc_id"))
        .join(clusters, Seq("doc_id"), "left_outer")
        .select(col("doc_id"),
          coalesce(col("cid"), col("doc_id")).cast("long").as("cluster_id"),
          when(col("cid").isNull || col("cid") === col("doc_id"), 1L)
            .otherwise(0L).cast("long").as("kept"))
        .orderBy(col("doc_id"))
    },

    // ---- QUALITY-keeper apply stage: dd_kept_corpus keeps each
    // cluster's MINIMUM doc_id — cheap and deterministic, but blind to
    // which copy is best. Production curation (RefinedWeb, Dolma) keeps
    // the best REPRESENTATIVE instead: here the cluster member with the
    // highest stopword ratio (Text's quality signal, SAME stopword
    // list), then most tokens (a truncated copy loses to the full
    // text — the dd_containment quote class), then min doc_id as the
    // final deterministic tie-break. Integer arithmetic throughout.
    // Scale shape: the memoized clusterLabels + tx_quality_score's
    // explode-agg + ONE window partitioned by cluster_id (clusters are
    // pair-verified near-dups — small groups by construction, never a
    // corpus-sized partition). ----
    sql("dd_quality_kept",
      s"""WITH RECURSIVE $neardupCtesSql,
         |sym AS (SELECT doc_a AS a, doc_b AS b FROM pairs
         |        UNION ALL SELECT doc_b, doc_a FROM pairs),
         |reach AS (SELECT a, b FROM sym
         |          UNION SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a),
         |clusters AS (SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id
         |             FROM reach GROUP BY a),
         |w AS (SELECT doc_id, unnest(string_split(coalesce(text, ''), ' ')) AS word
         |      FROM documents),
         |st AS (SELECT doc_id, COUNT(*) AS n_tokens,
         |              SUM(CASE WHEN word IN ${Text.stopSql} THEN 1 ELSE 0 END)
         |                AS n_stop
         |       FROM w GROUP BY doc_id),
         |q AS (SELECT d.doc_id,
         |             COALESCE(c.cluster_id, d.doc_id) AS cluster_id,
         |             CAST(100 * st.n_stop // st.n_tokens AS INT) AS stop_pct,
         |             CAST(st.n_tokens AS INT) AS n_tokens
         |      FROM documents d
         |      LEFT JOIN clusters c ON c.doc_id = d.doc_id
         |      JOIN st ON st.doc_id = d.doc_id),
         |rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY cluster_id
         |         ORDER BY stop_pct DESC, n_tokens DESC, doc_id) AS r
         |       FROM q)
         |SELECT doc_id, CAST(cluster_id AS BIGINT) AS cluster_id,
         |       stop_pct, n_tokens,
         |       CAST(CASE WHEN r = 1 THEN 1 ELSE 0 END AS BIGINT) AS kept
         |FROM rk ORDER BY doc_id""") { (s, dir) =>
      val clusters = clusterLabels(s, dir)
        .select(col("node").as("doc_id"), col("label").cast("long").as("cid"))
      // text coalesced to '' (gramRows' convention) so a NULL-text doc
      // still gets a token-stats row and therefore a keep/drop VERDICT
      // — an apply stage that silently loses docs is a policy hole
      // (dd_kept_corpus LEFT JOINs for the same reason); '' splits to
      // one empty token on both engines, so n_tokens = 1, stop_pct = 0
      val st = t(s, dir, "documents")
        .select(col("doc_id"),
          explode(split(coalesce(col("text"), lit("")), " ")).as("word"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"),
          sum(when(col("word").isInCollection(Text.stopwords), 1).otherwise(0))
            .as("n_stop"))
      val q = t(s, dir, "documents").select(col("doc_id"))
        .join(clusters, Seq("doc_id"), "left_outer")
        .join(st, Seq("doc_id"))
        .select(col("doc_id"),
          coalesce(col("cid"), col("doc_id")).cast("long").as("cluster_id"),
          expr("(100 * n_stop) div n_tokens").cast("int").as("stop_pct"),
          col("n_tokens").cast("int").as("n_tokens"))
      q.withColumn("r", row_number().over(
          Window.partitionBy(col("cluster_id"))
            .orderBy(col("stop_pct").desc, col("n_tokens").desc, col("doc_id"))))
        .select(col("doc_id"), col("cluster_id"), col("stop_pct"),
          col("n_tokens"),
          when(col("r") === 1, 1L).otherwise(0L).cast("long").as("kept"))
        .orderBy(col("doc_id"))
    },

    // ---- leakage-safe train/val/test split: the assignment unit is
    // the near-dup CLUSTER, not the document — hash-splitting raw
    // doc_ids puts one copy of a duplicated page in train and its
    // near-dup twin in test, and the eval silently measures
    // memorization (the split-leakage failure every dedup paper
    // warns about; SemDeDup/Dolma pipelines split AFTER clustering
    // for exactly this reason). Every doc inherits its cluster's
    // deterministic md5-bucket verdict (singletons are their own
    // cluster), so a verified near-dup pair can NEVER straddle splits
    // — asserted structurally by DedupSpec. First hex digit → 16
    // buckets: '0' → val, '1' → test, else train (87.5/6.25/6.25).
    // Scale shape: clusterLabels' pointer-jumping supersteps (shared,
    // memoized) + ONE left join corpus⋈labels + a map-side hash — the
    // split adds nothing shuffle-shaped beyond the clustering it
    // reuses. ----
    sql("dd_leakage_safe_split",
      s"""WITH RECURSIVE $neardupCtesSql,
         |sym AS (SELECT doc_a AS a, doc_b AS b FROM pairs
         |        UNION ALL SELECT doc_b, doc_a FROM pairs),
         |reach AS (SELECT a, b FROM sym
         |          UNION SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a),
         |clusters AS (SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id
         |             FROM reach GROUP BY a),
         |asg AS (SELECT d.doc_id,
         |               COALESCE(c.cluster_id, d.doc_id) AS cluster_id
         |        FROM documents d LEFT JOIN clusters c ON c.doc_id = d.doc_id)
         |SELECT doc_id, CAST(cluster_id AS BIGINT) AS cluster_id,
         |       CASE substr(md5(CAST(cluster_id AS VARCHAR)), 1, 1)
         |         WHEN '0' THEN 'val' WHEN '1' THEN 'test' ELSE 'train'
         |       END AS split
         |FROM asg ORDER BY doc_id""") { (s, dir) =>
      val clusters = clusterLabels(s, dir)
        .select(col("node").as("doc_id"), col("label").cast("long").as("cid"))
      t(s, dir, "documents").select(col("doc_id"))
        .join(clusters, Seq("doc_id"), "left_outer")
        .withColumn("cluster_id", coalesce(col("cid"), col("doc_id")).cast("long"))
        .withColumn("split",
          when(substring(md5(col("cluster_id").cast("string")), 1, 1) === "0", "val")
            .when(substring(md5(col("cluster_id").cast("string")), 1, 1) === "1", "test")
            .otherwise("train"))
        .select(col("doc_id"), col("cluster_id"), col("split"))
        .orderBy(col("doc_id"))
    },

    // ---- incremental (delta-batch) near-dup detection: band keys of
    // the new batch only, probed against the full persisted band-key
    // index — the daily-crawl primitive that avoids re-deriving
    // old-vs-old pairs. Same exact-Jaccard verify as the full run. ----
    sql("dd_incremental_neardups",
      s"""WITH ${incrementalNeardupCtesSqlFor(DefaultGeometry)}
         |SELECT doc_a, doc_b, n_common, n_union
         |FROM pairs ORDER BY doc_a, doc_b""") { (s, dir) =>
      incrementalNeardupPairs(s, dir)
        .select(col("doc_a"), col("doc_b"), col("n_common"), col("n_union"))
        .orderBy(col("doc_a"), col("doc_b"))
    },

    // ---- index MAINTENANCE (the write side of the daily-crawl loop):
    // merge the delta batch's band rows into the persisted index,
    // publish the merged artifact, and emit its capped read view. The
    // oracle replays a FULL from-scratch index build — exact equality
    // is the merge's correctness contract (old ∪ batch = rebuild,
    // with the hot-bucket cap re-evaluated on merged counts). ----
    sql("dd_index_merge",
      s"""WITH ${bucketCtesSqlFor(DefaultGeometry)}
         |SELECT doc_id, CAST(band AS INT) AS band, bkey
         |FROM bkept ORDER BY doc_id, band""") { (s, dir) =>
      mergeBandIndex(s, dir)
        .select(col("doc_id"), col("band").cast("int").as("band"), col("bkey"))
        .orderBy(col("doc_id"), col("band"))
    },

    // ---- window-index MAINTENANCE: dd_index_merge's delta contract
    // for the containment ladder's L = 16 rung — a growing corpus
    // extends the window-signature index with batch-sized work (old
    // docs' text is never re-windowed or re-hashed once their artifact
    // exists), and the published artifact's capped read view must be
    // row-identical to a full rebuild, which the oracle replays from
    // scratch. Unlike the whole-doc index, a (doc, band) key here
    // carries MANY bkeys (one per window), so the output orders on
    // all three columns. ----
    sql("dd_containment_index_merge",
      s"""WITH ${windowIndexCtesSqlFor(Rung16, DefaultGeometry)}
         |SELECT doc_id, CAST(band AS INT) AS band, bkey
         |FROM chkept ORDER BY doc_id, band, bkey""") { (s, dir) =>
      mergeWindowIndex(s, dir, Rung16)
        .select(col("doc_id"), col("band").cast("int").as("band"), col("bkey"))
        .orderBy(col("doc_id"), col("band"), col("bkey"))
    })

  /** Connected components over the near-dup pair graph via iterative
    * fused-superstep min-label propagation — shared by dd_dup_clusters
    * and the dd_kept_corpus apply stage. Returns (node, label) for
    * every doc that appears in at least one verified pair.
    *
    * Memoized per fixture (TrainMemo): SEVEN registered queries consume
    * the cluster map (dd_dup_clusters, dd_kept_corpus,
    * dd_leakage_safe_split, dd_dup_span_* family, pipe_curated_corpus,
    * pipe_training_manifest, pipe_llm_corpus), and while the verified
    * PAIRS relation is cache-canonical (a repeat consumer hits the
    * CacheManager), the superstep LOOP above it — per-iteration join +
    * min-agg + localCheckpoint + two driver fixpoint probes — re-ran
    * per consumer. The artifact is the dedup product a production
    * pipeline persists between crawls: (node, label), bounded by docs
    * appearing in ≥1 verified pair × 2 longs — index-class, not a raw
    * text derivative. The final superstep's localCheckpoint already
    * truncates lineage, so memoizing it holds no scaffolding alive;
    * the oracle replays the full fixpoint from the parquet inputs. */
  private[ops] def clusterLabels(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    TrainMemo.memoKeyOf(d) match {
      case Some(k) => TrainMemo.getOrTrain(
        s"cclabels:${TrainMemo.sessionKeyOf(s)}:$k")(clusterLabelsBuild(s, dir))
      case None => clusterLabelsBuild(s, dir)
    }
  }

  private def clusterLabelsBuild(s: SparkSession, dir: String): DataFrame = {
      def dbg(msg: String): Unit =
        if (sys.env.contains("GRAFT_DEBUG_CC"))
          println(s"[cc] $msg t=${System.nanoTime() / 1e9}")
      // neardupPairs returns an eagerly-cached relation, so the sym
      // union's concurrent branches and every superstep read blocks
      val pairs = neardupPairs(s, dir).select(col("doc_a"), col("doc_b"))
      dbg("pairs built")
      val sym = pairs.select(col("doc_a").as("node"), col("doc_b").as("peer"))
        .union(pairs.select(col("doc_b").as("node"), col("doc_a").as("peer")))
      dbg("sym built")
      // seed = superstep 0 for free: min over the direct neighborhood
      // is one aggregation over the edge list, no join
      var labels = sym.groupBy(col("node"))
        .agg(least(col("node"), min(col("peer"))).as("label"))
        .localCheckpoint()
      dbg("labels init")
      // Superstep = ONE join + one min-agg. The three candidate
      // sources of the classic formulation are fused by treating the
      // current labels as extra edges (node → label):
      //   keep:  (node, label)            — the union's left branch
      //   prop:  (node, label(peer))      — real edge (node, peer)
      //   jump:  (node, label(label))     — label-edge (node, label),
      //          pointer jumping ⇒ convergence in O(log diameter)
      // so (sym ∪ label-edges) ⋈ labels covers prop AND jump in a
      // single shuffle join where the unfused version ran two (the
      // fused join's input grows by |V| rows — exactly the rows the
      // second join consumed anyway; measured ~35% less wall time per
      // superstep at sf0.1).
      // Labels only ever decrease, so SUM(label) is strictly decreasing
      // until the fixpoint — an exact convergence test computed in one
      // tiny job on the checkpointed result, with no compare-join.
      // (decimal(38,0): a BIGINT sum could overflow at 1e9+ nodes.)
      def labelSum(df: DataFrame): java.math.BigDecimal =
        // SUM over an empty relation is NULL (e.g. a corpus with no
        // near-dup pairs at all) — treat as zero so the loop converges
        // immediately instead of NPE-ing on compareTo
        Option(df.agg(sum(col("label").cast("decimal(38,0)"))).first().getDecimal(0))
          .getOrElse(java.math.BigDecimal.ZERO)
      var prev = labelSum(labels)
      var converged = false
      while (!converged) {
        val edgesPlus = sym.select(col("node"), col("peer"))
          .union(labels.select(col("node"), col("label").as("peer")))
        val next = labels.select(col("node"), col("label"))
          .union(edgesPlus
            .join(labels.select(col("node").as("peer"), col("label")), Seq("peer"))
            .select(col("node"), col("label")))
          .groupBy(col("node")).agg(min(col("label")).as("label"))
          .localCheckpoint()
        val cur = labelSum(next)
        converged = cur.compareTo(prev) == 0
        prev = cur
        labels = next
        if (sys.env.contains("GRAFT_DEBUG_CC"))
          println(s"[cc] superstep done t=${System.nanoTime() / 1e9}")
      }
      labels
  }

  private val tailSpecs: Seq[QuerySpec] = Seq(

    // ---- shingle statistics through the graft_shingles GENERATOR
    // (custom Catalyst Generator = the UDTF surface): shingles stream
    // out one at a time instead of materializing the whole per-doc
    // array before explode ----
    sql("dd_shingle_stats",
      s"""WITH sh AS ($shinglesSql)
         |SELECT doc_id,
         |       CAST(COUNT(DISTINCT sh) AS BIGINT) AS n_shingles,
         |       MIN(sh) AS first_sh
         |FROM sh GROUP BY doc_id ORDER BY doc_id""") { (s, dir) =>
      graft.GraftExtensions.register(s)
      t(s, dir, "documents")
        .selectExpr("doc_id", "graft_shingles(text, 3) AS sh")
        .groupBy(col("doc_id"))
        .agg(countDistinct(col("sh")).cast("long").as("n_shingles"),
          min(col("sh")).as("first_sh"))
        .orderBy(col("doc_id"))
    },

    // ---- exact n-gram Jaccard, brute-force on a bounded sample — the
    // correctness baseline the LSH path is judged against. The sample
    // is broadcast against itself (≤100 docs), overlap by
    // array_intersect ----
    sql("dd_neardup_rate",
      s"""WITH $neardupCtesSql,
         |involved AS (SELECT doc_a AS d FROM pairs
         |             UNION SELECT doc_b FROM pairs)
         |SELECT CAST((SELECT COUNT(*) FROM documents) AS BIGINT) AS n_docs,
         |       CAST((SELECT COUNT(*) FROM pairs) AS BIGINT) AS n_pairs,
         |       CAST(COUNT(*) AS BIGINT) AS n_docs_with_neardup
         |FROM involved""") { (s, dir) =>
      // corpus near-dup health: one row — total docs, verified pairs,
      // docs appearing in ≥1 pair. Reuses the cached pairs pipeline;
      // the involved-docs count is a distinct over pair endpoints
      // (2×|pairs| rows), nowhere near corpus-sized. The three 1-row
      // aggregates combine via broadcast nested-loop joins (1×1 rows —
      // not a data-sized cartesian).
      val pairs = neardupPairs(s, dir)
      val involved = pairs.select(col("doc_a").as("d"))
        .union(pairs.select(col("doc_b").as("d"))).distinct()
      t(s, dir, "documents").agg(count(lit(1)).cast("long").as("n_docs"))
        .crossJoin(broadcast(pairs.agg(count(lit(1)).cast("long").as("n_pairs"))))
        .crossJoin(broadcast(involved.agg(count(lit(1)).cast("long").as("n_docs_with_neardup"))))
    },

    sql("dd_ngram_jaccard_sample",
      s"""WITH sh AS ($shinglesSql),
         |sample AS (SELECT * FROM sh WHERE doc_id < 100),
         |counts AS (SELECT doc_id, COUNT(*) AS n_sh FROM sample GROUP BY doc_id),
         |common AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
         |  FROM sample a JOIN sample b ON a.sh = b.sh AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id),
         |j AS (
         |  SELECT m.doc_a, m.doc_b, m.n_common,
         |         ca.n_sh + cb.n_sh - m.n_common AS n_union
         |  FROM common m
         |  JOIN counts ca ON ca.doc_id = m.doc_a
         |  JOIN counts cb ON cb.doc_id = m.doc_b)
         |SELECT doc_a, doc_b, CAST(n_common AS BIGINT) AS n_common,
         |       CAST(n_union AS BIGINT) AS n_union
         |FROM j
         |ORDER BY doc_a, doc_b""") { (s, dir) =>
      val sample = shArr(s, dir).filter(col("doc_id") < 100)
      val a = sample.select(col("doc_id").as("doc_a"), col("shs").as("shs_a"),
        col("n_sh").as("n_a"))
      val b = sample.select(col("doc_id").as("doc_b"), col("shs").as("shs_b"),
        col("n_sh").as("n_b"))
      a.join(broadcast(b), col("doc_a") < col("doc_b"))
        .withColumn("n_common", size(array_intersect(col("shs_a"), col("shs_b"))).cast("long"))
        .filter(col("n_common") >= 1) // oracle's inner join on shared shingles
        .select(col("doc_a"), col("doc_b"), col("n_common"),
          (col("n_a") + col("n_b") - col("n_common")).as("n_union"))
        .orderBy(col("doc_a"), col("doc_b"))
    },

    // ---- SimHash: 16-bit signature from per-word md5 bits ----
    sql("dd_simhash", simhashOracleSql) { (s, dir) =>
      val words = t(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      // hex value of the first 4 md5 chars (= the oracle's strpos sum)
      val value = conv(substring(md5(col("word")), 1, 4), 16, 10).cast("int")
      val withV = words.select(col("doc_id"), value.as("v"))
      val simhash = (0 until 16).map { bit =>
        when(sum(when(shiftright(col("v"), bit).bitwiseAND(1) === 1, 1).otherwise(-1)) > 0,
          1 << bit).otherwise(0)
      }.reduce(_ + _)
      withV.groupBy(col("doc_id"))
        .agg(simhash.cast("int").as("simhash"))
        .orderBy(col("doc_id"))
    },

    // ---- the same signature as ONE native codegen'd expression
    // (graft.functions.SimHash16): no explode, no shuffle — the whole
    // pipeline stays inside the scan's WholeStageCodegen. Shares
    // dd_simhash's oracle verbatim. ----
    sql("dd_simhash_native", simhashOracleSql) { (s, dir) =>
      graft.GraftExtensions.register(s)
      t(s, dir, "documents")
        .select(col("doc_id"), expr("graft_simhash16(text)").as("simhash"))
        .orderBy(col("doc_id"))
    },

    // ---- embedding-cosine near-dups AS a dedup operator: the
    // semantic-dup detector digest/shingle dedup can't be — a
    // paraphrase or re-render shares no n-grams but sits next to its
    // twin in embedding space. Reuses the sign-LSH bucketed pair
    // pipeline (Similarity.cosinePairs — never all-pairs), then joins
    // back to documents for the curation-relevant columns; the
    // cross_source flag marks semantic dups that ALSO leak across
    // corpus splits. Join keys are ids; text never moves. ----
    sqlN("dd_semantic_neardups")(n =>
      s"""WITH ${Similarity.cosinePairsCtesSqlFor(n)}
         |SELECT p.vec_a AS doc_a, p.vec_b AS doc_b,
         |       da.source AS source_a, db.source AS source_b,
         |       CAST(CASE WHEN da.source <> db.source THEN 1 ELSE 0 END AS INT)
         |         AS cross_source
         |FROM vpairs p
         |JOIN documents da ON da.doc_id = p.vec_a
         |JOIN documents db ON db.doc_id = p.vec_b
         |ORDER BY doc_a, doc_b""") { (s, dir) =>
      val d = t(s, dir, "documents").select(col("doc_id"), col("source"))
      Similarity.cosinePairs(s, dir)
        .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
        .join(d.select(col("doc_id").as("doc_a"), col("source").as("source_a")),
          Seq("doc_a"))
        .join(d.select(col("doc_id").as("doc_b"), col("source").as("source_b")),
          Seq("doc_b"))
        .withColumn("cross_source",
          (col("source_a") =!= col("source_b")).cast("int"))
        .select(col("doc_a"), col("doc_b"), col("source_a"), col("source_b"),
          col("cross_source"))
        .orderBy(col("doc_a"), col("doc_b"))
    },

    // ---- corpus-level duplicate-n-gram coverage (Lee et al. 2021,
    // "Deduplicating Training Data Makes Language Models Better"): for
    // each doc, the fraction of its distinct word 5-grams that occur in
    // ≥2 documents — the substring-duplication signal that exact-doc
    // dedup misses. Two word-count-shaped aggregations on the n-gram
    // key (distinct per doc → doc-frequency), then the df table joins
    // back hash-partitioned on the SAME key it was aggregated on — the
    // exchange is reused, and nothing corpus-wide is broadcast. ----
    sql("dd_ngram_coverage",
      s"""WITH ${Text.ng5CtesSql},
        |df AS (SELECT g, COUNT(*) AS nd FROM ng GROUP BY g)
        |SELECT n.doc_id,
        |       CAST(COUNT(*) AS BIGINT) AS n_ngrams,
        |       CAST(SUM(CASE WHEN d.nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_ngrams,
        |       CAST(SUM(CASE WHEN d.nd > 1 THEN 1 ELSE 0 END) * 1000000 // COUNT(*)
        |            AS BIGINT) AS coverage_ppm
        |FROM ng n JOIN df d ON n.g = d.g
        |GROUP BY n.doc_id ORDER BY n.doc_id""") { (s, dir) =>
      val ng = Text.ng5(t(s, dir, "documents"))
      // doc-frequency via groupBy + equi-join back on g, NOT a window
      // partitioned on the raw 5-gram: on a Zipfian corpus the hottest
      // gram's entire occurrence set would land in ONE window partition
      // = one unsplittable task, while the join's hot probe key is
      // fanned across tasks by AQE skew-join and the aggregate absorbs
      // it with map-side partials. ReusedExchange recovers the shared
      // shuffle on g, so the join-back costs no extra exchange.
      val df = ng.groupBy(col("g")).agg(count(lit(1)).as("nd"))
      ng.join(df, Seq("g"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).cast("long").as("n_ngrams"),
          sum(when(col("nd") > 1, 1L).otherwise(0L)).cast("long").as("dup_ngrams"),
          expr("CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) * 1000000 div count(1) AS BIGINT)")
            .as("coverage_ppm"))
        .orderBy(col("doc_id"))
    },

    // ---- SemDeDup (Abbas et al. 2023): semantic dedup with the
    // pairwise-cosine check confined to learned k-means clusters —
    // the paper's scale trick (k grows with N, so each cell's exact
    // O(n_c²) stays bounded, and the pair join is an equi-join on
    // cell). Every doc gets its cluster, duplicate degree, and the
    // deterministic keep-min-id removal flag — the apply-stage output
    // a curation pipeline writes. Training + assignment replayed
    // bit-exactly by the oracle (same Lloyd chain as ss_ivf_trained).
    sqlN("dd_semdedup")(n =>
      s"""WITH ${Similarity.semdedupCtesSqlFor(n)}
         |SELECT vec_id AS doc_id, cell, n_dups, removed
         |FROM sdflag ORDER BY doc_id""") { (s, dir) =>
      Similarity.semdedupFrame(s, dir)
        .select(col("vec_id").as("doc_id"), col("cell"),
          col("n_dups"), col("removed"))
        .orderBy(col("doc_id"))
    },

    // ---- MinHash-LSH recall eval (the text-side twin of
    // ss_recall_eval): ground truth = pairs with TRUE Jaccard ≥ 0.5
    // whose smaller id is in the query sample (doc_id ≡ 0 mod 5),
    // computed by an exact shingle equi-join of the sampled docs
    // against the WHOLE corpus (query-sample methodology — sample ×
    // collisions work, never corpus²); recall = the fraction the
    // banded-LSH pipeline (unchanged) recovers. The tuning
    // measurement for the bands×rows geometry. ----
    sql("dd_lsh_recall",
      s"""WITH $neardupCtesSql,
         |gt_counts AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
         |gt_common AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
         |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
         |  WHERE a.doc_id % 5 = 0 AND a.doc_id < 5000
         |  GROUP BY a.doc_id, b.doc_id),
         |gt AS (
         |  SELECT m.doc_a, m.doc_b
         |  FROM gt_common m
         |  JOIN gt_counts ca ON ca.doc_id = m.doc_a
         |  JOIN gt_counts cb ON cb.doc_id = m.doc_b
         |  WHERE m.n_common * 2 >= ca.n_sh + cb.n_sh - m.n_common)
         |SELECT CAST(COUNT(*) AS BIGINT) AS n_truth,
         |       CAST(COUNT(p.doc_a) AS BIGINT) AS n_recalled,
         |       CAST(COUNT(p.doc_a) * 1000000 // GREATEST(COUNT(*), 1) AS BIGINT)
         |         AS recall_ppm
         |FROM gt g LEFT JOIN pairs p
         |  ON p.doc_a = g.doc_a AND p.doc_b = g.doc_b""") { (s, dir) =>
      val sh = shArr(s, dir).cache() // exploded twice + counts + LSH side
      val ex = sh.select(col("doc_id"), explode(col("shs")).as("sh"))
      val counts = sh.select(col("doc_id"), col("n_sh"))
      // ground truth on a BOUNDED sample: % 5 alone is a fixed
      // FRACTION, so the truth-side shingle join grows with corpus²
      // (measured 142 s at the 100x fixture); the absolute cap keeps
      // the eval's cost linear at any SF while covering every doc of
      // the oracle fixture (500 docs) unchanged
      val common = ex.filter(col("doc_id") % 5 === 0 && col("doc_id") < 5000)
        .select(col("doc_id").as("doc_a"), col("sh"))
        .join(ex.select(col("doc_id").as("doc_b"), col("sh")), Seq("sh"))
        .filter(col("doc_a") < col("doc_b"))
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("n_common"))
      val gt = common
        .join(counts.select(col("doc_id").as("doc_a"), col("n_sh").as("n_a")),
          Seq("doc_a"))
        .join(counts.select(col("doc_id").as("doc_b"), col("n_sh").as("n_b")),
          Seq("doc_b"))
        .filter(col("n_common") * 2 >= col("n_a") + col("n_b") - col("n_common"))
        .select(col("doc_a"), col("doc_b"))
      val found = neardupPairs(s, dir)
        .select(col("doc_a"), col("doc_b"), lit(1).as("hit"))
      gt.join(found, Seq("doc_a", "doc_b"), "left")
        .agg(count(lit(1)).cast("long").as("n_truth"),
          count(col("hit")).cast("long").as("n_recalled"),
          expr("CAST(count(hit) * 1000000 div greatest(count(1), 1) AS BIGINT)")
            .as("recall_ppm"))
    })

  private val spanSpecs: Seq[QuerySpec] = Seq(

    // ---- maximal duplicated text spans (the positions exact-substring
    // dedup would cut) ----
    sql("dd_dup_spans",
      s"""WITH $dupSpanCtesSql
         |SELECT doc_id,
         |       CAST(MIN(pos) AS INT) AS span_start,
         |       CAST(MAX(pos) + ${SpanW - 1} AS INT) AS span_end,
         |       CAST(MAX(pos) + $SpanW - MIN(pos) AS INT) AS dup_words,
         |       CAST(COUNT(*) AS BIGINT) AS n_grams
         |FROM isl GROUP BY doc_id, island
         |ORDER BY doc_id, span_start""") { (s, dir) =>
      dupSpanFrame(s, dir)
        .select(col("doc_id"), col("span_start"), col("span_end"),
          col("dup_words"), col("n_grams"))
        .orderBy(col("doc_id"), col("span_start"))
    },

    // ---- per-doc duplicated-word coverage by those spans — the
    // curation signal (drop / trim docs past a dup_ppm threshold).
    // Distinct from dd_ngram_coverage: that counts duplicated GRAMS
    // (overlapping), this measures WORDS under maximal spans, the
    // fraction of the doc that is literally repeated text. Zero-span
    // docs surface with dup_ppm = 0 via the left join. ----
    sql("dd_dup_span_coverage",
      s"""WITH $dupSpanCtesSql,
         |spans AS (SELECT doc_id, MAX(pos) + $SpanW - MIN(pos) AS dup_words
         |          FROM isl GROUP BY doc_id, island),
         |agg AS (SELECT doc_id, CAST(SUM(dup_words) AS BIGINT) AS dup_words,
         |               CAST(COUNT(*) AS BIGINT) AS n_spans
         |        FROM spans GROUP BY doc_id),
         |wc AS (SELECT doc_id,
         |         CAST(len(string_split(COALESCE(text, ''), ' ')) AS BIGINT)
         |           AS n_words
         |       FROM documents)
         |SELECT wc.doc_id, wc.n_words,
         |       COALESCE(agg.dup_words, 0) AS dup_words,
         |       COALESCE(agg.n_spans, 0) AS n_spans,
         |       CAST(COALESCE(agg.dup_words, 0) * 1000000 // wc.n_words
         |            AS BIGINT) AS dup_ppm
         |FROM wc LEFT JOIN agg ON agg.doc_id = wc.doc_id
         |ORDER BY wc.doc_id""") { (s, dir) =>
      val agg = dupSpanFrame(s, dir)
        .groupBy(col("doc_id"))
        .agg(sum(col("dup_words")).cast("long").as("dup_words"),
          count(lit(1)).cast("long").as("n_spans"))
      t(s, dir, "documents")
        .select(col("doc_id"),
          size(split(coalesce(col("text"), lit("")), " ")).cast("long")
            .as("n_words"))
        .join(agg, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_words"),
          coalesce(col("dup_words"), lit(0L)).as("dup_words"),
          coalesce(col("n_spans"), lit(0L)).as("n_spans"),
          expr("CAST(coalesce(dup_words, 0) * 1000000 div n_words AS BIGINT)")
            .as("dup_ppm"))
        .orderBy(col("doc_id"))
    },

    // ---- span-dedup APPLY stage: the per-doc curation verdict the
    // Lee-2022 signal feeds a corpus with (the analog of
    // dd_kept_corpus for the span family). Spans of at least
    // MinCutSpan words are cut; a doc whose cut coverage reaches
    // DropPpm is dropped whole; a doc with cut spans below that is
    // trimmed (kept_words = words outside cut spans — exact, since
    // maximal spans never overlap); everything else is kept intact,
    // INCLUDING docs whose only spans are below the length floor.
    // Shape: one filter+agg over the memoized span frame and one left
    // join against doc word counts — nothing corpus-shaped beyond the
    // span derivation all three span ops share. ----
    sql("dd_dup_span_apply",
      s"""WITH $dupSpanCtesSql,
         |spans AS (SELECT doc_id, MAX(pos) + $SpanW - MIN(pos) AS dup_words
         |          FROM isl GROUP BY doc_id, island),
         |cut AS (SELECT doc_id, CAST(SUM(dup_words) AS BIGINT) AS cut_words,
         |               CAST(COUNT(*) AS BIGINT) AS n_spans_cut
         |        FROM spans WHERE dup_words >= $MinCutSpan GROUP BY doc_id),
         |wc AS (SELECT doc_id,
         |         CAST(len(string_split(COALESCE(text, ''), ' ')) AS BIGINT)
         |           AS n_words
         |       FROM documents),
         |v AS (SELECT wc.doc_id, wc.n_words,
         |        COALESCE(cut.cut_words, 0) AS cut_words,
         |        COALESCE(cut.n_spans_cut, 0) AS n_spans_cut
         |      FROM wc LEFT JOIN cut ON cut.doc_id = wc.doc_id)
         |SELECT doc_id, n_words, cut_words, n_spans_cut,
         |       CASE WHEN cut_words * 1000000 >= $DropPpm * n_words THEN 'drop'
         |            WHEN cut_words > 0 THEN 'trim' ELSE 'keep' END AS action,
         |       CAST(CASE WHEN cut_words * 1000000 >= $DropPpm * n_words THEN 0
         |                 ELSE n_words - cut_words END AS BIGINT) AS kept_words
         |FROM v ORDER BY doc_id""") { (s, dir) =>
      val cut = dupSpanFrame(s, dir)
        .filter(col("dup_words") >= MinCutSpan)
        .groupBy(col("doc_id"))
        .agg(sum(col("dup_words")).cast("long").as("cut_words"),
          count(lit(1)).cast("long").as("n_spans_cut"))
      t(s, dir, "documents")
        .select(col("doc_id"),
          size(split(coalesce(col("text"), lit("")), " ")).cast("long")
            .as("n_words"))
        .join(cut, Seq("doc_id"), "left")
        .withColumn("cut_words", coalesce(col("cut_words"), lit(0L)))
        .withColumn("n_spans_cut", coalesce(col("n_spans_cut"), lit(0L)))
        .withColumn("action",
          when(col("cut_words") * lit(1000000L) >= col("n_words") * lit(DropPpm),
            "drop")
            .when(col("cut_words") > 0, "trim")
            .otherwise("keep"))
        .withColumn("kept_words",
          when(col("action") === "drop", lit(0L))
            .otherwise(col("n_words") - col("cut_words")).cast("long"))
        .select(col("doc_id"), col("n_words"), col("cut_words"),
          col("n_spans_cut"), col("action"), col("kept_words"))
        .orderBy(col("doc_id"))
    },

    // ---- span GRAM-INDEX maintenance: daily-crawl delta merge of the
    // exact-substring index (see mergeSpanIndex). The read view must be
    // row-identical to dd_dup_spans' from-scratch rebuild — including
    // spans the BATCH created inside OLD docs (threshold-after-merge),
    // which is the part a per-side-verdict store would get wrong. The
    // oracle replays exactly that rebuild. ----
    sql("dd_span_index_merge",
      s"""WITH $dupSpanCtesSql
         |SELECT doc_id,
         |       CAST(MIN(pos) AS INT) AS span_start,
         |       CAST(MAX(pos) + ${SpanW - 1} AS INT) AS span_end,
         |       CAST(MAX(pos) + $SpanW - MIN(pos) AS INT) AS dup_words,
         |       CAST(COUNT(*) AS BIGINT) AS n_grams
         |FROM isl GROUP BY doc_id, island
         |ORDER BY doc_id, span_start""") { (s, dir) =>
      mergeSpanIndex(s, dir)
        .select(col("doc_id"), col("span_start"), col("span_end"),
          col("dup_words"), col("n_grams"))
        .orderBy(col("doc_id"), col("span_start"))
    })

  val specs: Seq[QuerySpec] = headSpecs ++ tailSpecs ++ spanSpecs

  /** DuckDB oracle for both simhash variants. */
  private lazy val simhashOracleSql: String = {
      // hex value of the first 4 md5 chars, spelled out so both engines
      // compute it identically
      def hexVal(expr: String, pos: Int) =
        s"(strpos('0123456789abcdef', substr($expr, $pos, 1)) - 1)"
      val v = (1 to 4).map(p => s"${hexVal("md5(word)", p)} * ${math.pow(16, 4 - p).toInt}")
        .mkString(" + ")
      val bits = (0 until 16).map { bit =>
        s"CASE WHEN SUM(CASE WHEN (v >> $bit) & 1 = 1 THEN 1 ELSE -1 END) > 0 THEN ${1 << bit} ELSE 0 END"
      }.mkString(" + ")
      s"""WITH w AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
         |h AS (SELECT doc_id, $v AS v FROM w)
         |SELECT doc_id, CAST($bits AS INT) AS simhash
         |FROM h GROUP BY doc_id ORDER BY doc_id""".stripMargin.trim
  }
}
