package graft.ops

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import Tables._
import QuerySpec.{sql, sqlN}

/** Sign-random-projection LSH geometry: `bands` bands of
  * `planesPerBand` hyperplanes over `dims`-dimensional vectors, plus
  * the hot-bucket cap. Collision probability per band for angle θ is
  * (1 − θ/π)^planesPerBand — bands×planes is the recall/cost knob.
  *
  * Fixture default: 2 × 4 over 64 dims (wide buckets, tuned to the
  * synthetic corpus's cosine range ≤ ~0.5); a production deployment
  * over real embeddings would run 8-16 bands of 8-12 planes plus
  * multi-probe. The builders take the geometry as an argument; the
  * registered queries pin the default so the generated oracle SQL
  * stays in lock-step with the DataFrame side. */
final case class SignLshGeometry(
    bands: Int, planesPerBand: Int, dims: Int, maxBucketSize: Long = 10000L) {
  val planes: Int = bands * planesPerBand
}

/** Similarity search over the `embeddings` table (vec_id, embedding:
  * array<float>, label).
  *
  * Three tiers, mirroring a production ANN stack:
  *  - ss_brute_topk   — exact top-k for a bounded query set: broadcast
  *    the queries, scan the corpus once (the correctness baseline and
  *    the "re-rank" stage of any ANN system);
  *  - ss_lsh_neardups — sign-random-projection LSH, banded: vectors
  *    only meet inside a shared (band, bucket) cell, never all-pairs —
  *    the 100 TB path. Bands × planes-per-band is the recall/cost
  *    knob (2 × 4 here for the synthetic fixture's cosine range; a
  *    1000-executor deployment over real embeddings would run 8-16
  *    bands of 8-12 planes plus multi-probe);
  *  - ss_ivf_topk     — IVF-style cell-probe search: the `label`
  *    column plays the coarse quantizer's cell id, so a query only
  *    scans its own cell (1/N_cells of the corpus).
  *
  * Execution shape (the 100 TB argument): every per-vector quantity —
  * quantization, norm, all 8 LSH projections, and every pairwise dot
  * product — is a single codegen'd array expression
  * (`transform`/`aggregate`/`zip_with`) evaluated where the row
  * already lives. The corpus is never exploded to (vec_id, dim) rows,
  * so no 64×-row-count shuffle exists anywhere: the only wide
  * exchanges are the (band, bucket) candidate join and the final
  * per-pair id joins. (An earlier revision exploded vectors into
  * per-dimension rows and computed dots as shuffle-join aggregations;
  * at sf0.1 that was ~6 s for ss_lsh_neardups vs well under 1 s for
  * this shape, and the gap only widens with corpus size.)
  *
  * Cross-engine determinism (DuckDB oracle parity): float arrays are
  * quantized once to BIGINT (`round(x * 1000)` — int8-style
  * quantization, standard ANN practice), after which every dot product
  * and norm is exact integer arithmetic, order-independent under
  * aggregation. Cosine appears only as an ORDER BY key computed by the
  * identical double expression from identical integers (IEEE ops are
  * correctly rounded ⇒ bit-equal in both engines) and is never output;
  * output columns are integers only. Near-dup thresholds are expressed
  * as integer cross-multiplication (400·dot² ≥ 49·n2a·n2b ⟺ cos ≥
  * 0.35 — chosen inside the fixture's cosine range, max ≈ 0.5). The
  * oracle SQL keeps the exploded per-dimension formulation (DuckDB has
  * no zip_with); same integers ⇒ same sums.
  */
object Similarity {

  val DefaultGeometry: SignLshGeometry =
    SignLshGeometry(bands = 2, planesPerBand = 4, dims = 64)
  private val QuerySetSql = "vec_id < 10" // bounded query sample

  // ---------------------------------------------------------------
  // Corpus-size-scaled index geometry (the 100 TB knob)
  // ---------------------------------------------------------------

  /** Target vectors per LSH bucket / k-means cell. Candidate-pair and
    * within-cell-pairwise volume is Σ occ²/2 per band/cell ≈
    * n·occ/2 — LINEAR in the corpus as long as occupancy is held
    * constant, QUADRATIC if the geometry is frozen while the corpus
    * grows (measured: the 2×4-plane fixture geometry at sf1 put 12.5k
    * vectors in each of 16 buckets and ss_lsh_multiprobe went
    * 1.2 s → 101 s on 10× the data). 250 is chosen so the sf0.01
    * ORACLE fixture (2,000 vectors) lands exactly on
    * [[DefaultGeometry]] / k=8 — the regime every generated oracle
    * SQL replays — pinned by ContractSpec. */
  private[ops] val TargetOccupancy = 250L

  private def ceilLog2(x: Long): Int =
    if (x <= 1) 0 else 64 - java.lang.Long.numberOfLeadingZeros(x - 1)

  /** Corpus row count, memoized per fixture content (one metadata-only
    * parquet count per fixture, amortized across every geometry
    * consumer in the session). */
  private[ops] def corpusCount(v: DataFrame): Long =
    TrainMemo.memoized("corpus_n", v)(java.lang.Long.valueOf(v.count())).longValue()

  /** Occupancy-targeted sign-LSH geometry: planes grow with
    * log2(n/occupancy) so expected bucket size stays ~[[TargetOccupancy]]
    * (each extra hyperplane halves it); bands grow one-per-plane
    * (capped at 8) to claw back per-band recall lost to the narrower
    * buckets — the Manku et al. 2007 (WWW, near-duplicate web crawling)
    * block-table shape, where signature bits and table count both rise
    * with corpus size. Recall at the deployed geometry is priced by
    * ss_lsh_recall / ss_recall_eval, not assumed. */
  private[ops] def scaledGeometry(n: Long): SignLshGeometry = {
    val coarse = math.min(16, math.max(4, ceilLog2(n / TargetOccupancy)))
    val bands = math.min(8, 2 + (coarse - 4))
    // refine: candidate volume is n·bands·occ/2, so once bands grow,
    // per-band occupancy must SHRINK by ~bands to hold the per-vector
    // candidate budget at ~TargetOccupancy/2 independent of n (at a
    // 30× fixture the unrefined rule produced 50M candidate pairs for
    // a 60k corpus — 830 per vector — and the pair verify dominated
    // the whole query). Finer buckets trade mid-similarity recall for
    // that bound — the standard knob, priced by the recall queries.
    val planes =
      if (coarse == 4) 4 // oracle-fixture regime: exactly DefaultGeometry
      else math.min(16, coarse + ceilLog2(bands))
    SignLshGeometry(bands, planesPerBand = planes, dims = DefaultGeometry.dims)
  }

  /** Multi-probe trades tables for probes ("more probes, fewer
    * tables"): 2 planes finer than the plain geometry — the (1+planes)×
    * probe expansion multiplies PAIR volume, so its occupancy target
    * must sit ~4× lower — and bands pinned at 2, since the 1-bit probe
    * ring already plays the role extra bands play in the plain path. */
  private[ops] def scaledMultiprobeGeometry(n: Long): SignLshGeometry = {
    val g = scaledGeometry(n)
    if (g == DefaultGeometry) g // oracle-fixture regime: replayed by the SQL twins
    else SignLshGeometry(bands = 2,
      planesPerBand = math.min(16, g.planesPerBand + 2), dims = g.dims)
  }

  /** Occupancy-targeted k-means cell count (SemDeDup §3 / IVF sizing):
    * k = n/occupancy keeps within-cell pairwise linear in n. The
    * assignment term is n·k dots — quadratic in n under this rule, so
    * the DISPATCHED assignment ([[dispatchedCells]], ss_cells_assign)
    * routes through the IMI two-level quantizer past
    * [[FlatAssignMaxK]], where k per level stays ⌈√k⌉-bounded; the
    * flat exhaustive pass remains the in-regime serving path and the
    * algorithmic definition the probe-family oracles replay. */
  private[ops] def scaledK(n: Long): Int =
    math.max(KmeansK.toLong, math.min(1L << 16, n / TargetOccupancy)).toInt

  /** Training-sample bound (FAISS `max_points_per_centroid` shape:
    * clustering trains on min(n, cap·k) sampled points — FAISS defaults
    * the cap to 256 and documents ~39 as the useful floor; 64 here).
    * With the occupancy rule k = n/250, an unsampled Lloyd pass costs
    * n·k = n²/250 dots — the engine's last super-linear term (measured:
    * dd_semantic_neardups 92 s cold at sf10, k=800). Capping the
    * TRAINING set at 64·k ≈ n/3.9 makes each training round ~4× cheaper
    * at any n in the scaled regime (and unboundedly cheaper past the
    * k = 2¹⁶ cap, where 64·k is a constant 4.2M rows); the final
    * serving assignment stays the honest exhaustive n·k pass. */
  private[ops] val TrainPointsPerCentroid = 64L

  /** Below this corpus size training is never sampled: the full pass
    * is already trivial, and the floor keeps the pinned oracle regime
    * (n ≤ [[QuerySpec.OracleRegimeN]]) byte-identical to the
    * pre-sampling oracle SQL. */
  private[ops] val TrainSampleFloor = 4000L

  /** Deterministic hash-sample threshold for k-means training: keep a
    * vector iff the first 4 hex chars of md5("km:" + vec_id) sort below
    * the threshold — the q16_hash_sample primitive (same md5 in any
    * engine ⇒ the same training set, no RNG state, no coordination).
    * None ⇒ train on the full corpus. */
  private[ops] def trainSampleThreshold(n: Long, k: Int): Option[String] = {
    val want = TrainPointsPerCentroid * k
    if (n <= TrainSampleFloor || n <= want) None
    else Some(f"${math.min(65535L,
      math.max(1L, math.ceil(want.toDouble / n * 65536).toLong))}%04x")
  }

  /** Spark twin of the oracle's sample predicate — fixed-width
    * lowercase hex compares lexicographically = numerically in both
    * engines. */
  private def trainSamplePred(thr: String): Column =
    substring(md5(concat(lit("km:"), col("vec_id").cast("string"))), 1, 4) < thr

  private def trainSamplePredSql(thr: String): String =
    s"substr(md5('km:' || CAST(vec_id AS VARCHAR)), 1, 4) < '$thr'"

  /** The corpus-scaled, sample-bounded k-means model every IVF/SemDeDup
    * consumer trains — k and the training sample both derived from the
    * SAME corpus count the oracle generators use. */
  private def scaledKmeansModel(v: DataFrame): Seq[(Long, Array[Long])] = {
    val n = corpusCount(v)
    val k = scaledK(n)
    kmeansModel(v, "qe", DefaultGeometry.dims, k, trainSampleThreshold(n, k))
  }

  /** Above this k the literal-argmin expression (k·dims longs inlined
    * in the plan) gives way to the broadcast-table assignment —
    * bit-equal by construction (SimilaritySpec asserts at k=8, 64 and
    * 256), only the model's transport changes. */
  private[ops] val LiteralAssignMaxK = 16

  /** The ALGORITHM dispatch boundary, one level up from the transport
    * dispatch above: at scaledK(n) ≤ this, the exhaustive flat
    * assignment runs (n·k dots — with the occupancy rule k = n/250
    * that term is n²/250, quadratic in corpus size, so it must not be
    * the default forever); above it, coarse assignment ROUTES THROUGH
    * the IMI two-level quantizer ([[imiCells]]): two independent
    * k′-means over the vector halves with k′ = ⌈√k⌉, n·2k′·(dims/2) =
    * n·√k·dims assignment work for the same joint-cell occupancy
    * target — the growth drops from n²/250 to ~n^1.5/16. The boundary
    * sits where both sides are oracle-gated by shipped fixtures
    * (k = 8 at the pinned regime and sf0.1 → flat; k = 80 at the 10×
    * fixture and 800 at sf10 → IMI), exactly like the transport
    * dispatch is asserted on both sides of k = 16; a production
    * deployment would raise it toward the documented ~10⁸-vector
    * limit of the flat term, and the dispatch keeps serving correct
    * answers either side because BOTH branches are full oracle
    * replays, not approximations of each other. */
  private[ops] val FlatAssignMaxK = 64

  /** int-quantized vector + its squared norm, both map-side.
    *
    * All per-vector math (norms, plane projections, pair dots) runs
    * through the native [[graft.functions.DotProduct]] expression —
    * constant-size codegen'd loop; see its scaladoc for why both a
    * lambda formulation and an unrolled expression tree lose. */
  private[ops] def varr(s: SparkSession, dir: String): DataFrame = {
    graft.GraftExtensions.register(s)
    t(s, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))")
          .as("qe"))
      .withColumn("n2", dot("qe", "qe"))
  }

  /** Exact integer dot product of two quantized array columns. */
  private def dot(a: String, b: String): Column = expr(s"graft_dot($a, $b)")

  private val qvSql =
    """SELECT vec_id, i - 1 AS dim,
      |       CAST(round(CAST(embedding[i] AS DOUBLE) * 1000) AS BIGINT) AS qe
      |FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)""".stripMargin

  private val normsSql =
    "SELECT vec_id, CAST(SUM(qe * qe) AS BIGINT) AS n2 FROM qv GROUP BY vec_id"

  /** Identical-in-both-engines cosine ORDER BY key from integer parts. */
  private val cosExprSql =
    "CAST(dot AS DOUBLE) / sqrt(CAST(n2_q AS DOUBLE) * CAST(n2_v AS DOUBLE))"
  private def cosCol =
    col("dot").cast("double") / sqrt(col("n2_q").cast("double") * col("n2_v").cast("double"))

  /** Deterministic sign-LSH hyperplanes: sgn(p,d) = +1 iff the first
    * hex digit of md5("p:d") is < 8. Generated driver-side for Spark
    * (512 constants), recomputed by md5() in the DuckDB oracle — same
    * md5, same signs. */
  private def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  /** Plane p's signed projection: graft_dot against the literal ±1
    * sign vector (a constant array; the codegen'd loop reads it like
    * any other ArrayData). */
  private def proj(p: Int, g: SignLshGeometry): Column = {
    val signs = (0 until g.dims)
      .map(d => if (md5Hex(s"$p:$d").charAt(0) < '8') "1L" else "-1L")
      .mkString("array(", ", ", ")")
    expr(s"graft_dot(qe, $signs)")
  }

  /** Band b's bucket id from its planesPerBand signed projections —
    * all map-side. */
  private def bucketCol(b: Int, g: SignLshGeometry): Column =
    (g.planesPerBand * b until g.planesPerBand * (b + 1)).map { p =>
      when(proj(p, g) > 0, lit(1L << (p % g.planesPerBand))).otherwise(lit(0L))
    }.reduce(_ + _)

  private def planesSqlFor(g: SignLshGeometry) =
    s"""SELECT a.p, b.dim,
       |       CASE WHEN substr(md5(CAST(a.p AS VARCHAR) || ':' || CAST(b.dim AS VARCHAR)), 1, 1)
       |                 IN ('0','1','2','3','4','5','6','7') THEN 1 ELSE -1 END AS sgn,
       |       a.p // ${g.planesPerBand} AS band,
       |       CAST(2 ** (a.p % ${g.planesPerBand}) AS BIGINT) AS pw
       |FROM (SELECT CAST(range AS INT) AS p FROM range(${g.planes})) a,
       |     (SELECT CAST(range AS INT) AS dim FROM range(${g.dims})) b""".stripMargin


  /** CTE chain ending in `ranked` — the brute-force cosine ranking of
    * the query set against the corpus (shared by ss_brute_topk and
    * ss_recall_eval). */
  private val bruteCtesSql =
    s"""qv AS ($qvSql),
       |norms AS ($normsSql),
       |qq AS (SELECT vec_id AS qid, dim, qe AS qqe FROM qv WHERE $QuerySetSql),
       |dots AS (
       |  SELECT q.qid, v.vec_id, CAST(SUM(q.qqe * v.qe) AS BIGINT) AS dot
       |  FROM qq q JOIN qv v ON v.dim = q.dim
       |  GROUP BY q.qid, v.vec_id),
       |scored AS (
       |  SELECT d.qid AS query_id, d.vec_id AS neighbor_id, d.dot,
       |         nq.n2 AS n2_q, nv.n2 AS n2_v
       |  FROM dots d
       |  JOIN norms nq ON nq.vec_id = d.qid
       |  JOIN norms nv ON nv.vec_id = d.vec_id
       |  WHERE d.vec_id <> d.qid),
       |ranked AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |             ORDER BY $cosExprSql DESC, neighbor_id) AS rk
       |  FROM scored)""".stripMargin

  /** CTE chain ending in `bkept(vec_id, band, bucket)` — the
    * hot-bucket-capped LSH bucket assignments. */
  private def lshBucketCtesSqlFor(g: SignLshGeometry) =
    s"""planes AS (${planesSqlFor(g)}),
       |proj AS (
       |  SELECT v.vec_id, pl.p, pl.band, pl.pw, CAST(SUM(pl.sgn * v.qe) AS BIGINT) AS proj
       |  FROM qv v JOIN planes pl ON pl.dim = v.dim
       |  GROUP BY v.vec_id, pl.p, pl.band, pl.pw),
       |buckets AS (
       |  SELECT vec_id, band,
       |         CAST(SUM(CASE WHEN proj > 0 THEN pw ELSE 0 END) AS BIGINT) AS bucket
       |  FROM proj GROUP BY vec_id, band),
       |bkept AS MATERIALIZED (
       |  SELECT buckets.* FROM buckets
       |  JOIN (SELECT band, bucket, COUNT(*) AS bn FROM buckets GROUP BY band, bucket) s
       |    ON s.band = buckets.band AND s.bucket = buckets.bucket
       |  WHERE s.bn <= ${g.maxBucketSize})""".stripMargin

  /** CTE chain ending in `cand(vec_a, vec_b)` — the LSH candidate
    * pairs (shared by ss_lsh_neardups and ss_recall_eval), with the
    * same hot-bucket cap the Spark side applies. */
  private def lshCandCtesSqlFor(g: SignLshGeometry) =
    s"""${lshBucketCtesSqlFor(g)},
       |cand AS MATERIALIZED (
       |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
       |  FROM bkept a JOIN bkept b
       |    ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id)""".stripMargin

  /** Multi-probe variant of `cand`: each vector ALSO probes the
    * `planesPerBand` buckets one sign-flip away, so pairs whose
    * buckets differ by ≤1 bit become candidates — the standard
    * recall-vs-bands tradeoff (more probes, fewer tables/bands).
    * Still a pure EQUI-join: the probe set is expanded row-wise
    * (planesPerBand+1 probes per (vec, band)), never a non-equi
    * bucket-distance join. */
  private def lshMultiprobeCandCtesSqlFor(g: SignLshGeometry) =
    s"""${lshBucketCtesSqlFor(g)},
       |probes AS (
       |  SELECT vec_id, band, bucket AS probe FROM bkept
       |  UNION ALL
       |  SELECT b.vec_id, b.band, xor(b.bucket, CAST(2 ** j.j AS BIGINT)) AS probe
       |  FROM bkept b, (SELECT CAST(range AS INT) AS j FROM range(${g.planesPerBand})) j),
       |cand AS MATERIALIZED (
       |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
       |  FROM probes a JOIN bkept b
       |    ON a.band = b.band AND a.probe = b.bucket AND a.vec_id < b.vec_id)""".stripMargin


  /** Spark twin of `cand`: LSH candidate pairs over [[varr]]'s `v`.
    *
    * The cache+eager-count sits BETWEEN the projection computing the
    * two bucket ids and the band explode, for two reasons: (a) EAGER
    * materialization — the candidate self-join's sides build their
    * shuffle maps concurrently, and a cold cache would let both race
    * through all 8 projections (cache(), not localCheckpoint, so the
    * identical sub-plan in ss_recall_eval hits the CacheManager
    * instead of recomputing); (b) codegen hygiene — a plain Project
    * splits the big bucket expressions across generated methods, while
    * the same expressions inlined into the explode's
    * array(struct(...)) input put the whole computation inside one
    * Generate consume method, which overflows Janino's 64 KB method
    * limit and silently falls back to interpreted eval. */
  /** Hot-bucket-capped (vec_id, band, bucket) assignments — the shared
    * upstream of the plain and multi-probe candidate joins. */
  private[ops] def keptBuckets(v: DataFrame, g: SignLshGeometry): DataFrame = {
    val withBuckets = v
      .select(col("vec_id") +:
        (0 until g.bands).map(b => bucketCol(b, g).as(s"b$b")): _*)
      .cache()
    withBuckets.count()
    val buckets = withBuckets
      .select(col("vec_id"),
        explode(array((0 until g.bands).map(b =>
          struct(lit(b).as("band"), col(s"b$b").as("bucket"))): _*)).as("bb"))
      .select(col("vec_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    Skew.dropOversizeGroups(buckets, Seq("band", "bucket"), g.maxBucketSize)
  }

  /** Like [[keptBuckets]] but the bucket rows CARRY the quantized
    * vector and its norm. Consumers that verify pairs read these
    * payloads straight off the bucket join's output, which replaces
    * the two corpus-sized post-candidate joins (each shuffling every
    * candidate row WITH a 0.5 KB array attached) by one exchange of
    * n·bands payload-bearing bucket rows — ~20× fewer shuffled bytes
    * at the measured sf10 pair volumes. The bucket expressions stay in
    * their own cached Project (Janino-limit hygiene — see the policy
    * note in SCALE.md); the explode only passes the payload columns
    * through. */
  private[ops] def keptBucketsWith(v: DataFrame, g: SignLshGeometry): DataFrame = {
    val withBuckets = v
      .select(col("vec_id") +: col("qe") +: col("n2") +:
        (0 until g.bands).map(b => bucketCol(b, g).as(s"b$b")): _*)
      .cache()
    withBuckets.count()
    val buckets = withBuckets
      .select(col("vec_id"), col("qe"), col("n2"),
        explode(array((0 until g.bands).map(b =>
          struct(lit(b).as("band"), col(s"b$b").as("bucket"))): _*)).as("bb"))
      .select(col("vec_id"), col("qe"), col("n2"),
        col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    // hot-bucket guard: one degenerate bucket (all-zero vectors, a
    // popular sign pattern) otherwise goes quadratic on one reducer
    Skew.dropOversizeGroups(buckets, Seq("band", "bucket"), g.maxBucketSize)
  }

  /** LSH candidates at the corpus-scaled geometry — the entry point
    * every registered query uses. At the sf0.01 oracle fixture the
    * scaled geometry IS [[DefaultGeometry]] (ContractSpec pins it), so
    * the static SQL twins replay exactly what ran. */
  private[ops] def lshCandidatesAuto(v: DataFrame): DataFrame =
    lshCandidates(v, scaledGeometry(corpusCount(v)))

  private[ops] def lshMultiprobeCandidatesAuto(v: DataFrame): DataFrame =
    lshMultiprobeCandidates(v, scaledMultiprobeGeometry(corpusCount(v)))

  private[ops] def lshCandidates(v: DataFrame,
      g: SignLshGeometry = DefaultGeometry): DataFrame = {
    val kept = keptBuckets(v, g)
    val a = kept.select(col("vec_id").as("vec_a"), col("band"), col("bucket"))
    val b = kept.select(col("vec_id").as("vec_b"), col("band"), col("bucket"))
    a.join(b, Seq("band", "bucket")).filter(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b")).distinct()
  }

  /** Spark twin of [[lshMultiprobeCandCtesSqlFor]]'s `cand`: one side's
    * probe set is expanded to the bucket itself plus its
    * `planesPerBand` one-bit-flip neighbors, then equi-joined against
    * the other side's actual buckets — recall of ≤1-bit-apart pairs at
    * (planesPerBand+1)× one side's exchange volume, no non-equi join.
    *
    * At production geometries (8-12 planes/band, 2^planes ≫ occupied
    * cells) the expanded probe set is first semi-joined (broadcast)
    * against the OCCUPIED (band, bucket) cells, whose key set is
    * bounded by bands × 2^planesPerBand — geometry, not corpus size —
    * so probes into empty cells (the dominant share there) are dropped
    * map-side instead of paying the candidate-join exchange. Results
    * are identical by construction: an empty-cell probe can never
    * produce a candidate (asserted by SimilaritySpec at a large-domain
    * geometry). The prefilter is gated on the bucket-domain size
    * because it costs one distinct + broadcast: at tiny domains every
    * cell is occupied and the semi-join is pure overhead — measured
    * +0.9 s at the 2×4-plane bench geometry, where it can drop
    * nothing. */
  private[ops] def lshMultiprobeCandidates(v: DataFrame,
      g: SignLshGeometry = DefaultGeometry,
      prefilter: Option[Boolean] = None): DataFrame = {
    val kept = keptBuckets(v, g)
    val probes = kept.select(col("vec_id"), col("band"), col("bucket").as("probe"))
      .union(kept.select(col("vec_id"), col("band"),
        explode(array((0 until g.planesPerBand).map(j =>
          col("bucket").bitwiseXOR(lit(1L << j))): _*)).as("probe")))
    val a0 = probes.select(col("vec_id").as("vec_a"), col("band"), col("probe").as("bucket"))
    val a =
      if (!prefilter.getOrElse((1L << g.planesPerBand) > 1024)) a0
      else {
        val occupied = kept.select(col("band"), col("bucket")).distinct()
        a0.join(broadcast(occupied), Seq("band", "bucket"), "leftsemi")
      }
    val b = kept.select(col("vec_id").as("vec_b"), col("band"), col("bucket"))
    a.join(b, Seq("band", "bucket")).filter(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b")).distinct()
  }

  // ---------------------------------------------------------------
  // Trained IVF: k-means coarse quantizer learned from the corpus
  // ---------------------------------------------------------------

  /** Number of IVF cells and Lloyd update rounds for ss_ivf_trained.
    * Init is deterministic (first `KmeansK` vectors by vec_id) so the
    * DuckDB oracle can replay the whole training run. */
  private val KmeansK = 8
  private val KmeansRounds = 2

  /** Product-quantization geometry for ss_pq_adc: `PqM` subspaces of
    * `PqSub` dims each (PqM × PqSub == DefaultGeometry.dims), each
    * with its own `KmeansK`-entry codebook. */
  private val PqM = 4
  private val PqSub = 16

  /** ADC-shortlist size for the exact re-rank stage (ss_adc_rerank /
    * ss_rerank_recall): 10 raw-vector reads per query — the FAISS
    * IndexRefineFlat `k_factor` trade at k=3 (shortlist ≈ 3×k). */
  private val RerankShortlist = 10

  /** Map-side nearest-centroid assignment: argmin over the k learned
    * centroids of ||v − c||², expanded to n2c − 2·dot(v, c) (the n2_v
    * term is constant per vector and drops out of the argmin). The
    * centroids arrive as LITERAL arrays — k·dims ≈ 512 longs of model
    * state, the Spark MLlib KMeans shape — so assignment is one
    * codegen'd expression with zero shuffle and zero extra scan.
    * Ties break on cell id via the lexicographic (score, cid) min. */
  private def assignElems(vecCol: String, cents: Seq[(Long, Array[Long])]): String =
    cents.map { case (cid, ce) =>
      val n2c = ce.map(x => x * x).sum
      val arr = ce.mkString("array(", "L, ", "L)")
      s"named_struct('s', ${n2c}L - 2L * graft_dot($vecCol, $arr), 'c', ${cid}L)"
    }.mkString(", ")
  private[ops] def assignCellOn(vecCol: String, cents: Seq[(Long, Array[Long])]): Column =
    expr(s"array_min(array(${assignElems(vecCol, cents)})).c")
  /** Winning (score, cid) struct — for consumers that also need the
    * distance to the assigned centroid (||v−c||² = s + n2_v). */
  private def assignStructOn(vecCol: String, cents: Seq[(Long, Array[Long])]): Column =
    expr(s"array_min(array(${assignElems(vecCol, cents)}))")
  private def assignCell(cents: Seq[(Long, Array[Long])]): Column =
    assignCellOn("qe", cents)

  /** How many nearest cells a query probes in ss_ivf_nprobe — the
    * production IVF recall/latency knob (nprobe=1 is ss_ivf_trained's
    * single-cell probe). */
  private val IvfNprobe = 2

  /** The `n` nearest (score, cid) structs per vector, in probe order:
    * array_sort on the (s, c) structs is the same lexicographic
    * (score, cid) order the single-cell argmin minimizes. */
  private def probeCellsOn(vecCol: String, cents: Seq[(Long, Array[Long])],
      n: Int): Column =
    expr(s"slice(array_sort(array(${assignElems(vecCol, cents)})), 1, $n)")

  /** Train-once-serve-many: the deterministic trainings (k-means, PQ
    * codebooks, SQ8 params) are memoized per fixture — keyed by the
    * input plan's parquet root paths plus the model geometry — so the
    * many queries that serve the same learned model in one session pay
    * for one Lloyd run, the way a model registry amortizes training in
    * production. Determinism makes the memo an evaluation-count
    * optimization only: every consumer's oracle still replays the full
    * training and still matches bit-for-bit. Values are model-sized
    * (k·dims longs), bounded by distinct fixtures touched. Inputs with
    * no file scan (synthetic test frames) are trained uncached. */
  // Memoization machinery lives in [[TrainMemo]] (shared with Dedup's
  // persisted band index); these aliases keep the call sites short.
  private def getOrTrain[T <: AnyRef](key: String)(train: => T): T =
    TrainMemo.getOrTrain(key)(train)
  private def memoKeyOf(v: DataFrame): Option[String] = TrainMemo.memoKeyOf(v)
  private def sessionKeyOf(s: SparkSession): String = TrainMemo.sessionKeyOf(s)
  private def trackedCache(df: DataFrame): DataFrame = TrainMemo.trackedCache(df)
  private def checkpointReleasing(build: => DataFrame): DataFrame =
    TrainMemo.checkpointReleasing(build)
  private def memoized[T <: AnyRef](kind: String, v: DataFrame)(train: => T): T =
    TrainMemo.memoized(kind, v)(train)

  /** Test hook: drop every memoized model/index (used by specs that
    * exercise re-training against a mutated fixture). */
  private[graft] def clearMemos(): Unit = TrainMemo.clear()

  /** Deterministic k-means over `v`'s array column `vecCol`: first-k
    * init by vec_id, `KmeansRounds` Lloyd updates, floor-division
    * means — the trainer behind [[trainedCells]] (full vectors) and
    * ss_pq_adc (per-subspace codebooks). Driver-side state per round
    * is the k·dims aggregated model, never corpus rows. */
  private[ops] def kmeansModel(v: DataFrame, vecCol: String, dims: Int,
      k: Int = KmeansK,
      sampleThr: Option[String] = None): Seq[(Long, Array[Long])] =
    memoized(s"kmeans:$vecCol:$dims:$k:${sampleThr.getOrElse("full")}", v)(
      kmeansModelUncached(v, vecCol, dims, k, sampleThr))

  private[ops] def kmeansModelUncached(v: DataFrame, vecCol: String, dims: Int,
      k: Int, sampleThr: Option[String] = None): Seq[(Long, Array[Long])] = {
    // sample-bounded training (see TrainPointsPerCentroid): the Lloyd
    // UPDATE rounds see only the deterministic hash sample; the init
    // stays first-k over the FULL corpus (the sample's membership is
    // hash-scattered, so "first k of the sample" would be a different —
    // not better — deterministic choice, and full-corpus init keeps the
    // unsampled regime's oracle SQL byte-identical)
    val vs = sampleThr.map(t => v.filter(trainSamplePred(t))).getOrElse(v)
    var cents: Seq[(Long, Array[Long])] = v
      .filter(col("vec_id") < k)
      .select(col("vec_id"), col(vecCol))
      .collect() // k rows: the deterministic init, model-sized
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
      .toSeq.sortBy(_._1)
    for (_ <- 1 to KmeansRounds) {
      // per-round assignment through the same literal-vs-broadcast
      // dispatch as serving: past LiteralAssignMaxK the k·dims literal
      // would swamp the plan (and Janino) — the broadcast transport is
      // bit-equal, so the trained model is identical either way
      val assigned =
        if (cents.size <= LiteralAssignMaxK)
          vs.select(assignCellOn(vecCol, cents).as("cid"), col(vecCol))
        else
          vs.join(assignWinnersBroadcast(vs, vecCol, cents), Seq("vec_id"))
            .select(col("cell").as("cid"), col(vecCol))
      cents = assigned
        .select(col("cid"), posexplode(col(vecCol)).as(Seq("dim", "x")))
        .groupBy(col("cid"), col("dim"))
        .agg(sum(col("x")).as("sx"), count(lit(1)).as("n"))
        .collect() // k·dims aggregated rows: model state, not data
        .groupBy(_.getLong(0))
        .map { case (cid, rows) =>
          val arr = new Array[Long](dims)
          rows.foreach(r => arr(r.getInt(1)) = Math.floorDiv(r.getLong(2), r.getLong(3)))
          (cid, arr)
        }
        .toSeq.sortBy(_._1)
    }
    cents
  }

  /** One trained-k-means pass over [[varr]]'s output: deterministic
    * first-k init, `KmeansRounds` Lloyd updates, final assignment.
    *
    * Scale shape: per round, assignment is the map-side literal-argmin
    * above and the centroid update is ONE word-count-shaped aggregation
    * (posexplode to (cid, dim) partial sums, map-side combined). The
    * only driver-side materialization is the k·dims aggregated model
    * state (512 rows here) — bounded by model size, never by corpus
    * size, exactly like MLlib's KMeans collecting centroids per round.
    * Centroid means use floor division (Math.floorDiv ≡ the oracle's
    * `(S - ((S % N + N) % N)) // N`) so the learned model is bit-equal
    * in both engines even for negative coordinate sums. */
  private def trainedCells(v: DataFrame): DataFrame = memoKeyOf(v) match {
    // the materialized IVF index (corpus + assigned cell), shared by
    // every cell-probe consumer; localCheckpoint: see knnGraph note
    case Some(k) => getOrTrain(
      s"cells:${sessionKeyOf(v.sparkSession)}:$k")(
      checkpointReleasing(trainedCellsUncached(v)))
    case None => trainedCellsUncached(v)
  }

  private def trainedCellsUncached(v: DataFrame): DataFrame = {
    // label is dropped: no cell-probe consumer reads it, and the
    // materialized index should store only what serving touches
    val model = scaledKmeansModel(v)
    val base = v.select(col("vec_id"), col("qe"), col("n2"))
    if (model.size <= LiteralAssignMaxK)
      base.withColumn("cell", assignCell(model))
    else
      base.join(assignWinnersBroadcast(v, "qe", model)
        .select(col("vec_id"), col("cell")), Seq("vec_id"))
  }

  /** Broadcast-join twin of the literal argmin, for LARGE k. The
    * literal path embeds k·dims longs in the expression tree — the
    * right call at model scale (k=8 ⇒ 512 longs, zero shuffle), but at
    * production IVF scale (k ≈ 2¹⁶) the plan itself becomes multi-MB
    * and is re-analyzed on every use. Here the centroids travel as a
    * broadcast TABLE of k (cid, centroid-array, ‖c‖²) rows joined on a
    * model fan-out (crossJoin against the broadcast k-row table — a
    * BroadcastNestedLoopJoin, the honest plan when every vector meets
    * every centroid), each (vec, cid) pair scored by ONE codegen'd `graft_dot`
    * loop (never exploded per dimension: that shape costs n·dims·k
    * join rows, ~64× this one) — then the lexicographic (score, cid)
    * min per vector: the same tie-break as [[assignCell]], so the two
    * paths are bit-equal (asserted at k=8/64/256 by SimilaritySpec and
    * the ss_cells_assign oracle's flat branch). Cost is the honest exhaustive
    * assignment (k dots per vector) either way; only the model's
    * transport changes. Returns (vec_id, cell, s) — s = ‖c‖² − 2·v·c,
    * the winner's score, so profile consumers recover ‖v−c‖² = s + ‖v‖²
    * without a second pass. */
  private[ops] def assignWinnersBroadcast(v: DataFrame, vecCol: String,
      cents: Seq[(Long, Array[Long])]): DataFrame =
    centroidScores(v, vecCol, cents)
      .select(col("vec_id"),
        struct(col("s"), col("cid").as("c")).as("sc"))
      .groupBy(col("vec_id"))
      .agg(min(col("sc")).as("m"))
      .select(col("vec_id"), col("m.c").as("cell"), col("m.s").as("s"))

  /** EVERY (vector, centroid) score — the broadcast fan-out of
    * [[assignWinnersBroadcast]] without the argmin: (vec_id, cid,
    * s = ‖c‖² − 2·v·c). The multi-sequence scan needs the full score
    * table per QUERY vector (it orders whole cells, not just picks the
    * winner); the fan-out is |v|·k rows, so callers keep `v` to the
    * bounded query set unless they genuinely want the exhaustive
    * assignment table. */
  private[ops] def centroidScores(v: DataFrame, vecCol: String,
      cents: Seq[(Long, Array[Long])]): DataFrame = {
    val s = v.sparkSession
    import s.implicits._
    val centDf = cents.map { case (cid, ce) => (cid, ce, ce.map(x => x * x).sum) }
      .toDF("cid", "ce", "n2c")
    v.select(col("vec_id"), col(vecCol))
      .crossJoin(broadcast(centDf))
      .select(col("vec_id"), col("cid"),
        (col("n2c") - lit(2L) * expr(s"graft_dot($vecCol, ce)")).as("s"))
  }

  private[ops] def assignCellsBroadcast(v: DataFrame, vecCol: String,
      cents: Seq[(Long, Array[Long])]): DataFrame =
    assignWinnersBroadcast(v, vecCol, cents).select(col("vec_id"), col("cell"))

  /** [[trainedCells]]' broadcast-transport twin: identical trained
    * model (at the corpus-scaled k), broadcast-join assignment instead
    * of literal-argmin. */
  private[ops] def trainedCellsBroadcast(v: DataFrame): DataFrame =
    assignCellsBroadcast(v, "qe",
      scaledKmeansModel(v))

  /** The corpus-size-DISPATCHED coarse assignment (ss_cells_assign):
    * flat exhaustive n·k below [[FlatAssignMaxK]], the IMI two-level
    * quantizer above it, with the joint (cell1, cell2) encoded as ONE
    * bigint cell id (cell1·2¹⁶ + cell2 — per-level k′ ≤ 2⁸ under the
    * scaledK 2¹⁶ cap, so the encoding never collides and stays stable
    * if the cap is raised up to 2¹⁶ per level). Above the boundary
    * this reads the MEMOIZED IMI index ([[imiCells]]), so the
    * assignment cost is paid once per (session, fixture) and shared
    * with the whole ss_imi_* family — the flat path's
    * recompute-per-call was half of why ss_cells_broadcast read as the
    * suite's worst sf10 ratio (17.8×); the other half was the n²/250
    * term this dispatch retires. */
  private[ops] def dispatchedCells(v: DataFrame): DataFrame = {
    val n = corpusCount(v)
    if (scaledK(n) <= FlatAssignMaxK) trainedCellsBroadcast(v)
    else imiCells(v).select(col("vec_id"),
      (col("cell1") * lit(65536L) + col("cell2")).as("cell"))
  }

  // ---------------------------------------------------------------
  // k-NN graph + beam search over it (graph ANN, batch-expressed)
  // ---------------------------------------------------------------

  /** Beam geometry for ss_graph_search: fixed hop count and per-hop
    * frontier bound, so the walk is a finite deterministic plan the
    * oracle can replay hop by hop. Recall at this geometry is bounded
    * by the GRAPH, not the beam (measured: beam 8 × 4 hops recalls only
    * 2/30 more than 4 × 3 on the fixture) — the degree-3 LSH-candidate
    * edges are the knob that buys recall, so widening the walk mostly
    * buys plan depth. ss_graph_recall prices exactly this trade. */
  private val BeamHops = 3
  private val BeamWidth = 4

  /** Directed LSH-kNN edges (vec_id, rk, nb, dot): each node's top-3
    * among its LSH candidates by exact cosine — ss_knn_graph's builder,
    * shared with [[beamSearch]]. Both pair orientations are emitted
    * map-side; ranking is a window partitioned on vec_id — per-node
    * top-k, no global sort, no all-pairs anything. */
  /** Like the model memo: the graph is an INDEX — built once per
    * (session, fixture), served by ss_knn_graph, ss_graph_search and
    * ss_graph_recall alike. The materialized value is corpus × 3
    * scalar edge rows. */
  private def knnGraph(v: DataFrame): DataFrame = memoKeyOf(v) match {
    // localCheckpoint (not cache): materializes the index AND truncates
    // its lineage, so consumers plan against a leaf relation instead of
    // re-analyzing the whole LSH+window build each time — measured 1.8 s
    // of pure Catalyst planning per consumer on the unrolled beam plan
    case Some(k) => getOrTrain(
      s"knngraph:${sessionKeyOf(v.sparkSession)}:$k")(
      checkpointReleasing(knnGraphUncached(v)))
    case None => knnGraphUncached(v)
  }

  private def knnGraphUncached(v: DataFrame): DataFrame = {
    val cand = lshCandidatesAuto(v)
    val sa = v.select(col("vec_id").as("vec_a"), col("qe").as("qe_a"),
      col("n2").as("n2_a"))
    val sb = v.select(col("vec_id").as("vec_b"), col("qe").as("qe_b"),
      col("n2").as("n2_b"))
    // scalar edge rows; both orientations read this once each. Tracked:
    // released once the memoized graph index checkpoints.
    val pd = trackedCache(cand.join(sa, Seq("vec_a")).join(sb, Seq("vec_b"))
      .withColumn("dot", dot("qe_a", "qe_b"))
      .select(col("vec_a"), col("vec_b"), col("dot"),
        col("n2_a"), col("n2_b")))
    val bi = pd.select(col("vec_a").as("vec_id"), col("vec_b").as("nb"),
        col("dot"), col("n2_a").as("n2_q"), col("n2_b").as("n2_v"))
      .unionAll(pd.select(col("vec_b").as("vec_id"), col("vec_a").as("nb"),
        col("dot"), col("n2_b").as("n2_q"), col("n2_a").as("n2_v")))
    bi.withColumn("rk", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(cosCol.desc, col("nb"))).cast("int"))
      .filter(col("rk") <= 3)
  }

  /** Oracle CTE chain for [[knnGraph]], ending in
    * `krnk(vec_id, nb, dot, n2_q, n2_v, rk)` (edges = rk <= 3). */
  private def knnEdgesCtesSqlFor(n: Long): String =
    s"""${cosinePairsCtesSqlFor(n)},
       |bi AS (
       |  SELECT vec_a AS vec_id, vec_b AS nb, dot FROM pairdot
       |  UNION ALL SELECT vec_b, vec_a, dot FROM pairdot),
       |ksc AS (
       |  SELECT b.vec_id, b.nb, b.dot, na.n2 AS n2_q, nv.n2 AS n2_v
       |  FROM bi b
       |  JOIN norms na ON na.vec_id = b.vec_id
       |  JOIN norms nv ON nv.vec_id = b.nb),
       |krnk AS MATERIALIZED (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
       |             ORDER BY $cosExprSql DESC, nb) AS rk
       |  FROM ksc)""".stripMargin

  /** One oracle hop `i`: frontier → new candidates (gc) → exact dots
    * (gd) → cosine-scored (gs) → bounded beam (gb). A node is "new" if
    * no EARLIER hop scored it (and it isn't the query itself) — scored
    * nodes never re-enter, the classic visited-set contract. */
  private def beamHopSqlFor(i: Int): String = {
    val frontier =
      if (i == 1) "SELECT qid, qid AS node FROM gq"
      else s"SELECT qid, node FROM gb${i - 1}"
    val exclusions = (1 until i).map(j =>
      s"""
         |    AND NOT EXISTS (SELECT 1 FROM gc$j x
         |                    WHERE x.qid = f.qid AND x.node = e.dst)""".stripMargin)
      .mkString
    s"""gc$i AS MATERIALIZED (
       |  SELECT DISTINCT f.qid, e.dst AS node
       |  FROM ($frontier) f JOIN gedges e ON e.src = f.node
       |  WHERE e.dst <> f.qid$exclusions),
       |gd$i AS (
       |  SELECT c.qid, c.node, CAST(SUM(a.qe * b.qe) AS BIGINT) AS dot
       |  FROM gc$i c
       |  JOIN qv a ON a.vec_id = c.qid
       |  JOIN qv b ON b.vec_id = c.node AND b.dim = a.dim
       |  GROUP BY c.qid, c.node),
       |gs$i AS MATERIALIZED (
       |  SELECT d.qid, d.node, d.dot, na.n2 AS n2_q, nv.n2 AS n2_v
       |  FROM gd$i d
       |  JOIN norms na ON na.vec_id = d.qid
       |  JOIN norms nv ON nv.vec_id = d.node),
       |gb$i AS MATERIALIZED (
       |  SELECT qid, node FROM (
       |    SELECT qid, node, ROW_NUMBER() OVER (PARTITION BY qid
       |             ORDER BY $cosExprSql DESC, node) AS rk
       |    FROM gs$i) t WHERE rk <= $BeamWidth)""".stripMargin
  }

  /** The whole beam walk as a CTE chain, ending in
    * `granked(qid, node, dot, rk)` over every node any hop scored. */
  private def beamSearchCtesSqlFor(n: Long): String = {
    val hops = (1 to BeamHops).map(beamHopSqlFor).mkString(",\n")
    val pool = (1 to BeamHops).map(i => s"SELECT * FROM gs$i").mkString(" UNION ALL ")
    s"""${knnEdgesCtesSqlFor(n)},
       |gedges AS MATERIALIZED (SELECT vec_id AS src, nb AS dst FROM krnk WHERE rk <= 3),
       |gq AS MATERIALIZED (SELECT DISTINCT vec_id AS qid FROM qv WHERE $QuerySetSql),
       |$hops,
       |gpool AS ($pool),
       |granked AS (
       |  SELECT qid, node, dot, ROW_NUMBER() OVER (PARTITION BY qid
       |           ORDER BY $cosExprSql DESC, node) AS rk
       |  FROM gpool)""".stripMargin
  }

  /** Spark twin of [[beamSearchCtesSql]]: returns every scored node
    * with its rank — (qid, node, dot, n2_q, n2_v, rk), rk <= 3.
    * The loop unrolls [[BeamHops]] joins into one plan; per hop the
    * frontier is queries × beam rows, candidates exclude ALL
    * previously-scored nodes via an anti-join against the accumulated
    * visited set (itself bounded by queries × beam × degree × hops). */
  private def beamSearch(v: DataFrame): DataFrame = memoKeyOf(v) match {
    // the walk is deterministic per fixture; ss_graph_search and
    // ss_graph_recall share one execution (pool is queries × beam ×
    // degree × hops rows — model-sized)
    case Some(k) => getOrTrain(
      s"beam:$BeamHops:$BeamWidth:${sessionKeyOf(v.sparkSession)}:$k")(
      checkpointReleasing(beamSearchUncached(v))) // see knnGraph note
    case None => beamSearchUncached(v)
  }

  private def beamSearchUncached(v: DataFrame): DataFrame = {
    val edges = knnGraph(v)
      .select(col("vec_id").as("src"), col("nb").as("dst"))
    val qq = v.filter(expr(QuerySetSql))
      .select(col("vec_id").as("qid"), col("qe").as("qqe"),
        col("n2").as("n2_q"))
    val cvec = v.select(col("vec_id").as("node"), col("qe"),
      col("n2").as("n2_v"))
    var frontier = qq.select(col("qid"), col("qid").as("node"))
    var visited = frontier
    var pool: DataFrame = null
    for (_ <- 1 to BeamHops) {
      val cand = frontier.join(edges, frontier("node") === edges("src"))
        .select(col("qid"), col("dst").as("node")).distinct()
        .join(visited, Seq("qid", "node"), "left_anti")
      // each hop's scored set feeds BOTH the answer pool and the next
      // frontier — cache it (queries × beam × degree rows, model-sized)
      // so the unrolled plan stays linear in hops instead of
      // re-evaluating every prior hop's window per consumer
      val scored = trackedCache(cand.join(cvec, Seq("node"))
        .join(broadcast(qq), Seq("qid"))
        .withColumn("dot", dot("qqe", "qe"))
        .select(col("qid"), col("node"), col("dot"), col("n2_q"), col("n2_v")))
      pool = if (pool == null) scored else pool.unionAll(scored)
      visited = visited.unionAll(cand)
      frontier = scored.withColumn("rk", row_number().over(
          Window.partitionBy(col("qid")).orderBy(cosCol.desc, col("node"))))
        .filter(col("rk") <= BeamWidth)
        .select(col("qid"), col("node"))
    }
    pool.withColumn("rk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(cosCol.desc, col("node"))).cast("int"))
      .filter(col("rk") <= 3)
  }

  /** Oracle replay of one assignment round against centroid CTE
    * `${pfx}c$idx` over source CTE `$src(vec_id, dim, qe)`, producing
    * `${pfx}a$idx(vec_id, cid)`. */
  private def kmeansAssignSqlFor(pfx: String, src: String, idx: Int): String =
    s"""${pfx}s$idx AS (SELECT cid, CAST(SUM(ce * ce) AS BIGINT) AS n2c
       |          FROM ${pfx}c$idx GROUP BY cid),
       |${pfx}d$idx AS (SELECT v.vec_id, c.cid, CAST(SUM(v.qe * c.ce) AS BIGINT) AS dot
       |          FROM $src v JOIN ${pfx}c$idx c ON c.dim = v.dim
       |          GROUP BY v.vec_id, c.cid),
       |${pfx}a$idx AS (SELECT vec_id, cid FROM (
       |            SELECT d.vec_id, d.cid,
       |                   ROW_NUMBER() OVER (PARTITION BY d.vec_id
       |                     ORDER BY s.n2c - 2 * d.dot, d.cid) AS rk
       |            FROM ${pfx}d$idx d JOIN ${pfx}s$idx s ON s.cid = d.cid) t
       |          WHERE rk = 1)""".stripMargin

  private def kmeansAssignSql(idx: Int): String = kmeansAssignSqlFor("", "qv", idx)

  /** Oracle replay of one centroid update from assignment
    * `${pfx}a$idx`: elementwise floor-division mean, exact in
    * integers. */
  private def kmeansUpdateSqlFor(pfx: String, src: String, idx: Int): String =
    s"""${pfx}c${idx + 1} AS (
       |  SELECT a.cid, v.dim,
       |         CAST((SUM(v.qe) - ((SUM(v.qe) % COUNT(*) + COUNT(*)) % COUNT(*))) // COUNT(*)
       |              AS BIGINT) AS ce
       |  FROM ${pfx}a$idx a JOIN $src v ON v.vec_id = a.vec_id
       |  GROUP BY a.cid, v.dim)""".stripMargin


  /** The whole training replay as a CTE chain over `qv`, ending in
    * `cells(vec_id, cell)` — plus the final round's `d$KmeansRounds`
    * (per-(vec, cid) dots) and `s$KmeansRounds` (per-cid ‖c‖²) CTEs,
    * which profile consumers reuse to recover each vector's distance
    * to its assigned centroid without recomputing.
    *
    * Generated from the corpus count `n` by the SAME sizing rules the
    * Spark trainer uses ([[scaledK]], [[trainSampleThreshold]]): the
    * init and the FINAL (serving) assignment run over the full `qv`;
    * when sampling binds, the Lloyd update rounds run over the
    * hash-sampled `kqv`. At n ≤ [[QuerySpec.OracleRegimeN]] this is
    * byte-identical to the pre-parameterized static SQL. */
  private[ops] def kmeansCellsCtesSqlFor(n: Long): String = {
    val k = scaledK(n)
    val thr = trainSampleThreshold(n, k)
    val src = if (thr.isDefined) "kqv" else "qv"
    val sampleCte = thr
      .map(t => s"kqv AS MATERIALIZED (SELECT * FROM qv WHERE ${trainSamplePredSql(t)}),\n")
      .getOrElse("")
    val iters = (0 until KmeansRounds)
      .map(i => s"${kmeansAssignSqlFor("", src, i)},\n${kmeansUpdateSqlFor("", src, i)}")
      .mkString(",\n")
    s"""${sampleCte}c0 AS (SELECT vec_id AS cid, dim, qe AS ce FROM qv WHERE vec_id < $k),
       |$iters,
       |${kmeansAssignSql(KmeansRounds)},
       |cells AS MATERIALIZED (SELECT vec_id, CAST(cid AS BIGINT) AS cell FROM a$KmeansRounds)""".stripMargin
  }


  /** Cell-probe top-3 with a multi-cell probe list: each query scans
    * only its `nprobe` nearest cells' vectors. The probe list is the
    * ranked prefix of the same literal argmin score array — map-side,
    * zero extra model state. */
  private def ivfProbeTop3(v: DataFrame, nprobe: Int): DataFrame = {
    val cents = scaledKmeansModel(v)
    val cells = trainedCells(v) // shared materialized IVF index
    val q = v.filter(expr(QuerySetSql))
      .select(col("vec_id").as("qid"), col("qe").as("qqe"), col("n2").as("n2_q"))
    // probe-list transport dispatches like assignment: literal sorted
    // slice at model k, ranked broadcast join at large k (the window
    // spans only |queries|·k rows and is partitioned per query)
    val qprobe =
      if (cents.size <= LiteralAssignMaxK)
        q.select(col("qid"), col("qqe"), col("n2_q"),
          explode(probeCellsOn("qqe", cents, nprobe)).as("probe"))
          .select(col("qid"), col("qqe"), col("n2_q"), col("probe.c").as("cell"))
      else {
        val s = v.sparkSession
        import s.implicits._
        val centDf = cents.map { case (cid, ce) => (cid, ce, ce.map(x => x * x).sum) }
          .toDF("cid", "ce", "n2c")
        q.crossJoin(broadcast(centDf))
          .withColumn("sc", col("n2c") - lit(2L) * expr("graft_dot(qqe, ce)"))
          .withColumn("crk", row_number().over(
            Window.partitionBy(col("qid")).orderBy(col("sc"), col("cid"))))
          .filter(col("crk") <= nprobe)
          .select(col("qid"), col("qqe"), col("n2_q"), col("cid").as("cell"))
      }
    cells.join(broadcast(qprobe), Seq("cell"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("dot", dot("qqe", "qe"))
      .withColumnRenamed("n2", "n2_v")
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(cosCol.desc, col("vec_id"))).cast("int"))
      .filter(col("rk") <= 3)
  }

  /** Oracle replay of [[ivfProbeTop3]] under prefix `p`, ending in
    * `${p}ranked(qid, vec_id, cell, dot, n2_q, n2_v, rk)`. Requires
    * `qv`, `norms` and [[kmeansCellsCtesSqlFor]]'s final-round
    * `d$KmeansRounds`/`s$KmeansRounds`/`cells` CTEs in scope. */
  private def ivfProbeCtesSqlFor(p: String, nprobe: Int): String =
    s"""${p}qprobe AS (
       |  SELECT vec_id AS qid, cid AS cell FROM (
       |    SELECT d.vec_id, d.cid,
       |           ROW_NUMBER() OVER (PARTITION BY d.vec_id
       |             ORDER BY s.n2c - 2 * d.dot, d.cid) AS crk
       |    FROM d$KmeansRounds d JOIN s$KmeansRounds s ON s.cid = d.cid
       |    WHERE $QuerySetSql) t
       |  WHERE crk <= $nprobe),
       |${p}cp AS (
       |  SELECT q.qid, c.vec_id, c.cell
       |  FROM ${p}qprobe q JOIN cells c ON c.cell = q.cell AND c.vec_id <> q.qid),
       |${p}dots AS (
       |  SELECT cp.qid, cp.vec_id, cp.cell, CAST(SUM(a.qe * b.qe) AS BIGINT) AS dot
       |  FROM ${p}cp cp
       |  JOIN qv a ON a.vec_id = cp.qid
       |  JOIN qv b ON b.vec_id = cp.vec_id AND b.dim = a.dim
       |  GROUP BY cp.qid, cp.vec_id, cp.cell),
       |${p}ranked AS (
       |  SELECT d.qid, d.vec_id, d.cell, d.dot, nq.n2 AS n2_q, nv.n2 AS n2_v,
       |         ROW_NUMBER() OVER (PARTITION BY d.qid
       |           ORDER BY CAST(d.dot AS DOUBLE) /
       |                    sqrt(CAST(nq.n2 AS DOUBLE) * CAST(nv.n2 AS DOUBLE))
       |                    DESC, d.vec_id) AS rk
       |  FROM ${p}dots d
       |  JOIN norms nq ON nq.vec_id = d.qid
       |  JOIN norms nv ON nv.vec_id = d.vec_id)""".stripMargin

  /** Adds the PqM sub-vector slice columns sub0..sub{PqM-1} to
    * [[varr]]'s output (keeping qe for consumers that also need the
    * full vector, e.g. the IVFADC coarse quantizer). */
  private def withSubs(v: DataFrame): DataFrame =
    v.select(col("vec_id") +: col("qe") +: col("n2") +: (0 until PqM).map(m =>
      expr(s"slice(qe, ${m * PqSub + 1}, $PqSub)").as(s"sub$m")): _*)

  /** RESIDUAL sub-vector slices: each vector minus its assigned coarse
    * centroid (exact integers — centroids are floor-division means),
    * sliced into the PqM subspaces. The input to residual-PQ training
    * and coding (ss_ivfadc_residual): residuals concentrate around 0
    * with far less variance than raw vectors, so the same M×k codebook
    * budget quantizes them with less error — the reason FAISS defaults
    * IndexIVFPQ to by_residual=true. One interpreted zip_with per
    * VECTOR (the one-off encode pass, not the per-pair hot path); the
    * centroid table is a broadcast k-row join. */
  /** Residual-PQ codes + query LUTs, memoized per fixture — shared by
    * ss_ivfadc_residual and ss_residual_recall. Keyed on the FIXTURE
    * (v's file scan): the residual stream derives from the
    * checkpointed index, whose plan carries no file relation, so
    * memoKeyOf of the residual frame itself would be None and every
    * run would re-train. */
  private def residualCodesAndLuts(s: SparkSession,
      v: DataFrame): (DataFrame, DataFrame) = memoKeyOf(v) match {
    case Some(k) => getOrTrain(
      s"pqcodesres:$PqM:$PqSub:${sessionKeyOf(s)}:$k")({
      val (c, l) = pqCodesAndLutsUncached(s, residualSubs(v), "res")
      (checkpointReleasing(c), l)
    })
    case None => pqCodesAndLutsUncached(s, residualSubs(v), "res")
  }

  private def residualSubs(v: DataFrame): DataFrame = {
    val s = v.sparkSession
    import s.implicits._
    val centDf = scaledKmeansModel(v).map { case (cid, ce) => (cid, ce) }
      .toDF("cell", "ce")
    trainedCells(v)
      .join(broadcast(centDf), Seq("cell"))
      .withColumn("rqe", expr("zip_with(qe, ce, (a, b) -> a - b)"))
      .select(col("vec_id") +: col("cell") +: (0 until PqM).map(m =>
        expr(s"slice(rqe, ${m * PqSub + 1}, $PqSub)").as(s"sub$m")): _*)
  }

  /** Trains the PqM per-subspace codebooks on `v` (must carry the
    * [[withSubs]] slice columns), returning
    *  - the coded corpus (vec_id, code0..code{PqM-1}) — the encode is
    *    a map-side argmin against literal codebooks, and the result is
    *    PqM longs per vector: the PQ compression;
    *  - the ADC lookup-table DF for the bounded query set (qid,
    *    lut0..lut{PqM-1}) — exact integer ‖q_m − c‖² per (query,
    *    subspace, code), indexed by cid (a dropped empty cell leaves a
    *    0 slot no code can reference); 10×PqM×KmeansK longs of
    *    model-sized state, meant to be broadcast. */
  /** Trains all PqM codebooks JOINTLY — one Spark job per Lloyd round
    * for the whole product quantizer, not one per subspace: the M
    * per-subspace assign+update aggregations fuse into a single
    * explode + groupBy(m, cid, dim) pass (the subspace id rides in the
    * key). Same math as [[kmeansModel]] per subspace — deterministic
    * init, floor-division means — so the per-subspace oracle replay
    * is unchanged; only the job count drops from 3M to 3. */
  private def pqModels(v: DataFrame, tag: String = ""): Seq[Seq[(Long, Array[Long])]] =
    // `tag` separates memo entries for PQ variants trained over the
    // same fixture (raw-vector vs residual): memoKeyOf sees only the
    // file scan, which is identical for both
    memoized(s"pq$tag:$PqM:$PqSub", v)(pqModelsUncached(v))

  private def pqModelsUncached(v: DataFrame): Seq[Seq[(Long, Array[Long])]] = {
    var cents: Seq[Seq[(Long, Array[Long])]] = {
      val init = v.filter(col("vec_id") < KmeansK)
        .select(col("vec_id") +: (0 until PqM).map(m => col(s"sub$m")): _*)
        .collect() // k rows: the deterministic init, model-sized
        .sortBy(_.getLong(0))
      (0 until PqM).map(m =>
        init.map(r => (r.getLong(0), r.getSeq[Long](m + 1).toArray)).toSeq)
    }
    for (_ <- 1 to KmeansRounds) {
      val assigned = v.select(
        (0 until PqM).map(m => assignCellOn(s"sub$m", cents(m)).as(s"cid$m")) ++
          (0 until PqM).map(m => col(s"sub$m")): _*)
      val sums = assigned
        .select(explode(array((0 until PqM).map(m =>
          struct(lit(m).as("m"), col(s"cid$m").as("cid"), col(s"sub$m").as("v"))): _*))
          .as("e"))
        .select(col("e.m"), col("e.cid"), posexplode(col("e.v")).as(Seq("dim", "x")))
        .groupBy(col("m"), col("cid"), col("dim"))
        .agg(sum(col("x")).as("sx"), count(lit(1)).as("n"))
        .collect() // M·k·subDims aggregated rows: model state, not data
      cents = (0 until PqM).map { m =>
        sums.filter(_.getInt(0) == m)
          .groupBy(_.getLong(1))
          .map { case (cid, rows) =>
            val arr = new Array[Long](PqSub)
            rows.foreach(r => arr(r.getInt(2)) = Math.floorDiv(r.getLong(3), r.getLong(4)))
            (cid, arr)
          }
          .toSeq.sortBy(_._1)
      }
    }
    cents
  }

  private def pqCodesAndLuts(s: SparkSession, v: DataFrame,
      tag: String = ""): (DataFrame, DataFrame) =
    memoKeyOf(v) match {
      // the coded corpus IS the stored PQ index (5 longs/vector);
      // materialize once per fixture, lineage-truncated. The LUT frame
      // is query-sized literal data — no checkpoint needed.
      case Some(k) => getOrTrain(
        s"pqcodes$tag:$PqM:$PqSub:${sessionKeyOf(s)}:$k")({
        val (coded, lut) = pqCodesAndLutsUncached(s, v, tag)
        (checkpointReleasing(coded), lut)
      })
      case None => pqCodesAndLutsUncached(s, v, tag)
    }

  private def pqCodesAndLutsUncached(s: SparkSession, v: DataFrame,
      tag: String = ""): (DataFrame, DataFrame) = {
    val models = pqModels(v, tag)
    val coded = (0 until PqM).foldLeft(v.toDF)((df, m) =>
      df.withColumn(s"code$m", assignCellOn(s"sub$m", models(m))))
      .select(col("vec_id") +: (0 until PqM).map(m => col(s"code$m")): _*)
    val lutRows = v.filter(expr(QuerySetSql))
      .select(col("vec_id") +: (0 until PqM).map(m => col(s"sub$m")): _*)
      .collect() // ≤10 query rows: bounded like the brute-force set
      .map { r =>
        val tables = (0 until PqM).map { m =>
          val q = r.getSeq[Long](m + 1).toArray
          val t = new Array[Long](KmeansK)
          models(m).foreach { case (cid, ce) =>
            var s2 = 0L
            var d = 0
            while (d < PqSub) { val x = q(d) - ce(d); s2 += x * x; d += 1 }
            t(cid.toInt) = s2
          }
          t.toSeq
        }
        org.apache.spark.sql.Row.fromSeq(r.getLong(0) +: tables)
      }
    // schema built from PqM like every other PQ component, so the
    // M×k accuracy knob stays turnable without touching this code
    val lutSchema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("qid",
        org.apache.spark.sql.types.LongType, nullable = false) +:
        (0 until PqM).map(m => org.apache.spark.sql.types.StructField(s"lut$m",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.LongType, containsNull = false),
          nullable = false)))
    (coded, s.createDataFrame(
      new java.util.ArrayList(java.util.Arrays.asList(lutRows: _*)), lutSchema))
  }

  /** Σ_m lut_m[code_m] — the ADC score of a coded vector against a
    * query row carrying the lut columns. */
  private def adcCol: Column = (0 until PqM).map(m =>
    expr(s"element_at(lut$m, CAST(code$m AS INT) + 1)")).reduce(_ + _)

  /** The full PQ oracle chain — PqM subspace trainings + codes + LUTs
    * — ending in `adcw(qid, vec_id, adc)`: the query-set × corpus ADC
    * scores, self excluded. Shared by ss_pq_adc and ss_pq_recall. */
  private lazy val pqAdcCtesSql: String = {
    val subs = (0 until PqM).map(m => pqSubspaceSql(m, PqSub)).mkString(",\n")
    val codeJoins = (1 until PqM)
      .map(m => s"  JOIN codes$m c$m ON c$m.vec_id = c0.vec_id").mkString("\n")
    val lutJoins = (0 until PqM).map(m =>
      if (m == 0) "  JOIN lut0 l0 ON l0.cid = c0.cid"
      else s"  JOIN lut$m l$m ON l$m.cid = c$m.cid AND l$m.qid = l0.qid")
      .mkString("\n")
    val adcSum = (0 until PqM).map(m => s"l$m.t").mkString(" + ")
    s"""$subs,
       |adcw AS (
       |  SELECT l0.qid, c0.vec_id, $adcSum AS adc
       |  FROM codes0 c0
       |$codeJoins
       |$lutJoins
       |  WHERE c0.vec_id <> l0.qid)""".stripMargin
  }

  /** Full k-means replay for one PQ subspace `m`: sub-vector slice CTE
    * + init + rounds + final assignment, ending in `codes$m(vec_id,
    * cid)` and the trained centroid CTE `p${m}c$KmeansRounds`. With
    * defaults this is the (unsampled, k=8) PQ-codebook replay; the IMI
    * chain passes its corpus-scaled per-level k and sample threshold —
    * training rounds then read the hash-sampled `ksv$m`, the final
    * (coding) assignment stays over the full `sv$m`. */
  private def pqSubspaceSql(m: Int, subDims: Int, k: Int = KmeansK,
      sampleThr: Option[String] = None, srcCte: String = "qv",
      pfx: String = ""): String = {
    // `srcCte`: the exploded (vec_id, dim, qe) stream the codebooks
    // train on — `qv` for raw-vector PQ, `rv` for the residual PQ of
    // ss_ivfadc_residual. `pfx` disambiguates CTE names when two PQ
    // chains coexist in one oracle (ss_residual_recall); the defaults
    // reproduce the historical names byte-for-byte.
    val lo = m * subDims
    val src = if (sampleThr.isDefined) s"${pfx}ksv$m" else s"${pfx}sv$m"
    val sampleCte = sampleThr
      .map(t => s"${pfx}ksv$m AS MATERIALIZED (SELECT * FROM ${pfx}sv$m WHERE ${trainSamplePredSql(t)}),\n")
      .getOrElse("")
    val iters = (0 until KmeansRounds)
      .map(i => s"${kmeansAssignSqlFor(s"${pfx}p$m", src, i)},\n${kmeansUpdateSqlFor(s"${pfx}p$m", src, i)}")
      .mkString(",\n")
    s"""${pfx}sv$m AS (SELECT vec_id, dim - $lo AS dim, qe FROM $srcCte
       |          WHERE dim >= $lo AND dim < ${lo + subDims}),
       |$sampleCte${pfx}p${m}c0 AS (SELECT vec_id AS cid, dim, qe AS ce FROM ${pfx}sv$m WHERE vec_id < $k),
       |$iters,
       |${kmeansAssignSqlFor(s"${pfx}p$m", s"${pfx}sv$m", KmeansRounds)},
       |${pfx}codes$m AS (SELECT vec_id, cid FROM ${pfx}p${m}a$KmeansRounds),
       |${pfx}lut$m AS (SELECT q.vec_id AS qid, c.cid,
       |                 CAST(SUM((q.qe - c.ce) * (q.qe - c.ce)) AS BIGINT) AS t
       |          FROM ${pfx}sv$m q JOIN ${pfx}p${m}c$KmeansRounds c ON c.dim = q.dim
       |          WHERE q.vec_id < 10 GROUP BY q.vec_id, c.cid)""".stripMargin
  }

  // ---------------------------------------------------------------
  // IMI: two-level coarse quantizer (inverted multi-index — Babenko &
  // Lempitsky 2012, "The Inverted Multi-Index", CVPR)
  // ---------------------------------------------------------------

  /** Per-level codebook size for the IMI queries: two independent
    * k-means codebooks over the vector's two halves give k² joint
    * cells at 2·k·(dims/2) = k·dims assignment work — the SAME cost as
    * a flat k-cell assignment, for k× the cells. This is the design
    * the scaledK scaladoc names for >10⁸ vectors, where flat IVF's
    * assignment term (n·k dots, k capped at 2¹⁶) stops scaling: a
    * 2⁸-per-level IMI reaches the same 2¹⁶ cells at 2⁹ dots per
    * vector instead of 2¹⁶ — a 2⁷× assignment saving (the ratio is
    * measured in SimilaritySpec and recorded in SCALE.md). Per-level k
    * scales as √(scaledK(n)) — the SAME joint occupancy target as flat
    * IVF, at √k of its assignment cost — so the IMI queries hold their
    * per-cell bound at any corpus size instead of re-growing the
    * frozen-geometry disease round 6 repaired. */
  private[ops] def imiLevelK(n: Long): Int =
    math.max(2, math.ceil(math.sqrt(scaledK(n).toDouble)).toInt)
  private def imiHalf = DefaultGeometry.dims / 2

  /** Multi-sequence-scan candidate budget (Babenko & Lempitsky 2012
    * §3.2: traverse joint cells in increasing distance until the
    * candidate list reaches T): one [[TargetOccupancy]]'s worth —
    * the same expected candidate volume as flat IVF's single-cell
    * probe, so the seqscan's cost sits beside ss_ivf_trained's while
    * drawing candidates from the better-localized joint grid. */
  private[ops] val SeqScanCandBudget = TargetOccupancy

  /** (vec_id, qe, n2, impart0, impart1, cell1, cell2): each half
    * assigned to its own trained codebook — both trainings and both
    * assignments are the exact machinery of the PQ path (deterministic
    * first-k init, floor-division Lloyd, sample-bounded rounds), so
    * the oracle replay is the per-subspace chain at subDims = dims/2.
    * Assignment transport dispatches per level like every other site:
    * literal argmin at model k, broadcast table above. */
  /** The materialized IMI index (corpus + joint cell), memoized per
    * fixture exactly like [[trainedCells]] — the probe, seqscan and
    * recall consumers all read it, and without the memo each one
    * re-derived the assignment (and re-compiled the per-level literal
    * argmin: at k=9 the generated code is big enough that Janino
    * compile time, not the 2·k·dims multiplies, dominated — measured
    * as sf1 being SLOWER than sf10, whose k=29 takes the broadcast
    * transport). */
  private[ops] def imiCells(v: DataFrame): DataFrame = memoKeyOf(v) match {
    case Some(key) => getOrTrain(
      s"imicells:${sessionKeyOf(v.sparkSession)}:$key")(
      checkpointReleasing(imiCellsUncached(v)))
    case None => imiCellsUncached(v)
  }

  private def imiCellsUncached(v: DataFrame): DataFrame = {
    val n = corpusCount(v)
    val k = imiLevelK(n)
    val thr = trainSampleThreshold(n, k)
    val vs = v.select(col("vec_id"), col("qe"), col("n2"),
      expr(s"slice(qe, 1, $imiHalf)").as("impart0"),
      expr(s"slice(qe, ${imiHalf + 1}, $imiHalf)").as("impart1"))
    val m0 = kmeansModel(vs, "impart0", imiHalf, k, thr)
    val m1 = kmeansModel(vs, "impart1", imiHalf, k, thr)
    if (k <= LiteralAssignMaxK)
      vs.select(col("vec_id"), col("qe"), col("n2"),
        assignCellOn("impart0", m0).as("cell1"),
        assignCellOn("impart1", m1).as("cell2"))
    else
      vs.join(assignCellsBroadcast(vs, "impart0", m0)
          .withColumnRenamed("cell", "cell1"), Seq("vec_id"))
        .join(assignCellsBroadcast(vs, "impart1", m1)
          .withColumnRenamed("cell", "cell2"), Seq("vec_id"))
        .select(col("vec_id"), col("qe"), col("n2"), col("cell1"), col("cell2"))
  }

  /** Oracle CTE chain for [[imiCells]], ending in
    * `imicells(vec_id, cell1, cell2)` — two [[pqSubspaceSql]]
    * trainings at subDims = dims/2, per-level k and training sample
    * derived from the corpus count like the Spark side. */
  private def imiCellsCtesSqlFor(n: Long): String = {
    val k = imiLevelK(n)
    val thr = trainSampleThreshold(n, k)
    s"""${pqSubspaceSql(0, imiHalf, k, thr)},
       |${pqSubspaceSql(1, imiHalf, k, thr)},
       |imicells AS MATERIALIZED (
       |  SELECT c0.vec_id, CAST(c0.cid AS BIGINT) AS cell1,
       |         CAST(c1.cid AS BIGINT) AS cell2
       |  FROM codes0 c0 JOIN codes1 c1 ON c1.vec_id = c0.vec_id)""".stripMargin
  }

  /** Joint-cell probe chain over `imicells`, ending in
    * `imiranked(qid, vec_id, dot, rk)` — each query scans exactly its
    * own (cell1, cell2). Shared by ss_imi_topk and ss_imi_recall. */
  private val imiProbeCtesSql: String =
    s"""imiq AS (SELECT vec_id AS qid, cell1, cell2 FROM imicells
       |         WHERE $QuerySetSql),
       |imicp AS (
       |  SELECT q.qid, c.vec_id
       |  FROM imiq q JOIN imicells c
       |    ON c.cell1 = q.cell1 AND c.cell2 = q.cell2 AND c.vec_id <> q.qid),
       |imidots AS (
       |  SELECT cp.qid, cp.vec_id, CAST(SUM(a.qe * b.qe) AS BIGINT) AS dot
       |  FROM imicp cp
       |  JOIN qv a ON a.vec_id = cp.qid
       |  JOIN qv b ON b.vec_id = cp.vec_id AND b.dim = a.dim
       |  GROUP BY cp.qid, cp.vec_id),
       |imiranked AS (
       |  SELECT d.qid, d.vec_id, d.dot,
       |         ROW_NUMBER() OVER (PARTITION BY d.qid
       |           ORDER BY CAST(d.dot AS DOUBLE) /
       |                    sqrt(CAST(nq.n2 AS DOUBLE) * CAST(nv.n2 AS DOUBLE))
       |                    DESC, d.vec_id) AS rk
       |  FROM imidots d
       |  JOIN norms nq ON nq.vec_id = d.qid
       |  JOIN norms nv ON nv.vec_id = d.vec_id)""".stripMargin

  /** Multi-sequence-scan chain (Babenko & Lempitsky §3.2) over
    * `imicells` + the trained per-level centroid CTEs, ending in
    * `imisranked(qid, vec_id, dot, rk)`: per-level query-to-centroid
    * scores, joint cells in increasing s1+s2 order, scan until
    * [[SeqScanCandBudget]] candidates, exact rerank. Shared by
    * ss_imi_seqscan and ss_imi_recall.
    *
    * The query's OWN joint cell is kept unconditionally (`imiskept`'s
    * OR-arm): the scan order tie-breaks equal s1+s2 on (cell1, cell2),
    * so on an exact distance tie a foreign cell can be visited first
    * and exhaust the budget before the own cell — which would break
    * the "seqscan recalls at least the single-cell probe" dominance
    * invariant SimilaritySpec asserts. With the OR-arm the superset
    * property is structural, not an artifact of tie-break luck. Both
    * engines apply the identical rule (see [[seqscanKeptCells]]). */
  private val imiSeqscanCtesSql: String =
    s"""iqn0 AS (SELECT cid, CAST(SUM(ce * ce) AS BIGINT) AS n2c
       |         FROM p0c$KmeansRounds GROUP BY cid),
       |iqd0 AS (SELECT v.vec_id AS qid, c.cid, CAST(SUM(v.qe * c.ce) AS BIGINT) AS dot
       |         FROM sv0 v JOIN p0c$KmeansRounds c ON c.dim = v.dim
       |         WHERE v.$QuerySetSql GROUP BY v.vec_id, c.cid),
       |iqs0 AS (SELECT d.qid, CAST(d.cid AS BIGINT) AS cell1, s.n2c - 2 * d.dot AS s1
       |         FROM iqd0 d JOIN iqn0 s ON s.cid = d.cid),
       |iqn1 AS (SELECT cid, CAST(SUM(ce * ce) AS BIGINT) AS n2c
       |         FROM p1c$KmeansRounds GROUP BY cid),
       |iqd1 AS (SELECT v.vec_id AS qid, c.cid, CAST(SUM(v.qe * c.ce) AS BIGINT) AS dot
       |         FROM sv1 v JOIN p1c$KmeansRounds c ON c.dim = v.dim
       |         WHERE v.$QuerySetSql GROUP BY v.vec_id, c.cid),
       |iqs1 AS (SELECT d.qid, CAST(d.cid AS BIGINT) AS cell2, s.n2c - 2 * d.dot AS s2
       |         FROM iqd1 d JOIN iqn1 s ON s.cid = d.cid),
       |imipop AS (SELECT cell1, cell2, COUNT(*) AS cnt
       |           FROM imicells GROUP BY cell1, cell2),
       |imiseq AS (
       |  SELECT a.qid, a.cell1, b.cell2,
       |         COALESCE(SUM(COALESCE(p.cnt, 0)) OVER (
       |           PARTITION BY a.qid ORDER BY a.s1 + b.s2, a.cell1, b.cell2
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev
       |  FROM iqs0 a JOIN iqs1 b ON b.qid = a.qid
       |  LEFT JOIN imipop p ON p.cell1 = a.cell1 AND p.cell2 = b.cell2),
       |imiskept AS (
       |  SELECT s.qid, s.cell1, s.cell2
       |  FROM imiseq s
       |  LEFT JOIN imicells o ON o.vec_id = s.qid
       |   AND o.cell1 = s.cell1 AND o.cell2 = s.cell2
       |  WHERE s.prev < $SeqScanCandBudget OR o.vec_id IS NOT NULL),
       |imiscand AS (
       |  SELECT kc.qid, c.vec_id
       |  FROM imiskept kc
       |  JOIN imicells c ON c.cell1 = kc.cell1 AND c.cell2 = kc.cell2
       |  WHERE c.vec_id <> kc.qid),
       |imisdots AS (
       |  SELECT cp.qid, cp.vec_id, CAST(SUM(a.qe * b.qe) AS BIGINT) AS dot
       |  FROM imiscand cp
       |  JOIN qv a ON a.vec_id = cp.qid
       |  JOIN qv b ON b.vec_id = cp.vec_id AND b.dim = a.dim
       |  GROUP BY cp.qid, cp.vec_id),
       |imisranked AS (
       |  SELECT d.qid, d.vec_id, d.dot,
       |         ROW_NUMBER() OVER (PARTITION BY d.qid
       |           ORDER BY CAST(d.dot AS DOUBLE) /
       |                    sqrt(CAST(nq.n2 AS DOUBLE) * CAST(nv.n2 AS DOUBLE))
       |                    DESC, d.vec_id) AS rk
       |  FROM imisdots d
       |  JOIN norms nq ON nq.vec_id = d.qid
       |  JOIN norms nv ON nv.vec_id = d.vec_id)""".stripMargin

  /** Spark twin of `imiranked`: each query's own-joint-cell candidates
    * exact-reranked (all ranks — callers slice). */
  private def imiProbeRanked(v: DataFrame): DataFrame = {
    val cells = imiCells(v)
    val qq = cells.filter(expr(QuerySetSql))
      .select(col("vec_id").as("qid"), col("cell1"), col("cell2"),
        col("qe").as("qqe"), col("n2").as("n2_q"))
    cells.join(broadcast(qq), Seq("cell1", "cell2"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("dot", dot("qqe", "qe"))
      .withColumnRenamed("n2", "n2_v")
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(cosCol.desc, col("vec_id"))).cast("int"))
  }

  /** The multi-sequence-scan kept-cell rule, twin of `imiskept`: a
    * (qid, cell1, cell2) survives when the candidate mass of the cells
    * visited STRICTLY BEFORE it (s1+s2 order, (cell1, cell2)
    * tie-break) is under `budget`, OR when it is the query's own
    * assigned joint cell — the unconditional own-cell arm that makes
    * the probe-dominance invariant structural on exact s1+s2 ties
    * (SimilaritySpec constructs such a tie). Factored out so the tie
    * semantics are unit-testable without training a model.
    *
    * @param scores (qid, cell1, cell2, s1, s2) — one row per query ×
    *               joint cell
    * @param pop    (cell1, cell2, cnt) — occupied-cell populations
    * @param own    (qid, cell1, cell2) — each query's assigned cell */
  private[ops] def seqscanKeptCells(scores: DataFrame, pop: DataFrame,
      own: DataFrame, budget: Long): DataFrame = {
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("s1") + col("s2"), col("cell1"), col("cell2"))
      .rowsBetween(Window.unboundedPreceding, -1)
    scores
      .join(pop, Seq("cell1", "cell2"), "left")
      .withColumn("prev", coalesce(sum(coalesce(col("cnt"), lit(0L))).over(w), lit(0L)))
      .join(own.withColumn("is_own", lit(true)), Seq("qid", "cell1", "cell2"), "left")
      .filter(col("prev") < budget || col("is_own").isNotNull)
      .select(col("qid"), col("cell1"), col("cell2"))
  }

  /** Spark twin of `imisranked`: budget-bounded multi-sequence-scan
    * candidates exact-reranked (all ranks — callers slice). */
  private def imiSeqscanRanked(v: DataFrame): DataFrame = {
    val n = corpusCount(v)
    val k = imiLevelK(n)
    val thr = trainSampleThreshold(n, k)
    val vs = v.select(col("vec_id"), col("qe"), col("n2"),
      expr(s"slice(qe, 1, $imiHalf)").as("impart0"),
      expr(s"slice(qe, ${imiHalf + 1}, $imiHalf)").as("impart1"))
    val m0 = kmeansModel(vs, "impart0", imiHalf, k, thr)
    val m1 = kmeansModel(vs, "impart1", imiHalf, k, thr)
    val cells = imiCells(v)
    val qs = vs.filter(expr(QuerySetSql))
    val s0 = centroidScores(qs, "impart0", m0)
      .select(col("vec_id").as("qid"), col("cid").as("cell1"), col("s").as("s1"))
    val s1 = centroidScores(qs, "impart1", m1)
      .select(col("vec_id").as("qid"), col("cid").as("cell2"), col("s").as("s2"))
    val pop = cells.groupBy(col("cell1"), col("cell2")).agg(count(lit(1)).as("cnt"))
    val own = cells.filter(expr(QuerySetSql))
      .select(col("vec_id").as("qid"), col("cell1"), col("cell2"))
    val kept = seqscanKeptCells(s0.join(s1, "qid"), pop, own, SeqScanCandBudget)
    val qfull = qs.select(col("vec_id").as("qid"),
      col("qe").as("qqe"), col("n2").as("n2_q"))
    cells.join(broadcast(kept.join(qfull, "qid")), Seq("cell1", "cell2"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("dot", dot("qqe", "qe"))
      .withColumnRenamed("n2", "n2_v")
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(cosCol.desc, col("vec_id"))).cast("int"))
  }

  /** Spark twin of `ranked`, sliced to the top `k` per query: scored
    * query×corpus, ranked via [[graft.plans.TopK.perKey]] bounded
    * heaps — ≤ k rows per qid per input partition cross the exchange,
    * where the former `row_number` window shuffled and sorted the
    * WHOLE corpus once per query id. Every consumer slices at
    * rk ≤ [[MrlTopK]], so nothing above k is ever needed. */
  private def bruteScored(v: DataFrame, k: Int = MrlTopK): DataFrame = {
    val qq = v.filter(expr(QuerySetSql))
      .select(col("vec_id").as("qid"), col("qe").as("qqe"), col("n2").as("n2_q"))
    val scored = v.join(broadcast(qq), col("vec_id") =!= col("qid"))
      .withColumn("dot", dot("qqe", "qe"))
      .withColumnRenamed("n2", "n2_v")
    graft.plans.TopK.perKey(scored, keyNames = Seq("qid"),
      order = Seq(cosCol.desc, col("vec_id").asc), k = k, rankName = "rk")
  }

  /** Matryoshka (MRL, Kusupati 2022) two-stage retrieval: MRL-trained
    * embeddings pack a usable coarse representation into their first
    * dimensions, so stage 1 ranks by the cosine of the [[MrlPrefixDims]]-dim
    * PREFIX (¼ of the multiply-adds and — with the prefix stored as
    * its own column, the production layout — ¼ of the scanned bytes)
    * and stage 2 reranks only the [[MrlShortK]]-deep shortlist with
    * exact full-dim cosine. Per-query work drops from n·d to
    * n·d/4 + shortK·d; the prefix pass composes with the IVF/IMI cell
    * dispatch above it exactly as the full-dim scan does. Recall is a
    * MEASURED property of how much signal the prefix carries
    * (ss_mrl_width_recall) — on these synthetic embeddings the prefix is
    * just the leading coordinates, so the recall gate is honest about
    * imperfection rather than vacuously 100%. */
  private val MrlPrefixDims = 16
  private val MrlShortK = 25
  private val MrlTopK = 5

  /** Stage-1 prefix shortlist + stage-2 exact rerank, ranked by full
    * cosine (`rk`); prefix rank kept as `prk` for audit. Parameterized
    * by prefix width `w` so the width-sweep op (ss_mrl_width_recall)
    * derives every curve point from the SAME two-stage definition. */
  private def mrlReranked(v: DataFrame, w: Int = MrlPrefixDims): DataFrame = {
    val vp = v
      .withColumn("qp", expr(s"slice(qe, 1, $w)"))
      .withColumn("n2p", dot("qp", "qp"))
    val qq = vp.filter(expr(QuerySetSql))
      .select(col("vec_id").as("qid"), col("qe").as("qqe"),
        col("n2").as("n2_q"), col("qp").as("qqp"), col("n2p").as("n2p_q"))
    val pcos = col("pdot").cast("double") /
      sqrt(col("n2p_q").cast("double") * col("n2p").cast("double"))
    // stage-1 shortlist via TopKPerKey bounded heaps: ≤ MrlShortK rows
    // per qid per input partition cross the exchange — the former
    // row_number window sorted the whole corpus once per query id
    val scored = vp.join(broadcast(qq), col("vec_id") =!= col("qid"))
      .withColumn("pdot", dot("qqp", "qp"))
    val short = graft.plans.TopK.perKey(scored, keyNames = Seq("qid"),
      order = Seq(pcos.desc, col("vec_id").asc), k = MrlShortK, rankName = "prk")
    // stage-2 exact rerank over the ≤ MrlShortK-deep shortlist: same
    // operator, k = MrlShortK keeps ALL shortlist ranks (callers slice)
    val full = short
      .withColumn("dot", dot("qqe", "qe"))
      .withColumnRenamed("n2", "n2_v")
    graft.plans.TopK.perKey(full, keyNames = Seq("qid"),
      order = Seq(cosCol.desc, col("vec_id").asc), k = MrlShortK, rankName = "rk")
  }

  /** The MRL stages (prefix norms → prefix dots → shortlist → exact
    * rerank) as a CTE fragment appended to [[bruteCtesSql]]'s
    * qv/norms/qq, ending in `reranked$sfx` — parameterized by prefix
    * width `w` (and a name suffix, so the width-sweep op can chain
    * three instances in one statement) so every consumer derives from
    * the SAME definitions and shortlist depth / width cannot drift. */
  private def mrlStagesSqlFor(w: Int, sfx: String): String =
    s"""pnorms$sfx AS (SELECT vec_id, CAST(SUM(qe * qe) AS BIGINT) AS n2p
       |           FROM qv WHERE dim < $w GROUP BY vec_id),
       |pdots$sfx AS (
       |  SELECT q.qid, v.vec_id, CAST(SUM(q.qqe * v.qe) AS BIGINT) AS pdot
       |  FROM qq q JOIN qv v ON v.dim = q.dim
       |  WHERE q.dim < $w
       |  GROUP BY q.qid, v.vec_id),
       |pscored$sfx AS (
       |  SELECT d.qid, d.vec_id, d.pdot, nq.n2p AS n2p_q, nv.n2p AS n2p_v
       |  FROM pdots$sfx d
       |  JOIN pnorms$sfx nq ON nq.vec_id = d.qid
       |  JOIN pnorms$sfx nv ON nv.vec_id = d.vec_id
       |  WHERE d.vec_id <> d.qid),
       |shortl$sfx AS (
       |  SELECT qid, vec_id,
       |         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY
       |           CAST(pdot AS DOUBLE)
       |             / sqrt(CAST(n2p_q AS DOUBLE) * CAST(n2p_v AS DOUBLE)) DESC,
       |           vec_id) AS prk
       |  FROM pscored$sfx),
       |fdots$sfx AS (
       |  SELECT c.qid, c.vec_id, CAST(SUM(a.qe * b.qe) AS BIGINT) AS dot
       |  FROM (SELECT qid, vec_id FROM shortl$sfx WHERE prk <= $MrlShortK) c
       |  JOIN qv a ON a.vec_id = c.qid
       |  JOIN qv b ON b.vec_id = c.vec_id AND b.dim = a.dim
       |  GROUP BY c.qid, c.vec_id),
       |fscored$sfx AS (
       |  SELECT d.qid AS query_id, d.vec_id AS neighbor_id, d.dot,
       |         nq.n2 AS n2_q, nv.n2 AS n2_v
       |  FROM fdots$sfx d
       |  JOIN norms nq ON nq.vec_id = d.qid
       |  JOIN norms nv ON nv.vec_id = d.vec_id),
       |reranked$sfx AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |             ORDER BY $cosExprSql DESC, neighbor_id) AS rk
       |  FROM fscored$sfx)""".stripMargin

  /** CTE chain extending [[bruteCtesSql]] (qv/norms/qq/…/ranked) with
    * the MRL stages at the default width, ending in `reranked`. */
  private val mrlCtesSql =
    s"""$bruteCtesSql,
       |${mrlStagesSqlFor(MrlPrefixDims, "")}""".stripMargin

  /** Shared verify tail: candidate pairs → exact integer dot + the
    * cos ≥ 0.35 cross-multiplication (400·dot² ≥ 49·n2a·n2b), as SQL
    * over a CTE chain ending in `cand` — ONE definition so the plain
    * and multi-probe variants can never drift apart. */
  /** Verified cosine near-dup pairs as a CTE chain ending in
    * `vpairs(vec_a, vec_b)` — the embedding-space dedup primitive,
    * shared with the dedup-pillar view dd_semantic_neardups. The
    * candidate geometry is derived from the corpus count `n`, matching
    * [[cosinePairs]]' scaledGeometry dispatch at any SF. */
  private[ops] def cosinePairsCtesSqlFor(n: Long): String =
    s"""qv AS ($qvSql),
       |norms AS ($normsSql),
       |${lshCandCtesSqlFor(scaledGeometry(n))},
       |pairdot AS MATERIALIZED (
       |  SELECT c.vec_a, c.vec_b, CAST(SUM(va.qe * vb.qe) AS BIGINT) AS dot
       |  FROM cand c
       |  JOIN qv va ON va.vec_id = c.vec_a
       |  JOIN qv vb ON vb.vec_id = c.vec_b AND vb.dim = va.dim
       |  GROUP BY c.vec_a, c.vec_b),
       |vpairs AS (
       |  SELECT p.vec_a, p.vec_b
       |  FROM pairdot p
       |  JOIN norms na ON na.vec_id = p.vec_a
       |  JOIN norms nb ON nb.vec_id = p.vec_b
       |  WHERE p.dot > 0 AND 400 * p.dot * p.dot >= 49 * na.n2 * nb.n2)""".stripMargin

  /** Spark twin of [[cosinePairsCtesSqlFor]]'s `vpairs`. */
  private[ops] def cosinePairs(s: SparkSession, dir: String): DataFrame = {
    val v = varr(s, dir).cache()
    fusedNeardupPairs(v, scaledGeometry(corpusCount(v)))
      .select(col("vec_a"), col("vec_b"))
  }

  // ---------------------------------------------------------------
  // SemDeDup: semantic dedup scoped to trained k-means clusters
  // (Abbas et al. 2023, arXiv:2303.09540)
  // ---------------------------------------------------------------

  /** Within-cluster cosine threshold for SemDeDup: cos ≥ 0.4, as the
    * cross-multiplied integer predicate 25·dot² ≥ 4·n2a·n2b (dot>0). */
  private val SemThreshSql = "d.dot > 0 AND 25 * d.dot * d.dot >= 4 * na.n2 * nb.n2"

  /** SemDeDup replay as a CTE chain (qv → norms → trained cells →
    * within-cell pairs → removal flags), ending in
    * `sdflag(vec_id, cell, n_dups, removed)`. Exact-pairwise is
    * confined to a cluster — the paper's own scale argument: k grows
    * with the corpus so |cell| stays bounded, and the pair join is an
    * equi-join on the learned cell, never a corpus cross join. */
  private[ops] def semdedupCtesSqlFor(n: Long): String =
    s"""qv AS ($qvSql),
       |norms AS ($normsSql),
       |${kmeansCellsCtesSqlFor(n)},
       |sdpairs AS (
       |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.cell
       |  FROM cells a JOIN cells b ON b.cell = a.cell AND b.vec_id > a.vec_id),
       |sddot AS (
       |  SELECT p.vec_a, p.vec_b, p.cell, CAST(SUM(va.qe * vb.qe) AS BIGINT) AS dot
       |  FROM sdpairs p
       |  JOIN qv va ON va.vec_id = p.vec_a
       |  JOIN qv vb ON vb.vec_id = p.vec_b AND vb.dim = va.dim
       |  GROUP BY p.vec_a, p.vec_b, p.cell),
       |sdup AS (
       |  SELECT d.vec_a, d.vec_b, d.cell
       |  FROM sddot d
       |  JOIN norms na ON na.vec_id = d.vec_a
       |  JOIN norms nb ON nb.vec_id = d.vec_b
       |  WHERE $SemThreshSql),
       |sdcnt AS (SELECT vec_id, COUNT(*) AS n_dups FROM (
       |            SELECT vec_a AS vec_id FROM sdup
       |            UNION ALL SELECT vec_b FROM sdup) GROUP BY vec_id),
       |sdrm AS (SELECT DISTINCT vec_b AS vec_id FROM sdup),
       |sdflag AS (
       |  SELECT c.vec_id, c.cell,
       |         CAST(coalesce(n.n_dups, 0) AS BIGINT) AS n_dups,
       |         CAST(CASE WHEN r.vec_id IS NULL THEN 0 ELSE 1 END AS INT) AS removed
       |  FROM cells c
       |  LEFT JOIN sdcnt n ON n.vec_id = c.vec_id
       |  LEFT JOIN sdrm r ON r.vec_id = c.vec_id)""".stripMargin

  /** Spark twin of [[semdedupCtesSqlFor]]'s `sdflag`: per vector, its
    * learned cluster, its duplicate degree, and the keep-min-id
    * removal decision (the paper keeps one representative per
    * duplicate pair; min-id is the deterministic choice, matching
    * dd_kept_corpus). */
  private[ops] def semdedupFrame(s: SparkSession, dir: String): DataFrame = {
    val v = varr(s, dir).cache()
    v.count() // shared by training rounds and the pair scan
    val cells = trainedCells(v)
    val a = cells.select(col("vec_id").as("vec_a"), col("cell"),
      col("qe").as("qe_a"), col("n2").as("n2_a"))
    val b = cells.select(col("vec_id").as("vec_b"), col("cell"),
      col("qe").as("qe_b"), col("n2").as("n2_b"))
    val dup = a.join(b, Seq("cell"))
      .filter(col("vec_b") > col("vec_a"))
      .withColumn("dot", dot("qe_a", "qe_b"))
      .filter(col("dot") > 0 &&
        lit(25) * col("dot") * col("dot") >= lit(4) * col("n2_a") * col("n2_b"))
      .select(col("vec_a"), col("vec_b"))
      .cache() // pair ids only; consumed by deg (twice) and rm
    val deg = dup.select(col("vec_a").as("vec_id"))
      .unionAll(dup.select(col("vec_b").as("vec_id")))
      .groupBy(col("vec_id")).agg(count(lit(1)).cast("long").as("n_dups"))
    val rm = dup.select(col("vec_b").as("vec_id")).distinct()
      .withColumn("rmf", lit(1))
    cells.select(col("vec_id"), col("cell"))
      .join(deg, Seq("vec_id"), "left")
      .join(rm, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"),
        coalesce(col("n_dups"), lit(0L)).as("n_dups"),
        coalesce(col("rmf"), lit(0)).cast("int").as("removed"))
  }

  private def neardupVerifySqlFor(candCtes: String) =
    s"""WITH qv AS ($qvSql),
       |norms AS ($normsSql),
       |$candCtes,
       |pairdot AS MATERIALIZED (
       |  SELECT c.vec_a, c.vec_b, CAST(SUM(va.qe * vb.qe) AS BIGINT) AS dot
       |  FROM cand c
       |  JOIN qv va ON va.vec_id = c.vec_a
       |  JOIN qv vb ON vb.vec_id = c.vec_b AND vb.dim = va.dim
       |  GROUP BY c.vec_a, c.vec_b)
       |SELECT p.vec_a, p.vec_b, p.dot, na.n2 AS n2_a, nb.n2 AS n2_b
       |FROM pairdot p
       |JOIN norms na ON na.vec_id = p.vec_a
       |JOIN norms nb ON nb.vec_id = p.vec_b
       |WHERE p.dot > 0 AND 400 * p.dot * p.dot >= 49 * na.n2 * nb.n2
       |ORDER BY p.vec_a, p.vec_b""".stripMargin

  /** Verify tail over payload-bearing pair rows (qe_a/n2_a/qe_b/n2_b
    * already attached): dot → threshold → thin columns → distinct.
    * Filtering BEFORE the distinct shrinks its exchange by the
    * pass-rate; the (dot, n2) values are deterministic per pair, so
    * de-duplicating the multi-band occurrences after scoring is
    * value-identical to the oracle's candidates-first formulation. */
  private def fusedVerifyTail(pairs: DataFrame): DataFrame =
    pairs
      .withColumn("dot", dot("qe_a", "qe_b"))
      .filter(col("dot") > 0 &&
        lit(400) * col("dot") * col("dot") >= lit(49) * col("n2_a") * col("n2_b"))
      .select(col("vec_a"), col("vec_b"), col("dot"), col("n2_a"), col("n2_b"))
      .distinct()
      .orderBy(col("vec_a"), col("vec_b"))

  /** Sign-LSH near-dup pairs with the verify FUSED into the bucket
    * join: bucket rows carry (qe, n2), so each pair is scored by one
    * codegen'd dot right where it is discovered. The candidates-first
    * formulation (join the [[lshCandidates]] output back against the
    * corpus on each pair side — the shape the oracle SQL keeps) shuffles
    * every candidate row twice more with a 0.5 KB array attached —
    * ~20× the exchanged bytes at the measured sf10 pair volumes. The
    * oracle keeps the candidates-first CTE chain; values are
    * identical, which the EXACT gate proves. */
  private[ops] def fusedNeardupPairs(v: DataFrame, g: SignLshGeometry): DataFrame = {
    val kept = keptBucketsWith(v, g)
    val a = kept.select(col("vec_id").as("vec_a"), col("qe").as("qe_a"),
      col("n2").as("n2_a"), col("band"), col("bucket"))
    val b = kept.select(col("vec_id").as("vec_b"), col("qe").as("qe_b"),
      col("n2").as("n2_b"), col("band"), col("bucket"))
    fusedVerifyTail(
      a.join(b, Seq("band", "bucket")).filter(col("vec_a") < col("vec_b")))
  }

  /** Multi-probe twin of [[fusedNeardupPairs]] — probe expansion and
    * occupied-cell prefilter as in [[lshMultiprobeCandidates]], with
    * the payload riding the probe rows (the prefilter drops empty-cell
    * probes MAP-SIDE, before their payload ever reaches an exchange). */
  private[ops] def fusedMultiprobeNeardupPairs(v: DataFrame, g: SignLshGeometry,
      prefilter: Option[Boolean] = None): DataFrame = {
    val kept = keptBucketsWith(v, g)
    val probes = kept
      .select(col("vec_id"), col("qe"), col("n2"), col("band"),
        col("bucket").as("probe"))
      .union(kept.select(col("vec_id"), col("qe"), col("n2"), col("band"),
        explode(array((0 until g.planesPerBand).map(j =>
          col("bucket").bitwiseXOR(lit(1L << j))): _*)).as("probe")))
    val a0 = probes.select(col("vec_id").as("vec_a"), col("qe").as("qe_a"),
      col("n2").as("n2_a"), col("band"), col("probe").as("bucket"))
    val a =
      if (!prefilter.getOrElse((1L << g.planesPerBand) > 1024)) a0
      else {
        val occupied = kept.select(col("band"), col("bucket")).distinct()
        a0.join(broadcast(occupied), Seq("band", "bucket"), "leftsemi")
      }
    val b = kept.select(col("vec_id").as("vec_b"), col("qe").as("qe_b"),
      col("n2").as("n2_b"), col("band"), col("bucket"))
    fusedVerifyTail(
      a.join(b, Seq("band", "bucket")).filter(col("vec_a") < col("vec_b")))
  }

  /** SQ8 scalar quantizer (FAISS ScalarQuantizer QT_8bit shape):
    * trained parameters are the per-dimension (min, max) of the
    * quantized corpus — dims pairs of longs, model-sized driver state
    * exactly like the k-means centroids. */
  private def sq8Params(v: DataFrame): (Array[Long], Array[Long]) =
    memoized("sq8", v)(sq8ParamsUncached(v))

  private def sq8ParamsUncached(v: DataFrame): (Array[Long], Array[Long]) = {
    val dims = DefaultGeometry.dims
    val mn = new Array[Long](dims)
    val mx = new Array[Long](dims)
    v.select(posexplode(col("qe")).as(Seq("dim", "x")))
      .groupBy(col("dim"))
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .collect() // dims aggregated rows: the quantizer model, not data
      .foreach { r =>
        mn(r.getInt(0)) = r.getLong(1); mx(r.getInt(0)) = r.getLong(2)
      }
    (mn, mx)
  }

  /** Map-side SQ8 encode+decode in one step: each coordinate snapped
    * to the floor of its 255-step per-dimension lattice cell, in a
    * ×255 integer scale so everything stays exact:
    * r_d = 255·mn_d + ((x − mn_d)·255 div (mx_d − mn_d))·(mx_d − mn_d).
    * (x − mn_d) ≥ 0 by construction, so Spark's truncating `div` and
    * DuckDB's floor `//` agree. The per-dim constants ride along as
    * literal arrays (3·dims longs), like the LSH sign planes; in a
    * stored deployment the 1-byte codes would be written once and this
    * decode would run over codes, never raw vectors. */
  private def sq8ReconCol(mn: Array[Long], mx: Array[Long]): Column = {
    val aA = mn.map(m => s"${255 * m}L").mkString("array(", ", ", ")")
    val mnA = mn.mkString("array(", "L, ", "L)")
    val sA = mn.indices.map(i => s"${mx(i) - mn(i)}L").mkString("array(", ", ", ")")
    expr(
      s"""transform(qe, (x, i) -> CASE WHEN element_at($sA, i + 1) > 0
         |  THEN element_at($aA, i + 1)
         |       + ((x - element_at($mnA, i + 1)) * 255 div element_at($sA, i + 1))
         |         * element_at($sA, i + 1)
         |  ELSE element_at($aA, i + 1) END)""".stripMargin)
  }

  /** Shared SQ8 ranking plan: reconstruct, broadcast the query set,
    * asymmetric integer scoring, per-query top-3. ONE definition so
    * ss_sq8_topk serves exactly the index ss_sq8_recall measures. */
  private def sq8Top3(v: DataFrame, qq: DataFrame,
      mn: Array[Long], mx: Array[Long]): DataFrame =
    v.withColumn("r", sq8ReconCol(mn, mx))
      .join(broadcast(qq), col("vec_id") =!= col("qid"))
      .withColumn("score", dot("qqe", "r"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("qid"))
          .orderBy(col("score").desc, col("vec_id"))).cast("int"))
      .filter(col("rk") <= 3)

  /** Oracle replay of the SQ8 pipeline: train (per-dim min/max),
    * decode, asymmetric inner-product scoring, ranking — CTE chain
    * ending in `sq_ranked(qid, vec_id, score, rk)`. */
  private val sq8CtesSql =
    s"""qv AS ($qvSql),
       |sq_st AS (SELECT dim, CAST(MIN(qe) AS BIGINT) AS mn, CAST(MAX(qe) AS BIGINT) AS mx
       |          FROM qv GROUP BY dim),
       |sq_rec AS (
       |  SELECT v.vec_id, v.dim,
       |         CASE WHEN st.mx > st.mn
       |              THEN 255 * st.mn
       |                   + ((v.qe - st.mn) * 255 // (st.mx - st.mn)) * (st.mx - st.mn)
       |              ELSE 255 * st.mn END AS r
       |  FROM qv v JOIN sq_st st USING (dim)),
       |sqq AS (SELECT vec_id AS qid, dim, qe FROM qv WHERE $QuerySetSql),
       |sq_sc AS (
       |  SELECT q.qid, r.vec_id, CAST(SUM(q.qe * r.r) AS BIGINT) AS score
       |  FROM sqq q JOIN sq_rec r ON r.dim = q.dim AND r.vec_id <> q.qid
       |  GROUP BY q.qid, r.vec_id),
       |sq_ranked AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
       |             ORDER BY score DESC, vec_id) AS rk
       |  FROM sq_sc)""".stripMargin

  /** Binary (sign) quantization: one bit per dimension (qe > 0),
    * packed into two 32-bit halves carried as BIGINTs — 16 bytes per
    * 64-dim vector, the 32× compression stage modern vector stores
    * run as their first-pass filter (FAISS IndexBinaryFlat shape).
    * Two halves instead of one 64-bit word because bit 63 of a signed
    * BIGINT can't be built by summing powers of two in either engine;
    * the split also mirrors mm_phash_neardups' Hamming-LSH key, so a
    * banded variant gets its pigeonhole halves for free. */
  private def bqHalfCol(lo: Int): Column = expr(
    s"""CAST(aggregate(sequence($lo, ${lo + 31}), CAST(0 AS BIGINT),
       |  (acc, i) -> acc + CASE WHEN element_at(qe, i + 1) > 0
       |    THEN shiftleft(CAST(1 AS BIGINT), i - $lo)
       |    ELSE CAST(0 AS BIGINT) END) AS BIGINT)""".stripMargin)

  private[ops] def bqFrame(v: DataFrame): DataFrame =
    v.select(col("vec_id"),
      bqHalfCol(0).as("h1"), bqHalfCol(32).as("h2"))

  /** Shared BQ ranking plan: pack, broadcast the query signatures,
    * Hamming rank (2 xor + 2 popcount per candidate). ONE definition
    * so ss_bq_topk serves exactly the index ss_bq_recall and
    * ss_bq_rerank_recall measure; callers filter `rk` to their depth
    * (3 to serve, [[RerankShortlist]] for the rescoring stage). */
  private def bqRanked(bq: DataFrame, qq: DataFrame): DataFrame =
    bq.join(broadcast(qq), col("vec_id") =!= col("qid"))
      .withColumn("hamming",
        expr("CAST(bit_count(h1 ^ q1) + bit_count(h2 ^ q2) AS BIGINT)"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("qid"))
          .orderBy(col("hamming"), col("vec_id"))).cast("int"))

  private def bqTop3(bq: DataFrame, qq: DataFrame): DataFrame =
    bqRanked(bq, qq).filter(col("rk") <= 3)

  /** Oracle replay of the BQ pipeline: pack (sum of powers of two per
    * half), xor/popcount Hamming, ranking — ends in
    * `bq_ranked(qid, vec_id, hamming, rk)`. */
  private val bqCtesSql =
    s"""qv AS ($qvSql),
       |bq AS (SELECT vec_id,
       |         CAST(SUM(CASE WHEN qe > 0 AND dim < 32
       |                       THEN (CAST(1 AS BIGINT) << dim) ELSE 0 END)
       |           AS BIGINT) AS h1,
       |         CAST(SUM(CASE WHEN qe > 0 AND dim >= 32
       |                       THEN (CAST(1 AS BIGINT) << (dim - 32)) ELSE 0 END)
       |           AS BIGINT) AS h2
       |       FROM qv GROUP BY vec_id),
       |bqq AS (SELECT vec_id AS qid, h1 AS q1, h2 AS q2 FROM bq
       |        WHERE $QuerySetSql),
       |bq_sc AS (
       |  SELECT q.qid, b.vec_id,
       |         CAST(bit_count(xor(b.h1, q.q1)) + bit_count(xor(b.h2, q.q2))
       |           AS BIGINT) AS hamming
       |  FROM bq b JOIN bqq q ON b.vec_id <> q.qid),
       |bq_ranked AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
       |             ORDER BY hamming, vec_id) AS rk
       |  FROM bq_sc)""".stripMargin

  val specs: Seq[QuerySpec] = Seq(

    // ---- exact brute-force top-5 for a bounded query set: broadcast
    // the 10 query vectors past every corpus row, one dot each ----
    sql("ss_brute_topk",
      s"""WITH $bruteCtesSql
         |SELECT query_id, CAST(rk AS INT) AS rk, neighbor_id, dot, n2_q, n2_v
         |FROM ranked WHERE rk <= 5 ORDER BY query_id, rk""") { (s, dir) =>
      bruteScored(varr(s, dir))
        .filter(col("rk") <= 5)
        .select(col("qid").as("query_id"), col("rk"),
          col("vec_id").as("neighbor_id"), col("dot"), col("n2_q"), col("n2_v"))
        .orderBy(col("query_id"), col("rk"))
    },

    // ---- HARD-NEGATIVE MINING (ANCE, Xiong 2020): for each query,
    // the top-5 highest-cosine corpus vectors with a DIFFERENT label —
    // the contrastive-training pairs an embedding-model pipeline
    // exports (easy random negatives teach nothing; the negatives that
    // move the loss are the ones the current space already confuses
    // with the query). Label plays the "positive class" role here the
    // way it plays the IVF-cell role in ss_ivf_topk — same fixture,
    // opposite predicate. Scale shape: the query set is the broadcast
    // side (bounded, same contract as ss_brute_topk), the corpus pays
    // one dot per (query, candidate), and TopKPerKey's bounded heaps
    // carry ≤ 5 rows per qid per partition across the exchange. ----
    sql("ss_hard_negatives",
      s"""WITH qv AS ($qvSql),
         |norms AS ($normsSql),
         |qq AS (SELECT vec_id AS qid, label AS qlabel FROM embeddings
         |       WHERE $QuerySetSql),
         |negc AS (SELECT q.qid, e.vec_id, e.label
         |         FROM qq q JOIN embeddings e ON e.label <> q.qlabel),
         |dots AS (SELECT n.qid, n.vec_id, n.label,
         |                CAST(SUM(a.qe * b.qe) AS BIGINT) AS dot
         |         FROM negc n
         |         JOIN qv a ON a.vec_id = n.qid
         |         JOIN qv b ON b.vec_id = n.vec_id AND b.dim = a.dim
         |         GROUP BY n.qid, n.vec_id, n.label),
         |scored AS (SELECT d.qid AS query_id, d.vec_id AS neighbor_id,
         |                  d.label, d.dot, nq.n2 AS n2_q, nv.n2 AS n2_v
         |           FROM dots d
         |           JOIN norms nq ON nq.vec_id = d.qid
         |           JOIN norms nv ON nv.vec_id = d.vec_id),
         |hneg AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |           ORDER BY $cosExprSql DESC, neighbor_id) AS rk
         |         FROM scored)
         |SELECT query_id, CAST(rk AS INT) AS rk, neighbor_id,
         |       CAST(label AS INT) AS label, dot, n2_q, n2_v
         |FROM hneg WHERE rk <= 5 ORDER BY query_id, rk""") { (s, dir) =>
      val v = varr(s, dir)
      val qq = v.filter(expr(QuerySetSql))
        .select(col("vec_id").as("qid"), col("label").as("qlabel"),
          col("qe").as("qqe"), col("n2").as("n2_q"))
      val scored = v.join(broadcast(qq), col("label") =!= col("qlabel"))
        .withColumn("dot", dot("qqe", "qe"))
        .withColumnRenamed("n2", "n2_v")
      graft.plans.TopK.perKey(scored, keyNames = Seq("qid"),
        order = Seq(cosCol.desc, col("vec_id").asc), k = 5, rankName = "rk")
        .select(col("qid").as("query_id"), col("rk"),
          col("vec_id").as("neighbor_id"), col("label").cast("int").as("label"),
          col("dot"), col("n2_q"), col("n2_v"))
        .orderBy(col("query_id"), col("rk"))
    },

    // ---- FILTERED vector search (the pre-filter vs post-filter
    // strategy question every production vector store answers —
    // Qdrant/Vespa/Milvus expose it as a query-planner choice): a
    // metadata predicate (label = query's label) constrains the
    // neighbor set. PRE-filter (the correct plan when the predicate
    // is selective) scores ONLY in-filter vectors — exact by
    // construction; POST-filter runs the unfiltered top-S shortlist
    // (S = RerankShortlist, the depth the rerank family already
    // serves) and filters afterwards — cheap, but a ~1/|labels|
    // selectivity keeps only ~S/|labels| shortlist survivors, so it
    // structurally misses most of the true top-5. Output is the
    // pre-filter ground truth with `in_post` marking which rows the
    // post-filter strategy would also have served — the per-row form
    // of the recall@5 a deployment reads before picking a plan.
    // Scale shape: query side broadcast (bounded ≤ 10 by the
    // QuerySetSql contract), the filtered scan pays one dot per
    // (query, in-filter vector) — selectivity × the brute cost —
    // and both rankings go through TopKPerKey bounded heaps; the
    // post list is ≤ S·|queries| rows, broadcast into the marker
    // join. ----
    sql("ss_filtered_topk",
      s"""WITH $bruteCtesSql,
         |fq AS (SELECT vec_id AS qid, label AS qlabel FROM embeddings
         |       WHERE $QuerySetSql),
         |fc AS (SELECT q.qid, e.vec_id FROM fq q JOIN embeddings e
         |       ON e.label = q.qlabel AND e.vec_id <> q.qid),
         |fdots AS (SELECT f.qid, f.vec_id,
         |                 CAST(SUM(a.qe * b.qe) AS BIGINT) AS dot
         |          FROM fc f
         |          JOIN qv a ON a.vec_id = f.qid
         |          JOIN qv b ON b.vec_id = f.vec_id AND b.dim = a.dim
         |          GROUP BY f.qid, f.vec_id),
         |fsc AS (SELECT d.qid AS query_id, d.vec_id AS neighbor_id, d.dot,
         |               nq.n2 AS n2_q, nv.n2 AS n2_v
         |        FROM fdots d
         |        JOIN norms nq ON nq.vec_id = d.qid
         |        JOIN norms nv ON nv.vec_id = d.vec_id),
         |pre AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |          ORDER BY $cosExprSql DESC, neighbor_id) AS rk
         |        FROM fsc),
         |post AS (SELECT r.query_id, r.neighbor_id FROM ranked r
         |         JOIN fq q ON q.qid = r.query_id
         |         JOIN embeddings en ON en.vec_id = r.neighbor_id
         |         WHERE r.rk <= $RerankShortlist AND en.label = q.qlabel)
         |SELECT p.query_id, CAST(p.rk AS INT) AS rk, p.neighbor_id,
         |       p.dot, p.n2_q, p.n2_v,
         |       CAST(CASE WHEN po.neighbor_id IS NULL THEN 0 ELSE 1 END AS INT)
         |         AS in_post
         |FROM pre p
         |LEFT JOIN post po ON po.query_id = p.query_id
         |  AND po.neighbor_id = p.neighbor_id
         |WHERE p.rk <= 5 ORDER BY p.query_id, p.rk""") { (s, dir) =>
      val v = varr(s, dir)
      val qq = v.filter(expr(QuerySetSql))
        .select(col("vec_id").as("qid"), col("label").as("qlabel"),
          col("qe").as("qqe"), col("n2").as("n2_q"))
      val fscored = v.join(broadcast(qq),
          col("label") === col("qlabel") && col("vec_id") =!= col("qid"))
        .withColumn("dot", dot("qqe", "qe"))
        .withColumnRenamed("n2", "n2_v")
      val pre = graft.plans.TopK.perKey(fscored, keyNames = Seq("qid"),
        order = Seq(cosCol.desc, col("vec_id").asc), k = 5, rankName = "rk")
      val post = bruteScored(v, k = RerankShortlist)
        .join(broadcast(qq.select(col("qid"), col("qlabel").as("ql"))), Seq("qid"))
        .filter(col("label") === col("ql"))
        .select(col("qid"), col("vec_id"), lit(1).as("in_post_hit"))
      pre.join(broadcast(post), Seq("qid", "vec_id"), "left")
        .select(col("qid").as("query_id"), col("rk"),
          col("vec_id").as("neighbor_id"), col("dot"), col("n2_q"), col("n2_v"),
          coalesce(col("in_post_hit"), lit(0)).cast("int").as("in_post"))
        .orderBy(col("query_id"), col("rk"))
    },

    // ---- Matryoshka prefix-dimension two-stage retrieval: rank by
    // 16-dim prefix cosine, exact-rerank the top-25 shortlist (see
    // mrlReranked's scaladoc for the cost shape) ----
    sql("ss_mrl_topk",
      s"""WITH $mrlCtesSql
         |SELECT query_id, CAST(rk AS INT) AS rk, neighbor_id, dot, n2_q, n2_v
         |FROM reranked WHERE rk <= $MrlTopK ORDER BY query_id, rk""") { (s, dir) =>
      mrlReranked(varr(s, dir))
        .filter(col("rk") <= MrlTopK)
        .select(col("qid").as("query_id"), col("rk"),
          col("vec_id").as("neighbor_id"), col("dot"), col("n2_q"), col("n2_v"))
        .orderBy(col("query_id"), col("rk"))
    },

    // ---- MRL recall CURVE: recall@5 of the prefix-shortlisted rerank
    // at prefix widths 16/32/48 — the tunable accuracy/cost trade a
    // deployment actually reads (each width w costs n·w per query at
    // stage 1; Kusupati 2022's whole point is that the width is the
    // knob). Supersedes the former single-point ss_mrl_recall: the
    // w = 16 row IS that measurement (SimilaritySpec pins it), so the
    // single-point query is retired rather than kept as a redundant
    // bench line. Every width runs through the ONE parameterized
    // mrlStagesSqlFor/mrlReranked definition — the sweep cannot drift
    // from the serving op. Output is 3 rows total (one per width):
    // driver-side UNION of three bounded aggregates, nothing
    // corpus-sized leaves the executors. ----
    sql("ss_mrl_width_recall",
      s"""WITH $bruteCtesSql,
         |${mrlStagesSqlFor(16, "_16")},
         |${mrlStagesSqlFor(32, "_32")},
         |${mrlStagesSqlFor(48, "_48")},
         |truth AS (SELECT query_id, neighbor_id FROM ranked WHERE rk <= $MrlTopK)
         |SELECT * FROM (
         |  ${Seq(16, 32, 48).map(w =>
            s"""SELECT CAST($w AS INT) AS prefix_dims,
               |       CAST(COUNT(*) AS BIGINT) AS n_truth,
               |       CAST(COUNT(g.hit) AS BIGINT) AS n_recalled,
               |       CAST(COUNT(g.hit) * 1000000 // GREATEST(COUNT(*), 1) AS BIGINT)
               |         AS recall_ppm
               |FROM truth t LEFT JOIN
               |  (SELECT query_id, neighbor_id, 1 AS hit
               |   FROM reranked_$w WHERE rk <= $MrlTopK) g
               |  ON g.query_id = t.query_id AND g.neighbor_id = t.neighbor_id"""
              .stripMargin).mkString("\nUNION ALL\n")})
         |ORDER BY prefix_dims""") { (s, dir) =>
      val v = varr(s, dir).cache() // truth + all three width sweeps
      val truth = bruteScored(v).filter(col("rk") <= MrlTopK)
        .select(col("qid"), col("vec_id"))
      Seq(16, 32, 48).map { w =>
        val got = mrlReranked(v, w).filter(col("rk") <= MrlTopK)
          .select(col("qid"), col("vec_id"), lit(1).as("hit"))
        truth.join(got, Seq("qid", "vec_id"), "left")
          .agg(count(lit(1)).cast("long").as("n_truth"),
            count(col("hit")).cast("long").as("n_recalled"),
            expr("CAST(count(hit) * 1000000 div greatest(count(1), 1) AS BIGINT)")
              .as("recall_ppm"))
          .select(lit(w).cast("int").as("prefix_dims"),
            col("n_truth"), col("n_recalled"), col("recall_ppm"))
      }.reduce(_.unionAll(_)).orderBy(col("prefix_dims"))
    },

    // ---- IVF × MRL composition — the production two-stage layout in
    // one plan: the coarse cell dispatch bounds WHICH vectors are
    // touched (ss_ivf_topk's join on label), the MRL prefix bounds HOW
    // MUCH of each is read (16 of 64 dims), and only the 25-deep
    // shortlist pays a full-dim exact rerank. Per query the cost drops
    // from |cell|·d (ss_ivf_topk) to |cell|·d/4 + shortK·d — the two
    // levers multiply because they cut different factors. Same top-3
    // contract as ss_ivf_topk, so the two are directly comparable. ----
    sql("ss_mrl_ivf_topk",
      s"""WITH qv AS ($qvSql),
         |norms AS ($normsSql),
         |pnorms AS (SELECT vec_id, CAST(SUM(qe * qe) AS BIGINT) AS n2p
         |           FROM qv WHERE dim < $MrlPrefixDims GROUP BY vec_id),
         |qq AS (SELECT vec_id AS qid, label FROM embeddings WHERE $QuerySetSql),
         |cp AS (
         |  SELECT q.qid, e.vec_id, e.label
         |  FROM qq q JOIN embeddings e ON e.label = q.label AND e.vec_id <> q.qid),
         |pdots AS (
         |  SELECT cp.qid, cp.vec_id, cp.label,
         |         CAST(SUM(a.qe * b.qe) AS BIGINT) AS pdot
         |  FROM cp
         |  JOIN qv a ON a.vec_id = cp.qid AND a.dim < $MrlPrefixDims
         |  JOIN qv b ON b.vec_id = cp.vec_id AND b.dim = a.dim
         |  GROUP BY cp.qid, cp.vec_id, cp.label),
         |pscored AS (
         |  SELECT d.qid, d.vec_id, d.label, d.pdot,
         |         nq.n2p AS n2p_q, nv.n2p AS n2p_v
         |  FROM pdots d
         |  JOIN pnorms nq ON nq.vec_id = d.qid
         |  JOIN pnorms nv ON nv.vec_id = d.vec_id),
         |shortl AS (
         |  SELECT qid, vec_id, label,
         |         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY
         |           CAST(pdot AS DOUBLE)
         |             / sqrt(CAST(n2p_q AS DOUBLE) * CAST(n2p_v AS DOUBLE)) DESC,
         |           vec_id) AS prk
         |  FROM pscored),
         |fdots AS (
         |  SELECT c.qid, c.vec_id, c.label,
         |         CAST(SUM(a.qe * b.qe) AS BIGINT) AS dot
         |  FROM (SELECT qid, vec_id, label FROM shortl WHERE prk <= $MrlShortK) c
         |  JOIN qv a ON a.vec_id = c.qid
         |  JOIN qv b ON b.vec_id = c.vec_id AND b.dim = a.dim
         |  GROUP BY c.qid, c.vec_id, c.label),
         |fscored AS (
         |  SELECT d.qid AS query_id, d.vec_id AS neighbor_id, d.label, d.dot,
         |         nq.n2 AS n2_q, nv.n2 AS n2_v
         |  FROM fdots d
         |  JOIN norms nq ON nq.vec_id = d.qid
         |  JOIN norms nv ON nv.vec_id = d.vec_id),
         |ranked2 AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |             ORDER BY $cosExprSql DESC, neighbor_id) AS rk
         |  FROM fscored)
         |SELECT query_id, CAST(rk AS INT) AS rk, neighbor_id, label, dot
         |FROM ranked2 WHERE rk <= 3 ORDER BY query_id, rk""") { (s, dir) =>
      val v = varr(s, dir)
      val vp = v
        .withColumn("qp", expr(s"slice(qe, 1, $MrlPrefixDims)"))
        .withColumn("n2p", dot("qp", "qp"))
      val qq = vp.filter(expr(QuerySetSql))
        .select(col("vec_id").as("qid"), col("label"), col("qe").as("qqe"),
          col("n2").as("n2_q"), col("qp").as("qqp"), col("n2p").as("n2p_q"))
      val pcos = col("pdot").cast("double") /
        sqrt(col("n2p_q").cast("double") * col("n2p").cast("double"))
      // both rank stages via TopKPerKey bounded heaps (see mrlReranked):
      // the cell dispatch bounds the candidate set, the heaps bound what
      // crosses the exchange — ≤ MrlShortK (then ≤ 3) rows per qid
      val cand = vp.join(broadcast(qq), Seq("label"))
        .filter(col("vec_id") =!= col("qid"))
        .withColumn("pdot", dot("qqp", "qp"))
      val short = graft.plans.TopK.perKey(cand, keyNames = Seq("qid"),
        order = Seq(pcos.desc, col("vec_id").asc), k = MrlShortK, rankName = "prk")
      val full = short
        .withColumn("dot", dot("qqe", "qe"))
        .withColumnRenamed("n2", "n2_v")
      graft.plans.TopK.perKey(full, keyNames = Seq("qid"),
        order = Seq(cosCol.desc, col("vec_id").asc), k = 3, rankName = "rk")
        .select(col("qid").as("query_id"), col("rk"),
          col("vec_id").as("neighbor_id"), col("label"), col("dot"))
        .orderBy(col("query_id"), col("rk"))
    },

    // ---- sign-LSH near-duplicate pairs (cos ≥ 0.35): projections and
    // band buckets map-side, candidates meet only inside a (band,
    // bucket) cell, dots verified per candidate pair ----
    sqlN("ss_lsh_neardups")(n =>
      neardupVerifySqlFor(lshCandCtesSqlFor(scaledGeometry(n)))) { (s, dir) =>
      val v = varr(s, dir).cache() // bucket side + both pair sides
      fusedNeardupPairs(v, scaledGeometry(corpusCount(v)))
    },

    // ---- multi-probe sign-LSH (cos ≥ 0.35): each vector also probes
    // its planesPerBand one-bit-flip neighbor buckets, recovering
    // pairs that straddle one hyperplane — the production lever for
    // recall without more bands/tables. Candidate superset of
    // ss_lsh_neardups (asserted in SimilaritySpec); same verify. ----
    sqlN("ss_lsh_multiprobe")(n =>
      neardupVerifySqlFor(lshMultiprobeCandCtesSqlFor(scaledMultiprobeGeometry(n)))) { (s, dir) =>
      val v = varr(s, dir).cache() // bucket side + both pair sides
      fusedMultiprobeNeardupPairs(v, scaledMultiprobeGeometry(corpusCount(v)))
    },

    // ---- IVF cell-probe top-3: `label` is the coarse cell id ----
    sql("ss_ivf_topk",
      s"""WITH qv AS ($qvSql),
         |norms AS ($normsSql),
         |qq AS (SELECT vec_id AS qid, label FROM embeddings WHERE $QuerySetSql),
         |cp AS (
         |  SELECT q.qid, e.vec_id, e.label
         |  FROM qq q JOIN embeddings e ON e.label = q.label AND e.vec_id <> q.qid),
         |dots AS (
         |  SELECT cp.qid, cp.vec_id, cp.label, CAST(SUM(a.qe * b.qe) AS BIGINT) AS dot
         |  FROM cp
         |  JOIN qv a ON a.vec_id = cp.qid
         |  JOIN qv b ON b.vec_id = cp.vec_id AND b.dim = a.dim
         |  GROUP BY cp.qid, cp.vec_id, cp.label),
         |scored AS (
         |  SELECT d.qid AS query_id, d.vec_id AS neighbor_id, d.label, d.dot,
         |         nq.n2 AS n2_q, nv.n2 AS n2_v
         |  FROM dots d
         |  JOIN norms nq ON nq.vec_id = d.qid
         |  JOIN norms nv ON nv.vec_id = d.vec_id),
         |ranked AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |             ORDER BY $cosExprSql DESC, neighbor_id) AS rk
         |  FROM scored)
         |SELECT query_id, CAST(rk AS INT) AS rk, neighbor_id, label, dot
         |FROM ranked WHERE rk <= 3 ORDER BY query_id, rk""") { (s, dir) =>
      val v = varr(s, dir)
      val qq = v.filter(expr(QuerySetSql))
        .select(col("vec_id").as("qid"), col("label"),
          col("qe").as("qqe"), col("n2").as("n2_q"))
      v.join(broadcast(qq), Seq("label"))
        .filter(col("vec_id") =!= col("qid"))
        .withColumn("dot", dot("qqe", "qe"))
        .withColumnRenamed("n2", "n2_v")
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("qid")).orderBy(cosCol.desc, col("vec_id"))).cast("int"))
        .filter(col("rk") <= 3)
        .select(col("qid").as("query_id"), col("rk"),
          col("vec_id").as("neighbor_id"), col("label"), col("dot"))
        .orderBy(col("query_id"), col("rk"))
    },

    // ---- trained-IVF cell-probe top-3: the coarse quantizer is now
    // LEARNED from the corpus (k-means: deterministic first-k init,
    // 2 Lloyd rounds, floor-division integer means — bit-replayable in
    // the oracle), instead of the given `label` column. The cell-probe
    // join itself is identical to ss_ivf_topk's: a query only scans
    // its own learned cell. ----
    sqlN("ss_ivf_trained")(n =>
      s"""WITH qv AS ($qvSql),
         |norms AS ($normsSql),
         |${kmeansCellsCtesSqlFor(n)},
         |qq AS (SELECT vec_id AS qid, cell FROM cells WHERE $QuerySetSql),
         |cp AS (
         |  SELECT q.qid, c.vec_id, c.cell
         |  FROM qq q JOIN cells c ON c.cell = q.cell AND c.vec_id <> q.qid),
         |dots AS (
         |  SELECT cp.qid, cp.vec_id, cp.cell, CAST(SUM(a.qe * b.qe) AS BIGINT) AS dot
         |  FROM cp
         |  JOIN qv a ON a.vec_id = cp.qid
         |  JOIN qv b ON b.vec_id = cp.vec_id AND b.dim = a.dim
         |  GROUP BY cp.qid, cp.vec_id, cp.cell),
         |scored AS (
         |  SELECT d.qid AS query_id, d.vec_id AS neighbor_id, d.cell, d.dot,
         |         nq.n2 AS n2_q, nv.n2 AS n2_v
         |  FROM dots d
         |  JOIN norms nq ON nq.vec_id = d.qid
         |  JOIN norms nv ON nv.vec_id = d.vec_id),
         |ranked AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |             ORDER BY $cosExprSql DESC, neighbor_id) AS rk
         |  FROM scored)
         |SELECT query_id, CAST(rk AS INT) AS rk, neighbor_id, cell, dot
         |FROM ranked WHERE rk <= 3 ORDER BY query_id, rk""") { (s, dir) =>
      val v = varr(s, dir).cache() // init + per-round assign/update + final
      v.count() // eager, so training rounds reuse one materialization
      val cells = trainedCells(v)
      val qq = cells.filter(expr(QuerySetSql))
        .select(col("vec_id").as("qid"), col("cell"),
          col("qe").as("qqe"), col("n2").as("n2_q"))
      cells.join(broadcast(qq), Seq("cell"))
        .filter(col("vec_id") =!= col("qid"))
        .withColumn("dot", dot("qqe", "qe"))
        .withColumnRenamed("n2", "n2_v")
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("qid")).orderBy(cosCol.desc, col("vec_id"))).cast("int"))
        .filter(col("rk") <= 3)
        .select(col("qid").as("query_id"), col("rk"),
          col("vec_id").as("neighbor_id"), col("cell"), col("dot"))
        .orderBy(col("query_id"), col("rk"))
    },

    // ---- multi-cell probing: the production IVF recall/latency knob.
    // A single-cell probe misses every true neighbor that fell across a
    // cell boundary; probing each query's `nprobe` nearest cells (the
    // ranked prefix of the SAME argmin score list — zero extra model
    // state) recovers them at nprobe× the scan cost. Still map-side
    // probe-list construction + one broadcast join; the corpus is
    // never scanned outside the probed cells. ----
    sqlN("ss_ivf_nprobe")(n =>
      s"""WITH qv AS ($qvSql),
         |norms AS ($normsSql),
         |${kmeansCellsCtesSqlFor(n)},
         |${ivfProbeCtesSqlFor("np_", IvfNprobe)}
         |SELECT qid AS query_id, CAST(rk AS INT) AS rk,
         |       vec_id AS neighbor_id, cell, dot
         |FROM np_ranked WHERE rk <= 3 ORDER BY query_id, rk""") { (s, dir) =>
      val v = varr(s, dir).cache()
      v.count() // eager, so training rounds reuse one materialization
      ivfProbeTop3(v, IvfNprobe)
        .select(col("qid").as("query_id"), col("rk"),
          col("vec_id").as("neighbor_id"), col("cell"), col("dot"))
        .orderBy(col("query_id"), col("rk"))
    },

    // ---- the recall curve of that knob: recall@3 vs brute-force
    // cosine for nprobe = 1 and 2, in one result — the measurement a
    // deployment reads to set nprobe. ----
    sqlN("ss_nprobe_recall")(n =>
      s"""WITH qv AS ($qvSql),
         |norms AS ($normsSql),
         |${kmeansCellsCtesSqlFor(n)},
         |${ivfProbeCtesSqlFor("np1_", 1)},
         |${ivfProbeCtesSqlFor("np2_", 2)},
         |gtd AS (
         |  SELECT q.vec_id AS qid, b.vec_id, CAST(SUM(a.qe * b.qe) AS BIGINT) AS dot
         |  FROM (SELECT DISTINCT vec_id FROM qv WHERE $QuerySetSql) q
         |  JOIN qv a ON a.vec_id = q.vec_id
         |  JOIN qv b ON b.dim = a.dim AND b.vec_id <> q.vec_id
         |  GROUP BY q.vec_id, b.vec_id),
         |gtr AS (
         |  SELECT d.qid, d.vec_id,
         |         ROW_NUMBER() OVER (PARTITION BY d.qid
         |           ORDER BY CAST(d.dot AS DOUBLE) /
         |                    sqrt(CAST(nq.n2 AS DOUBLE) * CAST(nv.n2 AS DOUBLE))
         |                    DESC, d.vec_id) AS rk
         |  FROM gtd d
         |  JOIN norms nq ON nq.vec_id = d.qid
         |  JOIN norms nv ON nv.vec_id = d.vec_id)
         |SELECT CAST(1 AS INT) AS nprobe,
         |       CAST(COUNT(*) AS BIGINT) AS n_top3,
         |       CAST(COUNT(h.vec_id) AS BIGINT) AS n_recalled
         |FROM gtr g LEFT JOIN np1_ranked h
         |  ON h.qid = g.qid AND h.vec_id = g.vec_id AND h.rk <= 3
         |WHERE g.rk <= 3
         |UNION ALL
         |SELECT CAST(2 AS INT),
         |       CAST(COUNT(*) AS BIGINT),
         |       CAST(COUNT(h.vec_id) AS BIGINT)
         |FROM gtr g LEFT JOIN np2_ranked h
         |  ON h.qid = g.qid AND h.vec_id = g.vec_id AND h.rk <= 3
         |WHERE g.rk <= 3
         |ORDER BY nprobe""") { (s, dir) =>
      val v = varr(s, dir).cache()
      v.count()
      val qq = v.filter(expr(QuerySetSql))
        .select(col("vec_id").as("qid"), col("qe").as("qqe"),
          col("n2").as("n2_q"))
      val gt = v.join(broadcast(qq), col("vec_id") =!= col("qid"))
        .withColumn("dot", dot("qqe", "qe"))
        .withColumnRenamed("n2", "n2_v")
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("qid")).orderBy(cosCol.desc, col("vec_id"))))
        .filter(col("rk") <= 3)
        .select(col("qid"), col("vec_id"))
      def recallRow(n: Int): DataFrame = {
        val hits = ivfProbeTop3(v, n)
          .select(col("qid"), col("vec_id"), lit(1).as("hit"))
        gt.join(hits, Seq("qid", "vec_id"), "left_outer")
          .agg(count(lit(1)).cast("long").as("n_top3"),
            count(col("hit")).cast("long").as("n_recalled"))
          .select(lit(n).cast("int").as("nprobe"),
            col("n_top3"), col("n_recalled"))
      }
      recallRow(1).unionAll(recallRow(2)).orderBy(col("nprobe"))
    },

    // ---- the corpus-scaled coarse assignment with BOTH dispatches
    // live (ss_cells_broadcast's successor): the model's TRANSPORT
    // dispatches at k > LiteralAssignMaxK (literal expression tree →
    // broadcast table), and the assignment ALGORITHM dispatches at
    // k > FlatAssignMaxK (flat exhaustive n·k → IMI two-level, n·√k·d
    // work, joint cell encoded cell1·2¹⁶ + cell2). The oracle replays
    // the SAME dispatch rule from the corpus count, so both sides of
    // the boundary are driver-verified EXACT on shipped fixtures
    // (k = 8 flat at ≤ sf0.1; k = 80 IMI at the 10× fixture) — the
    // quadratic-above-~10⁸-vectors flat term is no longer the only
    // registered serving path. ----
    sqlN("ss_cells_assign")(n =>
      if (scaledK(n) <= FlatAssignMaxK)
        s"""WITH qv AS ($qvSql),
           |${kmeansCellsCtesSqlFor(n)}
           |SELECT vec_id, cell FROM cells ORDER BY vec_id"""
      else
        s"""WITH qv AS ($qvSql),
           |${imiCellsCtesSqlFor(n)}
           |SELECT vec_id, CAST(cell1 * 65536 + cell2 AS BIGINT) AS cell
           |FROM imicells ORDER BY vec_id""") { (s, dir) =>
      val v = varr(s, dir).cache()
      v.count() // eager, so training rounds reuse one materialization
      dispatchedCells(v).orderBy(col("vec_id"))
    },

    // ---- IMI two-level coarse quantizer (Babenko & Lempitsky 2012):
    // the vector's two halves are quantized independently (k-means per
    // half, the PQ trainer), and the JOINT (cell1, cell2) is the coarse
    // cell — k² cells for one flat-k assignment cost. This is the
    // composition flat IVF needs past its k = 2¹⁶ cap (>10⁸ vectors):
    // per-level k stays bounded while effective cells square. Proven
    // here at small k×k' (8×8 on the fixture) with the full-assignment
    // oracle; the measured assignment-cost ratio is in SCALE.md. ----
    sqlN("ss_imi_cells")(n =>
      s"""WITH qv AS ($qvSql),
         |${imiCellsCtesSqlFor(n)}
         |SELECT vec_id, cell1, cell2 FROM imicells ORDER BY vec_id""") { (s, dir) =>
      val v = varr(s, dir).cache() // two trainings + two assignments
      v.count()
      imiCells(v).select(col("vec_id"), col("cell1"), col("cell2"))
        .orderBy(col("vec_id"))
    },

    // ---- IMI cell-probe top-3: a query scans only its JOINT cell —
    // 1/k² of the corpus (vs 1/k for flat IVF at the same assignment
    // cost). The equi-join key is the (cell1, cell2) pair; ranking is
    // the standard exact-cosine window. Sparser cells trade recall for
    // that scan bound — the multi-index sequence scan (probing
    // neighboring cells in (d1+d2) order) is the production recall
    // lever this query's shape composes with. ----
    sqlN("ss_imi_topk")(n =>
      s"""WITH qv AS ($qvSql),
         |norms AS ($normsSql),
         |${imiCellsCtesSqlFor(n)},
         |$imiProbeCtesSql
         |SELECT qid AS query_id, CAST(rk AS INT) AS rk,
         |       vec_id AS neighbor_id, dot
         |FROM imiranked WHERE rk <= 3 ORDER BY query_id, rk""") { (s, dir) =>
      val v = varr(s, dir).cache()
      v.count()
      imiProbeRanked(v)
        .filter(col("rk") <= 3)
        .select(col("qid").as("query_id"), col("rk"),
          col("vec_id").as("neighbor_id"), col("dot"))
        .orderBy(col("query_id"), col("rk"))
    },

    // ---- IMI multi-sequence scan (Babenko & Lempitsky 2012 §3.2):
    // the production IMI *query* algorithm the joint-cell probe above
    // composes with. Each query half is scored against ALL per-level
    // centroids (2·k dots — model-sized), joint cells are visited in
    // increasing s1+s2 order (= true ‖q−(c1,c2)‖² order, the ‖q‖² term
    // is constant per query), and scanning stops once the cells
    // visited so far hold ≥ SeqScanCandBudget candidates; the
    // candidates then exact-rerank. The first visited cell is
    // PROVABLY the query's own joint cell (min(s1+s2) decomposes to
    // (min s1, min s2)), so the candidate set is a superset of
    // ss_imi_topk's single-cell probe — recall can only go up, and
    // the budget is the knob that prices the latency for it. The
    // per-query cell table is k² rows (≤ 2¹⁶ at the per-level cap) —
    // model-sized, windowed per qid, never corpus-joined until the
    // kept cells select their members. ----
    sqlN("ss_imi_seqscan")(n =>
      s"""WITH qv AS ($qvSql),
         |norms AS ($normsSql),
         |${imiCellsCtesSqlFor(n)},
         |$imiSeqscanCtesSql
         |SELECT qid AS query_id, CAST(rk AS INT) AS rk,
         |       vec_id AS neighbor_id, dot
         |FROM imisranked WHERE rk <= 3 ORDER BY query_id, rk""") { (s, dir) =>
      val v = varr(s, dir).cache()
      v.count()
      imiSeqscanRanked(v)
        .filter(col("rk") <= 3)
        .select(col("qid").as("query_id"), col("rk"),
          col("vec_id").as("neighbor_id"), col("dot"))
        .orderBy(col("query_id"), col("rk"))
    },

    // ---- the recall price of both IMI probe modes, measured against
    // brute-force cosine top-3 in one result — the row a deployment
    // reads to decide whether the single-cell probe's 1/k² scan is
    // enough or the budgeted seqscan's extra cells are worth it. The
    // seqscan row can never recall LESS than the cell row (superset),
    // so this also oracle-checks the dominance invariant at every SF
    // the driver runs. ----
    sqlN("ss_imi_recall")(n =>
      s"""WITH qv AS ($qvSql),
         |norms AS ($normsSql),
         |${imiCellsCtesSqlFor(n)},
         |$imiProbeCtesSql,
         |$imiSeqscanCtesSql,
         |gtd AS (
         |  SELECT q.vec_id AS qid, b.vec_id, CAST(SUM(a.qe * b.qe) AS BIGINT) AS dot
         |  FROM (SELECT DISTINCT vec_id FROM qv WHERE $QuerySetSql) q
         |  JOIN qv a ON a.vec_id = q.vec_id
         |  JOIN qv b ON b.dim = a.dim AND b.vec_id <> q.vec_id
         |  GROUP BY q.vec_id, b.vec_id),
         |gtr AS (
         |  SELECT d.qid, d.vec_id,
         |         ROW_NUMBER() OVER (PARTITION BY d.qid
         |           ORDER BY CAST(d.dot AS DOUBLE) /
         |                    sqrt(CAST(nq.n2 AS DOUBLE) * CAST(nv.n2 AS DOUBLE))
         |                    DESC, d.vec_id) AS rk
         |  FROM gtd d
         |  JOIN norms nq ON nq.vec_id = d.qid
         |  JOIN norms nv ON nv.vec_id = d.vec_id)
         |SELECT 'cell' AS method,
         |       CAST(COUNT(*) AS BIGINT) AS n_top3,
         |       CAST(COUNT(h.vec_id) AS BIGINT) AS n_recalled
         |FROM gtr g LEFT JOIN imiranked h
         |  ON h.qid = g.qid AND h.vec_id = g.vec_id AND h.rk <= 3
         |WHERE g.rk <= 3
         |UNION ALL
         |SELECT 'seqscan',
         |       CAST(COUNT(*) AS BIGINT),
         |       CAST(COUNT(h.vec_id) AS BIGINT)
         |FROM gtr g LEFT JOIN imisranked h
         |  ON h.qid = g.qid AND h.vec_id = g.vec_id AND h.rk <= 3
         |WHERE g.rk <= 3
         |ORDER BY method""") { (s, dir) =>
      val v = varr(s, dir).cache()
      v.count()
      val gt = bruteScored(v)
        .filter(col("rk") <= 3)
        .select(col("qid"), col("vec_id"))
      def recallRow(method: String, ranked: DataFrame): DataFrame = {
        val hits = ranked.filter(col("rk") <= 3)
          .select(col("qid"), col("vec_id"), lit(1).as("hit"))
        gt.join(hits, Seq("qid", "vec_id"), "left_outer")
          .agg(count(lit(1)).cast("long").as("n_top3"),
            count(col("hit")).cast("long").as("n_recalled"))
          .select(lit(method).as("method"), col("n_top3"), col("n_recalled"))
      }
      recallRow("cell", imiProbeRanked(v))
        .unionAll(recallRow("seqscan", imiSeqscanRanked(v)))
        .orderBy(col("method"))
    },

    // ---- product quantization + ADC (Jégou, Douze, Schmid 2011,
    // "Product Quantization for Nearest Neighbor Search"): the corpus
    // is compressed to PqM codebook codes per vector (4 longs here vs
    // 64 — at 100 TB this is THE memory lever: the ADC scan touches
    // codes only, never raw vectors), each subspace's codebook trained
    // by the same deterministic k-means as ss_ivf_trained. Queries
    // precompute per-(subspace, code) squared-distance lookup tables —
    // 10×4×8 longs of model-sized state, broadcast — so scoring a
    // corpus vector is PqM array lookups instead of a dims-wide dot.
    // Everything is exact integer arithmetic; the oracle replays the 4
    // trainings, the coding, the LUTs, and the ranking verbatim. ----
    sql("ss_pq_adc",
      s"""WITH qv AS ($qvSql),
         |$pqAdcCtesSql,
         |ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
         |             ORDER BY adc, vec_id) AS rk FROM adcw)
         |SELECT qid AS query_id, CAST(rk AS INT) AS rk, vec_id AS neighbor_id, adc
         |FROM ranked WHERE rk <= 3 ORDER BY query_id, rk""") { (s, dir) =>
      val v = withSubs(varr(s, dir)).cache()
      v.count() // one materialization shared by 4 trainings + coding + LUTs
      val (coded, lutDf) = pqCodesAndLuts(s, v)
      coded.join(broadcast(lutDf), col("vec_id") =!= col("qid"))
        .withColumn("adc", adcCol)
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("qid")).orderBy(col("adc"), col("vec_id"))).cast("int"))
        .filter(col("rk") <= 3)
        .select(col("qid").as("query_id"), col("rk"),
          col("vec_id").as("neighbor_id"), col("adc"))
        .orderBy(col("query_id"), col("rk"))
    },

    // ---- exact re-ranking of the ADC shortlist (FAISS
    // IndexRefineFlat / the "refine" stage of IVFADC+R, Jégou et al.
    // 2011 §V): ADC ranks the WHOLE corpus from 4-byte codes, the top
    // RerankShortlist=10 survivors are re-scored with the exact
    // integer L2 (n2_q + n2_v − 2·dot — one codegen'd graft_dot per
    // (query, survivor)), and the final top-3 is by exact distance.
    // This is the standard accuracy/IO trade at 100 TB: the exact
    // re-rank touches 10 raw vectors per query instead of the corpus,
    // so the raw vectors can live in cold storage keyed by vec_id (a
    // 10-row broadcast-hash lookup per query), while the scan-side
    // state stays the 4-byte codes. ss_rerank_recall measures what the
    // re-rank buys. ----
    sql("ss_adc_rerank",
      s"""WITH qv AS ($qvSql),
         |norms AS ($normsSql),
         |$pqAdcCtesSql,
         |adcr AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
         |           ORDER BY adc, vec_id) AS adcrk FROM adcw),
         |short AS (SELECT qid, vec_id, adc FROM adcr WHERE adcrk <= $RerankShortlist),
         |exact AS (
         |  SELECT s.qid, s.vec_id, s.adc,
         |         CAST(nq.n2 + nv.n2 - 2 * d.dot AS BIGINT) AS l2
         |  FROM short s
         |  JOIN (SELECT s2.qid, s2.vec_id, CAST(SUM(q.qe * v.qe) AS BIGINT) AS dot
         |        FROM short s2
         |        JOIN qv q ON q.vec_id = s2.qid
         |        JOIN qv v ON v.vec_id = s2.vec_id AND v.dim = q.dim
         |        GROUP BY s2.qid, s2.vec_id) d
         |    ON d.qid = s.qid AND d.vec_id = s.vec_id
         |  JOIN norms nq ON nq.vec_id = s.qid
         |  JOIN norms nv ON nv.vec_id = s.vec_id),
         |ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
         |             ORDER BY l2, vec_id) AS rk FROM exact)
         |SELECT qid AS query_id, CAST(rk AS INT) AS rk, vec_id AS neighbor_id,
         |       l2, adc
         |FROM ranked WHERE rk <= 3 ORDER BY query_id, rk""") { (s, dir) =>
      val v = withSubs(varr(s, dir)).cache()
      v.count() // shared by 4 trainings + coding + LUTs + the re-rank reads
      val (coded, lutDf) = pqCodesAndLuts(s, v)
      val short = coded.join(broadcast(lutDf), col("vec_id") =!= col("qid"))
        .withColumn("adc", adcCol)
        .withColumn("adcrk", row_number().over(
          Window.partitionBy(col("qid")).orderBy(col("adc"), col("vec_id"))))
        .filter(col("adcrk") <= RerankShortlist)
        .select(col("qid"), col("vec_id"), col("adc"))
      val qvecs = v.filter(expr(QuerySetSql))
        .select(col("vec_id").as("qid"), col("qe").as("qqe"), col("n2").as("n2_q"))
      short.join(broadcast(qvecs), Seq("qid"))
        .join(v.select(col("vec_id"), col("qe"), col("n2").as("n2_v")), Seq("vec_id"))
        .withColumn("l2",
          (col("n2_q") + col("n2_v") - lit(2L) * dot("qqe", "qe")).cast("long"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("qid")).orderBy(col("l2"), col("vec_id"))).cast("int"))
        .filter(col("rk") <= 3)
        .select(col("qid").as("query_id"), col("rk"),
          col("vec_id").as("neighbor_id"), col("l2"), col("adc"))
        .orderBy(col("query_id"), col("rk"))
    },

    // ---- IVFADC: the production ANN composition (FAISS IndexIVFPQ
    // with by_residual=false) — the trained coarse quantizer restricts
    // the scan to the query's cell (ss_ivf_trained's cell-probe
    // equi-join), and ADC ranks the survivors from PQ codes + the
    // broadcast lookup tables (ss_pq_adc's scoring). At 100 TB this is
    // the shape that actually ships: 1/N_cells of the corpus touched,
    // 4 bytes of codes per touched vector, zero raw-vector reads after
    // the one-off encode. ----
    sqlN("ss_ivfadc_topk") { n =>
      val pqSubs = (0 until PqM).map(m => pqSubspaceSql(m, PqSub)).mkString(",\n")
      val codeJoins = (0 until PqM)
        .map(m => s"  JOIN codes$m k$m ON k$m.vec_id = cp.vec_id").mkString("\n")
      val lutJoins = (0 until PqM)
        .map(m => s"  JOIN lut$m l$m ON l$m.qid = cp.qid AND l$m.cid = k$m.cid")
        .mkString("\n")
      val adcSum = (0 until PqM).map(m => s"l$m.t").mkString(" + ")
      s"""WITH qv AS ($qvSql),
         |${kmeansCellsCtesSqlFor(n)},
         |$pqSubs,
         |qq AS (SELECT vec_id AS qid, cell FROM cells WHERE $QuerySetSql),
         |cp AS (SELECT q.qid, c.vec_id, c.cell FROM qq q
         |       JOIN cells c ON c.cell = q.cell AND c.vec_id <> q.qid),
         |adcw AS (
         |  SELECT cp.qid, cp.vec_id, cp.cell, $adcSum AS adc
         |  FROM cp
         |$codeJoins
         |$lutJoins),
         |ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
         |             ORDER BY adc, vec_id) AS rk FROM adcw)
         |SELECT qid AS query_id, CAST(rk AS INT) AS rk, vec_id AS neighbor_id,
         |       cell, adc
         |FROM ranked WHERE rk <= 3 ORDER BY query_id, rk"""
    } { (s, dir) =>
      val v = withSubs(varr(s, dir)).cache()
      v.count() // shared by the coarse training + 4 PQ trainings + encode
      val cells = trainedCells(v).select(col("vec_id"), col("cell"))
      val (coded, lutDf) = pqCodesAndLuts(s, v)
      val corpus = coded.join(cells, Seq("vec_id"))
      val qcells = cells.filter(expr(QuerySetSql)).select(col("vec_id").as("qid"), col("cell"))
      // ≤10 queries with their cell + LUTs: broadcast, cell-probe is an
      // EQUI-join on cell — only the query's cell is ever scanned
      corpus.join(broadcast(lutDf.join(qcells, Seq("qid"))), Seq("cell"))
        .filter(col("vec_id") =!= col("qid"))
        .withColumn("adc", adcCol)
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("qid")).orderBy(col("adc"), col("vec_id"))).cast("int"))
        .filter(col("rk") <= 3)
        .select(col("qid").as("query_id"), col("rk"),
          col("vec_id").as("neighbor_id"), col("cell"), col("adc"))
        .orderBy(col("query_id"), col("rk"))
    },

    // ---- IVFADC with RESIDUAL encoding (FAISS IndexIVFPQ's default,
    // by_residual=true): the PQ codebooks train on and encode each
    // vector's residual to its assigned coarse centroid instead of the
    // raw vector. Residuals concentrate around the origin with much
    // smaller variance, so the same M×k code budget quantizes them
    // with less error — measured on this fixture by ss_residual_recall.
    // The query side needs NO extra work at nprobe=1: the query's
    // residual w.r.t. its own (probed) cell is already in the residual
    // stream, so the LUT build is unchanged. The oracle replays the
    // coarse training, the exact-integer residual join (qe − ce — the
    // floor-division centroids make residuals integers, so EXACT
    // parity survives), the 4 residual codebooks, coding, LUTs, and
    // the ranking verbatim. Scale shape identical to ss_ivfadc_topk:
    // the residual join is one broadcast k-row join during the one-off
    // encode; serving still touches 1/N_cells of the corpus at 4 bytes
    // of codes per vector. ----
    sqlN("ss_ivfadc_residual") { n =>
      val pqSubs = (0 until PqM)
        .map(m => pqSubspaceSql(m, PqSub, srcCte = "rv")).mkString(",\n")
      val codeJoins = (0 until PqM)
        .map(m => s"  JOIN codes$m k$m ON k$m.vec_id = cp.vec_id").mkString("\n")
      val lutJoins = (0 until PqM)
        .map(m => s"  JOIN lut$m l$m ON l$m.qid = cp.qid AND l$m.cid = k$m.cid")
        .mkString("\n")
      val adcSum = (0 until PqM).map(m => s"l$m.t").mkString(" + ")
      s"""WITH qv AS ($qvSql),
         |${kmeansCellsCtesSqlFor(n)},
         |rv AS MATERIALIZED (SELECT v.vec_id, v.dim, v.qe - c.ce AS qe
         |       FROM qv v JOIN cells ON cells.vec_id = v.vec_id
         |       JOIN c$KmeansRounds c ON c.cid = cells.cell AND c.dim = v.dim),
         |$pqSubs,
         |qq AS (SELECT vec_id AS qid, cell FROM cells WHERE $QuerySetSql),
         |cp AS (SELECT q.qid, c.vec_id, c.cell FROM qq q
         |       JOIN cells c ON c.cell = q.cell AND c.vec_id <> q.qid),
         |adcw AS (
         |  SELECT cp.qid, cp.vec_id, cp.cell, $adcSum AS adc
         |  FROM cp
         |$codeJoins
         |$lutJoins),
         |ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
         |             ORDER BY adc, vec_id) AS rk FROM adcw)
         |SELECT qid AS query_id, CAST(rk AS INT) AS rk, vec_id AS neighbor_id,
         |       cell, adc
         |FROM ranked WHERE rk <= 3 ORDER BY query_id, rk"""
    } { (s, dir) =>
      val v = varr(s, dir).cache()
      v.count() // shared by the coarse training + residual + encode
      val cells = trainedCells(v).select(col("vec_id"), col("cell"))
      val (coded, lutDf) = residualCodesAndLuts(s, v)
      val corpus = coded.join(cells, Seq("vec_id"))
      val qcells = cells.filter(expr(QuerySetSql))
        .select(col("vec_id").as("qid"), col("cell"))
      corpus.join(broadcast(lutDf.join(qcells, Seq("qid"))), Seq("cell"))
        .filter(col("vec_id") =!= col("qid"))
        .withColumn("adc", adcCol)
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("qid")).orderBy(col("adc"), col("vec_id"))).cast("int"))
        .filter(col("rk") <= 3)
        .select(col("qid").as("query_id"), col("rk"),
          col("vec_id").as("neighbor_id"), col("cell"), col("adc"))
        .orderBy(col("query_id"), col("rk"))
    },

    // ---- residual-coding quality eval: recall@3 of plain-PQ ADC vs
    // residual-PQ ADC against the EXACT integer-L2 top-3 WITHIN the
    // probed cell — both variants share the identical coarse step and
    // candidate set, so the delta isolates pure quantization error,
    // the number FAISS's by_residual default is built on (the
    // ss_nprobe_recall / ss_imi_recall pricing discipline). Truth is
    // bounded (query set × own-cell members), all-integer, oracle
    // exact.
    //
    // Measured, both oracle-gated: at sf0.01 (n=500, k=8 — loose
    // ~62-member cells) residual RECALLS LESS (7/30 vs plain's 9/30):
    // with a weak coarse quantizer the residuals don't concentrate,
    // and centering costs more than it buys. At the derived 10×
    // fixture (n=20k, k=80, sampled training — cells near the ~250
    // target occupancy) residual wins decisively, 13/30 vs 8/30. The
    // crossover is the honest story: by_residual pays exactly when
    // the coarse quantizer is doing its job, i.e. in the at-scale
    // regime this engine targets. ----
    sqlN("ss_residual_recall") { n =>
      val pqPlain = (0 until PqM).map(m => pqSubspaceSql(m, PqSub)).mkString(",\n")
      val pqRes = (0 until PqM)
        .map(m => pqSubspaceSql(m, PqSub, srcCte = "rv", pfx = "r")).mkString(",\n")
      def adcwFor(name: String, pfx: String) = {
        val codeJoins = (0 until PqM)
          .map(m => s"  JOIN ${pfx}codes$m k$m ON k$m.vec_id = cp.vec_id").mkString("\n")
        val lutJoins = (0 until PqM)
          .map(m => s"  JOIN ${pfx}lut$m l$m ON l$m.qid = cp.qid AND l$m.cid = k$m.cid")
          .mkString("\n")
        val adcSum = (0 until PqM).map(m => s"l$m.t").mkString(" + ")
        s"""$name AS (
           |  SELECT cp.qid, cp.vec_id, $adcSum AS adc
           |  FROM cp
           |$codeJoins
           |$lutJoins)""".stripMargin
      }
      s"""WITH qv AS ($qvSql),
         |norms AS ($normsSql),
         |${kmeansCellsCtesSqlFor(n)},
         |rv AS MATERIALIZED (SELECT v.vec_id, v.dim, v.qe - c.ce AS qe
         |       FROM qv v JOIN cells ON cells.vec_id = v.vec_id
         |       JOIN c$KmeansRounds c ON c.cid = cells.cell AND c.dim = v.dim),
         |$pqPlain,
         |$pqRes,
         |qq AS (SELECT vec_id AS qid, cell FROM cells WHERE $QuerySetSql),
         |cp AS MATERIALIZED (SELECT q.qid, c.vec_id FROM qq q
         |       JOIN cells c ON c.cell = q.cell AND c.vec_id <> q.qid),
         |${adcwFor("padcw", "")},
         |${adcwFor("radcw", "r")},
         |ptop AS (SELECT qid, vec_id FROM (
         |           SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
         |             ORDER BY adc, vec_id) AS rk FROM padcw) t WHERE rk <= 3),
         |rtop AS (SELECT qid, vec_id FROM (
         |           SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
         |             ORDER BY adc, vec_id) AS rk FROM radcw) t WHERE rk <= 3),
         |tdots AS (SELECT cp.qid, cp.vec_id, CAST(SUM(a.qe * b.qe) AS BIGINT) AS dot
         |          FROM cp JOIN qv a ON a.vec_id = cp.qid
         |          JOIN qv b ON b.vec_id = cp.vec_id AND b.dim = a.dim
         |          GROUP BY cp.qid, cp.vec_id),
         |truth AS (SELECT qid, vec_id FROM (
         |            SELECT d.qid, d.vec_id,
         |                   ROW_NUMBER() OVER (PARTITION BY d.qid
         |                     ORDER BY nq.n2 - 2 * d.dot + nv.n2, d.vec_id) AS rk
         |            FROM tdots d
         |            JOIN norms nq ON nq.vec_id = d.qid
         |            JOIN norms nv ON nv.vec_id = d.vec_id) t WHERE rk <= 3),
         |nt AS (SELECT COUNT(*) AS n_truth FROM truth)
         |SELECT u.variant,
         |       CAST(u.recalled AS BIGINT) AS recalled,
         |       CAST(nt.n_truth AS BIGINT) AS n_truth
         |FROM (
         |  SELECT 'plain' AS variant, COUNT(*) AS recalled
         |  FROM ptop JOIN truth USING (qid, vec_id)
         |  UNION ALL
         |  SELECT 'residual', COUNT(*) FROM rtop JOIN truth USING (qid, vec_id)) u,
         |nt
         |ORDER BY u.variant"""
    } { (s, dir) =>
      val v = withSubs(varr(s, dir)).cache()
      v.count() // shared by coarse training + both PQ variants + truth
      val cells = trainedCells(v).select(col("vec_id"), col("cell"))
      val qcells = cells.filter(expr(QuerySetSql))
        .select(col("vec_id").as("qid"), col("cell"))
      val cp = cells.join(broadcast(qcells), Seq("cell"))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"))
      val (pc, pl) = pqCodesAndLuts(s, v)
      val (rc, rl) = residualCodesAndLuts(s, v)
      def top3(coded: DataFrame, lut: DataFrame): DataFrame =
        cp.join(coded, Seq("vec_id")).join(broadcast(lut), Seq("qid"))
          .withColumn("adc", adcCol)
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("qid")).orderBy(col("adc"), col("vec_id"))))
          .filter(col("rk") <= 3).select(col("qid"), col("vec_id"))
      val qside = v.filter(expr(QuerySetSql))
        .select(col("vec_id").as("qid"), col("qe").as("qqe"), col("n2").as("n2_q"))
      val truth = cp.join(broadcast(qside), Seq("qid"))
        .join(v.select(col("vec_id"), col("qe"), col("n2").as("n2_v")), Seq("vec_id"))
        .withColumn("l2", col("n2_q") - lit(2L) * dot("qqe", "qe") + col("n2_v"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("qid")).orderBy(col("l2"), col("vec_id"))))
        .filter(col("rk") <= 3).select(col("qid"), col("vec_id"))
      val nt = truth.agg(count(lit(1)).as("n_truth"))
      def recallRow(variant: String, top: DataFrame): DataFrame =
        top.join(truth, Seq("qid", "vec_id"))
          .agg(count(lit(1)).as("recalled"))
          .select(lit(variant).as("variant"), col("recalled"))
      recallRow("plain", top3(pc, pl)).unionAll(recallRow("residual", top3(rc, rl)))
        .crossJoin(broadcast(nt))
        .select(col("variant"), col("recalled").cast("long").as("recalled"),
          col("n_truth").cast("long").as("n_truth"))
        .orderBy(col("variant"))
    },

    // ---- re-rank quality eval: recall@3 of the raw ADC top-3 vs the
    // exact-re-ranked ADC top-10 shortlist, both against the full
    // exact-L2 truth (the ss_residual_recall pricing discipline: same
    // candidate machinery, one variable — here, whether the refine
    // stage runs). The rerank variant can only contain the truth hits
    // the shortlist already holds, so the delta prices EXACTLY the
    // "ADC ordered the right neighbors wrongly inside the top-10"
    // error class that 10 raw-vector reads per query repair. ----
    sql("ss_rerank_recall",
      s"""WITH qv AS ($qvSql),
         |norms AS ($normsSql),
         |$pqAdcCtesSql,
         |adcr AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
         |           ORDER BY adc, vec_id) AS adcrk FROM adcw),
         |adctop AS (SELECT qid, vec_id FROM adcr WHERE adcrk <= 3),
         |short AS (SELECT qid, vec_id FROM adcr WHERE adcrk <= $RerankShortlist),
         |qq AS (SELECT vec_id AS qid, dim, qe AS qqe FROM qv WHERE $QuerySetSql),
         |dots AS (SELECT q.qid, v.vec_id, CAST(SUM(q.qqe * v.qe) AS BIGINT) AS dot
         |         FROM qq q JOIN qv v ON v.dim = q.dim GROUP BY q.qid, v.vec_id),
         |l2s AS (SELECT d.qid, d.vec_id, nq.n2 - 2 * d.dot + nv.n2 AS l2
         |        FROM dots d
         |        JOIN norms nq ON nq.vec_id = d.qid
         |        JOIN norms nv ON nv.vec_id = d.vec_id
         |        WHERE d.vec_id <> d.qid),
         |truth AS (SELECT qid, vec_id FROM (
         |            SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
         |              ORDER BY l2, vec_id) AS rk FROM l2s) t WHERE rk <= 3),
         |rtop AS (SELECT qid, vec_id FROM (
         |           SELECT s.qid, s.vec_id, l.l2,
         |                  ROW_NUMBER() OVER (PARTITION BY s.qid
         |                    ORDER BY l.l2, s.vec_id) AS rk
         |           FROM short s
         |           JOIN l2s l ON l.qid = s.qid AND l.vec_id = s.vec_id) t
         |         WHERE rk <= 3),
         |u AS (SELECT 'adc' AS variant, qid, vec_id FROM adctop
         |      UNION ALL SELECT 'rerank', qid, vec_id FROM rtop),
         |nt AS (SELECT COUNT(*) AS n_truth FROM truth)
         |SELECT u.variant,
         |       CAST(COUNT(t.vec_id) AS BIGINT) AS recalled,
         |       CAST(nt.n_truth AS BIGINT) AS n_truth
         |FROM u
         |LEFT JOIN truth t ON t.qid = u.qid AND t.vec_id = u.vec_id, nt
         |GROUP BY u.variant, nt.n_truth ORDER BY u.variant""") { (s, dir) =>
      val v = withSubs(varr(s, dir)).cache()
      v.count() // shared by training, coding, LUTs, truth and the re-rank
      val (coded, lutDf) = pqCodesAndLuts(s, v)
      val adcr = coded.join(broadcast(lutDf), col("vec_id") =!= col("qid"))
        .withColumn("adc", adcCol)
        .withColumn("adcrk", row_number().over(
          Window.partitionBy(col("qid")).orderBy(col("adc"), col("vec_id"))))
        .select(col("qid"), col("vec_id"), col("adcrk"))
        .cache()
      val adcTop = adcr.filter(col("adcrk") <= 3).select(col("qid"), col("vec_id"))
      val short = adcr.filter(col("adcrk") <= RerankShortlist)
        .select(col("qid"), col("vec_id"))
      val qside = v.filter(expr(QuerySetSql))
        .select(col("vec_id").as("qid"), col("qe").as("qqe"), col("n2").as("n2_q"))
      val l2Of = (cand: DataFrame) => cand.join(broadcast(qside), Seq("qid"))
        .join(v.select(col("vec_id"), col("qe"), col("n2").as("n2_v")), Seq("vec_id"))
        .withColumn("l2", col("n2_q") - lit(2L) * dot("qqe", "qe") + col("n2_v"))
      val truth = v.join(broadcast(qside), col("vec_id") =!= col("qid"))
        .withColumn("l2", col("n2_q") - lit(2L) * dot("qqe", "qe") + col("n2"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("qid")).orderBy(col("l2"), col("vec_id"))))
        .filter(col("rk") <= 3).select(col("qid"), col("vec_id"))
      val rtop = l2Of(short)
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("qid")).orderBy(col("l2"), col("vec_id"))))
        .filter(col("rk") <= 3).select(col("qid"), col("vec_id"))
      val nt = truth.agg(count(lit(1)).as("n_truth"))
      def recallRow(variant: String, top: DataFrame): DataFrame =
        top.join(truth, Seq("qid", "vec_id"))
          .agg(count(lit(1)).as("recalled"))
          .select(lit(variant).as("variant"), col("recalled"))
      recallRow("adc", adcTop).unionAll(recallRow("rerank", rtop))
        .crossJoin(broadcast(nt))
        .select(col("variant"), col("recalled").cast("long").as("recalled"),
          col("n_truth").cast("long").as("n_truth"))
        .orderBy(col("variant"))
    },

    // ---- PQ quality eval: recall@3 of the ADC ranking against exact
    // integer-L2 ground truth — the compression-loss measurement any
    // PQ deployment runs to size M × k (more subspaces/codes = less
    // quantization error = higher recall). Truth is bounded (query set
    // × corpus, broadcast queries), all-integer, so the oracle is
    // exact. ----
    sql("ss_pq_recall",
      s"""WITH qv AS ($qvSql),
         |norms AS ($normsSql),
         |$pqAdcCtesSql,
         |adctop AS (SELECT qid, vec_id FROM (
         |             SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
         |               ORDER BY adc, vec_id) AS rk FROM adcw) t WHERE rk <= 3),
         |qq AS (SELECT vec_id AS qid, dim, qe AS qqe FROM qv WHERE $QuerySetSql),
         |dots AS (SELECT q.qid, v.vec_id, CAST(SUM(q.qqe * v.qe) AS BIGINT) AS dot
         |         FROM qq q JOIN qv v ON v.dim = q.dim GROUP BY q.qid, v.vec_id),
         |l2s AS (SELECT d.qid, d.vec_id, nq.n2 - 2 * d.dot + nv.n2 AS l2
         |        FROM dots d
         |        JOIN norms nq ON nq.vec_id = d.qid
         |        JOIN norms nv ON nv.vec_id = d.vec_id
         |        WHERE d.vec_id <> d.qid),
         |truth AS (SELECT qid, vec_id FROM (
         |            SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
         |              ORDER BY l2, vec_id) AS rk FROM l2s) t WHERE rk <= 3)
         |SELECT t.qid AS query_id, CAST(COUNT(*) AS BIGINT) AS n_truth,
         |       CAST(COUNT(a.vec_id) AS BIGINT) AS n_recalled
         |FROM truth t LEFT JOIN adctop a ON a.qid = t.qid AND a.vec_id = t.vec_id
         |GROUP BY t.qid ORDER BY query_id""") { (s, dir) =>
      val v = withSubs(varr(s, dir)).cache()
      v.count() // shared by training, coding, LUTs, and the truth scan
      val (coded, lutDf) = pqCodesAndLuts(s, v)
      val adcTop = coded.join(broadcast(lutDf), col("vec_id") =!= col("qid"))
        .withColumn("adc", adcCol)
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("qid")).orderBy(col("adc"), col("vec_id"))).cast("int"))
        .filter(col("rk") <= 3)
        .select(col("qid").as("query_id"), col("vec_id").as("neighbor_id"))
      val qq = v.filter(expr(QuerySetSql))
        .select(col("vec_id").as("qid"), col("qe").as("qqe"), col("n2").as("n2_q"))
      val truth = v.join(broadcast(qq), col("vec_id") =!= col("qid"))
        .withColumn("l2", col("n2_q") - lit(2) * dot("qqe", "qe") + col("n2"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("qid")).orderBy(col("l2"), col("vec_id"))).cast("int"))
        .filter(col("rk") <= 3)
        .select(col("qid").as("query_id"), col("vec_id").as("neighbor_id"))
      truth.join(adcTop.withColumn("hit", lit(1)),
          Seq("query_id", "neighbor_id"), "left_outer")
        .groupBy(col("query_id"))
        .agg(count(lit(1)).cast("long").as("n_truth"),
          count(col("hit")).cast("long").as("n_recalled"))
        .orderBy(col("query_id"))
    },

    // ---- embedding-health profile: per-dimension min/max/sum and
    // zero count over the quantized corpus — the monitoring row that
    // catches dead dimensions (all-zero), saturated ones, and
    // distribution drift between embedding-model versions. One
    // posexplode + hash aggregation on dim (64 groups): word-count
    // shape, map-side combined, linear in corpus size. ----
    sql("ss_embed_stats",
      s"""WITH qv AS ($qvSql)
         |SELECT CAST(dim AS INT) AS dim,
         |       CAST(MIN(qe) AS BIGINT) AS min_q,
         |       CAST(MAX(qe) AS BIGINT) AS max_q,
         |       CAST(SUM(qe) AS BIGINT) AS sum_q,
         |       CAST(SUM(CASE WHEN qe = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero
         |FROM qv GROUP BY dim ORDER BY dim""") { (s, dir) =>
      varr(s, dir)
        .select(posexplode(col("qe")).as(Seq("dim", "x")))
        .groupBy(col("dim"))
        .agg(min(col("x")).as("min_q"),
          max(col("x")).as("max_q"),
          sum(col("x")).as("sum_q"),
          sum(when(col("x") === 0, 1L).otherwise(0L)).cast("long").as("n_zero"))
        .select(col("dim").cast("int"), col("min_q"), col("max_q"),
          col("sum_q"), col("n_zero"))
        .orderBy(col("dim"))
    },

    // ---- ANN quality eval: recall@5 of the LSH candidate set against
    // brute-force ground truth, per query — the measurement loop any
    // production ANN deployment runs to tune bands×planes. Ground truth
    // is bounded (query set × 5), so the eval join broadcasts. ----
    sqlN("ss_recall_eval")(n =>
      s"""WITH $bruteCtesSql,
         |${lshCandCtesSqlFor(scaledGeometry(n))},
         |top5 AS (SELECT query_id, neighbor_id FROM ranked WHERE rk <= 5),
         |qcand AS (SELECT vec_a AS query_id, vec_b AS neighbor_id FROM cand
         |          UNION SELECT vec_b, vec_a FROM cand)
         |SELECT t.query_id AS query_id, CAST(COUNT(*) AS BIGINT) AS n_top5,
         |       CAST(COUNT(q.neighbor_id) AS BIGINT) AS n_recalled
         |FROM top5 t LEFT JOIN qcand q
         |  ON q.query_id = t.query_id AND q.neighbor_id = t.neighbor_id
         |GROUP BY t.query_id ORDER BY query_id""") { (s, dir) =>
      val v = varr(s, dir).cache() // brute side + LSH bucket side
      val top5 = bruteScored(v).filter(col("rk") <= 5)
        .select(col("qid").as("query_id"), col("vec_id").as("neighbor_id"))
      val cand = lshCandidatesAuto(v)
      val qcand = cand
        .select(col("vec_a").as("query_id"), col("vec_b").as("neighbor_id"))
        .union(cand.select(col("vec_b"), col("vec_a")))
        .distinct()
        .withColumn("hit", lit(1))
      top5.join(qcand, Seq("query_id", "neighbor_id"), "left_outer")
        .groupBy(col("query_id"))
        .agg(count(lit(1)).cast("long").as("n_top5"),
          count(col("hit")).cast("long").as("n_recalled"))
        .orderBy(col("query_id"))
    },

    // ---- SQ8 scalar-quantized top-3 (FAISS SQ8 / MIPS): the corpus
    // compressed to 1 byte per dimension (8× vs floats — the memory
    // lever between raw vectors and PQ's 16×), scored asymmetrically:
    // exact query ints against the lattice-floor reconstruction, all
    // integer, ranked by inner product. Train + decode + scan are each
    // one linear pass; the query set broadcasts. ----
    sql("ss_sq8_topk",
      s"""WITH $sq8CtesSql
         |SELECT qid AS query_id, CAST(rk AS INT) AS rk,
         |       vec_id AS neighbor_id, score
         |FROM sq_ranked WHERE rk <= 3 ORDER BY query_id, rk""") { (s, dir) =>
      val v = varr(s, dir).cache() // params scan + recon scan + query set
      v.count() // eager, so the training collect doesn't recompute
      val (mn, mx) = sq8Params(v)
      val qq = v.filter(expr(QuerySetSql))
        .select(col("vec_id").as("qid"), col("qe").as("qqe"))
      sq8Top3(v, qq, mn, mx)
        .select(col("qid").as("query_id"), col("rk"),
          col("vec_id").as("neighbor_id"), col("score"))
        .orderBy(col("query_id"), col("rk"))
    },

    // ---- SQ8 recall eval: quantized top-3 vs exact inner-product
    // top-3 — the accuracy row that prices the 8× compression, same
    // measurement loop as ss_pq_recall prices PQ's 16×. ----
    sql("ss_sq8_recall",
      s"""WITH $sq8CtesSql,
         |ip_gt AS (
         |  SELECT q.qid, v.vec_id, CAST(SUM(q.qe * v.qe) AS BIGINT) AS dot
         |  FROM sqq q JOIN qv v ON v.dim = q.dim AND v.vec_id <> q.qid
         |  GROUP BY q.qid, v.vec_id),
         |ip_ranked AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
         |             ORDER BY dot DESC, vec_id) AS rk
         |  FROM ip_gt)
         |SELECT g.qid AS query_id,
         |       CAST(COUNT(*) AS BIGINT) AS n_top3,
         |       CAST(COUNT(s.vec_id) AS BIGINT) AS n_recalled
         |FROM ip_ranked g LEFT JOIN sq_ranked s
         |  ON s.qid = g.qid AND s.vec_id = g.vec_id AND s.rk <= 3
         |WHERE g.rk <= 3
         |GROUP BY g.qid ORDER BY query_id""") { (s, dir) =>
      val v = varr(s, dir).cache() // shared by params, gt, and sq8 scans
      v.count()
      val (mn, mx) = sq8Params(v)
      val qq = v.filter(expr(QuerySetSql))
        .select(col("vec_id").as("qid"), col("qe").as("qqe"))
      val sq3 = sq8Top3(v, qq, mn, mx)
        .select(col("qid"), col("vec_id"), lit(1).as("hit"))
      v.join(broadcast(qq), col("vec_id") =!= col("qid"))
        .withColumn("dotv", dot("qqe", "qe"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("qid"))
            .orderBy(col("dotv").desc, col("vec_id"))).cast("int"))
        .filter(col("rk") <= 3)
        .select(col("qid"), col("vec_id"))
        .join(sq3, Seq("qid", "vec_id"), "left_outer")
        .groupBy(col("qid"))
        .agg(count(lit(1)).cast("long").as("n_top3"),
          count(col("hit")).cast("long").as("n_recalled"))
        .select(col("qid").as("query_id"), col("n_top3"), col("n_recalled"))
        .orderBy(col("query_id"))
    },

    // ---- binary-quantized top-3: sign bits packed to 16 bytes per
    // vector (32× vs the int-quantized raw form), ranked by Hamming
    // distance — 2 xor + 2 popcount ALU ops per candidate, the
    // cheapest scan a vector store owns. At 10⁹ vectors the whole
    // signature table is 16 GB — memory-resident per executor group
    // where raw vectors are a 0.5 TB scan; this is the first-stage
    // filter in front of an exact rerank (the ss_adc_rerank pattern),
    // priced honestly by ss_bq_recall below. Pack is one map-side
    // array fold; the scan is corpus-linear with the 10 query
    // signatures broadcast. ----
    sql("ss_bq_topk",
      s"""WITH $bqCtesSql
         |SELECT qid AS query_id, CAST(rk AS INT) AS rk,
         |       vec_id AS neighbor_id, hamming
         |FROM bq_ranked WHERE rk <= 3 ORDER BY query_id, rk""") { (s, dir) =>
      val bq = bqFrame(varr(s, dir))
      val qq = bq.filter(expr(QuerySetSql))
        .select(col("vec_id").as("qid"), col("h1").as("q1"), col("h2").as("q2"))
      bqTop3(bq, qq)
        .select(col("qid").as("query_id"), col("rk"),
          col("vec_id").as("neighbor_id"), col("hamming"))
        .orderBy(col("query_id"), col("rk"))
    },

    // ---- BQ recall eval: Hamming top-3 vs exact inner-product top-3
    // — the accuracy row that prices the 32× compression, same
    // measurement loop as ss_sq8_recall prices SQ8's 8×. One bit per
    // dimension keeps only direction octants, so recall sits well
    // below SQ8's; the pair of rows is the compression-accuracy
    // frontier a deployment chooses from. ----
    sql("ss_bq_recall",
      s"""WITH $bqCtesSql,
         |ip_gt AS (
         |  SELECT q.qid, v.vec_id, CAST(SUM(q.qe * v.qe) AS BIGINT) AS dot
         |  FROM (SELECT vec_id AS qid, dim, qe FROM qv WHERE $QuerySetSql) q
         |  JOIN qv v ON v.dim = q.dim AND v.vec_id <> q.qid
         |  GROUP BY q.qid, v.vec_id),
         |ip_ranked AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
         |             ORDER BY dot DESC, vec_id) AS rk
         |  FROM ip_gt)
         |SELECT g.qid AS query_id,
         |       CAST(COUNT(*) AS BIGINT) AS n_top3,
         |       CAST(COUNT(s.vec_id) AS BIGINT) AS n_recalled
         |FROM ip_ranked g LEFT JOIN bq_ranked s
         |  ON s.qid = g.qid AND s.vec_id = g.vec_id AND s.rk <= 3
         |WHERE g.rk <= 3
         |GROUP BY g.qid ORDER BY query_id""") { (s, dir) =>
      val v = varr(s, dir).cache() // shared by the pack scan and the gt scan
      val bq = bqFrame(v)
      val qqSig = bq.filter(expr(QuerySetSql))
        .select(col("vec_id").as("qid"), col("h1").as("q1"), col("h2").as("q2"))
      val bq3 = bqTop3(bq, qqSig)
        .select(col("qid"), col("vec_id"), lit(1).as("hit"))
      val qq = v.filter(expr(QuerySetSql))
        .select(col("vec_id").as("qid"), col("qe").as("qqe"))
      v.join(broadcast(qq), col("vec_id") =!= col("qid"))
        .withColumn("dotv", dot("qqe", "qe"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("qid"))
            .orderBy(col("dotv").desc, col("vec_id"))).cast("int"))
        .filter(col("rk") <= 3)
        .select(col("qid"), col("vec_id"))
        .join(bq3, Seq("qid", "vec_id"), "left_outer")
        .groupBy(col("qid"))
        .agg(count(lit(1)).cast("long").as("n_top3"),
          count(col("hit")).cast("long").as("n_recalled"))
        .select(col("qid").as("query_id"), col("n_top3"), col("n_recalled"))
        .orderBy(col("query_id"))
    },

    // ---- BQ + exact rescoring — the production shape for binary
    // quantization (Qdrant/Weaviate "rescore", FAISS refine): the
    // 16-byte Hamming scan nominates a [[RerankShortlist]]-deep
    // shortlist, then ONLY those 10 raw vectors per query are read
    // and re-ranked by exact inner product. Emits the measured
    // recall@3 of raw BQ vs rescored BQ against the exact truth —
    // the lift is data (5/30 → 13/30 at sf0.01), and the price is
    // 10 raw-vector reads per query where the scan side stayed at 16
    // bytes/vector. The truth/eval dots table is eval-only cost, as
    // in every *_recall op. ----
    sql("ss_bq_rerank_recall",
      s"""WITH $bqCtesSql,
         |bqtop AS (SELECT qid, vec_id FROM bq_ranked WHERE rk <= 3),
         |short AS (SELECT qid, vec_id FROM bq_ranked
         |          WHERE rk <= $RerankShortlist),
         |qq2 AS (SELECT vec_id AS qid, dim, qe AS qqe FROM qv
         |        WHERE $QuerySetSql),
         |dots AS (SELECT q.qid, v.vec_id, CAST(SUM(q.qqe * v.qe) AS BIGINT) AS dot
         |         FROM qq2 q JOIN qv v ON v.dim = q.dim AND v.vec_id <> q.qid
         |         GROUP BY q.qid, v.vec_id),
         |truth AS (SELECT qid, vec_id FROM (
         |            SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
         |              ORDER BY dot DESC, vec_id) AS rk FROM dots) t
         |          WHERE rk <= 3),
         |rtop AS (SELECT qid, vec_id FROM (
         |           SELECT s.qid, s.vec_id,
         |                  ROW_NUMBER() OVER (PARTITION BY s.qid
         |                    ORDER BY d.dot DESC, s.vec_id) AS rk
         |           FROM short s
         |           JOIN dots d ON d.qid = s.qid AND d.vec_id = s.vec_id) t
         |         WHERE rk <= 3),
         |u AS (SELECT 'bq' AS variant, qid, vec_id FROM bqtop
         |      UNION ALL SELECT 'bq_rerank', qid, vec_id FROM rtop),
         |nt AS (SELECT COUNT(*) AS n_truth FROM truth)
         |SELECT u.variant,
         |       CAST(COUNT(t.vec_id) AS BIGINT) AS recalled,
         |       CAST(nt.n_truth AS BIGINT) AS n_truth
         |FROM u
         |LEFT JOIN truth t ON t.qid = u.qid AND t.vec_id = u.vec_id, nt
         |GROUP BY u.variant, nt.n_truth ORDER BY u.variant""") { (s, dir) =>
      val v = varr(s, dir).cache() // pack scan + truth scan + rerank reads
      val bq = bqFrame(v)
      val qqSig = bq.filter(expr(QuerySetSql))
        .select(col("vec_id").as("qid"), col("h1").as("q1"), col("h2").as("q2"))
      val ranked = bqRanked(bq, qqSig)
        .select(col("qid"), col("vec_id"), col("rk")).cache()
      val bqTop = ranked.filter(col("rk") <= 3).select(col("qid"), col("vec_id"))
      val short = ranked.filter(col("rk") <= RerankShortlist)
        .select(col("qid"), col("vec_id"))
      val qq = v.filter(expr(QuerySetSql))
        .select(col("vec_id").as("qid"), col("qe").as("qqe"))
      val dots = v.join(broadcast(qq), col("vec_id") =!= col("qid"))
        .withColumn("dot", dot("qqe", "qe"))
        .select(col("qid"), col("vec_id"), col("dot")).cache()
      val truth = dots.withColumn("rk", row_number().over(
          Window.partitionBy(col("qid")).orderBy(col("dot").desc, col("vec_id"))))
        .filter(col("rk") <= 3).select(col("qid"), col("vec_id"))
      val rtop = short.join(dots, Seq("qid", "vec_id"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("qid")).orderBy(col("dot").desc, col("vec_id"))))
        .filter(col("rk") <= 3).select(col("qid"), col("vec_id"))
      val u = bqTop.withColumn("variant", lit("bq"))
        .unionAll(rtop.withColumn("variant", lit("bq_rerank")))
      u.join(truth.withColumn("hit", lit(1)), Seq("qid", "vec_id"), "left_outer")
        .crossJoin(broadcast(truth.agg(count(lit(1)).cast("long").as("n_truth"))))
        .groupBy(col("variant"), col("n_truth"))
        .agg(count(col("hit")).cast("long").as("recalled"))
        .select(col("variant"), col("recalled"), col("n_truth"))
        .orderBy(col("variant"))
    },

    // ---- k-NN graph construction (the primitive under graph-based
    // ANN and graph clustering): every vector's top-3 neighbors AMONG
    // ITS LSH CANDIDATES, ranked by exact cosine. Candidates come from
    // the banded bucket join (corpus-linear exchange); both pair
    // orientations are emitted map-side; ranking is a window
    // partitioned on vec_id — per-node top-k, no global sort, no
    // all-pairs anything. Nodes whose buckets collide with nothing
    // have no edges, as in any LSH-built graph. ----
    sqlN("ss_knn_graph")(n =>
      s"""WITH ${knnEdgesCtesSqlFor(n)}
         |SELECT vec_id, CAST(rk AS INT) AS rk, nb AS neighbor_id, dot
         |FROM krnk WHERE rk <= 3 ORDER BY vec_id, rk""") { (s, dir) =>
      val v = varr(s, dir).cache() // bucket pass + two edge-side lookups
      knnGraph(v)
        .select(col("vec_id"), col("rk"), col("nb").as("neighbor_id"), col("dot"))
        .orderBy(col("vec_id"), col("rk"))
    },

    // ---- PageRank over the k-NN graph (graph analytics on the
    // similarity structure — the centrality signal data-curation
    // pipelines use to find "hub" documents/embeddings: representative
    // cluster centers rank high, isolated outliers sink to the
    // teleport floor). FIXED-POINT integer arithmetic end-to-end —
    // ranks are 10¹²-scaled integers, one floor division per edge
    // contribution (r // deg) and per damping step, so 5 Pregel-style
    // supersteps produce bit-identical ranks in any engine (FP
    // summation order can never drift a hash). Teleport = 15%/n,
    // damping 85%; nodes without out-edges leak their damped mass
    // (documented simplification — the dangling-redistribution term
    // would add one 1-row broadcast per step), nodes without in-edges
    // hold the teleport floor.
    // Scale shape: the edge table is the memoized corpus×3-row kNN
    // index (localCheckpoint leaf); each superstep is ONE equi-join of
    // ranks⋈edges on src plus one hash-aggregate on dst — at 100 TB
    // you bucket the edge table on src once and every superstep
    // co-locates, the standard iterative-graph layout. Driver controls
    // exactly 5 supersteps; state is one (vec_id, r) row per node. ----
    sqlN("ss_knn_pagerank") { n =>
      val S = 1000000000000L
      val r0 = S / n
      val tele = 3 * S / (20 * n) // (15% · S) / (100% · n), floor
      val iters = (1 to 5).map { i =>
        s"""pr$i AS (
           |  SELECT i.vec_id, CAST($tele + (85 * coalesce(s.acc, 0)) // 100 AS BIGINT) AS r
           |  FROM ids i LEFT JOIN (
           |    SELECT e.dst AS vec_id, SUM(p.r // d.deg) AS acc
           |    FROM e JOIN pr${i - 1} p ON p.vec_id = e.src
           |    JOIN deg d ON d.src = e.src
           |    GROUP BY e.dst) s ON s.vec_id = i.vec_id)"""
      }.mkString(",\n")
      s"""WITH ${knnEdgesCtesSqlFor(n)},
         |ids AS MATERIALIZED (SELECT vec_id FROM embeddings),
         |e AS MATERIALIZED (SELECT vec_id AS src, nb AS dst FROM krnk WHERE rk <= 3),
         |deg AS MATERIALIZED (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
         |pr0 AS (SELECT vec_id, CAST($r0 AS BIGINT) AS r FROM ids),
         |$iters
         |SELECT vec_id, r AS rank_fx FROM pr5 ORDER BY vec_id"""
    } { (s, dir) =>
      val v = varr(s, dir).cache()
      val nn = corpusCount(v)
      val S = 1000000000000L
      val tele = 3 * S / (20 * nn)
      val edges = knnGraph(v).filter(col("rk") <= 3)
        .select(col("vec_id").as("src"), col("nb").as("dst"))
      val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      val ids = t(s, dir, "embeddings").select(col("vec_id"))
      var r = ids.withColumn("r", lit(S / nn))
      for (_ <- 1 to 5) {
        val acc = edges.join(r.withColumnRenamed("vec_id", "src"), Seq("src"))
          .join(deg, Seq("src"))
          .select(col("dst").as("vec_id"), expr("r div deg").as("c"))
          .groupBy(col("vec_id")).agg(sum(col("c")).as("acc"))
        r = ids.join(acc, Seq("vec_id"), "left")
          .select(col("vec_id"),
            (lit(tele) + expr("(85 * coalesce(acc, 0L)) div 100")).cast("long").as("r"))
      }
      r.select(col("vec_id"), col("r").as("rank_fx")).orderBy(col("vec_id"))
    },

    // ---- beam search OVER the k-NN graph (the NSW/HNSW serving
    // primitive, batch-expressed): start each query at its own node,
    // expand frontier → neighbors for a fixed number of hops, score
    // every reached node by exact cosine, keep a bounded beam per hop,
    // answer from everything scored. Deterministic by construction
    // (fixed hops, fixed beam, lexicographic (cos, node) tie-breaks) so
    // the oracle replays the whole walk as a CTE chain.
    // Scale shape: per hop ONE join of the (queries × beam)-bounded
    // frontier against the edge table (hash-partitioned on src; at
    // 100 TB you'd bucket it on src once and every hop co-locates) plus
    // a broadcast of the bounded query set — frontier and state never
    // exceed queries × beam rows, and the scored pool is queries ×
    // beam × degree × hops, all model-sized. No corpus-wide scan after
    // graph construction: that is the point of graph ANN. ----
    sqlN("ss_graph_search")(n =>
      s"""WITH ${beamSearchCtesSqlFor(n)}
         |SELECT qid AS query_id, CAST(rk AS INT) AS rk,
         |       node AS neighbor_id, dot
         |FROM granked WHERE rk <= 3 ORDER BY query_id, rk""") { (s, dir) =>
      val v = varr(s, dir).cache() // graph build + per-hop scoring scans
      beamSearch(v)
        .select(col("qid").as("query_id"), col("rk"),
          col("node").as("neighbor_id"), col("dot"))
        .orderBy(col("query_id"), col("rk"))
    },

    // ---- graph-search recall@3 vs exact cosine top-3: the accuracy
    // row that prices the beam (same measurement loop as ss_pq_recall /
    // ss_sq8_recall price their compressions). ----
    sqlN("ss_graph_recall")(n =>
      s"""WITH ${beamSearchCtesSqlFor(n)},
         |ggtd AS (
         |  SELECT q.qid, b.vec_id, CAST(SUM(a.qe * b.qe) AS BIGINT) AS dot
         |  FROM gq q
         |  JOIN qv a ON a.vec_id = q.qid
         |  JOIN qv b ON b.dim = a.dim AND b.vec_id <> q.qid
         |  GROUP BY q.qid, b.vec_id),
         |ggts AS (
         |  SELECT d.qid, d.vec_id, d.dot, na.n2 AS n2_q, nv.n2 AS n2_v
         |  FROM ggtd d
         |  JOIN norms na ON na.vec_id = d.qid
         |  JOIN norms nv ON nv.vec_id = d.vec_id),
         |ggtr AS (
         |  SELECT qid, vec_id, ROW_NUMBER() OVER (PARTITION BY qid
         |           ORDER BY $cosExprSql DESC, vec_id) AS rk
         |  FROM ggts)
         |SELECT g.qid AS query_id,
         |       CAST(COUNT(*) AS BIGINT) AS n_top3,
         |       CAST(COUNT(s.node) AS BIGINT) AS n_recalled
         |FROM ggtr g LEFT JOIN granked s
         |  ON s.qid = g.qid AND s.node = g.vec_id AND s.rk <= 3
         |WHERE g.rk <= 3
         |GROUP BY g.qid ORDER BY query_id""") { (s, dir) =>
      val v = varr(s, dir).cache() // graph + search + brute-force GT
      v.count()
      val found = beamSearch(v)
        .select(col("qid"), col("node"), lit(1).as("hit"))
      val qq = v.filter(expr(QuerySetSql))
        .select(col("vec_id").as("qid"), col("qe").as("qqe"),
          col("n2").as("n2_q"))
      v.join(broadcast(qq), col("vec_id") =!= col("qid"))
        .withColumn("dot", dot("qqe", "qe"))
        .withColumnRenamed("n2", "n2_v")
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("qid")).orderBy(cosCol.desc, col("vec_id"))))
        .filter(col("rk") <= 3)
        .select(col("qid"), col("vec_id").as("node"))
        .join(found, Seq("qid", "node"), "left_outer")
        .groupBy(col("qid"))
        .agg(count(lit(1)).cast("long").as("n_top3"),
          count(col("hit")).cast("long").as("n_recalled"))
        .select(col("qid").as("query_id"), col("n_top3"), col("n_recalled"))
        .orderBy(col("query_id"))
    },

    // ---- serving-index certification: ONE row per stored index (IVF
    // cell assignment, PQ code table, k-NN graph) carrying its entry
    // count and a two-level Merkle digest — per-bucket md5 over the
    // ordered rows, then md5 over the ordered bucket digests. This
    // certifies WHOLE-index equality against the oracle's replayed
    // build (row-level queries already hash-match row sets; this pins
    // the exact serialized index a deployment would ship). The merkle
    // shape is the scale-correct checksum: each bucket digests only
    // its own partition-sized slice, the final fold sees 32 digests —
    // no orderBy-the-world concatenation. ----
    sqlN("pipe_index_manifest") { n =>
      val subs = (0 until PqM).map(pqSubspaceSql(_, PqSub)).mkString(",\n")
      val codeJoins = (1 until PqM)
        .map(m => s"  JOIN codes$m c$m ON c$m.vec_id = c0.vec_id").mkString("\n")
      val codeConcat = (0 until PqM).map(m => s"CAST(c$m.cid AS VARCHAR)")
        .mkString(" || ':' || ")
      s"""WITH ${knnEdgesCtesSqlFor(n)},
         |${kmeansCellsCtesSqlFor(n)},
         |$subs,
         |cells_rows AS (
         |  SELECT vec_id % 32 AS bucket,
         |         CAST(vec_id AS VARCHAR) || ':' || CAST(cell AS VARCHAR) AS r,
         |         vec_id AS o1, 0 AS o2
         |  FROM cells),
         |codes_rows AS (
         |  SELECT c0.vec_id % 32 AS bucket,
         |         CAST(c0.vec_id AS VARCHAR) || ':' || $codeConcat AS r,
         |         c0.vec_id AS o1, 0 AS o2
         |  FROM codes0 c0
         |$codeJoins),
         |graph_rows AS (
         |  SELECT vec_id % 32 AS bucket,
         |         CAST(vec_id AS VARCHAR) || ':' || CAST(rk AS VARCHAR)
         |           || ':' || CAST(nb AS VARCHAR) AS r,
         |         vec_id AS o1, rk AS o2
         |  FROM krnk WHERE rk <= 3),
         |allrows AS (
         |  SELECT 'ivf_cells' AS index_name, * FROM cells_rows
         |  UNION ALL SELECT 'pq_codes', * FROM codes_rows
         |  UNION ALL SELECT 'knn_graph', * FROM graph_rows),
         |bdg AS (
         |  SELECT index_name, bucket,
         |         md5(string_agg(r, ',' ORDER BY o1, o2)) AS bd,
         |         COUNT(*) AS n
         |  FROM allrows GROUP BY index_name, bucket)
         |SELECT index_name, CAST(SUM(n) AS BIGINT) AS n_entries,
         |       md5(string_agg(bd, ',' ORDER BY bucket)) AS merkle
         |FROM bdg GROUP BY index_name ORDER BY index_name"""
    } { (s, dir) =>
      val v = varr(s, dir).cache()
      v.count()
      def rows(name: String, df: DataFrame, r: Column, o2: Column): DataFrame =
        df.select(lit(name).as("index_name"),
          (col("vec_id") % 32).as("bucket"), r.as("r"),
          col("vec_id").as("o1"), o2.cast("int").as("o2"))
      val cellRows = rows("ivf_cells",
        trainedCells(v).select(col("vec_id"), col("cell")),
        concat_ws(":", col("vec_id"), col("cell")), lit(0))
      val coded = pqCodesAndLuts(s, withSubs(v))._1
      val codeRows = rows("pq_codes", coded,
        concat_ws(":", col("vec_id") +: (0 until PqM).map(m => col(s"code$m")): _*),
        lit(0))
      val graphRows = rows("knn_graph",
        knnGraph(v).select(col("vec_id"), col("rk"), col("nb")),
        concat_ws(":", col("vec_id"), col("rk"), col("nb")), col("rk"))
      cellRows.unionAll(codeRows).unionAll(graphRows)
        .groupBy(col("index_name"), col("bucket"))
        .agg(expr("md5(array_join(transform(array_sort(collect_list(struct(o1, o2, r)))," +
          " x -> x.r), ','))").as("bd"),
          count(lit(1)).as("n"))
        .groupBy(col("index_name"))
        .agg(sum(col("n")).cast("long").as("n_entries"),
          expr("md5(array_join(transform(array_sort(collect_list(struct(bucket, bd)))," +
            " x -> x.bd), ','))").as("merkle"))
        .orderBy(col("index_name"))
    },

    // ---- per-cluster profile of the trained k-means model: size,
    // label diversity, and inertia (Σ ||v − c||², the k-means
    // objective) — the corpus-organization readout behind SemDeDup /
    // cluster-balanced sampling, and the health check that tells you
    // whether the ANN index's cells are usable. Scale shape: the
    // assignment is the map-side literal-argmin; the profile is ONE
    // k-group aggregation; distances reuse the argmin's own score
    // (||v−c||² = s + ‖v‖²), so no second pass touches vectors. ----
    sqlN("ss_cluster_profile")(n =>
      s"""WITH qv AS ($qvSql),
         |norms AS ($normsSql),
         |${kmeansCellsCtesSqlFor(n)},
         |best AS (
         |  SELECT a.vec_id, a.cid, s.n2c - 2 * d.dot + n.n2 AS dist
         |  FROM a$KmeansRounds a
         |  JOIN d$KmeansRounds d ON d.vec_id = a.vec_id AND d.cid = a.cid
         |  JOIN s$KmeansRounds s ON s.cid = a.cid
         |  JOIN norms n ON n.vec_id = a.vec_id)
         |SELECT CAST(b.cid AS BIGINT) AS cell,
         |       CAST(COUNT(*) AS BIGINT) AS n_vecs,
         |       CAST(COUNT(DISTINCT e.label) AS BIGINT) AS n_labels,
         |       CAST(SUM(b.dist) AS BIGINT) AS inertia,
         |       CAST(MIN(b.vec_id) AS BIGINT) AS min_vec,
         |       CAST(MAX(b.vec_id) AS BIGINT) AS max_vec
         |FROM best b JOIN embeddings e ON e.vec_id = b.vec_id
         |GROUP BY b.cid ORDER BY cell""") { (s, dir) =>
      val v = varr(s, dir).cache()
      v.count() // shared by the training rounds and the profile scan
      val cents = scaledKmeansModel(v)
      val assigned =
        if (cents.size <= LiteralAssignMaxK)
          v.withColumn("asg", assignStructOn("qe", cents))
            .select(col("vec_id"), col("label"),
              col("asg").getField("c").as("cell"),
              (col("asg").getField("s") + col("n2")).as("dist"))
        else
          v.join(assignWinnersBroadcast(v, "qe", cents), Seq("vec_id"))
            .select(col("vec_id"), col("label"), col("cell"),
              (col("s") + col("n2")).as("dist"))
      assigned
        .groupBy(col("cell"))
        .agg(count(lit(1)).cast("long").as("n_vecs"),
          countDistinct(col("label")).cast("long").as("n_labels"),
          sum(col("dist")).cast("long").as("inertia"),
          min(col("vec_id")).cast("long").as("min_vec"),
          max(col("vec_id")).cast("long").as("max_vec"))
        .orderBy(col("cell"))
    })
}
