package graft.ops

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import Tables._
import QuerySpec.sql

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

  private val Planes = 8 // 2 bands × 4 planes
  private val Dims = 64
  private val QuerySetSql = "vec_id < 10" // bounded query sample

  /** int-quantized vector + its squared norm, both map-side.
    *
    * All per-vector math here is unrolled over the known dimension
    * count into flat `a[i] * b[i] + …` expression trees: GetArrayItem
    * and the arithmetic are whole-stage-codegen'd, where a lambda
    * formulation (`aggregate(zip_with(...))`) would fall back to
    * interpreted per-element eval — measured several× slower on the
    * verify stage. Spark splits oversized generated methods, so the
    * 64-term sums stay codegen-safe; for very high-dim embeddings
    * (1024+) the lambda form becomes the right trade again. */
  private def varr(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))")
          .as("qe"))
      .withColumn("n2", dot("qe", "qe"))

  /** Exact integer dot product of two quantized arrays, unrolled. */
  private def dot(a: String, b: String): Column =
    (0 until Dims).map(i => col(a)(i) * col(b)(i)).reduce(_ + _)

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

  /** (plane, dim, sign, band, in-band bit weight) — kept row-shaped for
    * the unit spec; the query path consumes [[planeSigns]]. */
  private[ops] def planeRows(dims: Int): Seq[(Int, Int, Int, Int, Long)] =
    for (p <- 0 until Planes; d <- 0 until dims)
      yield (p, d, if (md5Hex(s"$p:$d").charAt(0) < '8') 1 else -1, p / 4, 1L << (p % 4))

  /** Plane p's signed projection, unrolled with literal ±1 weights. */
  private def proj(p: Int): Column =
    (0 until Dims).map { d =>
      if (md5Hex(s"$p:$d").charAt(0) < '8') col("qe")(d) else -col("qe")(d)
    }.reduce(_ + _)

  /** Band b's 4-bit bucket id from 4 signed projections — all map-side. */
  private def bucketCol(b: Int): Column =
    (4 * b until 4 * b + 4).map { p =>
      when(proj(p) > 0, lit(1L << (p % 4))).otherwise(lit(0L))
    }.reduce(_ + _)

  private val planesSql =
    s"""SELECT a.p, b.dim,
       |       CASE WHEN substr(md5(CAST(a.p AS VARCHAR) || ':' || CAST(b.dim AS VARCHAR)), 1, 1)
       |                 IN ('0','1','2','3','4','5','6','7') THEN 1 ELSE -1 END AS sgn,
       |       a.p // 4 AS band,
       |       CAST(2 ** (a.p % 4) AS BIGINT) AS pw
       |FROM (SELECT CAST(range AS INT) AS p FROM range($Planes)) a,
       |     (SELECT CAST(range AS INT) AS dim FROM range($Dims)) b""".stripMargin

  val specs: Seq[QuerySpec] = Seq(

    // ---- exact brute-force top-5 for a bounded query set: broadcast
    // the 10 query vectors past every corpus row, one dot each ----
    sql("ss_brute_topk",
      s"""WITH qv AS ($qvSql),
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
         |  FROM scored)
         |SELECT query_id, CAST(rk AS INT) AS rk, neighbor_id, dot, n2_q, n2_v
         |FROM ranked WHERE rk <= 5 ORDER BY query_id, rk""") { (s, dir) =>
      val v = varr(s, dir)
      val qq = v.filter(expr(QuerySetSql))
        .select(col("vec_id").as("qid"), col("qe").as("qqe"), col("n2").as("n2_q"))
      v.join(broadcast(qq), col("vec_id") =!= col("qid"))
        .withColumn("dot", dot("qqe", "qe"))
        .withColumnRenamed("n2", "n2_v")
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("qid")).orderBy(cosCol.desc, col("vec_id"))).cast("int"))
        .filter(col("rk") <= 5)
        .select(col("qid").as("query_id"), col("rk"),
          col("vec_id").as("neighbor_id"), col("dot"), col("n2_q"), col("n2_v"))
        .orderBy(col("query_id"), col("rk"))
    },

    // ---- sign-LSH near-duplicate pairs (cos ≥ 0.35): projections and
    // band buckets map-side, candidates meet only inside a (band,
    // bucket) cell, dots verified per candidate pair ----
    sql("ss_lsh_neardups",
      s"""WITH qv AS ($qvSql),
         |norms AS ($normsSql),
         |planes AS ($planesSql),
         |proj AS (
         |  SELECT v.vec_id, pl.p, pl.band, pl.pw, CAST(SUM(pl.sgn * v.qe) AS BIGINT) AS proj
         |  FROM qv v JOIN planes pl ON pl.dim = v.dim
         |  GROUP BY v.vec_id, pl.p, pl.band, pl.pw),
         |buckets AS (
         |  SELECT vec_id, band,
         |         CAST(SUM(CASE WHEN proj > 0 THEN pw ELSE 0 END) AS BIGINT) AS bucket
         |  FROM proj GROUP BY vec_id, band),
         |cand AS (
         |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
         |  FROM buckets a JOIN buckets b
         |    ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
         |pairdot AS (
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
         |ORDER BY p.vec_a, p.vec_b""") { (s, dir) =>
      val v = varr(s, dir).cache() // bucket side + both pair sides
      val buckets = v
        .select(col("vec_id"),
          explode(array(
            struct(lit(0).as("band"), bucketCol(0).as("bucket")),
            struct(lit(1).as("band"), bucketCol(1).as("bucket")))).as("bb"))
        .select(col("vec_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
        // self-joined: EAGER materialization (not lazy .cache()) — the
        // two join sides build their shuffle maps concurrently, and a
        // cold cache would let both race through all 8 projections
        .localCheckpoint()
      val a = buckets.select(col("vec_id").as("vec_a"), col("band"), col("bucket"))
      val b = buckets.select(col("vec_id").as("vec_b"), col("band"), col("bucket"))
      val cand = a.join(b, Seq("band", "bucket")).filter(col("vec_a") < col("vec_b"))
        .select(col("vec_a"), col("vec_b")).distinct()
      val sa = v.select(col("vec_id").as("vec_a"), col("qe").as("qe_a"), col("n2").as("n2_a"))
      val sb = v.select(col("vec_id").as("vec_b"), col("qe").as("qe_b"), col("n2").as("n2_b"))
      cand.join(sa, Seq("vec_a")).join(sb, Seq("vec_b"))
        .withColumn("dot", dot("qe_a", "qe_b"))
        .filter(col("dot") > 0 &&
          lit(400) * col("dot") * col("dot") >= lit(49) * col("n2_a") * col("n2_b"))
        .select(col("vec_a"), col("vec_b"), col("dot"), col("n2_a"), col("n2_b"))
        .orderBy(col("vec_a"), col("vec_b"))
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
    })
}
