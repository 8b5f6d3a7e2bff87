package graft.ops

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  * Cross-engine determinism (DuckDB oracle parity): float arrays are
  * quantized once to BIGINT (`round(x * 1000)` — int8-style
  * quantization, standard ANN practice), after which every dot product
  * and norm is exact integer arithmetic, order-independent under
  * aggregation. Cosine appears only as an ORDER BY key computed by the
  * identical double expression from identical integers (IEEE ops are
  * correctly rounded ⇒ bit-equal in both engines) and is never output;
  * output columns are integers only. Near-dup thresholds are expressed
  * as integer cross-multiplication (400·dot² ≥ 49·n2a·n2b ⟺ cos ≥
  * 0.35 — chosen inside the fixture's cosine range, max ≈ 0.5).
  */
object Similarity {

  private val Planes = 8 // 2 bands × 4 planes
  private val QuerySetSql = "vec_id < 10" // bounded query sample

  /** (vec_id, dim, qe): the quantized exploded view. */
  private def qv(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("vec_id"), col("dim"),
        expr("CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)").as("qe"))

  private val qvSql =
    """SELECT vec_id, i - 1 AS dim,
      |       CAST(round(CAST(embedding[i] AS DOUBLE) * 1000) AS BIGINT) AS qe
      |FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)""".stripMargin

  private def norms(qv: DataFrame): DataFrame =
    qv.groupBy(col("vec_id")).agg(lsum(col("qe") * col("qe")).as("n2"))

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

  /** (plane, dim, sign, band, in-band bit weight). */
  private[ops] def planeRows(dims: Int): Seq[(Int, Int, Int, Int, Long)] =
    for (p <- 0 until Planes; d <- 0 until dims)
      yield (p, d, if (md5Hex(s"$p:$d").charAt(0) < '8') 1 else -1, p / 4, 1L << (p % 4))

  private val planesSql =
    s"""SELECT a.p, b.dim,
       |       CASE WHEN substr(md5(CAST(a.p AS VARCHAR) || ':' || CAST(b.dim AS VARCHAR)), 1, 1)
       |                 IN ('0','1','2','3','4','5','6','7') THEN 1 ELSE -1 END AS sgn,
       |       a.p // 4 AS band,
       |       CAST(2 ** (a.p % 4) AS BIGINT) AS pw
       |FROM (SELECT CAST(range AS INT) AS p FROM range($Planes)) a,
       |     (SELECT CAST(range AS INT) AS dim FROM range(64)) b""".stripMargin

  val specs: Seq[QuerySpec] = Seq(

    // ---- exact brute-force top-5 for a bounded query set ----
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
      val v = qv(s, dir).cache()
      val n = norms(v).cache() // joined twice (query + neighbor side)
      val qq = v.filter(expr(QuerySetSql))
        .select(col("vec_id").as("qid"), col("dim"), col("qe").as("qqe"))
      val dots = broadcast(qq).join(v, Seq("dim"))
        .groupBy(col("qid"), col("vec_id"))
        .agg(lsum(col("qqe") * col("qe")).as("dot"))
      val scored = dots.filter(col("vec_id") =!= col("qid"))
        .join(n.select(col("vec_id").as("qid"), col("n2").as("n2_q")), Seq("qid"))
        .join(n.select(col("vec_id"), col("n2").as("n2_v")), Seq("vec_id"))
      scored
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("qid")).orderBy(cosCol.desc, col("vec_id"))).cast("int"))
        .filter(col("rk") <= 5)
        .select(col("qid").as("query_id"), col("rk"),
          col("vec_id").as("neighbor_id"), col("dot"), col("n2_q"), col("n2_v"))
        .orderBy(col("query_id"), col("rk"))
    },

    // ---- sign-LSH near-duplicate pairs (cos ≥ 0.35), bucketed join ----
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
      import s.implicits._
      val v = qv(s, dir).cache()
      val n = norms(v).cache() // joined twice (query + neighbor side)
      val planes = planeRows(64).toDF("p", "dim", "sgn", "band", "pw")
      val proj = v.join(broadcast(planes), Seq("dim"))
        .groupBy(col("vec_id"), col("p"), col("band"), col("pw"))
        .agg(lsum(col("sgn") * col("qe")).as("proj"))
      val buckets = proj.groupBy(col("vec_id"), col("band"))
        .agg(lsum(when(col("proj") > 0, col("pw")).otherwise(0L)).as("bucket"))
        .cache() // self-joined: avoids recomputing the projections per side
      val a = buckets.select(col("vec_id").as("vec_a"), col("band"), col("bucket"))
      val b = buckets.select(col("vec_id").as("vec_b"), col("band"), col("bucket"))
      val cand = a.join(b, Seq("band", "bucket")).filter(col("vec_a") < col("vec_b"))
        .select(col("vec_a"), col("vec_b")).distinct()
      val va = v.select(col("vec_id").as("vec_a"), col("dim"), col("qe").as("qe_a"))
      val vb = v.select(col("vec_id").as("vec_b"), col("dim"), col("qe").as("qe_b"))
      val pairdot = cand.join(va, Seq("vec_a")).join(vb, Seq("vec_b", "dim"))
        .groupBy(col("vec_a"), col("vec_b"))
        .agg(lsum(col("qe_a") * col("qe_b")).as("dot"))
      pairdot
        .join(n.select(col("vec_id").as("vec_a"), col("n2").as("n2_a")), Seq("vec_a"))
        .join(n.select(col("vec_id").as("vec_b"), col("n2").as("n2_b")), Seq("vec_b"))
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
      val v = qv(s, dir).cache()
      val n = norms(v).cache() // joined twice (query + neighbor side)
      val emb = t(s, dir, "embeddings").select(col("vec_id"), col("label"))
      val qq = emb.filter(expr(QuerySetSql))
        .select(col("vec_id").as("qid"), col("label"))
      val cp = broadcast(qq).join(emb, Seq("label"))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"), col("label"))
      val a = v.select(col("vec_id").as("qid"), col("dim"), col("qe").as("qe_a"))
      val b = v.select(col("vec_id"), col("dim"), col("qe").as("qe_b"))
      val dots = cp.join(a, Seq("qid")).join(b, Seq("vec_id", "dim"))
        .groupBy(col("qid"), col("vec_id"), col("label"))
        .agg(lsum(col("qe_a") * col("qe_b")).as("dot"))
      val scored = dots
        .join(n.select(col("vec_id").as("qid"), col("n2").as("n2_q")), Seq("qid"))
        .join(n.select(col("vec_id"), col("n2").as("n2_v")), Seq("vec_id"))
      scored
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("qid")).orderBy(cosCol.desc, col("vec_id"))).cast("int"))
        .filter(col("rk") <= 3)
        .select(col("qid").as("query_id"), col("rk"),
          col("vec_id").as("neighbor_id"), col("label"), col("dot"))
        .orderBy(col("query_id"), col("rk"))
    })
}
