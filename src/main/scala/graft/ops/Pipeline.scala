package graft.ops

import org.apache.spark.sql.functions._

import Tables._
import QuerySpec.sql

/** Composed curation pipeline — the end-to-end operator a corpus
  * curation run actually executes, chaining the pillar operators in
  * ONE declarative plan: the Gopher quality gate
  * ([[Text.gopherSignals]], map-side), the MinHash-LSH near-dup keep
  * decision ([[Dedup.clusterLabels]], banded bucket-join + fused
  * min-label propagation), and a final per-(lang, source) yield
  * aggregation — the table a curation job publishes to decide which
  * sources are worth crawling harder.
  *
  * Scale shape: quality signals never shuffle (pure array
  * expressions); the dedup keep reuses the capped LSH pipeline
  * unchanged; the only new exchanges are the doc_id equi-joins of two
  * doc-keyed sides and one word-count-shaped aggregation on (lang,
  * source). Catalyst fuses the whole chain — composing operators adds
  * no materialization boundary (the reference's closest analog is the
  * EP1 fleet loop, alterator.py:518, which is sequential per-table).
  */
object Pipeline {

  val specs: Seq[QuerySpec] = Seq(

    sql("pipe_curated_corpus",
      s"""WITH RECURSIVE ${Dedup.neardupCtesSql},
         |sym AS (SELECT doc_a AS a, doc_b AS b FROM pairs
         |        UNION ALL SELECT doc_b, doc_a FROM pairs),
         |reach AS (SELECT a, b FROM sym
         |          UNION SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a),
         |clusters AS (SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id
         |             FROM reach GROUP BY a),
         |${Text.gopherSigSql},
         |keptdoc AS (
         |  SELECT d.doc_id, d.lang, d.source,
         |         CASE WHEN c.cluster_id IS NULL OR c.cluster_id = d.doc_id
         |              THEN 1 ELSE 0 END AS kept
         |  FROM documents d LEFT JOIN clusters c ON c.doc_id = d.doc_id)
         |SELECT k.lang, k.source,
         |       CAST(COUNT(*) AS BIGINT) AS n_docs,
         |       CAST(SUM(g.quality_pass) AS BIGINT) AS n_quality,
         |       CAST(SUM(k.kept) AS BIGINT) AS n_kept,
         |       CAST(SUM(CASE WHEN g.quality_pass = 1 AND k.kept = 1
         |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_curated
         |FROM keptdoc k JOIN gq g ON g.doc_id = k.doc_id
         |GROUP BY k.lang, k.source
         |ORDER BY k.lang, k.source""") { (s, dir) =>
      val d = t(s, dir, "documents")
      val sig = Text.gopherSignals(d).select(col("doc_id"), col("quality_pass"))
      val clusters = Dedup.clusterLabels(s, dir)
        .select(col("node").as("doc_id"), col("label").cast("long").as("cid"))
      d.select(col("doc_id"), col("lang"), col("source"))
        .join(sig, Seq("doc_id"))
        .join(clusters, Seq("doc_id"), "left_outer")
        .withColumn("kept",
          when(col("cid").isNull || col("cid") === col("doc_id"), 1L).otherwise(0L))
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum(col("quality_pass")).cast("long").as("n_quality"),
          sum(col("kept")).cast("long").as("n_kept"),
          sum(when(col("quality_pass") === 1 && col("kept") === 1L, 1L)
            .otherwise(0L)).cast("long").as("n_curated"))
        .orderBy(col("lang"), col("source"))
    },

    // ---- the FULL training-data manifest: curation (quality gate ∧
    // near-dup keep) feeding concat-and-chunk sequence packing — the
    // artifact a pretraining run actually consumes (which doc lands in
    // which 256-token bin of which (lang, source) stream). One
    // declarative plan end-to-end: the dedup keep and quality gate
    // compose as doc_id equi-joins, the packer's prefix sum is
    // per-stream (never a global window), and token counts reuse the
    // gate's own n_words — no re-tokenization pass. ----
    sql("pipe_training_manifest",
      s"""WITH RECURSIVE ${Dedup.neardupCtesSql},
         |sym AS (SELECT doc_a AS a, doc_b AS b FROM pairs
         |        UNION ALL SELECT doc_b, doc_a FROM pairs),
         |reach AS (SELECT a, b FROM sym
         |          UNION SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a),
         |clusters AS (SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id
         |             FROM reach GROUP BY a),
         |${Text.gopherSigSql},
         |curated AS (
         |  SELECT d.doc_id, d.lang, d.source, g.n_words AS n_tokens
         |  FROM documents d
         |  JOIN gq g ON g.doc_id = d.doc_id
         |  LEFT JOIN clusters c ON c.doc_id = d.doc_id
         |  WHERE g.quality_pass = 1
         |    AND (c.cluster_id IS NULL OR c.cluster_id = d.doc_id)),
         |p AS (
         |  SELECT *,
         |         CAST(coalesce(SUM(n_tokens) OVER (
         |           PARTITION BY lang, source ORDER BY doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |           AS start_tok
         |  FROM curated)
         |SELECT doc_id, lang, source, n_tokens, start_tok,
         |       CAST(start_tok // 256 AS BIGINT) AS bin
         |FROM p ORDER BY doc_id""") { (s, dir) =>
      val d = t(s, dir, "documents")
      val sig = Text.gopherSignals(d)
        .select(col("doc_id"), col("quality_pass"), col("n_words"))
      val clusters = Dedup.clusterLabels(s, dir)
        .select(col("node").as("doc_id"), col("label").cast("long").as("cid"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang"), col("source")).orderBy(col("doc_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      d.select(col("doc_id"), col("lang"), col("source"))
        .join(sig, Seq("doc_id"))
        .join(clusters, Seq("doc_id"), "left_outer")
        .filter(col("quality_pass") === 1 &&
          (col("cid").isNull || col("cid") === col("doc_id")))
        .select(col("doc_id"), col("lang"), col("source"),
          col("n_words").as("n_tokens"))
        .withColumn("start_tok", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
        .select(col("doc_id"), col("lang"), col("source"), col("n_tokens"),
          col("start_tok"),
          expr("CAST(start_tok div 256 AS BIGINT)").as("bin"))
        .orderBy(col("doc_id"))
    })
}
