package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator registers a [[QuerySpec]] in one of the
  * ops modules; this object is just the aggregation point.
  */
object SparkEntry {

  private[graft] def allSpecs: Seq[QuerySpec] =
    Relational.specs ++ MetaOps.specs ++ Dedup.specs ++
      Events.specs ++ Text.specs ++ Similarity.specs ++ Multimodal.specs ++
      Pipeline.specs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q4_revenue_by_segment")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allSpecs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    * Static strings are pinned at [[graft.ops.QuerySpec.OracleRegimeN]];
    * Verify dumps [[oracleSqlFor]] instead, which resolves the
    * corpus-size-conditional oracles against the actual fixture. */
  def oracleSql: Map[String, String] =
    allSpecs.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** The oracle map with every corpus-size-conditional SQL twin
    * generated for THIS fixture's embeddings count — EXACT parity at
    * any SF, not only in the pinned regime (the similarity /
    * semantic-dedup operators derive LSH geometry, k-means k and the
    * training sample from corpus size; their oracles must be derived
    * from the same rules). */
  def oracleSqlFor(spark: SparkSession, sfDir: String): Map[String, String] = {
    lazy val n = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    allSpecs.flatMap(q =>
      q.oracleGen.map(g => q.name -> g(n))
        .orElse(q.oracle.map(q.name -> _))).toMap
  }

  /** For each queries key WITHOUT an oracleSql entry: why rows-only is
    * the intended contract and which exact twin + accuracy-bound spec
    * stands in for the cross-engine check. A driver report line of
    * err="no_oracle" for these names is by design, not a gap. */
  def rowsOnlyContract: Map[String, String] =
    allSpecs.flatMap(q => q.contract.map(q.name -> _)).toMap
}
