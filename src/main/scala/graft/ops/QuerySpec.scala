package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered operator: a Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle
  * query over the same parquet tables. `oracle = None` → the driver
  * records a weaker rows-only check; for those, `contract` names the
  * accuracy evidence (the exact twin query and the unit spec bounding
  * the approximation error) so a rows-only row in the driver's report
  * reads as BY DESIGN, not as a coverage gap.
  *
  * `oracleGen`, when present, generates the oracle SQL as a FUNCTION
  * of the fixture's embeddings-corpus row count — the similarity /
  * semantic-dedup operators size their LSH geometry, k-means k and
  * training sample from corpus size (the 100 TB knob), so their SQL
  * twins must be derived from the SAME sizing rules or EXACT parity
  * would hold only at the pinned oracle regime. Verify resolves
  * `oracleGen` against the actual fixture; `oracle` is always
  * `oracleGen(OracleRegimeN)` for these specs (asserted by
  * OracleScaleSpec), so the static map stays correct in-regime.
  */
final case class QuerySpec(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    contract: Option[String] = None,
    oracleGen: Option[Long => String] = None)

object QuerySpec {

  /** The corpus size every static oracle string is generated at:
    * 2,000 embeddings — the shipped sf0.1 fixture's exact count, well
    * inside the regime where the scaled geometry is exactly
    * [[Similarity.DefaultGeometry]] / k=8 / unsampled training
    * (scaledK uses integer division n/250, so the regime holds through
    * n = 2,249; the first above-regime n is 2,250 — consistent with
    * OracleScaleSpec's boundary remark, which asserts the pin). The
    * sf0.01 oracle fixture's 500 sit well inside; ContractSpec pins
    * the oracle fixture to the regime. Above-regime parity evidence
    * comes from the generators run against a derived 10× fixture
    * (docs/oracle_scale_check_sf1.txt). */
  val OracleRegimeN = 2000L

  def sql(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): QuerySpec =
    QuerySpec(name, fn, Some(oracle.stripMargin.trim))

  /** A corpus-size-conditional oracle: `gen(n)` must replay exactly
    * what the Spark side computes at an n-row embeddings corpus. The
    * static `oracle` is pinned at [[OracleRegimeN]]. */
  def sqlN(name: String)(gen: Long => String)(
      fn: (SparkSession, String) => DataFrame): QuerySpec = {
    val g = (n: Long) => gen(n).stripMargin.trim
    QuerySpec(name, fn, Some(g(OracleRegimeN)), oracleGen = Some(g))
  }

  /** A sketch/approximate operator: no cross-engine oracle exists
    * (sketch internals are engine-specific), so `contract` must point
    * at the exact-twin query + accuracy-bound spec standing in for it. */
  def rowsOnly(name: String, contract: String = "")(
      fn: (SparkSession, String) => DataFrame): QuerySpec =
    QuerySpec(name, fn, None,
      if (contract.isEmpty) None else Some(contract))
}
