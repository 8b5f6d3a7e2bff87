package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered operator: a Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle
  * query over the same parquet tables. `oracle = None` → the driver
  * records a weaker rows-only check; for those, `contract` names the
  * accuracy evidence (the exact twin query and the unit spec bounding
  * the approximation error) so a rows-only row in the driver's report
  * reads as BY DESIGN, not as a coverage gap.
  */
final case class QuerySpec(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    contract: Option[String] = None)

object QuerySpec {
  def sql(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): QuerySpec =
    QuerySpec(name, fn, Some(oracle.stripMargin.trim))

  /** A sketch/approximate operator: no cross-engine oracle exists
    * (sketch internals are engine-specific), so `contract` must point
    * at the exact-twin query + accuracy-bound spec standing in for it. */
  def rowsOnly(name: String, contract: String = "")(
      fn: (SparkSession, String) => DataFrame): QuerySpec =
    QuerySpec(name, fn, None,
      if (contract.isEmpty) None else Some(contract))
}
