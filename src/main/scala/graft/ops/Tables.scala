package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column
import org.apache.spark.sql.types.DecimalType

/** Parquet table loaders + oracle-parity helpers.
  *
  * Oracle-parity conventions (the driver hash-compares against DuckDB):
  *  - ALL arithmetic on money/quantity columns happens in the decimal
  *    domain. The generator emits exact 2-decimal values, so casting the
  *    stored double to DECIMAL(18,2) is unambiguous in every engine
  *    (double representation error ~1e-13 << the 0.005 rounding
  *    boundary). Multiplying/subtracting decimals is exact and
  *    engine-identical; only then do we SUM. Never multiply doubles and
  *    cast the product — Spark rounds the shortest-string rendering
  *    (HALF_UP) while DuckDB rounds the exact binary expansion, and the
  *    two diverge in the last digit often enough to break a 60k-row hash.
  *  - aggregate outputs are pinned to an explicit DECIMAL(38,s) on both
  *    engines so scale/precision match bit-for-bit,
  *  - integer sums are cast to BIGINT (DuckDB widens to HUGEINT),
  *  - every query is deterministically ordered,
  *  - every computed column is aliased identically in Spark and SQL.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Exact decimal view of a 2-decimal money/quantity double column. */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** SUM of a 2-decimal column, pinned to DECIMAL(38,2). */
  def dsum(c: Column): Column = sum(dec2(c)).cast(DecimalType(38, 2))

  /** SUM of a decimal-domain product (scale 4), pinned to DECIMAL(38,4). */
  def dsum4(c: Column): Column = sum(c).cast(DecimalType(38, 4))

  /** SUM over ints/longs pinned to BIGINT on both engines. */
  def lsum(c: Column): Column = sum(c).cast("long")
}
