package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column
import org.apache.spark.sql.types.DecimalType

/** Parquet table loaders + oracle-parity helpers.
  *
  * Oracle-parity conventions (the driver hash-compares against DuckDB):
  *  - never SUM doubles directly (order-dependent FP); cast to decimal
  *    first so the aggregate is exact and associative, and KEEP it
  *    decimal in the output (both engines then emit the same value),
  *  - integer sums are cast to BIGINT (DuckDB widens to HUGEINT),
  *  - every query is deterministically ordered,
  *  - every computed column is aliased identically in Spark and SQL.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Exact decimal view of a double column, for associative aggregation. */
  def dec(c: Column, precision: Int = 28, scale: Int = 6): Column =
    c.cast(DecimalType(precision, scale))

  /** SUM(double) with exact decimal accumulation; stays decimal. */
  def dsum(c: Column): Column = sum(dec(c))

  /** SUM over ints/longs pinned to BIGINT on both engines. */
  def lsum(c: Column): Column = sum(c).cast("long")
}
