package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column
import org.apache.spark.sql.types.DecimalType

/** Parquet table loaders + oracle-parity helpers.
  *
  * Oracle-parity conventions (the driver hash-compares against DuckDB
  * after BOTH sides pass through pandas):
  *  - ALL arithmetic on money/quantity columns happens in the decimal
  *    domain. The generator emits exact 2-decimal values, so casting the
  *    stored double to DECIMAL(18,2) is unambiguous in every engine
  *    (double representation error ~1e-13 << the 0.005 rounding
  *    boundary). Multiplying/subtracting decimals is exact and
  *    engine-identical; only then do we SUM. Never multiply doubles and
  *    cast the product — Spark rounds the shortest-string rendering
  *    (HALF_UP) while DuckDB rounds the exact binary expansion, and the
  *    two diverge in the last digit often enough to break a 60k-row hash.
  *  - aggregate OUTPUTS are integers (BIGINT cents / ten-thousandths),
  *    never DECIMAL: the driver's harness converts DuckDB results with
  *    `.df()` (DECIMAL → float64, `506627.0`) but Spark parquet with
  *    pyarrow `to_pandas()` (DECIMAL → decimal.Decimal('506627.00')) —
  *    value-equal yet hash-different whenever the decimal rendering
  *    carries trailing zeros. Round 2 shipped 9 such representational
  *    hash failures; int64 is identical through every conversion path.
  *  - integer sums are cast to BIGINT (DuckDB widens to HUGEINT),
  *  - every query is deterministically ordered,
  *  - every computed column is aliased identically in Spark and SQL.
  *
  * Overflow headroom: BIGINT cents caps at ~9.2e16 currency units.
  * lineitem at SF 100k (~100 TB) is ~6e11 rows × ~1e5 avg price
  * → ~6e16 cents for a GLOBAL sum — inside the cap; grouped sums are
  * orders of magnitude smaller. Scale-4 sums (×10000) cap at ~9.2e14
  * units, still >10× the same global-sum bound at 100 TB per group.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Exact decimal view of a 2-decimal money/quantity double column. */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Exact BIGINT hundredths (cents) of a 2-decimal double column. */
  def cents(c: Column): Column = (dec2(c) * 100).cast("long")

  /** SUM of a 2-decimal column as BIGINT cents. */
  def csum(c: Column): Column = sum(cents(c)).cast("long")

  /** SUM of a scale-4 decimal product as BIGINT ten-thousandths. */
  def csum4(c: Column): Column = sum((c * 10000).cast("long")).cast("long")

  /** SUM over ints/longs pinned to BIGINT on both engines. */
  def lsum(c: Column): Column = sum(c).cast("long")

  /** Column `i` of a collected 1-row aggregate as a long, 0 when NULL —
    * MAX/MIN over an empty input collects NULL, and every collected-
    * literal site must degrade to the empty result the old
    * crossJoin(broadcast) subplan form null-propagated to, never NPE
    * (zGeomOf's guard, generalized per the r14 advice). */
  private[graft] def longAt(row: org.apache.spark.sql.Row, i: Int = 0): Long =
    if (row.isNullAt(i)) 0L else row.getLong(i)
}
