package graft.meta.types

/** Type-domain rewrites (reference: src/rules/rule_book.py:226-298).
  *
  * All functions are pure (the reference mutates caller frames in place —
  * rule_book.py:293-297 — which we deliberately do not replicate).
  */
object TypeNorm {

  private val VarcharRe = "(?i)varchar\\(\\d+\\)".r
  private val DecimalRe = "decimal\\((\\d+),\\s*(\\d+)\\)".r

  /** N1 — `varchar(n)` → `string` (rule_book.py:226-228). */
  def convertVarchar(dataType: String): String =
    VarcharRe.replaceAllIn(dataType, "string")

  /** N2/N4 — canonical decimal spacing `decimal(p,s)` → `decimal(p, s)`
    * (rule_book.py:231-233, :246-259). Non-decimal strings pass through.
    */
  def processDecimal(columnType: String): String =
    DecimalRe.replaceAllIn(columnType, m => s"decimal(${m.group(1)}, ${m.group(2)})")

  def reformatDecimal(columnType: String): String =
    if (!columnType.toLowerCase.contains("decimal")) columnType
    else processDecimal(columnType)

  /** N3 — DDL type → Spark/Iceberg comparison type (rule_book.py:236-243):
    * varchar→string, decimal canonicalized, `timestamp`→`timestamptz`,
    * then SPARK_DTYPE_MAP (`bigint`→`long`). Skipped entirely when a
    * table is being migrated (handler:88).
    */
  def convertDataType(columnType: String): String = {
    val lower = columnType.toLowerCase
    if (lower.startsWith("varchar")) convertVarchar(columnType)
    else if (lower.startsWith("decimal")) processDecimal(columnType)
    else if (lower == "timestamp") "timestamptz"
    else sparkDtypeMap.getOrElse(columnType, columnType)
  }

  /** rule_book.py:332-334 — DDL dtype → Spark dtype. */
  val sparkDtypeMap: Map[String, String] = Map("bigint" -> "long")

  /** N6 — Iceberg metadata type → Spark type (rule_book.py:336-339). */
  val icebergToSparkDtypeMap: Map[String, String] =
    Map("timestamp" -> "timestamp_ntz", "timestamptz" -> "timestamp")

  def mapIcebergToSparkDtype(dataType: String): String =
    icebergToSparkDtypeMap.getOrElse(dataType, dataType)

  /** Iceberg table properties never reported as "removed"
    * (rule_book.py:342-345).
    */
  val icebergDefaultProps: Seq[String] =
    Seq("write.parquet.compression-codec", "schema.name-mapping.default")
}
