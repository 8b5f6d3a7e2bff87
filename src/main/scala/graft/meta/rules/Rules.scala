package graft.meta.rules

import scala.util.matching.Regex

import graft.meta.model._

/** The validation rule system (R1-R3, P8) — the engine's "analyzer".
  *
  * Each rule evaluates uniformly over a DDL string or a catalog table
  * (reference: src/rules/rule_book.py:13-89, :210-223; runner
  * src/utils/helper.py:12-31).
  */
object Rules {

  val ParquetSerde = "org.apache.hadoop.hive.ql.io.parquet.serde.ParquetHiveSerDe"
  val ParquetInputFormat = "org.apache.hadoop.hive.ql.io.parquet.MapredParquetInputFormat"
  val ParquetOutputFormat = "org.apache.hadoop.hive.ql.io.parquet.MapredParquetOutputFormat"

  sealed trait TableFacts
  final case class DdlFacts(ddl: String) extends TableFacts
  final case class CatalogFacts(info: CatalogTableInfo) extends TableFacts

  private val ExternalRe: Regex = """(?i)CREATE\s*(EXTERNAL)\s*table""".r.unanchored
  private val StoredAsRe: Regex = """(?i)STORED\s+AS\s+(\w+)""".r.unanchored
  private val RowFormatRe: Regex = """(?i)ROW\s+FORMAT\s+SERDE\s+'([\w\.]+)'""".r.unanchored
  private val InputSerdeRe: Regex = """(?i)INPUTFORMAT\s+'([\w\.]+)'""".r.unanchored
  private val OutputSerdeRe: Regex = """(?i)OUTPUTFORMAT\s+'([\w\.]+)'""".r.unanchored
  private val UsingRe: Regex = """(?i)USING\s+(\w+)""".r.unanchored

  /** EXTERNAL_TABLE (rule_book.py:13-30). */
  def externalTableCheck(facts: TableFacts): Boolean = facts match {
    case CatalogFacts(info) => info.tableType.toLowerCase == "external_table"
    case DdlFacts(ddl) => ExternalRe.findFirstIn(ddl).isDefined
  }

  /** PARQUET_CHECK (rule_book.py:33-89). */
  def parquetCheck(facts: TableFacts): Boolean = facts match {
    case CatalogFacts(info) =>
      info.storedAsParquet || (
        info.serializationLibrary.contains(ParquetSerde) &&
          info.inputFormat.contains(ParquetInputFormat) &&
          info.outputFormat.contains(ParquetOutputFormat))
    case DdlFacts(ddl) =>
      StoredAsRe.findFirstMatchIn(ddl) match {
        case None => false
        case Some(m) if m.group(1).toLowerCase == "parquet" => true
        case Some(m) if m.group(1).toLowerCase != "inputformat" => false
        case _ =>
          RowFormatRe.findFirstMatchIn(ddl).exists(_.group(1).equalsIgnoreCase(ParquetSerde)) &&
            InputSerdeRe.findFirstMatchIn(ddl).exists(_.group(1).equalsIgnoreCase(ParquetInputFormat)) &&
            OutputSerdeRe.findFirstMatchIn(ddl).exists(_.group(1).equalsIgnoreCase(ParquetOutputFormat))
      }
  }

  /** ICEBERG_CHECK (rule_book.py:210-223). */
  def icebergCheck(facts: TableFacts): Boolean = facts match {
    case CatalogFacts(info) =>
      info.parameters.getOrElse("table_type", "").toUpperCase == "ICEBERG"
    case DdlFacts(ddl) =>
      UsingRe.findFirstMatchIn(ddl).exists(_.group(1).equalsIgnoreCase("iceberg"))
  }

  /** R1 — the registry, applied as a batch (rule_book.py:301-305). */
  val initialRules: Seq[(String, TableFacts => Boolean)] = Seq(
    "EXTERNAL_TABLE" -> externalTableCheck,
    "PARQUET_CHECK" -> parquetCheck,
    "ICEBERG_CHECK" -> icebergCheck)

  def initialChecks(facts: TableFacts): Map[String, Boolean] =
    initialRules.map { case (name, rule) => name -> rule(facts) }.toMap

  /** R3 — format-change detection (alterator.py:461-480). The catalog
    * default is TEXT when neither parquet nor iceberg — a reference
    * assumption kept for report parity.
    */
  def detectCatalogFormat(info: CatalogTableInfo): TableFormat =
    if (icebergCheck(CatalogFacts(info))) TableFormat.Iceberg
    else if (parquetCheck(CatalogFacts(info))) TableFormat.Parquet
    else TableFormat.Text

  def formatChanged(info: CatalogTableInfo, hqlFormat: TableFormat)
      : Option[(String, String)] = {
    val catalogFormat = detectCatalogFormat(info)
    if (catalogFormat == hqlFormat) None
    else Some(TableFormat.name(catalogFormat) -> TableFormat.name(hqlFormat))
  }
}
