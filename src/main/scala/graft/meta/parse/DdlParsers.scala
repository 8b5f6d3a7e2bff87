package graft.meta.parse

import scala.util.matching.Regex

import graft.meta.model._
import graft.meta.types.TypeNorm

/** DDL text extraction (P1-P9) + the annotation pre-parser (§1.3).
  *
  * Spark's ANTLR parser discards SQL comments, so the evolution
  * directives the engine understands (`-- renamed_from:`, `-- after:`,
  * `-- backfilled_from:`, `-- first`, and a leading `--` as a
  * drop-marker) are extracted here, by line-scanning regexes, before any
  * Catalyst involvement. Semantics mirror the reference
  * (src/bin/alterator.py:74-78, src/handler/iceberg_schema_handler.py:65-128)
  * with two documented fixes:
  *  - complex types (`array<...>`, `struct<...>`, `map<...>`) parse
  *    instead of silently vanishing (reference defect A.7);
  *  - the `-- first` directive actually fires (reference defect A.4:
  *    a group-index off-by-one made it dead code).
  */
object DdlParsers {

  /** Normalize DDL text exactly like the reference read path
    * (alterator.py:170-179): lowercase, trim, substitute the
    * `{aws_account_id}` template.
    */
  def normalize(raw: String, accountId: String = ""): String =
    raw.toLowerCase.trim.replace("{aws_account_id}", accountId)

  // P1 — table-name extraction. `[IF NOT EXISTS]*` is kept verbatim from
  // the reference (alterator.py:74): a character-class repetition, not
  // the keyword — part of the format contract.
  private val TableRe: Regex =
    """(?i)TABLE [IF NOT EXISTS]*\s*`(\w+)[\.](\w+)`""".r.unanchored

  def extractTableName(ddl: String): Option[(String, String)] =
    TableRe.findFirstMatchIn(ddl).map(m => (m.group(1), m.group(2)))

  /** P2 — CREATE-statement guard (alterator.py:219). */
  def isCreateStatement(ddl: String): Boolean = ddl.startsWith("create")

  // A type token: word + optional (p[,s]) params, or a complex type with
  // a greedy same-line <...> payload (covers arbitrary nesting as long
  // as the column definition sits on one line — the format contract).
  private val TypeTok = """\w+(?:\(\d+,\s*\d+\)|\(\d+\)|<[^\n]*>)?"""

  // P3 — Hive column + backfilled_from annotation (alterator.py:75-78).
  private val HiveColRe: Regex =
    s"""(?i)`(\\w+)`\\s+($TypeTok),*(?:\\s*--\\s*(?:backfilled_from:\\s*([^\\s,]+)))?""".r

  def hiveColumns(ddl: String): Seq[ColumnSpec] =
    HiveColRe.findAllMatchIn(ddl).map { m =>
      ColumnSpec(
        name = m.group(1),
        dataType = m.group(2),
        backfilledFrom = Option(m.group(3)))
    }.toSeq

  // P4 — Iceberg column + full annotation set (handler:65-68).
  private val IcebergColRe: Regex =
    (s"""(?i)(--\\s*[^\\n`]*)?\\s*`([\\w-]+)`\\s+($TypeTok),*""" +
      """(?:\s*--\s*(?:renamed_from:\s*([^\s,]+)|after:\s*([^\s,]+)|backfilled_from:\s*([^\s,]+)|(first)))?""").r

  def icebergColumns(ddl: String, migration: Boolean): Seq[ColumnSpec] =
    IcebergColRe.findAllMatchIn(ddl).map { m =>
      ColumnSpec(
        name = m.group(2),
        dataType = if (migration) m.group(3) else TypeNorm.convertDataType(m.group(3)),
        commented = Option(m.group(1)).exists(_.contains("--")),
        renamedFrom = Option(m.group(4)).filter(_.nonEmpty),
        after = Option(m.group(5)).filter(_.nonEmpty),
        backfilledFrom = Option(m.group(6)).filter(_.nonEmpty),
        first = m.group(7) != null)
    }.toSeq

  // P5 — typed Hive partition clause (rule_book.py:101-112).
  private val HivePartRe: Regex =
    """(?i)PARTITIONED\s+BY\s+\(([\w`\s,]+)\)""".r.unanchored

  def hivePartitions(ddl: String): Seq[PartitionKey] =
    HivePartRe.findFirstMatchIn(ddl).map { m =>
      m.group(1).toLowerCase.trim.replace("`", "").replaceAll("\\s+", " ")
        .split(",").toSeq.map { entry =>
          val parts = entry.trim.split(" ")
          PartitionKey(parts(0), parts(1))
        }
    }.getOrElse(Seq.empty)

  // P6 — untyped, comment-aware Iceberg partition clause (handler:69, :99-116).
  private val IcebergPartBlockRe: Regex =
    ("""(?is)PARTITIONED BY\s*\(\s*((?:(?:--[^\n]*)?\s*`[^`]+`\s*(?:,|\n|\r\n)?\s*)+)\)""").r.unanchored
  private val IcebergPartEntryRe: Regex = """(?is)(--[^\n`]*)?\s*`([^`]+)`""".r

  def icebergPartitions(ddl: String): Seq[IcebergPartField] =
    IcebergPartBlockRe.findFirstMatchIn(ddl).map { block =>
      IcebergPartEntryRe.findAllMatchIn(block.group(1)).zipWithIndex.map {
        case (m, i) =>
          IcebergPartField(1000 + i, m.group(2), commented = m.group(1) != null)
      }.toSeq
    }.getOrElse(Seq.empty)

  // P7 — TBLPROPERTIES (handler:70-72, :118-127).
  private val TblPropsBlockRe: Regex =
    """(?is)TBLPROPERTIES\s*\(\s*((?:'[\w.-]+'\s*=\s*'[\w.-]+'\s*,?\s*)+)\)""".r.unanchored
  private val TblPropEntryRe: Regex = """'([\w.-]+)'\s*=\s*'([\w.-]+)'""".r

  def tblProperties(ddl: String): Map[String, String] =
    TblPropsBlockRe.findFirstMatchIn(ddl).map { block =>
      TblPropEntryRe.findAllMatchIn(block.group(1))
        .map(m => m.group(1) -> m.group(2)).toMap
    }.getOrElse(Map.empty)
}
