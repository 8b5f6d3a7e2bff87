package graft.meta.diff

import graft.meta.model._
import graft.meta.types.TypeNorm

/** Hive-path schema diff (J1-J4) + ordered partition invariant (J15).
  *
  * Per-table descriptor lists are tens of rows, so the core runs as
  * plain Scala on the driver; the same operators are exposed as
  * DataFrame queries in `graft.ops.MetaOps` for fleet-scale use and for
  * the oracle-checked operator inventory.
  */
object HiveDiff {

  /** One row of the J1 full-outer merge on `name`. */
  final case class MergedColumn(
      name: String,
      typeNew: Option[String],
      typeOld: Option[String],
      backfilledFrom: Option[String])

  final case class SchemaDiff(
      added: Seq[PartitionKey],      // {Name, Type} records (helper.py:76-78)
      deleted: Seq[PartitionKey],
      typeChanged: Seq[MergedColumn])

  /** J1-J4 — compare DDL columns vs catalog columns (catalog side =
    * data columns ++ partition keys; alterator.py:388). Mirrors
    * helper.py:34-93: full-outer join on name; added = old-side null,
    * deleted = new-side null, typeChanged = both present and decimal-
    * canonicalized types differ. Order: DDL order for added/changed,
    * catalog order for deleted.
    */
  def compareSchema(newCols: Seq[ColumnSpec], oldCols: Seq[PartitionKey]): SchemaDiff = {
    val oldByName = oldCols.map(c => c.name -> c.dataType).toMap
    val newByName = newCols.map(c => c.name -> c).toMap

    val added = newCols.filterNot(c => oldByName.contains(c.name))
      .map(c => PartitionKey(c.name, c.dataType))
    val deleted = oldCols.filterNot(c => newByName.contains(c.name))
    val typeChanged = newCols.flatMap { c =>
      oldByName.get(c.name).collect {
        case oldType if TypeNorm.reformatDecimal(oldType) != TypeNorm.reformatDecimal(c.dataType) =>
          MergedColumn(c.name, Some(c.dataType), Some(oldType), c.backfilledFrom)
      }
    }
    SchemaDiff(added, deleted, typeChanged)
  }

  /** J15 — ordered partition equality (rule_book.py:92-158).
    *
    * Returns (ok, sameNameSet): position-or-type mismatch fails; the
    * second flag (name sets equal but order/type differs) selects
    * `PartitionOrderValidationError` over `PartitionValidationError`.
    */
  def partitionColCheck(newParts: Seq[PartitionKey], oldParts: Seq[PartitionKey])
      : (Boolean, Boolean) = {
    if (newParts.size != oldParts.size) return (false, false)
    if (newParts.isEmpty) return (true, false)
    val sameNames = newParts.map(_.name).toSet == oldParts.map(_.name).toSet
    val positionsMatch = newParts.zip(oldParts).forall { case (n, o) => n.name == o.name }
    if (!positionsMatch) return (false, sameNames)
    val typesMatch = newParts.zip(oldParts).forall { case (n, o) => n.dataType == o.dataType }
    if (!typesMatch) return (false, sameNames)
    (true, false)
  }
}
