package graft.meta.diff

import graft.meta.model._
import graft.meta.types.Compat
import graft.meta.types.Compat.TypeChange
import graft.meta.types.TypeNorm

/** Iceberg schema-change planner (J6-J16, J18-J19 + §2.6 cascades).
  *
  * Pure comparison: given the catalog view (field ids + names + types,
  * partition spec, properties) and the annotated DDL view, emits the
  * change plan the reference reports (src/handler/
  * iceberg_schema_handler.py:241-576). Never applies anything.
  *
  * Documented deviations from reference behavior (each a defect fix):
  *  - migration sequence gate (J18) compares ordered (name, type) pairs;
  *    the reference compares dicts with disjoint key sets, which can
  *    never be equal (handler:702-708 — migration always reported as
  *    sequenceMismatch as shipped);
  *  - the partition fallback when only one side has a partition spec
  *    emits names/{field_id,name} records instead of raw descriptor
  *    dicts (handler:505-508 would KeyError on sort — `field-id` vs
  *    `field_id`);
  *  - position-change validation uses the catalog field order already
  *    fetched instead of re-reading raw metadata (handler:191-193 NPEs
  *    in the migration path).
  */
object IcebergDiff {

  final case class NewColumn(name: String, dataType: String,
      after: Option[String], first: Boolean)
  final case class Rename(oldName: String, newName: String)
  final case class NewPartition(fieldId: Int, name: String)
  final case class ReplacedPartition(oldName: String, newName: String)

  final case class ColumnsDiff(
      newCols: Seq[NewColumn],
      dropped: Seq[String],
      renamed: Seq[Rename],
      updatedCompatible: Seq[TypeChange],
      updatedIncompatible: Seq[TypeChange],
      positionChanges: Seq[PositionPlanner.PositionChange],
      firstPosition: Option[String])

  final case class PartitionsDiff(
      newParts: Seq[NewPartition],
      dropped: Seq[String],
      replaced: Seq[ReplacedPartition])

  final case class PropsDiff(
      newProps: Map[String, String],
      removed: Seq[String],
      updated: Map[String, String])

  final case class Result(
      tableName: String,
      columns: Option[ColumnsDiff],
      partitions: PartitionsDiff,
      props: PropsDiff,
      migration: Boolean,
      sequenceMismatch: Boolean = false) {
    def isEmpty: Boolean = !sequenceMismatch &&
      columns.forall(c => c.newCols.isEmpty && c.dropped.isEmpty &&
        c.renamed.isEmpty && c.updatedCompatible.isEmpty &&
        c.updatedIncompatible.isEmpty && c.positionChanges.isEmpty &&
        c.firstPosition.isEmpty) &&
      partitions.newParts.isEmpty && partitions.dropped.isEmpty &&
      partitions.replaced.isEmpty &&
      props.newProps.isEmpty && props.removed.isEmpty && props.updated.isEmpty
  }

  /** R7 — incompatible change without `backfilled_from` aborts the table
    * (handler:359-371).
    */
  final case class MissingBackfillException(tableName: String, columns: Seq[String])
    extends RuntimeException(
      s"backfilled_from is missing for column in DDL file for: $tableName ${columns.mkString(", ")}")

  /** Full table comparison. `catalogCols` must be in current schema
    * order (ids from metadata; synthesized from 1 for migration).
    */
  def compare(
      qualifiedName: String,
      catalogCols: Seq[IcebergField],
      hqlCols: Seq[ColumnSpec],
      catalogParts: Seq[IcebergPartField],
      hqlParts: Seq[IcebergPartField],
      catalogProps: Map[String, String],
      hqlProps: Map[String, String],
      migration: Boolean): Result = {

    if (migration && !sameOrder(hqlCols, catalogCols))
      return Result(qualifiedName, None,
        PartitionsDiff(Nil, Nil, Nil), PropsDiff(Map.empty, Nil, Map.empty),
        migration, sequenceMismatch = true)

    val cat = catalogCols.map(c => c.copy(name = c.name.toLowerCase))
    val hql = hqlCols.map(c => c.copy(name = c.name.toLowerCase))
    val catByName = cat.map(c => c.name -> c).toMap
    val hqlByName = hql.map(c => c.name -> c).toMap

    // J6 — the "common" relation: catalog ⋈ hql on name, catalog order.
    val common: Seq[(IcebergField, ColumnSpec)] =
      cat.flatMap(c => hqlByName.get(c.name).map(c -> _))

    // J7 — commented (explicit) drops: only existing columns.
    val commentedDrops = common.collect { case (c, h) if h.commented => c.name }

    // J8 — implicit drops: in catalog, absent from DDL, not a rename source.
    val renamedFromSet = hql.flatMap(_.renamedFrom).toSet
    val implicitDrops = cat.collect {
      case c if !hqlByName.contains(c.name) && !renamedFromSet.contains(c.name) => c.name
    }
    val dropped = commentedDrops ++ implicitDrops

    // J9 — rename detection: catalog.name == hql.renamed_from.
    val renamed = cat.flatMap { c =>
      hql.filter(_.renamedFrom.contains(c.name)).map(h => Rename(c.name, h.name))
    }

    // J10 — type updates over the common relation.
    val typeChanges = common.collect {
      case (c, h) if c.dataType != h.dataType =>
        TypeChange(c.name, c.dataType, h.dataType, h.after, h.first, h.backfilledFrom)
    }
    val (_, compatible, incompatible) = Compat.classify(typeChanges, "iceberg")
    val missingBackfill = incompatible.filter(_.backfilledFrom.isEmpty)
    if (missingBackfill.nonEmpty)
      throw MissingBackfillException(qualifiedName, missingBackfill.map(_.name))

    // J11/J12 + §2.6 — validated, cascade-expanded position moves.
    val afterCandidates = common.collect {
      case (c, h) if c.dataType == h.dataType && h.after.isDefined && !h.commented => h
    }
    val positionChanges: Seq[PositionPlanner.PositionChange] =
      if (afterCandidates.isEmpty) Nil
      else {
        val afterTargets = afterCandidates.flatMap(_.after).toSet
        val matching = afterTargets.intersect(cat.map(_.name).toSet)
        if (matching.isEmpty) Nil
        else {
          // successor of each matched target in current catalog order
          val order = cat.map(_.name)
          val successor: Map[String, Option[String]] = order.zipWithIndex.collect {
            case (name, idx) if matching.contains(name) =>
              name -> order.lift(idx + 1)
          }.toMap
          // moves that would actually change the layout
          val effective = afterCandidates.filter { h =>
            val target = h.after.get
            successor.get(target).exists(_ != Some(h.name))
          }
          if (effective.isEmpty) Nil
          else {
            val planner = PositionPlanner(afterCandidates.map(h => h.name -> h.after))
            planner.generate(effective.map(h => h.name -> h.after))
          }
        }
      }

    // like J12's effectiveness filter: a `first` directive on the
    // column already leading the catalog order is a no-op, and
    // reporting it anyway would keep the diff non-empty forever — the
    // apply path (IcebergDdl) would never reach its fixpoint
    val firstPosition = common.collectFirst {
      case (c, h) if c.dataType == h.dataType && h.first &&
        !cat.headOption.map(_.name).contains(c.name) => c.name
    }

    // J13 — new columns: DDL-only, not renames/drops/backfill sources.
    val backfilledFromSet = hql.flatMap(_.backfilledFrom).toSet
    val newCols = hql.collect {
      case h if !catByName.contains(h.name) && h.renamedFrom.isEmpty &&
        !h.commented && !backfilledFromSet.contains(h.name) =>
        NewColumn(h.name, h.dataType, h.after, h.first)
    }

    val columnsDiff = ColumnsDiff(newCols, dropped, renamed,
      compatible, if (incompatible.nonEmpty) incompatible else Nil,
      positionChanges, firstPosition)

    // J14 — partition specs, positional by field-id.
    val hqlActiveParts = hqlParts.filterNot(_.commented)
      .map(p => p.copy(name = p.name.toLowerCase))
    val catParts = catalogParts.map(p => p.copy(name = p.name.toLowerCase))
    val partsDiff =
      if (catParts.nonEmpty && hqlActiveParts.nonEmpty) {
        val catById = catParts.map(p => p.fieldId -> p).toMap
        val hqlById = hqlActiveParts.map(p => p.fieldId -> p).toMap
        val allIds = (catParts.map(_.fieldId) ++
          hqlActiveParts.map(_.fieldId).filterNot(catById.contains)).distinct
        val newParts = allIds.collect {
          case id if !catById.contains(id) => NewPartition(id, hqlById(id).name)
        }.sortBy(_.fieldId)
        val droppedParts = allIds.collect {
          case id if !hqlById.contains(id) => catById(id).name
        }
        val replacedParts = allIds.collect {
          case id if catById.contains(id) && hqlById.contains(id) &&
            catById(id).name != hqlById(id).name =>
            ReplacedPartition(catById(id).name, hqlById(id).name)
        }
        PartitionsDiff(newParts, droppedParts, replacedParts)
      } else {
        PartitionsDiff(
          hqlActiveParts.map(p => NewPartition(p.fieldId, p.name)).sortBy(_.fieldId),
          if (hqlActiveParts.isEmpty) catParts.map(_.name) else Nil,
          Nil)
      }

    // J16 — table-property set diffs (handler:517-575).
    val propsDiff =
      if (migration) PropsDiff(hqlProps, Nil, Map.empty)
      else if (catalogProps.nonEmpty && hqlProps.nonEmpty) {
        val catalogFiltered = catalogProps.keySet
          .filterNot(TypeNorm.icebergDefaultProps.contains)
        val removed = (catalogFiltered -- hqlProps.keySet).toSeq
        val newProps = hqlProps.view.filterKeys(k => !catalogProps.contains(k)).toMap
        val updated = hqlProps.view
          .filterKeys(k => catalogProps.contains(k) && catalogProps(k) != hqlProps(k))
          .toMap
        PropsDiff(newProps, removed, updated)
      } else PropsDiff(hqlProps, Nil, Map.empty)

    Result(qualifiedName, Some(columnsDiff), partsDiff, propsDiff, migration)
  }

  /** J18 — migration sequence gate: DDL column order must equal catalog
    * order on (name, type), case-insensitive on names.
    */
  private def sameOrder(hqlCols: Seq[ColumnSpec], catalogCols: Seq[IcebergField]): Boolean =
    hqlCols.size == catalogCols.size &&
      hqlCols.zip(catalogCols).forall { case (h, c) =>
        h.name.toLowerCase == c.name.toLowerCase && h.dataType == c.dataType
      }
}
