package graft.meta.app

import graft.meta.catalog.CatalogAdapter
import graft.meta.diff.HiveDiff
import graft.meta.model._
import graft.meta.types.Compat

/** EP3 — `--sync`: make the target table's column set equal the
  * source's, with the same compatibility gating as EP1.
  *
  * The reference ships this path broken (calls a nonexistent helper and
  * treats a tuple as a scalar — src/bin/process.py:56-57, :69-75;
  * SURVEY.md Appendix A.1/A.2); this implements the documented intent.
  */
object Sync {

  final case class SyncError(message: String) extends RuntimeException(message)

  final case class SyncResult(
      target: String,
      added: Seq[PartitionKey],
      removed: Seq[PartitionKey],
      applied: Boolean)

  def syncTables(
      catalog: CatalogAdapter,
      src: String,
      tgt: String,
      validate: Boolean = false,
      partCheck: Boolean = true,
      force: Boolean = false): SyncResult = {
    val Array(srcDb, srcTbl) = src.split("\\.", 2)
    val Array(tgtDb, tgtTbl) = tgt.split("\\.", 2)

    val srcInfo = catalog.getTable(srcDb, srcTbl)
      .getOrElse(throw SyncError(s"EntityNotFoundException: $src"))
    val tgtInfo = catalog.getTable(tgtDb, tgtTbl)
      .getOrElse(throw SyncError(s"EntityNotFoundException: $tgt"))

    // initial validation on both sides (process.py:56-58, repaired)
    import graft.meta.rules.Rules
    Seq(src -> srcInfo, tgt -> tgtInfo).foreach { case (name, info) =>
      val checks = Rules.initialChecks(Rules.CatalogFacts(info))
      val failed = checks.collect { case (rule, false) if rule != "ICEBERG_CHECK" => rule }
      if (failed.nonEmpty)
        throw SyncError(s"Initial Validation Failed for $name: ${failed.mkString(", ")}")
    }

    if (partCheck) {
      val (ok, _) = HiveDiff.partitionColCheck(tgtInfo.partitionKeys, srcInfo.partitionKeys)
      if (!ok) throw SyncError("Partition column check failed.")
    }

    // source plays "new", target plays "old" (process.py:77)
    val srcCols = (srcInfo.partitionKeys ++ srcInfo.columns)
      .map(c => ColumnSpec(c.name, c.dataType))
    val tgtCols = tgtInfo.partitionKeys ++ tgtInfo.columns
    val diff = HiveDiff.compareSchema(srcCols, tgtCols)

    if (diff.typeChanged.nonEmpty && !force) {
      val changes = diff.typeChanged.map(m =>
        Compat.TypeChange(m.name, m.typeOld.getOrElse(""), m.typeNew.getOrElse("")))
      val (allOk, _, _) = Compat.classify(changes, "athena")
      if (!allOk) throw SyncError(s"Data type Validation failed for $tgt")
    }

    val applied = !validate && (diff.added.nonEmpty || diff.deleted.nonEmpty)
    if (applied) {
      catalog.updateSchema(tgtDb, tgtTbl, diff.added, diff.deleted) match {
        case Left(err) => throw SyncError(s"Schema update failed for $tgt: $err")
        case Right(_) => ()
      }
    }
    SyncResult(tgt, diff.added, diff.deleted, applied)
  }
}
