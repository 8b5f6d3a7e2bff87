package graft.meta

import org.scalatest.funsuite.AnyFunSuite

import graft.meta.diff.{IcebergDdl, IcebergDiff, PositionPlanner}
import graft.meta.model._
import graft.meta.types.Compat.TypeChange

/** DDL generation from a diff result (`--apply-iceberg` plan). */
class IcebergDdlSpec extends AnyFunSuite {

  test("every change class maps to ordered ALTER statements") {
    val r = IcebergDiff.Result(
      tableName = "spark_catalog.sdb.t",
      columns = Some(IcebergDiff.ColumnsDiff(
        newCols = Seq(
          IcebergDiff.NewColumn("c_new", "string", after = Some("c1"), first = false),
          IcebergDiff.NewColumn("c_top", "int", after = None, first = true)),
        dropped = Seq("c_old"),
        renamed = Seq(IcebergDiff.Rename("c2", "c2_renamed")),
        updatedCompatible = Seq(TypeChange("c3", "int", "bigint")),
        updatedIncompatible = Seq(
          TypeChange("c4", "string", "bigint", backfilledFrom = Some("c4_hist"))),
        positionChanges = Seq(PositionPlanner.PositionChange("c5", Some("c1"), "explicit")),
        firstPosition = None)),
      partitions = IcebergDiff.PartitionsDiff(
        newParts = Seq(IcebergDiff.NewPartition(1001, "hour_rk")),
        dropped = Seq("old_rk"),
        replaced = Seq(IcebergDiff.ReplacedPartition("geo", "region"))),
      props = IcebergDiff.PropsDiff(
        newProps = Map("write.delete.mode" -> "merge-on-read"),
        removed = Seq("stale.prop"),
        updated = Map("write.merge.mode" -> "merge-on-read")),
      migration = false)

    val ddl = IcebergDdl.statements(r)
    val t = "spark_catalog.sdb.t"
    assert(ddl == Seq(
      s"ALTER TABLE $t RENAME COLUMN `c2` TO `c2_renamed`",
      s"ALTER TABLE $t ALTER COLUMN `c3` TYPE bigint",
      s"ALTER TABLE $t RENAME COLUMN `c4` TO `c4_hist`",
      s"ALTER TABLE $t ADD COLUMN `c4` bigint",
      s"ALTER TABLE $t ADD COLUMN `c_new` string AFTER `c1`",
      s"ALTER TABLE $t ADD COLUMN `c_top` int FIRST",
      s"ALTER TABLE $t DROP COLUMN `c_old`",
      s"ALTER TABLE $t ALTER COLUMN `c5` AFTER `c1`",
      s"ALTER TABLE $t ADD PARTITION FIELD `hour_rk`",
      s"ALTER TABLE $t DROP PARTITION FIELD `old_rk`",
      s"ALTER TABLE $t REPLACE PARTITION FIELD `geo` WITH `region`",
      s"ALTER TABLE $t SET TBLPROPERTIES ('write.delete.mode' = 'merge-on-read', " +
        "'write.merge.mode' = 'merge-on-read')",
      s"ALTER TABLE $t UNSET TBLPROPERTIES ('stale.prop')"))
  }

  test("empty diff emits no statements") {
    val r = IcebergDiff.Result("t", None,
      IcebergDiff.PartitionsDiff(Nil, Nil, Nil),
      IcebergDiff.PropsDiff(Map.empty, Nil, Map.empty), migration = false)
    assert(IcebergDdl.statements(r).isEmpty)
  }

  test("apply probes for the Iceberg runtime and skips with the plan intact (this env has none)") {
    assert(!IcebergDdl.runtimeAvailable,
      "this build env ships no iceberg-spark-runtime; if that changed, " +
        "extend this spec to execute against a hadoop catalog")
    val r = IcebergDiff.Result("spark_catalog.sdb.t",
      None, IcebergDiff.PartitionsDiff(
        Seq(IcebergDiff.NewPartition(1000, "day_rk")), Nil, Nil),
      IcebergDiff.PropsDiff(Map.empty, Nil, Map.empty), migration = false)
    val res = IcebergDdl.apply(graft.SparkTestSession.spark, r)
    assert(res.left.exists(_.contains("skipped execution")), res)
    // the plan itself is still emitted for --emit-iceberg-ddl consumers
    assert(IcebergDdl.statements(r).nonEmpty)
  }
}
