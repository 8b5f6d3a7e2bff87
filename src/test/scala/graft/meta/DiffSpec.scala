package graft.meta

import org.scalatest.funsuite.AnyFunSuite

import graft.meta.diff.{HiveDiff, IcebergDiff, PositionPlanner}
import graft.meta.model._

class HiveDiffSpec extends AnyFunSuite {
  private def cols(pairs: (String, String)*): Seq[PartitionKey] =
    pairs.map { case (n, t) => PartitionKey(n, t) }
  private def specs(pairs: (String, String)*): Seq[ColumnSpec] =
    pairs.map { case (n, t) => ColumnSpec(n, t) }

  test("J1-J3 added and deleted columns") {
    val d = HiveDiff.compareSchema(
      specs("a" -> "int", "b" -> "string", "d" -> "date"),
      cols("a" -> "int", "c" -> "double"))
    assert(d.added == cols("b" -> "string", "d" -> "date"))
    assert(d.deleted == cols("c" -> "double"))
    assert(d.typeChanged.isEmpty)
  }

  test("J4 type change with decimal canonicalization") {
    val d = HiveDiff.compareSchema(
      specs("a" -> "decimal(18, 2)", "b" -> "bigint"),
      cols("a" -> "decimal(18,2)", "b" -> "int"))
    // decimal spacing difference is NOT a change; int->bigint is
    assert(d.typeChanged.map(_.name) == Seq("b"))
    assert(d.typeChanged.head.typeOld.contains("int"))
    assert(d.typeChanged.head.typeNew.contains("bigint"))
  }

  test("diff(s, s) is empty") {
    val s = cols("a" -> "int", "b" -> "string")
    val d = HiveDiff.compareSchema(s.map(c => ColumnSpec(c.name, c.dataType)), s)
    assert(d.added.isEmpty && d.deleted.isEmpty && d.typeChanged.isEmpty)
  }

  test("J15 partition invariant: ok / order / count / type") {
    val base = cols("day_rk" -> "date", "run_rk" -> "int")
    assert(HiveDiff.partitionColCheck(base, base) == (true, false))
    assert(HiveDiff.partitionColCheck(Nil, Nil) == (true, false))
    // reorder: same name set -> order flag set
    assert(HiveDiff.partitionColCheck(
      cols("run_rk" -> "int", "day_rk" -> "date"), base) == (false, true))
    // extra column -> plain validation failure
    assert(HiveDiff.partitionColCheck(
      base ++ cols("x" -> "int"), base) == (false, false))
    // renamed partition -> name sets differ
    assert(HiveDiff.partitionColCheck(
      cols("day_rk" -> "date", "other" -> "int"), base) == (false, false))
    // type change at same position -> fails, name set equal
    assert(HiveDiff.partitionColCheck(
      cols("day_rk" -> "date", "run_rk" -> "bigint"), base) == (false, true))
  }
}

class PositionPlannerSpec extends AnyFunSuite {
  // The reference's own doc-test scenario
  // (column_position_manager.py:132-156).
  private val positions = Seq(
    "month_yr" -> None,
    "month" -> None,
    "batch_run_type" -> None,
    "orig_batch_type" -> None,
    "day_rk" -> None,
    "rawfile_rundate" -> None,
    "sovereign_pse_flag" -> Some("cva_exemp_int_grp_comp_flag"),
    "sovereign_guarantee_flag" -> Some("sovereign_pse_flag"),
    "sec_w_factor" -> Some("sovereign_guarantee_flag"),
    "sec_k_sa" -> Some("sec_w_factor"))

  test("cascade from a direct move, topologically ordered") {
    val planner = PositionPlanner(positions)
    val changes = planner.generate(Seq("sovereign_pse_flag" -> Some("orig_batch_type")))
    assert(changes.map(_.name) == Seq(
      "sovereign_pse_flag", "sovereign_guarantee_flag", "sec_w_factor", "sec_k_sa"))
    assert(changes.head.reason == "direct")
    assert(changes.head.after.contains("orig_batch_type"))
    assert(changes.tail.forall(_.reason == "cascade"))
    // cascade columns keep their declared after targets
    assert(changes(1).after.contains("sovereign_pse_flag"))
  }

  test("each column emitted at most once; direct exactly for requested") {
    val planner = PositionPlanner(positions)
    val changes = planner.generate(Seq(
      "sovereign_pse_flag" -> Some("orig_batch_type"),
      "sec_w_factor" -> Some("month")))
    assert(changes.map(_.name).distinct.size == changes.size)
    assert(changes.count(_.reason == "direct") == 1) // second was already cascaded
  }

  test("independent move has no cascade") {
    val planner = PositionPlanner(Seq("a" -> Some("x"), "b" -> Some("y")))
    val changes = planner.generate(Seq("a" -> Some("z")))
    assert(changes == Seq(PositionPlanner.PositionChange("a", Some("z"), "direct")))
  }
}

class IcebergDiffSpec extends AnyFunSuite {
  import graft.meta.parse.DdlParsers

  private val catalogCols = Seq(
    IcebergField(1, "col1", "string"),
    IcebergField(2, "col2", "double"),
    IcebergField(3, "col3", "decimal(18, 7)"),
    IcebergField(4, "col4", "long"),
    IcebergField(5, "day_rk", "date"),
    IcebergField(6, "run_rk", "int"),
    IcebergField(7, "col6", "double"),
    IcebergField(8, "seq_col", "string"),
    IcebergField(9, "lead_col", "string"))
  private val catalogParts = Seq(
    IcebergPartField(1000, "day_rk"), IcebergPartField(1001, "run_rk"))
  private val catalogProps = Map(
    "write.parquet.compression-codec" -> "zstd", // default-excluded
    "write.merge.mode" -> "copy-on-write",
    "stale.prop" -> "x")

  private def run(result: String => String = identity) = {
    val ddl = Fixtures.icebergDdl
    IcebergDiff.compare(
      "spark_catalog.idb.ic_sales",
      catalogCols,
      DdlParsers.icebergColumns(ddl, migration = false),
      catalogParts,
      DdlParsers.icebergPartitions(ddl),
      catalogProps,
      DdlParsers.tblProperties(ddl),
      migration = false)
  }

  test("J7 commented drop + J8 implicit drop") {
    val r = run()
    // col2 commented; col6_hist is NOT in catalog so not a drop;
    // col4 is renamed_from source so NOT an implicit drop.
    assert(r.columns.get.dropped == Seq("col2"))
  }

  test("J9 rename detection") {
    assert(run().columns.get.renamed == Seq(IcebergDiff.Rename("col4", "col5")))
  }

  test("J10 type update with backfill satisfied") {
    val r = run()
    // col6 double->long is incompatible, carries backfilled_from
    assert(r.columns.get.updatedIncompatible.map(_.name) == Seq("col6"))
    assert(r.columns.get.updatedIncompatible.head.backfilledFrom.contains("col6_hist"))
    assert(r.columns.get.updatedCompatible.isEmpty)
  }

  test("R7 missing backfill aborts the table") {
    val hql = Seq(ColumnSpec("col6", "long")) // incompatible, no backfill
    val ex = intercept[IcebergDiff.MissingBackfillException] {
      IcebergDiff.compare("c.d.t", Seq(IcebergField(1, "col6", "double")),
        hql, Nil, Nil, Map.empty, Map.empty, migration = false)
    }
    assert(ex.columns == Seq("col6"))
  }

  test("J11/J12 effective position move with cascade") {
    val r = run()
    // seq_col declares after: col3; current successor of col3 is col4 ->
    // effective move.
    assert(r.columns.get.positionChanges.map(_.name) == Seq("seq_col"))
    assert(r.columns.get.positionChanges.head.after.contains("col3"))
    assert(r.columns.get.positionChanges.head.reason == "direct")
  }

  test("J12 already-in-place move is a no-op") {
    val cat = Seq(IcebergField(1, "a", "string"), IcebergField(2, "b", "string"))
    val hql = Seq(ColumnSpec("a", "string"), ColumnSpec("b", "string", after = Some("a")))
    val r = IcebergDiff.compare("c.d.t", cat, hql, Nil, Nil, Map.empty, Map.empty, false)
    assert(r.columns.get.positionChanges.isEmpty)
  }

  test("first directive surfaces (fixes A.4)") {
    assert(run().columns.get.firstPosition.contains("lead_col"))
  }

  test("J13 new columns exclude renames/drops/backfill sources") {
    val r = run()
    // col5 is a rename, col6_hist is a backfill source -> only new_col
    assert(r.columns.get.newCols.map(_.name) == Seq("new_col"))
    assert(r.columns.get.newCols.head.dataType == "timestamptz")
  }

  test("J14 partition spec: dropped + new by field-id") {
    val r = run()
    // catalog: day_rk(1000), run_rk(1001); hql active: day_rk(1000), batch_rk(1002)
    assert(r.partitions.newParts == Seq(IcebergDiff.NewPartition(1002, "batch_rk")))
    assert(r.partitions.dropped == Seq("run_rk"))
    assert(r.partitions.replaced.isEmpty)
  }

  test("J14 replaced partition at same field-id") {
    val r = IcebergDiff.compare("c.d.t",
      Seq(IcebergField(1, "a", "int")),
      Seq(ColumnSpec("a", "int")),
      Seq(IcebergPartField(1000, "day_rk")),
      Seq(IcebergPartField(1000, "month_rk")),
      Map.empty, Map.empty, false)
    assert(r.partitions.replaced == Seq(IcebergDiff.ReplacedPartition("day_rk", "month_rk")))
  }

  test("J16 tblprops: new/removed/updated with default exclusion") {
    val r = run()
    assert(r.props.newProps.keySet == Set("write.delete.mode", "write.update.mode"))
    assert(r.props.removed == Seq("stale.prop")) // compression-codec excluded
    assert(r.props.updated == Map("write.merge.mode" -> "merge-on-read"))
  }

  test("J18 migration sequence gate") {
    val cat = Seq(IcebergField(1, "a", "int"), IcebergField(2, "b", "string"))
    val okHql = Seq(ColumnSpec("a", "int"), ColumnSpec("b", "string"))
    val badHql = Seq(ColumnSpec("b", "string"), ColumnSpec("a", "int"))
    assert(!IcebergDiff.compare("c.d.t", cat, okHql, Nil, Nil, Map.empty, Map.empty,
      migration = true).sequenceMismatch)
    val r = IcebergDiff.compare("c.d.t", cat, badHql, Nil, Nil, Map.empty, Map.empty,
      migration = true)
    assert(r.sequenceMismatch)
  }

  test("identical table yields empty result") {
    val cat = Seq(IcebergField(1, "a", "int"))
    val r = IcebergDiff.compare("c.d.t", cat, Seq(ColumnSpec("a", "int")),
      Nil, Nil, Map.empty, Map.empty, false)
    assert(r.isEmpty)
  }
}
