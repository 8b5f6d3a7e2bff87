package graft.meta

import org.apache.spark.sql.connector.catalog.Identifier
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.meta.diff.{IcebergDdl, IcebergDiff}
import graft.meta.parse.DdlParsers
import graft.meta.types.TypeNorm

/** The Iceberg mirror of SessionCatalogSpec's Derby fixpoint: the
  * planner's DDL (IcebergDdl.statements) is EXECUTED through Spark's
  * real SQL → analyzer → V2 `alterTable(TableChange*)` path against
  * the in-memory [[IceboxCatalog]], then the table is re-diffed and
  * must be `identical`. This proves the emitted plan is not just
  * well-formed strings but a complete, correctly ORDERED program:
  * renames free names before backfills claim them, adds land before
  * drops and moves, and every change class round-trips to an empty
  * diff. (The reference only ever reports —
  * iceberg_schema_handler.py:570-574; this is the apply-path upgrade,
  * runnable without an iceberg-spark-runtime jar.)
  */
class IcebergApplyFixpointSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  // Iceberg's partition-evolution statements are SQL-extension syntax
  // (no vanilla-Spark parse); the shim routes ONLY those three shapes
  // to the catalog double — exactly what the extensions parser does.
  private val AddPart = """ALTER TABLE \S+ ADD PARTITION FIELD `([^`]+)`""".r
  private val DropPart = """ALTER TABLE \S+ DROP PARTITION FIELD `([^`]+)`""".r
  private val ReplacePart =
    """ALTER TABLE \S+ REPLACE PARTITION FIELD `([^`]+)` WITH `([^`]+)`""".r

  private val targetDdl = DdlParsers.normalize(
    """CREATE TABLE IF NOT EXISTS `sdb.t`(
      |  `txn_id` bigint,
      |  `c2_renamed` string, -- renamed_from: c2
      |  `c5` double, -- after: c1
      |  `amount` bigint,
      |  `c4` bigint, -- backfilled_from: c4_hist
      |  `c4_hist` string,
      |  `c1` string,
      |  -- `c_old` double,
      |  `c_new` string, -- after: c4
      |  `c_top` int, -- first
      |  `day_rk` date,
      |  `region` string,
      |  `hour_rk` int
      |)
      |USING iceberg
      |PARTITIONED BY (`region`, `hour_rk`)
      |TBLPROPERTIES ('write.merge.mode' = 'merge-on-read',
      |  'keep.prop' = 'v1', 'fresh.prop' = 'on')""".stripMargin)

  test("plan -> execute through the V2 catalog -> re-diff is the fixpoint") {
    spark.conf.set("spark.sql.catalog.icebox", classOf[IceboxCatalog].getName)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS icebox.sdb")
    spark.sql("DROP TABLE IF EXISTS icebox.sdb.t")
    spark.sql(
      """CREATE TABLE icebox.sdb.t (
        |  txn_id BIGINT, c2 STRING, c5 DOUBLE, amount INT, c4 STRING,
        |  c1 STRING, c_old DOUBLE, day_rk DATE, region STRING, hour_rk INT)
        |USING iceberg
        |PARTITIONED BY (day_rk)
        |TBLPROPERTIES ('write.merge.mode' = 'copy-on-write',
        |  'stale.prop' = 'x', 'keep.prop' = 'v1')""".stripMargin)

    val icebox = spark.sessionState.catalogManager.catalog("icebox")
      .asInstanceOf[IceboxCatalog]
    val ident = Identifier.of(Array("sdb"), "t")

    val hqlCols = DdlParsers.icebergColumns(targetDdl, migration = false)
    val hqlParts = DdlParsers.icebergPartitions(targetDdl)
    val hqlProps = DdlParsers.tblProperties(targetDdl)
    def diff(): IcebergDiff.Result = {
      // the same projection Alterator.icebergPath applies to a real
      // metadata.json view (Alterator.scala:130-134)
      val (fields, parts, props) = icebox.state(ident).icebergView
      IcebergDiff.compare("icebox.sdb.t",
        fields.map(f => f.copy(dataType = TypeNorm.mapIcebergToSparkDtype(f.dataType))),
        hqlCols, parts, hqlParts, props, hqlProps, migration = false)
    }

    val r1 = diff()
    assert(!r1.isEmpty)
    val stmts = IcebergDdl.statements(r1)
    // the full change-class surface is in the plan
    assert(stmts.exists(_.contains("RENAME COLUMN `c2` TO `c2_renamed`")), stmts)
    assert(stmts.exists(_.contains("ALTER COLUMN `amount` TYPE long")), stmts)
    assert(stmts.exists(_.contains("RENAME COLUMN `c4` TO `c4_hist`")), stmts)
    assert(stmts.exists(_.contains("ADD COLUMN `c4` long")), stmts)
    assert(stmts.exists(_.contains("ADD COLUMN `c_top` int FIRST")), stmts)
    assert(stmts.exists(_.contains("DROP COLUMN `c_old`")), stmts)
    assert(stmts.exists(_.contains("ALTER COLUMN `c5` AFTER `c1`")), stmts)
    assert(stmts.exists(_.contains("ADD PARTITION FIELD `hour_rk`")), stmts)
    assert(stmts.exists(_.contains("REPLACE PARTITION FIELD `day_rk` WITH `region`")), stmts)
    assert(stmts.exists(_.contains("UNSET TBLPROPERTIES ('stale.prop')")), stmts)

    stmts.foreach {
      case AddPart(src) => icebox.addPartitionField(ident, src)
      case DropPart(src) => icebox.dropPartitionField(ident, src)
      case ReplacePart(oldSrc, newSrc) =>
        icebox.replacePartitionField(ident, oldSrc, newSrc)
      case sql => spark.sql(sql)
    }

    // the REAL table changed, in the planned order
    val st = icebox.state(ident)
    assert(st.cols.map(_._2.name) == Vector(
      "c_top", "txn_id", "c2_renamed", "amount", "c4_hist", "c1", "c5",
      "day_rk", "region", "hour_rk", "c4", "c_new"), st.cols)
    // Iceberg field-id semantics survived the evolution: the rename
    // kept c2's id, the backfill kept the OLD data under the old id
    // and allocated fresh ids for the new c4 / c_new / c_top
    val ids = st.cols.map { case (id, f) => f.name -> id }.toMap
    assert(ids("c2_renamed") == 2, ids)
    assert(ids("c4_hist") == 5, ids)
    assert(Set(ids("c4"), ids("c_new"), ids("c_top")).forall(_ > 10), ids)
    assert(st.parts.map(_._2) == Vector("region", "hour_rk"), st.parts)

    val r2 = diff()
    assert(r2.isEmpty, s"re-diff after apply must be the fixpoint, got: $r2")
  }

  test("the double rejects dropping an active partition source (Iceberg invariant)") {
    spark.conf.set("spark.sql.catalog.icebox", classOf[IceboxCatalog].getName)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS icebox.sdb")
    spark.sql("DROP TABLE IF EXISTS icebox.sdb.guard")
    spark.sql(
      """CREATE TABLE icebox.sdb.guard (a BIGINT, day_rk DATE)
        |USING iceberg PARTITIONED BY (day_rk)""".stripMargin)
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE icebox.sdb.guard DROP COLUMN `day_rk`")
    }
    assert(e.getMessage.contains("partition source") ||
      Option(e.getCause).exists(_.getMessage.contains("partition source")), e.getMessage)
  }
}
