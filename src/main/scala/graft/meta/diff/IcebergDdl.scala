package graft.meta.diff

import graft.meta.diff.IcebergDiff._

/** §7.4 built-in win: turn an [[IcebergDiff.Result]] into executable
  * Spark `ALTER TABLE` statements. The reference only REPORTS Iceberg
  * changes (alterator.py:570-574); with Iceberg's Spark runtime every
  * change class maps to DDL, so the plan becomes applyable
  * (`--apply-iceberg` mode). Statement order matters and mirrors the
  * report's semantics:
  *
  *   1. renames            (free up / claim names before type edits)
  *   2. type updates       (compatible ones; incompatible are the
  *                          backfill protocol: rename old + add new)
  *   3. new columns        (with AFTER / FIRST placement)
  *   4. drops              (after adds so backfill sources survive)
  *   5. position moves     (cascade-planned order from PositionPlanner)
  *   6. partition evolution
  *   7. property updates
  */
object IcebergDdl {

  private def q(name: String) = s"`$name`"

  def statements(r: Result): Seq[String] = {
    val t = r.tableName
    val cols = r.columns

    val renames = cols.toSeq.flatMap(_.renamed).map(rn =>
      s"ALTER TABLE $t RENAME COLUMN ${q(rn.oldName)} TO ${q(rn.newName)}")

    val typeUpdates = cols.toSeq.flatMap(_.updatedCompatible).map(tc =>
      s"ALTER TABLE $t ALTER COLUMN ${q(tc.name)} TYPE ${tc.newType}")

    // backfill protocol (README.md:416-420): keep the old column under
    // its history name, add the new one with the target type
    val backfills = cols.toSeq.flatMap(_.updatedIncompatible).flatMap { tc =>
      val hist = tc.backfilledFrom.getOrElse(s"${tc.name}_hist")
      Seq(
        s"ALTER TABLE $t RENAME COLUMN ${q(tc.name)} TO ${q(hist)}",
        s"ALTER TABLE $t ADD COLUMN ${q(tc.name)} ${tc.newType}")
    }

    val adds = cols.toSeq.flatMap(_.newCols).map { nc =>
      val placement =
        if (nc.first) " FIRST"
        else nc.after.map(a => s" AFTER ${q(a)}").getOrElse("")
      s"ALTER TABLE $t ADD COLUMN ${q(nc.name)} ${nc.dataType}$placement"
    }

    val drops = cols.toSeq.flatMap(_.dropped).map(d =>
      s"ALTER TABLE $t DROP COLUMN ${q(d)}")

    val moves = cols.toSeq.flatMap(_.positionChanges).map(pc =>
      pc.after match {
        case Some(a) => s"ALTER TABLE $t ALTER COLUMN ${q(pc.name)} AFTER ${q(a)}"
        case None => s"ALTER TABLE $t ALTER COLUMN ${q(pc.name)} FIRST"
      }) ++
      cols.toSeq.flatMap(_.firstPosition).map(c =>
        s"ALTER TABLE $t ALTER COLUMN ${q(c)} FIRST")

    val parts =
      r.partitions.newParts.map(p =>
        s"ALTER TABLE $t ADD PARTITION FIELD ${q(p.name)}") ++
        r.partitions.dropped.map(p =>
          s"ALTER TABLE $t DROP PARTITION FIELD ${q(p)}") ++
        r.partitions.replaced.map(p =>
          s"ALTER TABLE $t REPLACE PARTITION FIELD ${q(p.oldName)} WITH ${q(p.newName)}")

    val props = {
      val sets = r.props.newProps ++ r.props.updated
      val set =
        if (sets.isEmpty) Nil
        else Seq(sets.toSeq.sortBy(_._1)
          .map { case (k, v) => s"'$k' = '$v'" }
          .mkString(s"ALTER TABLE $t SET TBLPROPERTIES (", ", ", ")"))
      val unset =
        if (r.props.removed.isEmpty) Nil
        else Seq(r.props.removed.sorted
          .map(k => s"'$k'")
          .mkString(s"ALTER TABLE $t UNSET TBLPROPERTIES (", ", ", ")"))
      set ++ unset
    }

    renames ++ typeUpdates ++ backfills ++ adds ++ drops ++ moves ++ parts ++ props
  }

  /** True when Iceberg's Spark runtime is on the classpath — the
    * precondition for [[apply]] actually executing the plan. This
    * build environment ships Spark 4.1.2 without
    * `iceberg-spark-runtime`, so the probe returns false there and
    * [[apply]] degrades to a documented skip instead of a
    * ClassNotFound at ALTER time. */
  def runtimeAvailable: Boolean =
    try { Class.forName("org.apache.iceberg.spark.SparkCatalog"); true }
    catch { case _: ClassNotFoundException => false }

  /** Executes the plan's statements against `spark`, in order, stopping
    * at the first failure: Left(skip/failure reason) or Right(count
    * executed). Probe-and-skip: without the Iceberg runtime the plan is
    * still emitted (`--emit-iceberg-ddl`), only execution is refused —
    * matching the reference's report-only behavior on such clusters. */
  def apply(spark: org.apache.spark.sql.SparkSession, r: Result): Either[String, Int] =
    if (!runtimeAvailable)
      Left("iceberg-spark-runtime is not on the classpath; emitted the " +
        s"${statements(r).size}-statement plan but skipped execution " +
        "(add org.apache.iceberg:iceberg-spark-runtime and an Iceberg " +
        "catalog config to apply)")
    else {
      val stmts = statements(r)
      var done = 0
      try {
        stmts.foreach { s => spark.sql(s); done += 1 }
        Right(done)
      } catch {
        case e: Exception =>
          Left(s"statement ${done + 1}/${stmts.size} failed: ${e.getMessage}")
      }
    }
}
