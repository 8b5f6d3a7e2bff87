package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

/** One Hive-enabled SparkSession shared by every Spark-touching suite
  * (enableHiveSupport is a static conf — mixing hive and non-hive
  * sessions in one JVM silently drops the metastore). Derby metastore
  * and warehouse live in a fresh temp dir per JVM.
  */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val tmp = Files.createTempDirectory("graft-test-").toFile.getAbsolutePath
    SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", s"$tmp/warehouse")
      .config("javax.jdo.option.ConnectionURL",
        s"jdbc:derby:;databaseName=$tmp/metastore_db;create=true")
      .config("derby.stream.error.file", s"$tmp/derby.log")
      // Glue semantics: updateSchema is a whole-column-list replacement,
      // so the metastore must not veto positional type changes.
      .config("spark.hadoop.hive.metastore.disallow.incompatible.col.type.changes",
        "false")
      .enableHiveSupport()
      .getOrCreate()
  }
}
