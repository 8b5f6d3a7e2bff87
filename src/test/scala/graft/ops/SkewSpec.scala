package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Salted join ≡ plain join, with the skewed key's rows actually
  * spread across salt partitions.
  */
class SkewSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("saltedEquiJoin matches the plain join on a skewed key") {
    import spark.implicits._
    // 90% of fact rows hit one key — the straggler shape
    val fact = spark.range(10000)
      .select(col("id"),
        when(col("id") % 10 =!= 0, "hot").otherwise(concat(lit("k"), col("id") % 7))
          .as("k"))
    val dim = (Seq("hot") ++ (0 until 7).map(i => s"k$i"))
      .toDF("dk").withColumn("payload", length(col("dk")))

    val plain = fact.join(dim, fact("k") === dim("dk"))
      .groupBy("k").agg(count(lit(1)).as("n"), sum("payload").as("p"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Skew.saltedEquiJoin(fact, dim, "k", "dk", "id", n = 8)
      .groupBy("k").agg(count(lit(1)).as("n"), sum("payload").as("p"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == plain)

    // the hot key really is spread over the salt space
    val spread = fact.withColumn("__salt", pmod(hash(col("id")), lit(8)))
      .filter(col("k") === "hot")
      .select(countDistinct(col("__salt"))).head().getLong(0)
    assert(spread == 8)
  }

  test("outer salted join preserves unmatched fact rows") {
    import spark.implicits._
    val fact = Seq((1L, "a"), (2L, "b"), (3L, "zzz")).toDF("id", "k")
    val dim = Seq(("a", 10), ("b", 20)).toDF("dk", "v")
    val rows = Skew.saltedEquiJoin(fact, dim, "k", "dk", "id", n = 4, "left_outer")
      .select(col("k"), col("v")).collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) -1 else r.getInt(1))).toSet
    assert(rows == Set(("a", 10), ("b", 20), ("zzz", -1)))
  }
}
