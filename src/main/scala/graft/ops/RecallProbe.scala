package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (like [[graft.Explain]]): measures, per SF dir, the recall
  * price of the corpus-size-scaled LSH geometry —
  *  - recall@5 vs brute-force 5-NN (plain + multiprobe candidates),
  *  - near-dup pair recall (cos ≥ 0.35) on a 10% sample, stratified
  *    by cosine band.
  *
  * {{{ sbt "runMain graft.ops.RecallProbe <sfDir> [<sfDir> ...]" }}}
  *
  * Measured on the derived fixtures (docs/ROUND7_NOTES.md): the
  * scaled geometry concentrates recall where a dedup pipeline needs
  * it — near-identical pairs (cos ≈ 0.95) recall ≥ 95% (SimilaritySpec
  * plants and asserts them) while borderline-threshold mass
  * (cos 0.35-0.5, the blend floor of the synthetic fixture) is
  * sacrificed to the per-vector candidate budget. Generic k-NN
  * serving at scale belongs to the IVF / nprobe / graph family, not
  * sign-LSH — this probe is the evidence for drawing that line. */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- args) {
      val r = graft.SparkEntry.queries("ss_recall_eval")(spark, dir)
        .agg(sum("n_top5").as("t"), sum("n_recalled").as("r")).head()
      val v = Similarity.varr(spark, dir)
      val n = v.count()
      println(s"dir=$dir n=$n geometry=${Similarity.scaledGeometry(n)} " +
        s"recall@5=${r.getLong(1)}/${r.getLong(0)}")
      // multiprobe recall at its own scaled geometry
      val vc = Similarity.varr(spark, dir).cache(); vc.count()
      val qq = vc.filter(expr("vec_id < 10"))
        .select(col("vec_id").as("qid"), col("qe").as("qqe"), col("n2").as("n2_q"))
      val truth = vc.join(broadcast(qq), col("vec_id") =!= col("qid"))
        .withColumn("l2", col("n2_q") - lit(2) * expr("graft_dot(qqe, qe)") + col("n2"))
        .withColumn("rk", org.apache.spark.sql.functions.row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("qid"))
            .orderBy(col("l2"), col("vec_id"))))
        .filter(col("rk") <= 5)
        .select(col("qid").as("query_id"), col("vec_id").as("neighbor_id"))
      val mcand = Similarity.lshMultiprobeCandidatesAuto(vc)
      val mq = mcand.select(col("vec_a").as("query_id"), col("vec_b").as("neighbor_id"))
        .union(mcand.select(col("vec_b").as("query_id"), col("vec_a").as("neighbor_id")))
      val mr = truth.join(mq.withColumn("hit", lit(1)).distinct(),
          Seq("query_id", "neighbor_id"), "left_outer")
        .agg(count(lit(1)).as("t"), count(col("hit")).as("r")).head()
      println(s"  multiprobe geometry=${Similarity.scaledMultiprobeGeometry(n)} " +
        s"recall@5=${mr.getLong(1)}/${mr.getLong(0)}")
      // NEAR-DUP pair recall (cos >= 0.35, the operator's actual job):
      // brute-force truth on a 10% sample x corpus, vs the registered
      // ss_lsh_neardups output
      val samp = vc.filter(col("vec_id") % 10 === 0)
        .select(col("vec_id").as("sid"), col("qe").as("sqe"), col("n2").as("sn2"))
      val truthNd = vc.join(broadcast(samp), col("vec_id") =!= col("sid"))
        .withColumn("dot", expr("graft_dot(sqe, qe)"))
        .filter(col("dot") > 0 &&
          lit(400) * col("dot") * col("dot") >= lit(49) * col("sn2") * col("n2"))
        .select(least(col("sid"), col("vec_id")).as("vec_a"),
          greatest(col("sid"), col("vec_id")).as("vec_b")).distinct().cache()
      val nTruth = truthNd.count()
      val found = graft.SparkEntry.queries("ss_lsh_neardups")(spark, dir)
        .select(col("vec_a"), col("vec_b"))
      val nHit = truthNd.join(found, Seq("vec_a", "vec_b"), "left_semi").count()
      println(s"  NEAR-DUP recall (cos>=0.35, 10% sample): $nHit/$nTruth")
      // stratified by cosine band: which similarity mass survives?
      val a2 = vc.select(col("vec_id").as("vec_a"), col("qe").as("qa"), col("n2").as("na"))
      val b2 = vc.select(col("vec_id").as("vec_b"), col("qe").as("qb"), col("n2").as("nb"))
      val strat = truthNd.join(a2, Seq("vec_a")).join(b2, Seq("vec_b"))
        .withColumn("cos", expr("graft_dot(qa, qb)").cast("double") /
          sqrt(col("na").cast("double") * col("nb").cast("double")))
        .withColumn("band2", when(col("cos") >= 0.7, "c>=0.7")
          .when(col("cos") >= 0.5, "0.5-0.7").otherwise("0.35-0.5"))
        .join(found.withColumn("hit", lit(1)), Seq("vec_a", "vec_b"), "left_outer")
        .groupBy("band2").agg(count(lit(1)).as("t"), count(col("hit")).as("r"))
        .orderBy("band2").collect()
      strat.foreach(r => println(s"    ${r.getString(0)}: ${r.getLong(2)}/${r.getLong(1)}"))
      truthNd.unpersist()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
