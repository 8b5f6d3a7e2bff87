package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is power-law —
  * the standard salting transform, packaged as an operator.
  *
  * A plain equi-join shuffles both sides on the key; a hot key sends
  * its entire fact volume to ONE reducer (the straggler that kills
  * 100 TB jobs even with AQE's skew split, which only helps
  * sort-merge sides it can subdivide). Salting rewrites
  *
  *   fact ⋈_key dim   ⇒   fact' ⋈_{key, salt} dim'
  *
  * where fact' gets a uniform random-ish salt in [0, n) derived from a
  * stable row attribute (no rand(): deterministic retries matter) and
  * dim' is replicated n times. The hot key's rows now spread over n
  * reducers; the dim replication is n× a dim-sized table — cheap.
  *
  * AQE complements this (set spark.sql.adaptive.skewJoin.enabled);
  * salting is the code-level tool when the dim side is too big to
  * broadcast but small enough to replicate.
  */
object Skew {

  /** Drops rows belonging to groups larger than `maxSize` — the
    * hot-bucket guard for LSH-style candidate self-joins.
    *
    * A bucket of n members contributes n² candidate pairs that all
    * land on ONE reducer (the join key IS the bucket id — salting
    * can't split it without losing intra-bucket pairs), so one
    * degenerate bucket — boilerplate text, zero vectors, a hash
    * collision — turns the candidate join quadratic on a single
    * partition at 100 TB. Oversize buckets are also useless for
    * similarity (they pair everything with everything), so the
    * standard LSH practice is to drop them outright; callers mirror
    * the same cap in their oracle SQL so engines agree when it fires.
    * Cost: one map-side-combined count per group + a re-join against
    * the (tiny, group-count-sized) size relation.
    */
  def dropOversizeGroups(df: DataFrame, keys: Seq[String], maxSize: Long): DataFrame = {
    require(maxSize > 0, "maxSize must be positive")
    val sizes = df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__group_n"))
      .filter(col("__group_n") <= maxSize)
      .drop("__group_n")
    df.join(sizes, keys)
  }

  /** Equi-join `fact ⋈ dim` on `factKey == dimKey`, salted `n` ways.
    * `saltSource` must be a fact column with per-row variation (an id,
    * an event time) — it seeds the deterministic salt.
    */
  def saltedEquiJoin(
      fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String,
      saltSource: String, n: Int,
      joinType: String = "inner"): DataFrame = {
    require(n > 0, "salt factor must be positive")
    val salted = fact.withColumn("__salt", pmod(hash(col(saltSource)), lit(n)))
    val replicated = dim
      .withColumn("__salt", explode(sequence(lit(0), lit(n - 1))))
    salted
      .join(replicated,
        salted(factKey) === replicated(dimKey) &&
          salted("__salt") === replicated("__salt"),
        joinType)
      .drop("__salt")
  }
}
