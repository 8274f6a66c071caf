package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigated equi-join: salt the skewed (large) side into
  * `buckets` sub-keys and replicate the small side across every salt
  * value, so one hot key spreads over `buckets` shuffle partitions
  * instead of serializing on a single reducer.
  *
  * This is the manual fallback for skew AQE can't fix (e.g. when the
  * small side is still too big to broadcast but hot keys overwhelm
  * single partitions). The salt is derived from a per-row id, so the
  * spread needs no statistics; the replicated side grows by
  * `buckets`×, which is the explicit trade.
  *
  * Reference analog: the Distributed engine's sharding of a hot key
  * via `rand()` in the sharding expression
  * (dbms/src/Storages/StorageDistributed.cpp sharding_key).
  */
object SaltedJoin {
  private val saltCol = "__graft_salt"

  def apply(skewed: DataFrame, small: DataFrame, keys: Seq[String],
      buckets: Int, joinType: String = "inner"): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    // right/full outer would emit unmatched small-side rows once per
    // salt bucket — replication is only sound when the small side's
    // non-matches never surface
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti", "cross")
      .contains(joinType.toLowerCase.replace("_", "")),
      s"SaltedJoin does not support join type '$joinType' (small side is replicated)")
    val salted = skewed.withColumn(saltCol,
      pmod(monotonically_increasing_id(), lit(buckets.toLong)).cast("int"))
    val replicated = small.withColumn(saltCol,
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, keys :+ saltCol, joinType).drop(saltCol)
  }
}
