package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is pathological
  * (one hot key swamping a reducer). AQE's skew-join split handles
  * sort-merge cases automatically; this explicit salt is for when the
  * skewed side must hash-join or the optimizer can't see the skew
  * (e.g. post-UDF keys at 100 TB).
  *
  * Fact rows get a deterministic salt in [0, saltFactor); the dimension
  * side is replicated once per salt value, so the join key becomes
  * (key, salt) and the hot key spreads over saltFactor reducers.
  */
object Skew {

  def saltedJoin(
      fact: DataFrame, dim: DataFrame, key: String,
      saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    // Replicating the dim side is only sound when unmatched dim rows
    // never surface: right/full outer would emit saltFactor null-padded
    // duplicates for every unmatched dim key.
    require(Set("inner", "left", "left_outer", "leftouter")(joinType.toLowerCase),
      s"saltedJoin supports inner/left joins only, got '$joinType' " +
        "(outer-preserved dim rows would be duplicated saltFactor times)")
    // deterministic per-row salt: hash of the whole fact row tuple
    val salted = fact.withColumn("_salt",
      pmod(xxhash64(struct(fact.columns.toIndexedSeq.map(col): _*)), lit(saltFactor)))
    val replicated = dim
      .withColumn("_salt", explode(sequence(lit(0L), lit(saltFactor - 1L))))
    salted.join(replicated, Seq(key, "_salt"), joinType).drop("_salt")
  }
}
