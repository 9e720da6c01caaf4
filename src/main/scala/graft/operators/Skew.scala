package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation for joins whose key distribution is Zipf-like (SURVEY §7:
  * merchant keys; at 100 TB any hot key turns one task into the straggler).
  * AQE's skew-join splitting handles sort-merge joins automatically; salting
  * is the explicit fallback that also works for hash joins and pre-AQE
  * plans.
  */
object Skew {

  /** Join `big` (skewed side) to `small` on `key`, spreading each hot key
    * over `numSalts` partitions. The big side salts each row
    * deterministically from `saltSource` (pass a unique/id column — never a
    * random: re-runs must be reproducible); the small side replicates each
    * row `numSalts` times. Result is identical to the unsalted join.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      numSalts: Int, saltSource: Column, joinType: String = "inner"): DataFrame = {
    // Right/full outer would emit each unmatched small-side row once per
    // salt replica — only big-side-preserving join types are equivalent.
    val allowed = Set("inner", "left", "left_outer", "leftouter",
      "left_semi", "leftsemi", "left_anti", "leftanti")
    require(allowed.contains(joinType.toLowerCase),
      s"saltedJoin supports big-side-preserving joins only, got $joinType")
    val b = big.withColumn("__salt",
      pmod(xxhash64(saltSource), lit(numSalts)).cast("int"))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(numSalts - 1))))
    b.join(s, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
