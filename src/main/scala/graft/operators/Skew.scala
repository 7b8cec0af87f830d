package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-handling join helpers (SURVEY §4). AQE's skew-join split handles
  * most runtime skew; explicit salting is for the pathological case where
  * a handful of hot keys dominate a fact-fact join and even split
  * partitions stay hot (e.g. a null-ish sentinel key owning 10% of 100 TB).
  */
object Skew {

  /** Salted equi-join: the (large, skewed) left side gets a deterministic
    * salt in [0, salts) derived from hashing the whole row — NOT rand(),
    * so retries/replays of a task produce identical output — and the
    * (smaller) right side is replicated `salts` times. The join key
    * becomes (key, salt): each hot key's rows spread over `salts`
    * reducers instead of one.
    *
    * Cost model: right side is duplicated x salts through the shuffle —
    * use only when right is much smaller than the hot-key volume, and
    * keep `salts` near the executor-count scale, not higher. */
  def saltJoin(
      left: DataFrame, right: DataFrame, key: String,
      salts: Int = 16, joinType: String = "inner"): DataFrame = {
    require(salts >= 1 && salts <= 4096, "salts in [1,4096]")
    // right/full joins would surface each replicated right row once per
    // salt when unmatched — semantically wrong, so refuse them
    val jt = joinType.toLowerCase.replace("_", "").replace("outer", "")
    require(Set("inner", "left", "leftsemi", "leftanti", "cross").contains(jt),
      s"saltJoin supports inner/left/left_semi/left_anti joins, not $joinType")
    val saltedLeft = left.withColumn("__salt",
      pmod(hash(struct(left.columns.map(col).toIndexedSeq: _*), lit(0x5A17)), lit(salts)))
    val saltedRight = right.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedLeft.join(saltedRight, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
