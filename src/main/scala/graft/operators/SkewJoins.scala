package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual key-salting for skew joins (SURVEY §5). AQE's skew-join split
  * handles most cases at runtime; explicit salting is the deterministic
  * fallback for pathological hot keys (the `null`/`unknown` user, the
  * boilerplate document) when both sides are too big to broadcast.
  */
object SkewJoins {

  /** Inner equi-join with a salted key: the left (skewed) side gets a
    * deterministic per-row salt in [0, salt); the right side is replicated
    * `salt` times. Hot keys spread across `salt` reducers; results are
    * identical to the plain join.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, salt: Int): DataFrame = {
    require(salt >= 1)
    // deterministic salt from the full row hash (no rand(): results must be
    // stable under retries/speculative execution)
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(left.columns.map(col): _*), lit(salt.toLong)).cast("int"))
    val replicatedRight = right.withColumn("__salt",
      explode(expr(s"sequence(0, ${salt - 1})")))
    saltedLeft.join(replicatedRight, Seq(key, "__salt")).drop("__salt")
  }
}
