package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skew that AQE cannot fix.
  *
  * AQE's skew-join splits oversized SHUFFLE partitions at runtime, which
  * covers most fact-fact joins. It cannot help when the build side must be
  * replicated anyway (a medium dimension too big to broadcast whole but
  * small enough to replicate `salt`×) or when a downstream stage reuses the
  * join's partitioning and would re-concentrate the hot key. Salting fixes
  * the layout itself: one hot key's rows spread over `salt` partitions
  * permanently.
  *
  * Mechanics: the large side gets a deterministic-per-row salt in
  * [0, salt); the small side is exploded `salt`× (one copy per salt value);
  * the join key becomes (keys..., __salt). Join OUTPUT is identical to the
  * unsalted join — salting only changes physical row placement — verified
  * row-for-row in SkewJoinSpec.
  *
  * Cost model: small side shuffles `salt`× its size; large side's hot key
  * fans out over `salt` tasks. Pick salt ≈ (hot-key rows / target rows per
  * task); 8–32 covers most real skew.
  */
object SkewJoin {

  /** Inner/left equi-join of `large` ⋈ `small` on `keys`, with the large
    * side salted `salt` ways. Supported joinType: "inner", "left". */
  def saltedJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
      salt: Int, joinType: String = "inner"): DataFrame = {
    require(salt >= 1, s"salt must be >= 1: $salt")
    require(Set("inner", "left").contains(joinType),
      s"joinType must be inner|left: $joinType")
    require(!large.columns.contains("__salt") && !small.columns.contains("__salt"),
      "inputs must not already have a __salt column")
    // per-row salt from the row's partition/index — deterministic within a
    // run, and ANY assignment yields the same join output since every salt
    // value meets a full copy of the small side
    val salted = large.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salt.toLong)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salt.toLong - 1))))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }
}
