package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter join pruning (runtime filter), beyond-reference.
  *
  * At 100 TB the expensive part of a selective fact⋈dim join is shuffling
  * fact rows that can never match. A Bloom filter built from the dim-side
  * join keys and pushed into a fact-side `where` drops most of them before
  * the Exchange, at the cost of one small dim-side aggregation. False
  * positives only cost wasted shuffle bytes — the exact join behind the
  * filter keeps the result identical (gate q71 proves bit-equality with the
  * plain join).
  *
  * The filter itself is an `Array[Long]` bitmap built with k independent
  * `xxhash64(seed, key)` probes. Membership is tested with composed builtin
  * expressions (element_at / shiftright / bitwiseAND) against the bitmap as
  * a foldable array literal, so the test stays inside whole-stage codegen —
  * no UDF, no broadcast variable plumbing.
  */
object BloomPrune {

  /** Build the bitmap from the dim side's key column.
    *
    * Distributed probe-position computation; the driver only materializes
    * the DISTINCT set bit positions, which is bounded by `numBits` (not by
    * the dim cardinality), so the collect is safe by construction.
    */
  def build(dim: DataFrame, keyCol: String, numBits: Int = 1 << 16,
      numHashes: Int = 3): Array[Long] = {
    require(numBits > 0 && numBits % 64 == 0, s"numBits must be a positive multiple of 64, got $numBits")
    require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")
    val probes = (0 until numHashes).map(i =>
      pmod(xxhash64(lit(i), col(keyCol)), lit(numBits.toLong)).cast("int"))
    val positions = dim
      .where(col(keyCol).isNotNull)
      .select(explode(array(probes: _*)).as("p"))
      .distinct()
      .collect()
      .map(_.getInt(0))
    val words = new Array[Long](numBits / 64)
    positions.foreach(p => words(p >> 6) |= 1L << (p & 63))
    words
  }

  /** Membership-test column against a bitmap from [[build]]. Must be called
    * with the same numBits/numHashes the bitmap was built with.
    *
    * `call_function("shiftright", …)` is used because the in-word bit index
    * is itself a column and the Scala `shiftright` helper only accepts a
    * literal shift; the SQL builtin takes two expressions.
    */
  def mightContain(bitmap: Array[Long], key: Column, numBits: Int = 1 << 16,
      numHashes: Int = 3): Column = {
    require(bitmap.length * 64 == numBits,
      s"bitmap has ${bitmap.length * 64} bits, expected $numBits")
    val words = typedLit(bitmap.toSeq)
    (0 until numHashes).map { i =>
      val h = pmod(xxhash64(lit(i), key), lit(numBits.toLong)).cast("int")
      val word = element_at(words, shiftright(h, 6) + lit(1))
      val bit = h.bitwiseAND(lit(63))
      call_function("shiftright", word, bit).bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
  }

  /** Fact⋈dim equi-join with the fact side Bloom-pruned on the join key
    * before the shuffle. Output is identical to the plain join; the Bloom
    * stage only removes rows the join would drop anyway.
    */
  def prunedJoin(fact: DataFrame, factKey: String, dim: DataFrame,
      dimKey: String, numBits: Int = 1 << 16, numHashes: Int = 3): DataFrame = {
    // xxhash64 is TYPE-sensitive (hash of int 5 != long 5 != "5"), while
    // the equi-join behind the filter would implicitly cast and match —
    // mismatched key types would silently drop every row whose hashes
    // disagree across the two sides. Fail fast instead.
    val ft = fact.schema(factKey).dataType
    val dt = dim.schema(dimKey).dataType
    require(ft == dt,
      s"bloom-pruned join requires identical key types (fact $factKey: $ft, " +
        s"dim $dimKey: $dt) — cast one side first; xxhash64 is type-sensitive " +
        "so a widening cast inside the join would not reach the bloom probes")
    val bitmap = build(dim, dimKey, numBits, numHashes)
    fact.where(mightContain(bitmap, col(factKey), numBits, numHashes))
      .join(dim, col(factKey) === col(dimKey))
  }
}
