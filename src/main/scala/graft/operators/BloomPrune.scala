package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** A built Bloom filter: bitmap words plus the hash count they were built
  * with. Carrying `numHashes` inside the value makes a build/probe
  * parameter mismatch unrepresentable — probing with MORE hashes than the
  * bitmap was built with would yield silent FALSE NEGATIVES (true join
  * rows dropped before the join), the worst failure mode a pruning filter
  * can have. */
case class BloomFilter(words: Array[Long], numHashes: Int) {
  def numBits: Int = words.length * 64
  /** Fraction of set bits. Past ~0.5 the false-positive rate climbs
    * toward 1 and the prune quietly becomes a no-op that still pays
    * `numHashes` xxhash64 probes per fact row — [[BloomPrune.build]]'s
    * auto-sizing keeps this ≈0.25 at the observed key count. */
  def fillFactor: Double =
    words.iterator.map(java.lang.Long.bitCount).sum.toDouble / numBits
}

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
  *
  * Sizing: a Bloom filter saturates silently — at a fixed 64 Kbit a dim of
  * ~15k distinct keys already passes fill factor 0.5 and the FP rate heads
  * toward 1. [[build]] therefore sizes the bitmap from the dim-side key
  * cardinality by default (~10 bits/key, [[sizedBits]]); pass an explicit
  * `numBits` only when the cardinality is known a priori. Beyond the
  * [[MaxBits]] cap (~1.6M keys at 10 bits/key) a literal-bitmap probe stops
  * being the right tool — at that dim size use the plain shuffle join and
  * let AQE/native runtime filtering handle it.
  */
object BloomPrune {

  /** Auto-size sentinel for `numBits`: derive from dim key cardinality. */
  val AutoBits = 0

  /** Bitmap cap: 1&lt;&lt;24 bits = 2 MB of plan literal. */
  val MaxBits: Int = 1 << 24

  /** ~`bitsPerKey` bits per distinct key, rounded up to a power of two,
    * clamped to [1&lt;&lt;10, [[MaxBits]]]. At 10 bits/key and 3 probes the
    * fill factor stays ≈0.26 and the FP rate ≈1.7% — and doubles in cost
    * only when the key count doubles, instead of cliffing at a fixed
    * capacity. */
  def sizedBits(distinctKeys: Long, bitsPerKey: Int = 10): Int = {
    val want = math.max(1L << 10, distinctKeys * bitsPerKey)
    val p2 = if (java.lang.Long.bitCount(want) == 1) want
             else java.lang.Long.highestOneBit(want) << 1
    math.min(p2, MaxBits.toLong).toInt
  }

  /** Build the bitmap from the dim side's key column. `numBits =`
    * [[AutoBits]] (default) sizes it from `approx_count_distinct` of the
    * keys via [[sizedBits]].
    *
    * Distributed bitmap assembly: probe positions are OR-combined into
    * 64-bit words executor-side (`groupBy(word) bit_or(mask)`), so the
    * driver collects at most numBits/64 word rows — bounded by the bitmap
    * size, never by the dim cardinality. */
  def build(dim: DataFrame, keyCol: String, numBits: Int = AutoBits,
      numHashes: Int = 3): BloomFilter = {
    require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")
    val keys = dim.where(col(keyCol).isNotNull)
    val bits =
      if (numBits == AutoBits)
        sizedBits(keys.agg(approx_count_distinct(col(keyCol))).head().getLong(0))
      else numBits
    require(bits > 0 && bits % 64 == 0,
      s"numBits must be a positive multiple of 64, got $bits")
    val probes = (0 until numHashes).map(i =>
      pmod(xxhash64(lit(i), col(keyCol)), lit(bits.toLong)).cast("int"))
    val wordRows = keys
      .select(explode(array(probes: _*)).as("p"))
      .select(shiftright(col("p"), 6).as("w"),
        // shiftleft builtin via call_function: the in-word bit index is a
        // column and the Scala helper only takes a literal shift
        call_function("shiftleft", lit(1L), col("p").bitwiseAND(lit(63))).as("m"))
      .groupBy("w").agg(bit_or(col("m")).as("m"))
      .collect()
    val words = new Array[Long](bits / 64)
    wordRows.foreach(r => words(r.getInt(0)) = r.getLong(1))
    BloomFilter(words, numHashes)
  }

  /** Membership-test column against a [[BloomFilter]] from [[build]] —
    * probe parameters come from the filter value itself, so they cannot
    * diverge from what the bitmap was built with.
    *
    * `call_function("shiftright", …)` is used because the in-word bit index
    * is itself a column and the Scala `shiftright` helper only accepts a
    * literal shift; the SQL builtin takes two expressions.
    */
  def mightContain(bf: BloomFilter, key: Column): Column = {
    val words = typedLit(bf.words.toSeq)
    (0 until bf.numHashes).map { i =>
      val h = pmod(xxhash64(lit(i), key), lit(bf.numBits.toLong)).cast("int")
      val word = element_at(words, shiftright(h, 6) + lit(1))
      val bit = h.bitwiseAND(lit(63))
      call_function("shiftright", word, bit).bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
  }

  /** True when a dim of `distinctKeys` keys would CLAMP the literal bitmap
    * at `cap` bits (10 bits/key target) — the signal to switch to the
    * native-sketch path instead of silently degrading the FP rate. */
  def wouldClamp(distinctKeys: Long, cap: Int = MaxBits): Boolean =
    distinctKeys * 10L > cap

  /** Serialized native Bloom sketch (`org.apache.spark.util.sketch`) built
    * DISTRIBUTED over `xxhash64(key)` via Spark's own `BloomFilterAggregate`
    * — the no-cliff path for dims past [[MaxBits]]/10 ≈ 1.6M keys, where a
    * foldable array-literal bitmap stops being the right tool (a 100M-key
    * dim wants ~125 MB of bitmap; as codegen'd plan literal that breaks
    * compilation, as a binary value it rides the once-per-stage broadcast
    * task binary like any subquery result). `numBits` is additionally
    * clamped by Spark's `runtime.bloomFilter.maxNumBits` conf — an
    * over-budget request degrades the FP rate, never correctness (a Bloom
    * filter has no false negatives at ANY size). */
  def buildNative(dim: DataFrame, keyCol: String, expectedKeys: Long,
      numBits: Long): Array[Byte] = {
    val agg = new BloomFilterAggregate(
      XxHash64(Seq(ColumnBridge.expression(col(keyCol))), 42L),
      Literal(math.max(expectedKeys, 1L)),
      Literal(math.max(numBits, 1L << 10)))
    dim.where(col(keyCol).isNotNull)
      .select(ColumnBridge.column(agg.toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]](0)
  }

  /** Membership test against a [[buildNative]] sketch: Spark's
    * `BloomFilterMightContain` over `xxhash64(key)` — same hash family and
    * seed as the build side by construction. */
  def mightContainNative(bloom: Array[Byte], key: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      XxHash64(Seq(ColumnBridge.expression(key)), 42L)))

  /** Fact⋈dim equi-join with the fact side Bloom-pruned on the join key
    * before the shuffle. Output is identical to the plain join; the Bloom
    * stage only removes rows the join would drop anyway. The bitmap is
    * sized from the dim key cardinality unless `numBits` is given; a dim
    * whose auto-sizing [[wouldClamp]] the literal bitmap switches to the
    * native-sketch probe ([[buildNative]]) instead of silently running at
    * a saturated FP rate.
    */
  def prunedJoin(fact: DataFrame, factKey: String, dim: DataFrame,
      dimKey: String, numBits: Int = AutoBits, numHashes: Int = 3,
      literalBitsCap: Int = MaxBits): DataFrame = {
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
    // spread the unsplittable fact scan so the per-row bloom probes (k
    // hashes each) parallelize; conditional no-op on wide input
    val factW = graft.operators.Spread.wideScan(fact)
    val pruned =
      if (numBits != AutoBits) {
        factW.where(mightContain(build(dim, dimKey, numBits, numHashes), col(factKey)))
      } else {
        // sizing statistic: when Catalyst knows the dim's EXACT row count
        // at plan time (Range/LocalRelation leaves), skip the
        // approx_count_distinct pass over the dim — row count is an upper
        // bound on distinct keys, and oversizing a bloom only lowers its
        // FP rate (the clamp check just switches to the native sketch
        // sooner). Relations without a plan-time count (parquet scans,
        // filters, joins) keep the measured pass.
        val statsCount = (try dim.queryExecution.optimizedPlan.stats.rowCount
          catch { case scala.util.control.NonFatal(_) => None })
          .map(_.min(BigInt(Long.MaxValue / 32)).toLong) // ×10 headroom below
        val distinctKeys = statsCount.getOrElse(
          dim.where(col(dimKey).isNotNull)
            .agg(approx_count_distinct(col(dimKey))).head().getLong(0))
        if (wouldClamp(distinctKeys, literalBitsCap))
          factW.where(mightContainNative(
            buildNative(dim, dimKey, distinctKeys, distinctKeys * 10L),
            col(factKey)))
        else
          factW.where(mightContain(
            build(dim, dimKey, sizedBits(distinctKeys), numHashes), col(factKey)))
      }
    // NO pins here (r22, ADVICE): the operator's design point is
    // prune-then-BROADCAST — when the dim fits the broadcast threshold the
    // plain join plans shuffle-free (scan → bloom probe → BHJ), and the
    // r21 byKey pins forced two exchanges that plan never had (a dim-side
    // shuffle feeding a broadcast, plus a full shuffle of the pruned
    // fact). If the dim outgrows the threshold at scale, Catalyst inserts
    // the join exchanges itself; the probe CPU — the part byte-based
    // coalescing could serialize — already parallelizes via the wideScan
    // above.
    pruned.join(dim, col(factKey) === col(dimKey))
  }
}
