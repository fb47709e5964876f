package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic hash-based dataset splitting (train/validation/test),
  * beyond-reference.
  *
  * Random splits are not reproducible across runs, cluster sizes, or
  * engines; a split keyed on a content-stable hash is. The bucket is the
  * first 8 hex digits of md5(key) — md5 because every engine agrees on it
  * bit-for-bit (the xxhash64 used elsewhere for speed has no cross-engine
  * twin), so the assignment can be re-derived anywhere, including by the
  * DuckDB oracle (gate q80) or a Python consumer reading the same table.
  *
  * Embarrassingly parallel: no shuffle, no state — one codegen'd
  * projection. Keying on a GROUP column (e.g. source domain) instead of
  * the row id keeps whole groups on one side of the split, the standard
  * guard against near-duplicate leakage across train/test.
  */
object HashSplit {

  /** Bucket in [0, buckets): first 8 md5 hex digits of the key, mod
    * buckets. 32 bits of hash against ≤ ~10^4 buckets makes the modulo
    * bias negligible (< 2^-18). */
  def bucket(key: Column, buckets: Int = 10000): Column = {
    require(buckets > 0 && buckets <= (1 << 20), s"buckets out of range: $buckets")
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10)
      .cast("long") % buckets
  }

  /** Split-name assignment from cumulative fraction thresholds. Fractions
    * must sum to ≤ 1; the LAST split absorbs any remainder (so 0.8/0.1/0.1
    * is exact and rounding dust lands in the final split). A NULL key
    * yields a NULL assignment — silently folding null-keyed rows into one
    * split would skew it and defeat the grouped-key leakage guard. */
  def assign(key: Column, fractions: Seq[(String, Double)],
      buckets: Int = 10000): Column = {
    val b = bucket(key, buckets)
    val thresholds = cumThresholds(fractions, buckets)
    val assigned = thresholds.init.foldRight(lit(thresholds.last._1): Column) {
      case ((name, t), rest) => when(b < t, name).otherwise(rest)
    }
    when(key.isNull, lit(null).cast("string")).otherwise(assigned)
  }

  /** K-fold cross-validation fold id in [0, k): md5 of "seed:key", so
    * folds are (a) deterministic and engine-portable like [[bucket]],
    * (b) decorrelated from the train/test bucket AND from other seeds —
    * re-seeding yields an independent fold scheme over the same keys.
    * Shuffle-free one-pass projection; every fold is usable as a
    * validation slice with the other k−1 as train. NULL keys stay NULL
    * (same rationale as [[assign]]). */
  def kFold(key: Column, k: Int, seed: Long = 0L): Column = {
    require(k >= 2 && k <= 10000, s"fold count out of range: $k")
    // concat_ws silently DROPS nulls (every null key would land on
    // md5("<seed>")'s fold — a hidden skew), so null keys are guarded to
    // a null fold explicitly, matching [[assign]]
    when(key.isNull, lit(null).cast("long")).otherwise(
      conv(substring(md5(concat_ws(":", lit(seed), key.cast("string"))), 1, 8),
        16, 10).cast("long") % k)
  }

  /** DuckDB twin of [[kFold]]. */
  def kFoldSql(keyExpr: String, k: Int, seed: Long = 0L): String =
    s"(('0x' || substr(md5('$seed:' || CAST($keyExpr AS VARCHAR)), 1, 8))::UBIGINT % $k)"

  /** ANSI-SQL twin of [[bucket]] for oracle engines without conv(): the
    * 8 hex digits fold to an integer via strpos arithmetic. */
  def bucketSql(keyExpr: String, buckets: Int = 10000): String = {
    val hex = s"md5(CAST($keyExpr AS VARCHAR))"
    val digits = (1 to 8).map(i =>
      s"(strpos('0123456789abcdef', substr($hex, $i, 1)) - 1)")
    val folded = digits.reduce((a, d) => s"($a * 16 + $d)")
    s"($folded % $buckets)"
  }

  /** ANSI-SQL twin of [[assign]], including the NULL-key and single-split
    * cases (a searched CASE with zero WHEN branches is invalid SQL), with
    * split names quoted safely. */
  def assignSql(keyExpr: String, fractions: Seq[(String, Double)],
      buckets: Int = 10000): String = {
    def quote(name: String) = "'" + name.replace("'", "''") + "'"
    val b = bucketSql(keyExpr, buckets)
    val thresholds = cumThresholds(fractions, buckets)
    val core =
      if (thresholds.size == 1) quote(thresholds.last._1)
      else {
        val whens = thresholds.init
          .map { case (name, t) => s"WHEN $b < $t THEN ${quote(name)}" }
          .mkString(" ")
        s"(CASE $whens ELSE ${quote(thresholds.last._1)} END)"
      }
    s"(CASE WHEN ($keyExpr) IS NULL THEN NULL ELSE $core END)"
  }

  /** EXACT per-stratum proportional split: within each stratum, rows are
    * ordered by `md5(seed ":" id)` (engine-portable, parallelism-invariant
    * — same convention as [[graft.text.Selection.epochShuffle]]) and the
    * first `ceil(cum_i · n_stratum)` positions go to split i. Unlike
    * [[assign]] (hash buckets — proportions hold only in expectation),
    * every stratum's split sizes are exact to the row, the property
    * stratified evaluation sets need. Rows beyond the last cumulative
    * boundary (fractions summing < 1) get NULL = held out; when fractions
    * sum to 1 the last split takes the stratum remainder exactly.
    *
    * One shuffle: the rank and the stratum count share the stratum-key
    * window partitioning. */
  def stratifiedAssign(df: DataFrame, strataCols: Seq[Column], idCol: Column,
      fractions: Seq[(String, Double)], seed: Long = 0L,
      splitCol: String = "split"): DataFrame = {
    require(fractions.nonEmpty, "need at least one split")
    require(fractions.forall(_._2 > 0), "fractions must be positive")
    val cums = fractions.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
    require(cums.last <= 1.0 + 1e-9, s"fractions sum to ${cums.last} > 1")
    val sumIsOne = math.abs(cums.last - 1.0) <= 1e-9
    val key = md5(concat_ws(":", lit(seed.toString), idCol.cast("string")))
    val w = Window.partitionBy(strataCols: _*).orderBy(key, idCol.cast("string"))
    val wAll = Window.partitionBy(strataCols: _*)
    val rn = col("__gf_rn")
    val bounds: Seq[(String, Column)] =
      fractions.map(_._1).zip(cums).zipWithIndex.map { case ((name, c), i) =>
        // epsilon guard (abs + relative): ceil(f·n) on a mathematically-
        // integer boundary can land one row HIGH in IEEE doubles (e.g.
        // f=3/17, n=85 → 15.000000000000002); the slack dwarfs the
        // product's rounding error (~2⁻⁵²·f·n) at every magnitude while
        // only boundary-exact products can cross an integer under it —
        // the same trap PrefixFilterJoin guards in its prefix length
        val b = if (i == fractions.size - 1 && sumIsOne) col("__gf_n")
          else {
            val cn = lit(c) * col("__gf_n")
            ceil(cn - lit(1e-9) - cn * lit(1e-12))
          }
        (name, b)
      }
    val assigned = bounds.foldRight(lit(null).cast("string"): Column) {
      case ((name, b), rest) => when(rn <= b, name).otherwise(rest)
    }
    df.withColumn("__gf_rn", row_number().over(w))
      .withColumn("__gf_n", count(lit(1)).over(wAll))
      .withColumn(splitCol, assigned)
      .drop("__gf_rn", "__gf_n")
  }

  /** (name, exclusive upper bucket bound) per split, in declaration order. */
  private def cumThresholds(fractions: Seq[(String, Double)],
      buckets: Int): Seq[(String, Long)] = {
    require(fractions.nonEmpty, "need at least one split")
    val total = fractions.map(_._2).sum
    require(total <= 1.0 + 1e-9, s"fractions sum to $total > 1")
    require(fractions.forall(_._2 > 0), "fractions must be positive")
    val cums = fractions.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
    val ts = fractions.map(_._1).zip(cums.map(c => math.floor(c * buckets).toLong))
    // a fraction below 1/buckets floors to a zero-width bucket range: its
    // split name would silently never be assigned (and assignSql would
    // emit a dead WHEN branch). Fail loudly instead.
    ts.foldLeft(0L) { case (prev, (name, t)) =>
      require(t > prev,
        s"split '$name' resolves to an empty bucket range: every fraction " +
          s"must be >= 1/buckets (= ${1.0 / buckets}); raise the fraction " +
          "or the bucket count")
      t
    }
    ts
  }
}
