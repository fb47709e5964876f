package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the hot text/vector paths.
  *
  * Spark's higher-order functions (`transform`, `aggregate`, `zip_with`,
  * `array_distinct`) evaluate their lambdas INTERPRETED, one closure call
  * per element — profiling showed the shingle pipeline spending ~10s on
  * 5k docs where a compiled pass needs milliseconds. These expressions do
  * the same work in one tight JVM loop per row while preserving the exact
  * output semantics the DuckDB oracle checks (same tokenization, same
  * fold order and IEEE arithmetic for dot products).
  */
object TextExpressions {

  /** Distinct word n-gram shingles of lower(trim(text)) — exact semantic
    * match of `array_distinct(transform(sequence...))` over
    * `split(trim(lower(text)), "\\s+")`. */
  case class Shingles(child: Expression, n: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "graft_shingles"

    override def nullSafeEval(input: Any): Any = {
      // UTF8String.toLowerCase + trim match Spark's lower()/trim() exactly
      val s = input.asInstanceOf[UTF8String].toLowerCase.trim().toString
      val toks = s.split("\\s+", -1)
      if (toks.length < n) new GenericArrayData(Array.empty[Any])
      else {
        val seen = new java.util.LinkedHashSet[UTF8String]()
        val sb = new java.lang.StringBuilder
        var i = 0
        while (i + n <= toks.length) {
          sb.setLength(0)
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            sb.append(toks(i + j))
            j += 1
          }
          seen.add(UTF8String.fromString(sb.toString))
          i += 1
        }
        val out = new Array[Any](seen.size)
        val it = seen.iterator()
        var k = 0
        while (it.hasNext) { out(k) = it.next(); k += 1 }
        new GenericArrayData(out)
      }
    }

    override protected def withNewChildInternal(c: Expression): Shingles = copy(child = c)
  }

  /** Gopher-style repetition signal: the fraction of n-gram occurrences
    * taken by the single most frequent n-gram (over the SAME tokenization
    * as [[Shingles]], but counting duplicates — repetition is exactly what
    * distinctness would erase). NULL when the doc has fewer than n tokens.
    * One hash map per row, no shuffle; ratio = max count / total grams,
    * both exact integers, so the double is engine-reproducible. */
  case class RepetitionRatio(child: Expression, n: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "graft_repetition"

    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String].toLowerCase.trim().toString
      val toks = s.split("\\s+", -1)
      if (toks.length < n) null
      else {
        val counts = new java.util.HashMap[String, Int]()
        val sb = new java.lang.StringBuilder
        var maxC = 0
        var total = 0
        var i = 0
        while (i + n <= toks.length) {
          sb.setLength(0)
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            sb.append(toks(i + j))
            j += 1
          }
          val c = counts.merge(sb.toString, 1, (a, b) => a + b)
          if (c > maxC) maxC = c
          total += 1
          i += 1
        }
        maxC.toDouble / total.toDouble
      }
    }

    override protected def withNewChildInternal(c: Expression): RepetitionRatio =
      copy(child = c)
  }

  /** MinHash signature over a shingle array: sig[i] = min over shingles of
    * xxhash64(shingle, seed=i), i in [0, k). One compiled pass replaces
    * k min-aggregations over an exploded shingle table. */
  case class MinHashSignature(child: Expression, k: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_minhash"

    // k permutations from ONE xxhash64 per shingle via universal hashing
    // h_j(x) = a_j * h(x) + b_j mod 2^64 (odd a_j => bijection) — the
    // textbook k-permutation MinHash family. Hashing the string bytes k
    // times (the naive form) costs k × |shingle| per shingle; this costs
    // one string hash + k multiply-adds. Constants are fixed SplitMix64
    // outputs, so signatures stay deterministic across runs and clusters.
    private def splitmix64(x0: Long): Long = {
      var x = x0 + 0x9E3779B97F4A7C15L
      x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
      x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
      x ^ (x >>> 31)
    }
    private lazy val permA: Array[Long] =
      Array.tabulate(k)(j => splitmix64(2L * j) | 1L)
    private lazy val permB: Array[Long] =
      Array.tabulate(k)(j => splitmix64(2L * j + 1L))

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val sig = Array.fill[Long](k)(Long.MaxValue)
      var i = 0
      val nSh = arr.numElements()
      while (i < nSh) {
        val s = arr.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
          s.numBytes(), 0)
        var j = 0
        while (j < k) {
          val v = permA(j) * h + permB(j)
          if (v < sig(j)) sig(j) = v
          j += 1
        }
        i += 1
      }
      new GenericArrayData(sig.map(java.lang.Long.valueOf(_): Any))
    }

    override protected def withNewChildInternal(c: Expression): MinHashSignature =
      copy(child = c)
  }

  /** Count of lower(trim(text)) whitespace tokens contained in `markers` —
    * exact semantic match of `size(filter(tokens, _.isInCollection(...)))`
    * without the interpreted per-token lambda. */
  case class MarkerCount(child: Expression, markers: Seq[String])
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = IntegerType
    override def prettyName: String = "graft_marker_count"
    @transient private lazy val set = markers.toSet

    override def nullSafeEval(input: Any): Any = {
      val toks = input.asInstanceOf[UTF8String].toLowerCase.trim().toString
        .split("\\s+", -1)
      var c = 0
      var i = 0
      while (i < toks.length) {
        if (set.contains(toks(i))) c += 1
        i += 1
      }
      c
    }

    override protected def withNewChildInternal(c: Expression): MarkerCount =
      copy(child = c)
  }

  /** 64-bit SimHash of lower(trim(text)) whitespace tokens: bit i set iff
    * the sum over token OCCURRENCES of ±1 (sign of bit i of
    * xxhash64(token, seed=42) — Spark's default xxhash64 seed) is positive.
    * One compiled pass replaces token-explode + 64 sum-aggregations. */
  case class SimHash64(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_simhash"

    override def nullSafeEval(input: Any): Any = {
      val toks = input.asInstanceOf[UTF8String].toLowerCase.trim().toString
        .split("\\s+", -1)
      val sums = new Array[Int](64)
      var i = 0
      while (i < toks.length) {
        val u = UTF8String.fromString(toks(i))
        val h = XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes(), 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) sums(b) += 1 else sums(b) -= 1
          b += 1
        }
        i += 1
      }
      var fp = 0L
      var b = 0
      while (b < 64) {
        if (sums(b) > 0) fp |= (1L << b)
        b += 1
      }
      fp
    }

    override protected def withNewChildInternal(c: Expression): SimHash64 =
      copy(child = c)
  }

  /** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken): polynomial
    * rolling hashes of k-char grams over the normalized text, then the
    * minimum hash of each window of w grams (rightmost-min, deduped) — the
    * standard rolling-hash fingerprint for plagiarism/near-dup detection.
    * Guarantees: any shared substring of length ≥ w+k-1 yields at least one
    * shared fingerprint. Output: array<long> of selected hashes. */
  case class WinnowingFingerprints(child: Expression, k: Int, w: Int)
      extends UnaryExpression with CodegenFallback {
    require(k >= 2 && w >= 1)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_winnow"

    private val Base = 1000003L

    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String].toLowerCase.trim().toString
        .replaceAll("\\s+", " ")
      if (s.length < k) return new GenericArrayData(Array.empty[Any])
      val n = s.length - k + 1
      val hashes = new Array[Long](n)
      // rolling polynomial hash over k-char windows
      var pow = 1L
      var i = 1
      while (i < k) { pow *= Base; i += 1 }
      var h = 0L
      i = 0
      while (i < k) { h = h * Base + s.charAt(i); i += 1 }
      hashes(0) = h
      i = 1
      while (i < n) {
        h = (h - s.charAt(i - 1) * pow) * Base + s.charAt(i + k - 1)
        hashes(i) = h
        i += 1
      }
      if (n <= w) {
        var min = hashes(0); i = 1
        while (i < n) { if (hashes(i) <= min) min = hashes(i); i += 1 }
        return new GenericArrayData(Array[Any](java.lang.Long.valueOf(min)))
      }
      val out = new java.util.LinkedHashSet[java.lang.Long]()
      var start = 0
      while (start + w <= n) {
        // rightmost minimal hash in window [start, start+w)
        var minIdx = start
        i = start + 1
        while (i < start + w) { if (hashes(i) <= hashes(minIdx)) minIdx = i; i += 1 }
        out.add(hashes(minIdx))
        start += 1
      }
      val arr = new Array[Any](out.size)
      val it = out.iterator()
      i = 0
      while (it.hasNext) { arr(i) = it.next().longValue(); i += 1 }
      new GenericArrayData(arr)
    }

    override protected def withNewChildInternal(c: Expression): WinnowingFingerprints =
      copy(child = c)
  }

  /** Dot product of two float/double arrays in DOUBLE with a strict left
    * fold — bit-identical to `aggregate(zip_with(a, b, _*_), 0.0, _+_)` and
    * to DuckDB's `list_reduce(list_transform(...))`, since all three perform
    * the same IEEE multiply-then-accumulate sequence. */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_dot"

    private def elem(a: ArrayData, et: DataType, i: Int): Double = et match {
      case FloatType => a.getFloat(i).toDouble
      case DoubleType => a.getDouble(i)
      case _ => throw new IllegalArgumentException(s"dot over $et")
    }

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val at = left.dataType.asInstanceOf[ArrayType].elementType
      val bt = right.dataType.asInstanceOf[ArrayType].elementType
      val n = math.min(a.numElements(), b.numElements())
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += elem(a, at, i) * elem(b, bt, i)
        i += 1
      }
      acc
    }

    override protected def withNewChildrenInternal(l: Expression, r: Expression)
        : DotProduct = copy(left = l, right = r)
  }

  /** All n-token grams WITH repeats — the multiset twin of [[Shingles]]
    * (which dedups per doc for Jaccard). Compiled single pass; the builtin
    * formulation (`transform(sequence(...), i -> concat_ws(slice(...)))`)
    * interprets three nested HOFs and allocates a slice array per gram. */
  case class NGrams(child: Expression, n: Int)
      extends UnaryExpression with CodegenFallback {
    require(n >= 1, s"n must be >= 1, got $n")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "graft_ngrams"

    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String].toLowerCase.trim().toString
      val toks = s.split("\\s+", -1)
      if (toks.length < n) new GenericArrayData(Array.empty[Any])
      else {
        val out = new Array[Any](toks.length - n + 1)
        val sb = new java.lang.StringBuilder
        var i = 0
        while (i + n <= toks.length) {
          sb.setLength(0)
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            sb.append(toks(i + j))
            j += 1
          }
          out(i) = UTF8String.fromString(sb.toString)
          i += 1
        }
        new GenericArrayData(out)
      }
    }

    override protected def withNewChildInternal(c: Expression): NGrams = copy(child = c)
  }

  /** Exact integer dot product over two array<int> columns (quantized
    * embeddings): one long accumulator in a primitive while loop. The
    * higher-order-function form (`aggregate(zip_with(...))`) allocates an
    * intermediate array and interprets two lambdas PER PAIR — measured 20×
    * slower on the all-pairs stage (q66). Long arithmetic keeps the sum
    * exact and order-independent at any parallelism. */
  case class IntDotProduct(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_qdot"

    override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_qdot expects (array<int>, array<int>), got ($l, $r)")
    }

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val n = math.min(a.numElements(), b.numElements())
      var acc = 0L
      var i = 0
      while (i < n) {
        acc += a.getInt(i).toLong * b.getInt(i).toLong
        i += 1
      }
      acc
    }

    override protected def withNewChildrenInternal(l: Expression, r: Expression)
        : IntDotProduct = copy(left = l, right = r)
  }

  /** BPE-ish subword token estimate without a vocabulary: letter runs
    * contribute ceil(len/4) subtokens (≈4 chars/token, the common BPE
    * average), each digit is one token, each non-alphanumeric non-space
    * char is one token. A deterministic, vocabulary-free proxy for
    * training-data token budgeting (whitespace counting is
    * [[TextAnalysis.tokenCount]]; this is the "BPE-ish" estimator). */
  case class BpeTokenCount(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_bpe_tokens"

    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String].toString
      var total = 0L
      var run = 0
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        val isLetter = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
        if (isLetter) run += 1
        else {
          if (run > 0) { total += (run + 3) / 4; run = 0 }
          if (c >= '0' && c <= '9') total += 1
          else if (c != ' ' && c != '\t' && c != '\n' && c != '\r' &&
            c != '\u000B' && c != '\f') {
            total += 1
            // count CODEPOINTS, not UTF-16 units: a surrogate pair (emoji
            // etc.) is ONE token, matching the DuckDB oracle's
            // codepoint-based regex in bpeTokenCountSql
            if (Character.isHighSurrogate(c) && i + 1 < s.length &&
              Character.isLowSurrogate(s.charAt(i + 1))) i += 1
          }
        }
        i += 1
      }
      if (run > 0) total += (run + 3) / 4
      total
    }

    override protected def withNewChildInternal(c: Expression): BpeTokenCount =
      copy(child = c)
  }

  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

  def shingles(text: Column, n: Int): Column = column(Shingles(expression(text), n))

  def repetitionRatio(text: Column, n: Int): Column =
    column(RepetitionRatio(expression(text), n))

  def bpeTokenCount(text: Column): Column = column(BpeTokenCount(expression(text)))

  def minhashSignature(shingles: Column, k: Int): Column =
    column(MinHashSignature(expression(shingles), k))

  def dot(a: Column, b: Column): Column =
    column(DotProduct(expression(a), expression(b)))

  def qdot(a: Column, b: Column): Column =
    column(IntDotProduct(expression(a), expression(b)))

  def ngrams(text: Column, n: Int): Column = column(NGrams(expression(text), n))

  def markerCount(text: Column, markers: Seq[String]): Column =
    column(MarkerCount(expression(text), markers))

  def simhash(text: Column): Column = column(SimHash64(expression(text)))

  def winnow(text: Column, k: Int = 5, w: Int = 4): Column =
    column(WinnowingFingerprints(expression(text), k, w))
}
