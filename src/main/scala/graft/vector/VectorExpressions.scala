package graft.vector

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Compiled expressions for the vector hot paths (same rationale as
  * [[graft.text.TextExpressions]]: higher-order-function lambdas are
  * interpreted per element, a compiled loop is ~an order of magnitude
  * faster while preserving the exact IEEE fold order).
  */
object VectorExpressions {

  /** Hyperplane LSH signature: bit p is set iff the DOUBLE left-fold dot
    * product of the vector with plane p's ±1 components is >= 0. Bit-exact
    * match of the interpreted `aggregate(zip_with(...))` formulation in
    * [[VectorOps.hyperplaneSignatureInterpreted]] — same multiply-then-
    * accumulate sequence per plane. */
  case class HyperplaneSig(child: Expression, nPlanes: Int, dims: Int)
      extends UnaryExpression with CodegenFallback {
    require(nPlanes >= 1 && nPlanes <= 63)
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_hyperplane_sig"

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<float> or array<double>, got $other")
    }

    @transient private lazy val planes: Array[Array[Double]] =
      Array.tabulate(nPlanes, dims)(VectorOps.planeComponent)

    override def nullSafeEval(input: Any): Any = {
      val a = input.asInstanceOf[ArrayData]
      val isFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType
      val n = math.min(a.numElements(), dims)
      var sig = 0L
      var p = 0
      while (p < nPlanes) {
        val plane = planes(p)
        var acc = 0.0
        var j = 0
        while (j < n) {
          val v = if (isFloat) a.getFloat(j).toDouble else a.getDouble(j)
          acc += v * plane(j)
          j += 1
        }
        if (acc >= 0) sig |= (1L << p)
        p += 1
      }
      sig
    }

    override protected def withNewChildInternal(c: Expression): HyperplaneSig =
      copy(child = c)
  }

  /** int8 quantization in one compiled pass: struct(q array<int>, scale
    * double) with scale = 127/max|x| (0 for zero vectors) and q_i =
    * floor(x_i·scale + 0.5). Bit-identical to the HOF formulation
    * (`transform` + `aggregate` greatest-fold — QuantizeSpec asserts), but
    * one tight two-loop eval per row. The HOF form was pathological here:
    * CollapseProject inlines the scale (containing the absMax aggregate)
    * into EVERY lambda element, so each row paid dims × 2 re-evaluations
    * of a dims-element fold — ~8k interpreted ops per 64-dim row, again
    * per consumer of the column. */
  case class Int8Quantize(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StructType(Seq(
      StructField("q", ArrayType(IntegerType, containsNull = false), nullable = false),
      StructField("scale", DoubleType, nullable = false)))
    override def prettyName: String = "graft_int8_quantize"

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<float> or array<double>, got $other")
    }

    override def nullSafeEval(input: Any): Any = {
      val a = input.asInstanceOf[ArrayData]
      val isFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType
      val n = a.numElements()
      var mx = 0.0
      var i = 0
      while (i < n) {
        val v = math.abs(if (isFloat) a.getFloat(i).toDouble else a.getDouble(i))
        if (v > mx) mx = v
        i += 1
      }
      val scale = if (mx > 0) 127.0 / mx else 0.0
      val out = new Array[Any](n)
      i = 0
      while (i < n) {
        val v = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
        out(i) = math.floor(v * scale + 0.5).toInt
        i += 1
      }
      org.apache.spark.sql.catalyst.InternalRow(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(out), scale)
    }

    override protected def withNewChildInternal(c: Expression): Int8Quantize =
      copy(child = c)
  }

  /** Nearest-centroid assignment: index (0-based) of the centroid with the
    * smallest squared-L2 distance to the vector; ties break to the lowest
    * index. Centroids are embedded constants (the k-means driver loop
    * re-plans with fresh literals each iteration), so assignment is one
    * compiled k×dims loop per row — no per-centroid join or HOF lambda. */
  case class NearestCentroid(child: Expression, centroids: Array[Array[Double]])
      extends UnaryExpression with CodegenFallback {
    require(centroids.nonEmpty)
    override def dataType: DataType = IntegerType
    override def prettyName: String = "graft_nearest_centroid"

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<float> or array<double>, got $other")
    }

    override def nullSafeEval(input: Any): Any = {
      val a = input.asInstanceOf[ArrayData]
      val isFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType
      var best = 0
      var bestDist = Double.MaxValue
      var c = 0
      while (c < centroids.length) {
        val cent = centroids(c)
        val n = math.min(a.numElements(), cent.length)
        var acc = 0.0
        var j = 0
        while (j < n) {
          val v = if (isFloat) a.getFloat(j).toDouble else a.getDouble(j)
          val d = v - cent(j)
          acc += d * d
          j += 1
        }
        if (acc < bestDist) { bestDist = acc; best = c }
        c += 1
      }
      best
    }

    override protected def withNewChildInternal(c: Expression): NearestCentroid =
      copy(child = c)
  }

  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

  def hyperplaneSig(vec: Column, nPlanes: Int, dims: Int): Column =
    column(HyperplaneSig(expression(vec), nPlanes, dims))

  def nearestCentroid(vec: Column, centroids: Array[Array[Double]]): Column =
    column(NearestCentroid(expression(vec), centroids))

  def int8Quantize(vec: Column): Column = column(Int8Quantize(expression(vec)))
}
