package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen-callable float-vector kernel: operates on Spark's internal
  * ArrayData (primitive getFloat access), so neither the interpreted
  * nor the generated path ever materializes boxed element arrays the
  * way a Scala UDF does. A 64-dim dot through the UDF boundary boxes
  * 128 Floats per call — per CANDIDATE PAIR in the similarity joins.
  */
object VectorCodegen {

  /** Strict left-to-right double-accumulated dot product; null on
    * length mismatch or any null element — the exact semantics of the
    * aggregate(zip_with(…)) fold this replaces (and of the DuckDB
    * list_* oracles that re-derive it), so results are bit-identical.
    */
  def dotFloat(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  /** Exact squared L2 distance of two long-code vectors (the k-means
    * hot kernel): Σ (a_i − b_i)², pure 64-bit integer arithmetic so
    * results are bit-identical to the DuckDB list_sum oracle and
    * independent of accumulation order. Null on length mismatch or
    * any null element, mirroring dotFloat's contract. With |code| ≤
    * scale (quantizeCodes' contract) the sum is ≤ dim·(2·scale)² —
    * nowhere near 2⁶³ for any sane (dim, scale).
    */
  def sqDistLong(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getLong(i) - b.getLong(i)
      s += d * d
      i += 1
    }
    java.lang.Long.valueOf(s)
  }
}

object VectorExpressions {

  /** vector dot(array<float>, array<float>) → DOUBLE, as a native
    * expression with doGenCode so similarity scoring stays inside
    * WholeStageCodegen. Callers cast inputs to array<float> at the
    * Column level (a no-op cast Catalyst removes when the input
    * already is one) — the coercion the UDF signature used to trigger.
    */
  case class FloatVectorDot(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
          TypeCheckResult.TypeCheckSuccess
        case _ => TypeCheckResult.TypeCheckFailure(
          s"vector dot requires array<float> inputs, got " +
            s"${left.dataType.sql} / ${right.dataType.sql}")
      }

    override protected def nullSafeEval(a: Any, b: Any): Any =
      VectorCodegen.dotFloat(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val tmp = ctx.freshName("dotRes")
        s"""
          java.lang.Double $tmp = graft.functions.VectorCodegen.dotFloat($a, $b);
          if ($tmp == null) { ${ev.isNull} = true; }
          else { ${ev.value} = $tmp.doubleValue(); }
        """
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Squared L2 distance(array<bigint>, array<bigint>) → BIGINT, the
    * per-(vector, centroid) kernel of Lloyd's k-means. As a native
    * expression the k·dim multiply-adds per row stay inside
    * WholeStageCodegen reading primitive longs off ArrayData — the
    * aggregate(zip_with(…)) HOF formulation is interpreted per
    * element and a UDF boxes 2·dim Longs per candidate (the repo-wide
    * straggler lesson from the r8 kernelization sweep).
    */
  case class LongVectorSqDist(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
          TypeCheckResult.TypeCheckSuccess
        case _ => TypeCheckResult.TypeCheckFailure(
          s"vector sqdist requires array<bigint> inputs, got " +
            s"${left.dataType.sql} / ${right.dataType.sql}")
      }

    override protected def nullSafeEval(a: Any, b: Any): Any =
      VectorCodegen.sqDistLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val tmp = ctx.freshName("sqdRes")
        s"""
          java.lang.Long $tmp = graft.functions.VectorCodegen.sqDistLong($a, $b);
          if ($tmp == null) { ${ev.isNull} = true; }
          else { ${ev.value} = $tmp.longValue(); }
        """
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }
}
