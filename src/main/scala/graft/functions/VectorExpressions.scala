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
}
