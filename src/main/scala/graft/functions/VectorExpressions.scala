package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
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

  /** Signed projection of a code vector through a ±1 sign matrix:
    * out(j) = Σ_i q(i) · signs(j)(i). One dim·outDim primitive loop
    * per row; null on any null element or a length mismatch against
    * the matrix rows.
    */
  def projectSigned(q: ArrayData, signs: Array[Array[Long]]): Array[Long] = {
    val n = q.numElements()
    if (signs.length == 0 || signs(0).length != n) return null
    val qv = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (q.isNullAt(i)) return null
      qv(i) = q.getLong(i)
      i += 1
    }
    val out = new Array[Long](signs.length)
    var j = 0
    while (j < signs.length) {
      val sj = signs(j)
      var s = 0L
      var i2 = 0
      while (i2 < n) { s += qv(i2) * sj(i2); i2 += 1 }
      out(j) = s
      j += 1
    }
    out
  }

  /** Full Lloyd's assignment for one code vector against the whole
    * centroid matrix: argmin of sqDistLong over k centroids, ties to
    * the LOWEST centroid id (callers pass cids ascending; strict <
    * keeps the earlier winner). One tight k·dim primitive loop per
    * row — the k-inline-sqDist-expressions formulation blows past the
    * codegen budget around k≈64 and degrades to interpreted
    * per-struct evaluation (measured 52 s vs ~2 s at 500k rows,
    * k=256). Returns null when the row vector is null-element'd or
    * length-mismatched against the matrix.
    */
  def assignMin(q: ArrayData, cents: Array[Array[Long]], cids: Array[Long]): Array[Long] = {
    val n = q.numElements()
    if (cents.length == 0 || cents(0).length != n) return null
    val qv = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (q.isNullAt(i)) return null
      qv(i) = q.getLong(i)
      i += 1
    }
    var bestD = Long.MaxValue
    var bestC = -1L
    var c = 0
    while (c < cents.length) {
      val cv = cents(c)
      var s = 0L
      var j = 0
      while (j < n) {
        val d = qv(j) - cv(j)
        s += d * d
        j += 1
      }
      if (s < bestD) { bestD = s; bestC = cids(c) }
      c += 1
    }
    Array(bestD, bestC)
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

  /** Lloyd's assignment(array<bigint>) → struct(dist BIGINT, cid
    * BIGINT): argmin over a driver-provided centroid matrix riding
    * the expression as a codegen reference object, ties to the
    * lowest centroid id. Replaces the array_min(array(k × struct(
    * sqDist, cid))) formulation, whose generated code outgrows the
    * codegen budget around k≈64 and falls back to interpreted
    * per-struct evaluation (52 s → ~2 s at 500k rows / k=256,
    * KmProbe r9). Semantics identical to that formulation — the
    * DuckDB oracle chain (dist, cid tie-break) pins both.
    */
  case class KMeansAssign(
      child: Expression,
      cids: Array[Long],
      cents: Array[Array[Long]])
      extends UnaryExpression {
    require(cids.length == cents.length && cents.nonEmpty)

    override def dataType: DataType = StructType(Seq(
      StructField("dist", LongType, nullable = false),
      StructField("cid", LongType, nullable = false)))
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"kmeans assign requires array<bigint> input, got ${other.sql}")
      }

    override protected def nullSafeEval(q: Any): Any = {
      val r = VectorCodegen.assignMin(q.asInstanceOf[ArrayData], cents, cids)
      if (r == null) null
      else new GenericInternalRow(Array[Any](r(0), r(1)))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val centsRef = ctx.addReferenceObj("kmCents", cents, "long[][]")
      val cidsRef = ctx.addReferenceObj("kmCids", cids, "long[]")
      nullSafeCodeGen(ctx, ev, q => {
        val tmp = ctx.freshName("kmRes")
        s"""
          long[] $tmp = graft.functions.VectorCodegen.assignMin($q, $centsRef, $cidsRef);
          if ($tmp == null) { ${ev.isNull} = true; }
          else {
            ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
              new Object[] { $tmp[0], $tmp[1] });
          }
        """
      })
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Signed random projection(array<bigint>) → array<bigint>: the
    * Johnson–Lindenstrauss kernel with the driver-computed ±1 sign
    * matrix as a codegen reference object. The unrolled
    * dim·outDim-term expression formulation codegens fine standalone
    * but drops to interpreted evaluation once composed under a join
    * (~11 s per 500k-row evaluation vs 0.3 s here, KmProbe r9); the
    * kernel is immune to plan composition. Bit-identical semantics
    * (pure integer multiply-adds).
    */
  case class SignedRandomProject(
      child: Expression,
      signs: Array[Array[Long]])
      extends UnaryExpression {
    require(signs.nonEmpty)

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"signed project requires array<bigint> input, got ${other.sql}")
      }

    override protected def nullSafeEval(q: Any): Any = {
      val r = VectorCodegen.projectSigned(q.asInstanceOf[ArrayData], signs)
      if (r == null) null
      else new org.apache.spark.sql.catalyst.util.GenericArrayData(r)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val signsRef = ctx.addReferenceObj("rpSigns", signs, "long[][]")
      nullSafeCodeGen(ctx, ev, q => {
        val tmp = ctx.freshName("rpRes")
        s"""
          long[] $tmp = graft.functions.VectorCodegen.projectSigned($q, $signsRef);
          if ($tmp == null) { ${ev.isNull} = true; }
          else {
            ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($tmp);
          }
        """
      })
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
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
