package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BooleanType, DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the CIGAR scalar surface.
  *
  * Chosen over Scala UDFs per the custom-operator preference order:
  * each generates a direct static call into CigarCodegen inside
  * WholeStageCodegen — no catalyst↔Scala row conversion, no Option
  * boxing, no codegen break. Registered in SQL under the same names
  * the reference exposes (src/miint_extension.cpp:65-117).
  */
object CigarExpressions {

  /** alignment_query_length(cigar, include_hard_clips) → BIGINT.
    * NULL cigar → NULL; NULL flag → the documented default (true),
    * matching the pre-expression UDF behavior.
    */
  case class AlignmentQueryLength(left: Expression, right: Expression)
      extends BinaryExpression with ImplicitCastInputTypes {
    override def inputTypes = Seq(StringType, BooleanType)
    override def dataType: DataType = LongType
    override def nullable: Boolean = left.nullable
    override def prettyName: String = "alignment_query_length"
    override def eval(input: InternalRow): Any = {
      val c = left.eval(input)
      if (c == null) return null
      val h = right.eval(input)
      CigarCodegen.queryLength(c.asInstanceOf[UTF8String],
        h == null || h.asInstanceOf[Boolean])
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cG = left.genCode(ctx)
      val hG = right.genCode(ctx)
      ev.copy(code =
        code"""
          ${cG.code}
          boolean ${ev.isNull} = ${cG.isNull};
          long ${ev.value} = 0L;
          if (!${ev.isNull}) {
            ${hG.code}
            ${ev.value} = graft.functions.CigarCodegen.queryLength(
              ${cG.value}, ${hG.isNull} || ${hG.value});
          }""")
    }
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** alignment_query_coverage(cigar, type) → DOUBLE.
    * NULL cigar → NULL; NULL type → the documented default 'aligned',
    * matching the pre-expression UDF behavior.
    */
  case class AlignmentQueryCoverage(left: Expression, right: Expression)
      extends BinaryExpression with ImplicitCastInputTypes {
    override def inputTypes = Seq(StringType, StringType)
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = left.nullable
    override def prettyName: String = "alignment_query_coverage"
    override def eval(input: InternalRow): Any = {
      val c = left.eval(input)
      if (c == null) return null
      val t = right.eval(input)
      CigarCodegen.queryCoverage(c.asInstanceOf[UTF8String],
        if (t == null) CigarCodegen.ALIGNED_TYPE else t.asInstanceOf[UTF8String])
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cG = left.genCode(ctx)
      val tG = right.genCode(ctx)
      ev.copy(code =
        code"""
          ${cG.code}
          boolean ${ev.isNull} = ${cG.isNull};
          double ${ev.value} = 0.0;
          if (!${ev.isNull}) {
            ${tG.code}
            ${ev.value} = graft.functions.CigarCodegen.queryCoverage(
              ${cG.value},
              ${tG.isNull} ? graft.functions.CigarCodegen.ALIGNED_TYPE() : ${tG.value});
          }""")
    }
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** alignment_seq_identity(cigar, nm, md, type) → DOUBLE.
    *
    * Not null-strict: a NULL nm/md yields NULL only when the identity
    * type requires that tag (kernel decides), so null handling is
    * hand-rolled rather than nullSafeEval.
    */
  case class AlignmentSeqIdentity(
      cigar: Expression, nm: Expression, md: Expression, idType: Expression)
      extends Expression with ImplicitCastInputTypes {
    override def children: Seq[Expression] = Seq(cigar, nm, md, idType)
    override def inputTypes =
      Seq(StringType, LongType, StringType, StringType)
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "alignment_seq_identity"

    override def eval(input: InternalRow): Any = {
      val c = cigar.eval(input)
      val t = idType.eval(input)
      if (c == null || t == null) return null
      val nmV = nm.eval(input)
      val mdV = md.eval(input)
      val r = CigarCodegen.seqIdentity(
        c.asInstanceOf[UTF8String],
        nmV == null, if (nmV == null) -1L else nmV.asInstanceOf[Long],
        mdV.asInstanceOf[UTF8String], t.asInstanceOf[UTF8String])
      if (r == null) null else r.doubleValue()
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cG = cigar.genCode(ctx)
      val nmG = nm.genCode(ctx)
      val mdG = md.genCode(ctx)
      val tG = idType.genCode(ctx)
      val r = ctx.freshName("ident")
      ev.copy(code =
        code"""
          ${cG.code}
          ${nmG.code}
          ${mdG.code}
          ${tG.code}
          boolean ${ev.isNull} = true;
          double ${ev.value} = 0.0;
          if (!${cG.isNull} && !${tG.isNull}) {
            java.lang.Double $r = graft.functions.CigarCodegen.seqIdentity(
              ${cG.value},
              ${nmG.isNull}, ${nmG.isNull} ? -1L : ${nmG.value},
              ${mdG.isNull} ? null : ${mdG.value},
              ${tG.value});
            if ($r != null) { ${ev.isNull} = false; ${ev.value} = $r.doubleValue(); }
          }""")
    }

    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(cigar = newChildren(0), nm = newChildren(1),
        md = newChildren(2), idType = newChildren(3))
  }
}
