package graft.functions

import graft.kernel.Sequence
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen-callable UTF8String entry points for the sequence kernel.
  * Delegates to the reference-validated String kernel — sequences are
  * short and these are not scan-bound, so parity beats duplicating the
  * IUPAC tables at the byte level.
  */
object SequenceCodegen {
  def dnaRevComp(u: UTF8String): UTF8String =
    UTF8String.fromString(Sequence.dnaReverseComplement(u.toString))
  def rnaRevComp(u: UTF8String): UTF8String =
    UTF8String.fromString(Sequence.rnaReverseComplement(u.toString))
  def dnaAsRegexp(u: UTF8String): UTF8String =
    UTF8String.fromString(Sequence.dnaAsRegexp(u.toString))
  def rnaAsRegexp(u: UTF8String): UTF8String =
    UTF8String.fromString(Sequence.rnaAsRegexp(u.toString))
}

/** Native expressions for the four sequence functions (NULL-strict,
  * invalid bases throw with 1-based positions — reference:
  * src/sequence_functions.cpp:12-288).
  */
object SequenceExpressions {

  /** fn ∈ dnaRevComp | rnaRevComp | dnaAsRegexp | rnaAsRegexp —
    * the codegen method name on SequenceCodegen.
    */
  case class SequenceTransform(child: Expression, fn: String, sqlName: String)
      extends UnaryExpression with ImplicitCastInputTypes {
    override def inputTypes = Seq(StringType)
    override def dataType: DataType = StringType
    override def prettyName: String = sqlName

    private lazy val impl: UTF8String => UTF8String = fn match {
      case "dnaRevComp"  => SequenceCodegen.dnaRevComp
      case "rnaRevComp"  => SequenceCodegen.rnaRevComp
      case "dnaAsRegexp" => SequenceCodegen.dnaAsRegexp
      case "rnaAsRegexp" => SequenceCodegen.rnaAsRegexp
    }

    override protected def nullSafeEval(seq: Any): Any =
      impl(seq.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.SequenceCodegen.$fn($c)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }
}
