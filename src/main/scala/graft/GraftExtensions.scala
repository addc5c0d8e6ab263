package graft

import graft.functions.CigarExpressions._
import graft.functions.SequenceExpressions.SequenceTransform
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions entry point: makes every native graft
  * expression a first-class SQL function in ANY session built with
  *   spark.sql.extensions=graft.GraftExtensions
  * (cluster-wide, no per-session registration call needed). The same
  * builders back MiintRegistry.registerAll for programmatic use.
  *
  * Reference SQL surface: src/miint_extension.cpp:65-117.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    val nullStr = Literal.create(null, org.apache.spark.sql.types.StringType)

    ext.injectFunction((FunctionIdentifier("alignment_seq_identity"),
      info("alignment_seq_identity",
        "alignment_seq_identity(cigar, nm[, md[, type]]) - Heng Li sequence identity"),
      (args: Seq[Expression]) => args match {
        case Seq(c, nm)        => AlignmentSeqIdentity(c, nm, nullStr, Literal("gap_compressed"))
        case Seq(c, nm, md)    => AlignmentSeqIdentity(c, nm, md, Literal("gap_compressed"))
        case Seq(c, nm, md, t) => AlignmentSeqIdentity(c, nm, md, t)
        case other => throw new IllegalArgumentException(
          s"alignment_seq_identity expects 2-4 arguments, got ${other.length}")
      }))

    ext.injectFunction((FunctionIdentifier("alignment_query_length"),
      info("alignment_query_length",
        "alignment_query_length(cigar[, include_hard_clips]) - query length from CIGAR"),
      (args: Seq[Expression]) => args match {
        case Seq(c)    => AlignmentQueryLength(c, Literal(true))
        case Seq(c, h) => AlignmentQueryLength(c, h)
        case other => throw new IllegalArgumentException(
          s"alignment_query_length expects 1-2 arguments, got ${other.length}")
      }))

    ext.injectFunction((FunctionIdentifier("alignment_query_coverage"),
      info("alignment_query_coverage",
        "alignment_query_coverage(cigar[, type]) - covered fraction of the query"),
      (args: Seq[Expression]) => args match {
        case Seq(c)    => AlignmentQueryCoverage(c, Literal("aligned"))
        case Seq(c, t) => AlignmentQueryCoverage(c, t)
        case other => throw new IllegalArgumentException(
          s"alignment_query_coverage expects 1-2 arguments, got ${other.length}")
      }))

    for ((name, fn) <- Seq(
        "sequence_dna_reverse_complement" -> "dnaRevComp",
        "sequence_rna_reverse_complement" -> "rnaRevComp",
        "sequence_dna_as_regexp" -> "dnaAsRegexp",
        "sequence_rna_as_regexp" -> "rnaAsRegexp")) {
      ext.injectFunction((FunctionIdentifier(name),
        info(name, s"$name(seq) - IUPAC-aware sequence transform"),
        (args: Seq[Expression]) => args match {
          case Seq(c) => SequenceTransform(c, fn, name)
          case other => throw new IllegalArgumentException(
            s"$name expects 1 argument, got ${other.length}")
        }))
    }
  }
}
