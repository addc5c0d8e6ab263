package graft.functions

import graft.functions.CigarExpressions._
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.functions.lit

/** CIGAR-based scalar functions — native Catalyst expressions
  * (CigarExpressions) over the byte-level CigarCodegen kernel.
  *
  * Reference: src/alignment_functions.cpp:11-337 —
  * alignment_seq_identity (gap_excluded | blast | gap_compressed),
  * alignment_query_length (htslib-compatible), alignment_query_coverage
  * (aligned | mapped). NULL semantics: NULL/`*`/invalid CIGAR → NULL
  * identity; `*`/empty CIGAR → 0 length / 0.0 coverage; NULL nm/md
  * treated as absent (identity NULL when the type requires them).
  */
object AlignmentFunctions {

  private def e(c: Column): Expression = ColumnBridge.expression(c)
  private def col(e: Expression): Column = ColumnBridge.column(e)

  def alignmentSeqIdentity(cigar: Column, nm: Column, md: Column): Column =
    alignmentSeqIdentity(cigar, nm, md, "gap_compressed")
  def alignmentSeqIdentity(cigar: Column, nm: Column, md: Column, idType: String): Column =
    col(AlignmentSeqIdentity(e(cigar), e(nm), e(md), e(lit(idType))))

  def alignmentQueryLength(cigar: Column): Column =
    alignmentQueryLength(cigar, includeHardClips = true)
  def alignmentQueryLength(cigar: Column, includeHardClips: Boolean): Column =
    col(AlignmentQueryLength(e(cigar), e(lit(includeHardClips))))

  def alignmentQueryCoverage(cigar: Column): Column =
    alignmentQueryCoverage(cigar, "aligned")
  def alignmentQueryCoverage(cigar: Column, covType: String): Column =
    col(AlignmentQueryCoverage(e(cigar), e(lit(covType))))

}
