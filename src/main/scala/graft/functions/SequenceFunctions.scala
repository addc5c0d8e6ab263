package graft.functions

import graft.functions.SequenceExpressions.SequenceTransform
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graft.ColumnBridge

/** Nucleotide sequence scalar functions — native Catalyst expressions
  * over the pure kernel. Reference: src/sequence_functions.cpp:296-328.
  * Strict validation: invalid bases throw (position-reporting),
  * matching the reference's error-first behavior; NULL in → NULL out.
  */
object SequenceFunctions {

  private def mk(fn: String, sqlName: String)(seq: Column): Column =
    ColumnBridge.column(SequenceTransform(ColumnBridge.expression(seq), fn, sqlName))

  def sequenceDnaReverseComplement(seq: Column): Column =
    mk("dnaRevComp", "sequence_dna_reverse_complement")(seq)
  def sequenceRnaReverseComplement(seq: Column): Column =
    mk("rnaRevComp", "sequence_rna_reverse_complement")(seq)
  def sequenceDnaAsRegexp(seq: Column): Column =
    mk("dnaAsRegexp", "sequence_dna_as_regexp")(seq)
  def sequenceRnaAsRegexp(seq: Column): Column =
    mk("rnaAsRegexp", "sequence_rna_as_regexp")(seq)

}
