package graft.functions

import graft.kernel.Sequence
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.udf

/** Nucleotide sequence scalar functions over the pure kernel.
  * Reference: src/sequence_functions.cpp:296-328. Strict validation:
  * invalid bases throw (position-reporting), matching the reference's
  * error-first behavior; NULL in → NULL out.
  */
object SequenceFunctions {

  private val dnaRevCompUdf = udf((s: String) =>
    if (s == null) null else Sequence.dnaReverseComplement(s))
  private val rnaRevCompUdf = udf((s: String) =>
    if (s == null) null else Sequence.rnaReverseComplement(s))
  private val dnaAsRegexpUdf = udf((s: String) =>
    if (s == null) null else Sequence.dnaAsRegexp(s))
  private val rnaAsRegexpUdf = udf((s: String) =>
    if (s == null) null else Sequence.rnaAsRegexp(s))

  def sequenceDnaReverseComplement(seq: Column): Column = dnaRevCompUdf(seq)
  def sequenceRnaReverseComplement(seq: Column): Column = rnaRevCompUdf(seq)
  def sequenceDnaAsRegexp(seq: Column): Column = dnaAsRegexpUdf(seq)
  def sequenceRnaAsRegexp(seq: Column): Column = rnaAsRegexpUdf(seq)

  def registerSql(spark: SparkSession): Unit = {
    spark.udf.register("sequence_dna_reverse_complement", dnaRevCompUdf)
    spark.udf.register("sequence_rna_reverse_complement", rnaRevCompUdf)
    spark.udf.register("sequence_dna_as_regexp", dnaAsRegexpUdf)
    spark.udf.register("sequence_rna_as_regexp", rnaAsRegexpUdf)
  }
}
