package graft.functions

import graft.kernel.Cigar
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.{lit, udf}

/** CIGAR-based scalar functions over the pure kernel.
  *
  * Reference: src/alignment_functions.cpp:11-337 —
  * alignment_seq_identity (gap_excluded | blast | gap_compressed),
  * alignment_query_length (htslib-compatible), alignment_query_coverage
  * (aligned | mapped). NULL semantics: NULL/`*`/invalid CIGAR → NULL
  * identity; `*`/empty CIGAR → 0 length / 0.0 coverage; NULL nm/md
  * treated as absent (identity NULL when the type requires them).
  */
object AlignmentFunctions {

  private val seqIdentityUdf =
    udf((cigar: String, nm: java.lang.Long, md: String, idType: String) =>
      if (cigar == null || idType == null) None
      else Cigar.seqIdentity(cigar, if (nm == null) -1L else nm.longValue(), md, idType))

  private val queryLengthUdf =
    udf((cigar: String, includeHardClips: java.lang.Boolean) =>
      if (cigar == null) None
      else Some(Cigar.queryLength(cigar, includeHardClips == null || includeHardClips.booleanValue())))

  private val queryCoverageUdf =
    udf((cigar: String, covType: String) =>
      if (cigar == null) None
      else Some(Cigar.queryCoverage(cigar, if (covType == null) "aligned" else covType)))

  def alignmentSeqIdentity(cigar: Column, nm: Column, md: Column): Column =
    seqIdentityUdf(cigar, nm, md, lit("gap_compressed"))
  def alignmentSeqIdentity(cigar: Column, nm: Column, md: Column, idType: String): Column =
    seqIdentityUdf(cigar, nm, md, lit(idType))

  def alignmentQueryLength(cigar: Column): Column = queryLengthUdf(cigar, lit(true))
  def alignmentQueryLength(cigar: Column, includeHardClips: Boolean): Column =
    queryLengthUdf(cigar, lit(includeHardClips))

  def alignmentQueryCoverage(cigar: Column): Column = queryCoverageUdf(cigar, lit("aligned"))
  def alignmentQueryCoverage(cigar: Column, covType: String): Column =
    queryCoverageUdf(cigar, lit(covType))

  /** SQL registration: full-arity names (Spark UDF registration has no
    * overloads; defaults are provided by the Column API above).
    */
  def registerSql(spark: SparkSession): Unit = {
    spark.udf.register("alignment_seq_identity", seqIdentityUdf)
    spark.udf.register("alignment_query_length", queryLengthUdf)
    spark.udf.register("alignment_query_coverage", queryCoverageUdf)
  }
}
