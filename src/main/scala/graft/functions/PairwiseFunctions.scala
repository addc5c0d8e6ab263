package graft.functions

import graft.kernel.PairwiseAlign
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.udf

/** align_pairwise_* scalar functions (reference:
  * src/align_pairwise_functions.cpp:1-303): gap-affine alignment with
  * defaults (mismatch=4, gap_open=6, gap_extend=2), method must be
  * 'wfa2', penalties are CONSTANTS (the reference enforces bind-time
  * foldability — here they are plain Scala parameters, which is the
  * same constraint expressed in the host language), NULL in → NULL out.
  *
  * The per-thread aligner reuse of the reference maps to one Aligner
  * instance captured per UDF closure (reused across rows in a task).
  */
object PairwiseFunctions {

  final case class CigarResult(score: Int, cigar: String)
  final case class FullResult(score: Int, cigar: String,
      query_aligned: String, subject_aligned: String)

  private def checkMethod(method: String): Unit =
    require(method == "wfa2", s"method must be 'wfa2' (got '$method')")

  def alignPairwiseScore(
      query: Column, subject: Column,
      method: String = "wfa2", mismatch: Int = 4,
      gapOpen: Int = 6, gapExtend: Int = 2): Column = {
    checkMethod(method)
    val aligner = new PairwiseAlign.Aligner(mismatch, gapOpen, gapExtend)
    val f = udf((q: String, s: String) =>
      if (q == null || s == null) None else Some(aligner.alignScore(q, s)))
    f(query, subject)
  }

  def alignPairwiseCigar(
      query: Column, subject: Column,
      method: String = "wfa2", mismatch: Int = 4,
      gapOpen: Int = 6, gapExtend: Int = 2): Column = {
    checkMethod(method)
    val aligner = new PairwiseAlign.Aligner(mismatch, gapOpen, gapExtend)
    val f = udf((q: String, s: String) =>
      if (q == null || s == null) None
      else { val r = aligner.alignCigar(q, s); Some(CigarResult(r._1, r._2)) })
    f(query, subject)
  }

  def alignPairwiseFull(
      query: Column, subject: Column,
      method: String = "wfa2", mismatch: Int = 4,
      gapOpen: Int = 6, gapExtend: Int = 2): Column = {
    checkMethod(method)
    val aligner = new PairwiseAlign.Aligner(mismatch, gapOpen, gapExtend)
    val f = udf((q: String, s: String) =>
      if (q == null || s == null) None
      else {
        val r = aligner.alignFull(q, s)
        Some(FullResult(r.score, r.cigar, r.queryAligned, r.subjectAligned))
      })
    f(query, subject)
  }

  /** SQL names with default penalties. */
  def registerSql(spark: SparkSession): Unit = {
    val aligner = new PairwiseAlign.Aligner()
    spark.udf.register("align_pairwise_score",
      udf((q: String, s: String) =>
        if (q == null || s == null) None else Some(aligner.alignScore(q, s))))
    spark.udf.register("align_pairwise_cigar",
      udf((q: String, s: String) =>
        if (q == null || s == null) None
        else { val r = aligner.alignCigar(q, s); Some(CigarResult(r._1, r._2)) }))
    spark.udf.register("align_pairwise_full",
      udf((q: String, s: String) =>
        if (q == null || s == null) None
        else {
          val r = aligner.alignFull(q, s)
          Some(FullResult(r.score, r.cigar, r.queryAligned, r.subjectAligned))
        }))
  }
}
