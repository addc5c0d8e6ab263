package graft.ops

import graft.functions.CompressIntervals
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** genome_coverage(alignments, subject_total_length, subject_genome_id)
  * → (genome_id, covered, proportion_covered)
  *
  * Reference: src/include/miint_macros.hpp:196-243. Half-open interval
  * arithmetic (covered = Σ(stop−start) over merged intervals, per
  * test/sql/genome_coverage.test:8-10).
  *
  * Scale shape: one shuffle on `reference` for the interval aggregate
  * (state bounded by the compressor's 1M cap), the contig→genome map
  * and totals are dimension tables → Catalyst broadcasts them; no
  * driver materialization.
  */
object GenomeCoverage {

  def genomeCoverage(
      alignments: DataFrame,
      subjectTotalLength: DataFrame,
      subjectGenomeId: DataFrame): DataFrame = {
    val compressed = alignments
      .groupBy(col("reference"))
      .agg(CompressIntervals.compressIntervals(col("position"), col("stop_position")).as("cis"))
      .select(col("reference"), explode(col("cis")).as("ci"))
    val internal = compressed
      .join(subjectGenomeId, compressed("reference") === subjectGenomeId("contig_id"))
      .groupBy(col("genome_id"), col("reference"))
      .agg(sum(col("ci.stop") - col("ci.start")).as("covered_internal"))
    val total = internal
      .groupBy(col("genome_id"))
      .agg(sum(col("covered_internal")).as("covered"))
    total
      .join(subjectTotalLength, Seq("genome_id"))
      .select(
        col("genome_id"),
        col("covered"),
        (col("covered").cast("double") / col("total_length")).as("proportion_covered"))
  }
}
