package graft.ops

import graft.functions.AlignmentFlags
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Woltka OGU feature-count macros as DataFrame→DataFrame ops.
  *
  * Reference: src/include/miint_macros.hpp:35-100. The relation must
  * contain `reference` and `flags` columns plus the caller-named
  * sequence-id (and sample-id) columns. Fractional multi-mapping: each
  * distinct (read, orientation) contributes 1/N to each of its N
  * distinct references.
  *
  * Scale shape (SURVEY §3.2): DISTINCT shuffles on the full key, the
  * window shuffles on (seq_id, is_fwd), the final agg shuffles on the
  * output key — same two-exchange plan DuckDB runs, fully partitioned,
  * no driver materialization.
  */
object Woltka {

  /** woltka_ogu(relation, sequence_id_field) → (feature_id, value) */
  def woltkaOgu(relation: DataFrame, sequenceIdField: String): DataFrame = {
    val base = relation
      .select(
        col(sequenceIdField).as("query_local_id_field"),
        col("reference").as("feature_id"),
        AlignmentFlags.alignmentIsRead1(col("flags")).as("is_fwd"))
      .distinct()
    val w = Window.partitionBy(col("query_local_id_field"), col("is_fwd"))
    base
      .select(col("feature_id"), (lit(1.0) / count(lit(1)).over(w)).as("local_value"))
      .groupBy(col("feature_id"))
      .agg(sum(col("local_value")).as("value"))
  }

  /** woltka_ogu_per_sample(relation, sample_id_field, sequence_id_field)
    * → (sample_id, feature_id, value)
    */
  def woltkaOguPerSample(
      relation: DataFrame,
      sampleIdField: String,
      sequenceIdField: String): DataFrame = {
    val base = relation
      .select(
        col(sequenceIdField).as("query_local_id_field"),
        col(sampleIdField).as("query_local_sample_id"),
        col("reference").as("feature_id"),
        AlignmentFlags.alignmentIsRead1(col("flags")).as("is_fwd"))
      .distinct()
    val w = Window.partitionBy(col("query_local_id_field"), col("is_fwd"))
    base
      .select(
        col("query_local_sample_id"),
        col("feature_id"),
        (lit(1.0) / count(lit(1)).over(w)).as("local_value"))
      .groupBy(col("query_local_sample_id"), col("feature_id"))
      .agg(sum(col("local_value")).as("value"))
      .withColumnRenamed("query_local_sample_id", "sample_id")
  }
}
