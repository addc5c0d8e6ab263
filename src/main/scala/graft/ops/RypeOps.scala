package graft.ops

import graft.kernel.Rype
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** RYpe extraction/classification operators (reference: src/
  * rype_extract.cpp, src/rype_classify.cpp, README.md:1823-1960).
  *
  * Scale design: the index is a Parquet-backed INVERTED relation
  * (minimizer → bucket), matching upstream's "Parquet-based inverted
  * index" description. Classification is `explode(query minimizers) ⋈
  * index on minimizer` — a hash-partitioned join that never
  * materializes per-executor copies of a big index (Catalyst still
  * broadcasts it when it is small). The reference's single-threaded
  * Arrow-FFI loop becomes a fully distributed join.
  */
object RypeOps {

  private def extractUdf(k: Int, w: Int, salt: Long) =
    udf((seq: String) =>
      if (seq == null) None
      else {
        val (f, r) = Rype.extractMinimizerSet(seq, k, w, salt)
        Some((f, r))
      })

  private def strandUdf(k: Int, w: Int, salt: Long) =
    udf((seq: String) =>
      if (seq == null) None
      else {
        val (fh, fp) = Rype.strandMinimizers(seq, k, w, salt)
        val (rh, rp) = Rype.strandMinimizers(Rype.reverseComplementLenient(seq), k, w, salt)
        Some((fh, fp, rh, rp))
      })

  private def requireColumns(df: DataFrame, idColumn: String): Unit = {
    val f = df.schema.fieldNames.toSet
    require(f.contains(idColumn), s"missing required column: $idColumn")
    require(f.contains("sequence1"), "missing required column: sequence1")
  }

  /** rype_extract_minimizer_set → (read_id, fwd_set, rc_set). */
  def rypeExtractMinimizerSet(
      sequences: DataFrame, k: Int, w: Int,
      salt: Long = Rype.DefaultSalt,
      idColumn: String = "read_id"): DataFrame = {
    Rype.validateK(k); Rype.validateW(w)
    requireColumns(sequences, idColumn)
    sequences
      .select(col(idColumn).as("read_id"),
        extractUdf(k, w, salt)(col("sequence1")).as("mz"))
      .select(col("read_id"), col("mz._1").as("fwd_set"), col("mz._2").as("rc_set"))
  }

  /** rype_extract_strand_minimizers → hashes + 0-based positions. */
  def rypeExtractStrandMinimizers(
      sequences: DataFrame, k: Int, w: Int,
      salt: Long = Rype.DefaultSalt,
      idColumn: String = "read_id"): DataFrame = {
    Rype.validateK(k); Rype.validateW(w)
    requireColumns(sequences, idColumn)
    sequences
      .select(col(idColumn).as("read_id"),
        strandUdf(k, w, salt)(col("sequence1")).as("mz"))
      .select(col("read_id"),
        col("mz._1").as("fwd_hashes"), col("mz._2").as("fwd_positions"),
        col("mz._3").as("rc_hashes"), col("mz._4").as("rc_positions"))
  }

  /** Build the inverted index relation: (bucket_id, bucket_name,
    * minimizer). Bucket ids are dense ranks of bucket names.
    */
  def buildIndex(
      subjects: DataFrame, k: Int, w: Int,
      salt: Long = Rype.DefaultSalt,
      bucketColumn: String = "bucket_name"): DataFrame = {
    Rype.validateK(k); Rype.validateW(w)
    val ext = subjects
      .select(col(bucketColumn).as("bucket_name"),
        extractUdf(k, w, salt)(col("sequence1")).as("mz"))
      .select(col("bucket_name"),
        explode(concat(col("mz._1"), col("mz._2"))).as("minimizer"))
      .distinct()
    val ids = ext.select("bucket_name").distinct()
      .withColumn("bucket_id",
        (dense_rank().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("bucket_name"))) - 1).cast("long"))
    ext.join(ids, "bucket_name").select("bucket_id", "bucket_name", "minimizer")
  }

  /** Persist / load the index as Parquet (.ryxdi-equivalent). */
  def saveIndex(index: DataFrame, path: String): Unit =
    index.write.mode("overwrite").parquet(path)
  def loadIndex(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** rype_classify → (read_id, bucket_id, bucket_name, score):
    * per-strand score = |query∩bucket| / |query set|, row kept when
    * max(fwd, rc) ≥ threshold; multi-bucket matches = multiple rows;
    * `negative_index` minimizers are removed from queries first.
    * Paired-end: when a `sequence2` column exists, both mates'
    * minimizers merge into the per-strand query sets (reference:
    * README.md:1848-1850 paired classification).
    */
  def rypeClassify(
      index: DataFrame,
      sequences: DataFrame,
      k: Int, w: Int,
      salt: Long = Rype.DefaultSalt,
      idColumn: String = "read_id",
      threshold: Double = 0.1,
      negativeIndex: Option[DataFrame] = None): DataFrame = {
    requireColumns(sequences, idColumn)
    val paired = sequences.schema.fieldNames.contains("sequence2")
    val sets =
      if (!paired) rypeExtractMinimizerSet(sequences, k, w, salt, idColumn)
      else {
        // mate2's forward strand pairs with mate1's reverse complement:
        // merge (fwd1 ∪ rc2) and (rc1 ∪ fwd2) per strand orientation
        val ext = extractUdf(k, w, salt)
        sequences
          .select(col(idColumn).as("read_id"),
            ext(col("sequence1")).as("m1"), ext(col("sequence2")).as("m2"))
          .select(col("read_id"),
            array_distinct(concat(col("m1._1"), coalesce(col("m2._2"), array())))
              .as("fwd_set"),
            array_distinct(concat(col("m1._2"), coalesce(col("m2._1"), array())))
              .as("rc_set"))
      }
    val strands = sets
      .select(col("read_id"), explode(array(
        struct(lit("fwd").as("strand"), col("fwd_set").as("set")),
        struct(lit("rc").as("strand"), col("rc_set").as("set")))).as("s"))
      .select(col("read_id"), col("s.strand").as("strand"), col("s.set").as("set"))
    val exploded0 = strands
      .withColumn("set_size", size(col("set")))
      .filter(col("set_size") > 0)
      .select(col("read_id"), col("strand"), col("set_size"),
        explode(col("set")).as("minimizer"))
    // negative index: drop query minimizers that occur in it
    val exploded = negativeIndex match {
      case Some(neg) =>
        exploded0.join(neg.select(col("minimizer")).distinct(),
          Seq("minimizer"), "left_anti")
      case None => exploded0
    }
    exploded
      .join(index, "minimizer")
      .groupBy(col("read_id"), col("strand"), col("set_size"),
        col("bucket_id"), col("bucket_name"))
      .agg(count(lit(1)).as("hits"))
      .withColumn("strand_score", col("hits").cast("double") / col("set_size"))
      .groupBy(col("read_id"), col("bucket_id"), col("bucket_name"))
      .agg(max(col("strand_score")).as("score"))
      .filter(col("score") >= threshold)
  }
}
