package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** jplace phylogenetic-placement reading as a DataFrame composition.
  *
  * Reference: src/include/miint_macros.hpp:156-194 — read_jplace is a
  * SQL macro over read_json(filename:=true): unnest(placements), take
  * the best placement p[0] (fields edge_num, likelihood,
  * like_weight_ratio, distal_length, pendant_length per the jplace
  * fields array convention), fragment name = COALESCE(nm[0][0], n[0]).
  *
  * The jplace schema is fixed by the format spec (Matsen et al. 2012),
  * so we declare it explicitly rather than inferring — `nm` entries mix
  * strings and multiplicity ints, which inference would mistype.
  */
object Jplace {

  private val jplaceSchema =
    "version INT, tree STRING, " +
      "placements ARRAY<STRUCT<p: ARRAY<ARRAY<DOUBLE>>, n: ARRAY<STRING>, " +
      "nm: ARRAY<ARRAY<STRING>>>>, " +
      "fields ARRAY<STRING>, metadata MAP<STRING, STRING>"

  /** read_jplace(path) → 7-col best-placement relation. */
  def readJplace(spark: SparkSession, path: String): DataFrame = {
    val best = element_at(col("pl.p"), 1)
    spark.read
      .option("multiLine", "true")
      .schema(jplaceSchema)
      .json(path)
      .withColumn("filepath", input_file_name())
      .select(explode(col("placements")).as("pl"), col("filepath"))
      .select(
        coalesce(
          element_at(element_at(col("pl.nm"), 1), 1),
          element_at(col("pl.n"), 1)).as("fragment"),
        element_at(best, 1).cast("int").as("edge_num"),
        element_at(best, 2).as("likelihood"),
        element_at(best, 3).as("like_weight_ratio"),
        element_at(best, 4).as("distal_length"),
        element_at(best, 5).as("pendant_length"),
        col("filepath"))
  }
}
