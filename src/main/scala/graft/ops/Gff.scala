package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** GFF3 reading as a pure DataFrame composition.
  *
  * Reference: src/include/miint_macros.hpp:102-154 — read_gff is a SQL
  * macro over read_csv (tab-delimited, 9 VARCHAR columns, '#' comments,
  * null padding) with `.` → NULL casts and parse_gff_attributes
  * splitting `k=v;...` into a MAP. DuckDB's string_split indexing is
  * 1-based; Spark's element_at is also 1-based, so the translation is
  * index-preserving.
  */
object Gff {

  /** parse_gff_attributes(kvp) → MAP<STRING,STRING> */
  def parseGffAttributes(kvp: Column): Column =
    map_from_entries(
      transform(
        split(kvp, ";"),
        x =>
          struct(
            element_at(split(x, "="), 1).as("key"),
            element_at(split(x, "="), 2).as("value"))))

  private val rawSchema =
    (0 to 8).map(i => s"column$i STRING").mkString(", ")

  private def dotNull(c: Column): Column = when(c === ".", lit(null)).otherwise(c)

  /** read_gff(path) → 9-col GFF relation with MAP attributes. */
  def readGff(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("sep", "\t")
      .option("comment", "#")
      .option("header", "false")
      .schema(rawSchema)
      .csv(path)
      .filter(!col("column0").startsWith("##"))
      .select(
        col("column0").as("seqid"),
        col("column1").as("source"),
        col("column2").as("type"),
        col("column3").cast("int").as("position"),
        col("column4").cast("int").as("stop_position"),
        dotNull(col("column5")).cast("double").as("score"),
        dotNull(col("column6")).as("strand"),
        dotNull(col("column7")).cast("int").as("phase"),
        parseGffAttributes(col("column8")).as("attributes"))
}
