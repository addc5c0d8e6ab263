package graft.tools

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch probe: where do l18's 30s at sf0.1 go? Compares the
  * run-length topRatio against the naive count-per-distinct and
  * isolates wordGrams construction. */
object L18Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def words(t: Column) = filter(split(t, "\\s+"), w => length(w) > 0)
    def grams(t: Column, n: Int) = {
      val ws = words(t)
      when(size(ws) < n, array().cast("array<string>")).otherwise(
        transform(sequence(lit(0), size(ws) - n),
          i => concat_ws(" ", slice(ws, i + 1, lit(n)))))
    }
    def topRun(g: Column): Column = {
      val rs = aggregate(array_sort(g),
        struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("max")),
        (acc, x) => {
          val run = when(x === acc.getField("prev"), acc.getField("run") + 1L).otherwise(lit(1L))
          struct(x.as("prev"), run.as("run"), greatest(acc.getField("max"), run).as("max"))
        })
      when(size(g) === 0, 0.0).otherwise(rs.getField("max").cast("double") / size(g).cast("double"))
    }
    def topNaive(g: Column): Column =
      when(size(g) === 0, 0.0).otherwise(
        aggregate(array_distinct(g), lit(0L),
          (acc, x) => greatest(acc, size(filter(g, y => y === x)).cast("long")))
          .cast("double") / size(g).cast("double"))

    def time(name: String)(f: => Unit): Unit = {
      f
      val t0 = System.nanoTime(); f
      println(f"PROBE $name: ${(System.nanoTime() - t0) / 1e9}%.3f")
    }

    time("n_words_only") {
      docs.select(size(words(col("text")))).write.format("noop").mode("overwrite").save()
    }
    time("grams2_size_only") {
      docs.select(size(grams(col("text"), 2))).write.format("noop").mode("overwrite").save()
    }
    time("sort_grams2") {
      docs.select(size(array_sort(grams(col("text"), 2)))).write.format("noop").mode("overwrite").save()
    }
    time("toprun_g2") {
      docs.select(topRun(grams(col("text"), 2))).write.format("noop").mode("overwrite").save()
    }
    time("topnaive_g2") {
      docs.select(topNaive(grams(col("text"), 2))).write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
