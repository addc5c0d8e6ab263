package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: native CIGAR expression vs equivalent Scala UDF. */
object ExprProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
      .withColumn("cigar",
        concat((col("l_suppkey") % 5) * 10 + 5, lit("S"),
          col("l_quantity").cast("long"), lit("M"),
          round(col("l_discount") * 100, 0).cast("long") + 1, lit("I"),
          round(col("l_tax") * 100, 0).cast("long") + 1, lit("D")))
      .withColumn("nm", col("l_linenumber").cast("long"))

    val udfIdent = udf((c: String, nm: java.lang.Long) =>
      if (c == null) None
      else graft.kernel.Cigar.seqIdentity(c, if (nm == null) -1 else nm, null, "gap_compressed"))
    val udfQlen = udf((c: String) =>
      if (c == null) None else Some(graft.kernel.Cigar.queryLength(c, true)))

    def time(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      mk.write.format("noop").mode("overwrite").save() // warm
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"EXPR $name: ${runs.min}%.3f")
    }

    time("udf") {
      li.select(udfIdent(col("cigar"), col("nm")).as("i"), udfQlen(col("cigar")).as("q"))
    }
    time("native") {
      li.select(
        graft.functions.AlignmentFunctions.alignmentSeqIdentity(
          col("cigar"), col("nm"), lit(null).cast("string")).as("i"),
        graft.functions.AlignmentFunctions.alignmentQueryLength(col("cigar")).as("q"))
    }
    spark.stop()
  }
}
