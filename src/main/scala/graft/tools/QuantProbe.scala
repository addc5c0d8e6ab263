package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: inspect int8 quantization internals for one vector. */
object QuantProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .filter(col("vec_id") === 197)
    val q = graft.ops.Similarity.quantizeInt8(emb)
    val r = q.select(col("q_scale"), col("q"), col("embedding")).collect()(0)
    val s = r.getDouble(0)
    println("SCALE_BITS " + java.lang.Double.doubleToLongBits(s) + " " + s)
    val codes = r.getSeq[Int](1)
    val xs = r.getSeq[Float](2).map(_.toDouble)
    for ((x, i) <- xs.zipWithIndex) {
      val expect = math.floor(x / s + 0.5).toInt
      if (expect != codes(i))
        println(s"DIFF elem $i x=$x x/s=${x / s} spark=${codes(i)} expect=$expect")
    }
    // the exact metric expression from l15
    val m = q.select(
      aggregate(
        zip_with(col("embedding"),
          graft.ops.Similarity.dequantizeInt8(col("q"), col("q_scale")),
          (x, y) => abs(x.cast("double") - y)),
        lit(0.0), (a, v) => greatest(a, v)).as("max_err"))
      .collect()(0).getDouble(0)
    println("L15_MAXERR " + m)
    val manual = xs.zip(codes).map { case (x, c) => math.abs(x - c * s) }.max
    println("MANUAL_MAXERR " + manual)
    // the registered query, verbatim
    val full = graft.SparkEntry.queries("l15_quantize_int8")(
      spark, "/root/testdata/sf0.01")
      .filter(col("vec_id") === 197).collect()(0)
    println("QUERY_ROW " + full)
    println("DONE")
    spark.stop()
  }
}
