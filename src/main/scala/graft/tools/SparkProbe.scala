// scratch probe — run via: sbt "runMain graft.tools.SparkProbe"
package graft.tools
import org.apache.spark.sql.SparkSession
object SparkProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    o.printSchema()
    o.show(2, false)
    spark.stop()
  }
}
