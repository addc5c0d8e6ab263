package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Where does x02_rype_throughput spend its time? Forces progressively
  * longer prefixes of the classify pipeline to a noop sink. */
object X02Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/tmp/sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time(label: String)(f: => Unit): Unit = {
      f // warm
      System.gc()
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[x02probe] $label%-22s min=${runs.min}%.3f runs=${runs.map(r => f"$r%.3f").mkString(",")}")
    }

    val NGenomes = 4; val GenomeLen = 2000; val ReadLen = 150
    val genomes = graft.queries.LayerB.syntheticGenomes(NGenomes, GenomeLen)
    val slice = udf((id: Long) => {
      val g = genomes(java.lang.Math.floorMod(id, NGenomes.toLong).toInt)
      val off = java.lang.Math.floorMod(id * 131, (GenomeLen - ReadLen).toLong).toInt
      g.substring(off, off + ReadLen)
    })
    def reads = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(concat(lit("r"), col("doc_id")).as("read_id"),
        slice(col("doc_id")).as("sequence1"))
      .repartition(spark.sparkContext.defaultParallelism)
    val subjects = genomes.zipWithIndex
      .map { case (g, i) => (s"bucket$i", g) }.toDF("bucket_name", "sequence1")
    val index = graft.ops.RypeOps.buildIndex(subjects, k = 16, w = 5)

    def sets = graft.ops.RypeOps.rypeExtractMinimizerSet(reads, 16, 5)
    def strands = sets
      .select(col("read_id"), explode(array(
        struct(lit("fwd").as("strand"), col("fwd_set").as("set")),
        struct(lit("rc").as("strand"), col("rc_set").as("set")))).as("s"))
      .select(col("read_id"), col("s.strand").as("strand"), col("s.set").as("set"))
    def exploded = strands
      .withColumn("set_size", size(col("set")))
      .filter(col("set_size") > 0)
      .select(col("read_id"), col("strand"), col("set_size"),
        explode(col("set")).as("minimizer"))
    def joined = exploded.join(index, "minimizer")
    def agg1 = joined.groupBy(col("read_id"), col("strand"), col("set_size"),
      col("bucket_id"), col("bucket_name")).agg(count(lit(1)).as("hits"))
    def full = graft.ops.RypeOps.rypeClassify(index, reads, k = 16, w = 5, threshold = 0.2)

    time("reads") { reads.write.format("noop").mode("overwrite").save() }
    time("sets") { sets.write.format("noop").mode("overwrite").save() }
    time("strands") { strands.write.format("noop").mode("overwrite").save() }
    time("exploded") { exploded.write.format("noop").mode("overwrite").save() }
    time("joined") { joined.write.format("noop").mode("overwrite").save() }
    time("agg1") { agg1.write.format("noop").mode("overwrite").save() }
    time("full") { full.write.format("noop").mode("overwrite").save() }
    println("[x02probe] exploded count = " + exploded.count() +
      ", joined = " + joined.count())
    spark.stop()
  }
}
