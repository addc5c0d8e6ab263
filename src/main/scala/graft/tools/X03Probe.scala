package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.kernel.TextKernel

/** Where does x03_minhash spend its time? Times each pipeline stage
  * (signature UDF, banding, candidate join, verify join) separately by
  * forcing progressively longer prefixes to a noop sink. */
object X03Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(f: => Unit): Unit = {
      f // warm
      System.gc()
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[x03probe] $label%-22s min=${runs.min}%.3f runs=${runs.map(r => f"$r%.3f").mkString(",")}")
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .repartition(spark.sparkContext.defaultParallelism)
    val minhashUdf = udf((text: String, shingleN: Int, numHashes: Int) =>
      TextKernel.minhashSignature(TextKernel.shingleHashes(text, shingleN), numHashes))

    def sigs = docs.select(col("doc_id").as("id"),
      minhashUdf(col("text"), lit(5), lit(64)).as("sig"))
    def banded = sigs.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(15)),
        b => hash(slice(col("sig"), b * 4 + 1, lit(4)), b))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_hash")
    def keys = banded.select(col("band"), col("band_hash"), col("id"))
    def pairs = keys.select(col("band"), col("band_hash"), col("id").as("id_a"))
      .join(keys.select(col("band"), col("band_hash"), col("id").as("id_b")),
        Seq("band", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    def full = graft.ops.Dedup.minhashPairs(docs, "doc_id", "text",
      shingleN = 5, numHashes = 64, bands = 16, threshold = 0.4)

    def texts = docs.select(col("doc_id").as("id"), col("text"))
    def joined = pairs
      .join(texts.select(col("id").as("id_a"), col("text").as("text_a")), "id_a")
      .join(texts.select(col("id").as("id_b"), col("text").as("text_b")), "id_b")
    def jac = joined.select(col("id_a"), col("id_b"),
      graft.ops.Dedup.ngramJaccard(col("text_a"), col("text_b"), 5).as("jaccard"))
      .filter(col("jaccard") >= 0.4)

    time("docs_scan") { docs.write.format("noop").mode("overwrite").save() }
    time("sigs") { sigs.write.format("noop").mode("overwrite").save() }
    time("banded") { banded.write.format("noop").mode("overwrite").save() }
    time("pairs") { pairs.write.format("noop").mode("overwrite").save() }
    time("join_texts") { joined.write.format("noop").mode("overwrite").save() }
    time("jaccard_filter") { jac.write.format("noop").mode("overwrite").save() }
    time("full") { full.write.format("noop").mode("overwrite").save() }
    println("[x03probe] pairs count = " + pairs.count())
    spark.stop()
  }
}
