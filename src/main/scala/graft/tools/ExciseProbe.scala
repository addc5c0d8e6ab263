package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for decontaminateExcise (l74): wall time and excision
  * volume across corpus decades, FNV production hash. Benchmark = the
  * doc_id % 23 slice of the SAME amplified corpus, so the
  * contamination rate stays constant across decades and wall time
  * isolates the machinery (fingerprint exchange, island merge, span
  * join + token rebuild) rather than a shifting hit rate.
  *
  * Usage: runMain graft.tools.ExciseProbe [sfDir] [factors] [n]
  */
object ExciseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val factors = args.lift(1).getOrElse("10,100").split(",").map(_.toInt)
    val n = args.lift(2).getOrElse("8").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (f <- factors) {
      val dir = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft_exciseprobe_x$f.parquet")
      if (!dir.exists())
        Amplify.documents(
            spark.read.parquet(s"$sfDir/documents.parquet"), f)
          .repartition(32)
          .write.mode("overwrite").parquet(dir.getAbsolutePath)
      val docs = spark.read.parquet(dir.getAbsolutePath)
      val bench = docs.filter(col("doc_id") % 23 === 0)
      // warm-up then steady
      for (rep <- 1 to 2) {
        val t0 = System.nanoTime()
        val out = graft.ops.Decontaminate.decontaminateExcise(
            docs, bench, "doc_id", "text", n, exactHash = false)
          .agg(count(lit(1)).as("docs"),
            sum(when(col("n_spans") > 0, 1L).otherwise(0L)).as("excised"),
            sum(col("n_removed_tokens")).as("removed"))
          .collect().head
        val secs = (System.nanoTime() - t0) / 1e9
        if (rep == 2)
          println(f"[probe] x$f%-5d docs=${out.getLong(0)}%9d " +
            f"excised=${out.getLong(1)}%8d removed_tokens=${out.getLong(2)}%11d " +
            f"$secs%7.2f s")
      }
    }
    spark.stop()
  }
}
