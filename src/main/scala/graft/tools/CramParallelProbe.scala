package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-file parallelism proof for the alignments source over CRAM:
  * the same 16-file glob read at local[1] vs local[16]. The source
  * plans one task per file, so wall time should scale ~linearly with
  * cores until the file count bounds it. */
object CramParallelProbe {
  def main(args: Array[String]): Unit = {
    for (cores <- Seq(1, 16)) {
      val spark = SparkSession.builder().master(s"local[$cores]")
        .config("spark.sql.shuffle.partitions", cores)
        .config("spark.ui.enabled", "false").getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      // warm (JIT + file cache)
      spark.read.format("alignments")
        .option("reference_fasta", "/tmp/htslib/test/ce.fa")
        .load("/tmp/cram_par/*.cram").count()
      val t0 = System.nanoTime()
      val n = spark.read.format("alignments")
        .option("reference_fasta", "/tmp/htslib/test/ce.fa")
        .load("/tmp/cram_par/*.cram").count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[crampar] local[$cores]: $n records in $secs%.2f s (${n / secs / 1e6}%.2f Mrec/s)")
      spark.stop()
    }
  }
}
