package graft.tools

/** Single-thread CRAM decode throughput: CramCodec.Reader straight
  * over a file, counting records — the per-task cost model for the
  * alignments source (one task per file/partition at scale). Args:
  * <cram> <fasta> [md]. */
object CramThroughputProbe {
  def main(args: Array[String]): Unit = {
    val cram = args(0); val fa = args(1)
    val md = args.length > 2 && args(2) == "md"
    for (round <- 1 to 2) {
      val t0 = System.nanoTime()
      val rdr = new graft.kernel.CramCodec.Reader(
        new java.io.BufferedInputStream(new java.io.FileInputStream(cram)),
        Some(graft.kernel.CramCodec.loadFasta(new java.io.FileInputStream(fa))),
        cram, generateMd = md)
      var n = 0L
      while (rdr.hasNext) { rdr.next(); n += 1 }
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[cram] round $round: $n records in $secs%.2f s (${n / secs / 1e3}%.0f krec/s, md=$md)")
    }
  }
}
