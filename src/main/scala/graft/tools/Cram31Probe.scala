package graft.tools

/** Scratch driver: decode CRAM 3.1 fixtures straight through
  * CramCodec.Reader and report per-file status. */
object Cram31Probe {
  def main(args: Array[String]): Unit = {
    val refDir = "/root/reference/ext/htslib-1.22.1/test"
    val fixDir = "/root/repo/src/test/resources/graft/cram31"
    val files =
      if (args.nonEmpty) args.toSeq
      else new java.io.File(fixDir).listFiles().map(_.getPath).sorted.toSeq
    for (f <- files) {
      try {
        val rdr = new graft.kernel.CramCodec.Reader(
          new java.io.BufferedInputStream(new java.io.FileInputStream(f)),
          Some(graft.kernel.CramCodec.loadFasta(
            new java.io.FileInputStream(s"$refDir/ce.fa"))),
          f, generateMd = false)
        val lines = rdr.toList
        println(s"${f.split('/').last}: OK ${lines.length} records")
        if (args.length > 1) lines.take(3).foreach(l => println("  " + l.take(120)))
      } catch {
        case e: Throwable =>
          println(s"${f.split('/').last}: FAIL $e")
      }
    }
  }
}
