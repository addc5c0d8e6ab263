package graft.tools

/** Scratch driver for the CRAM 3.1 codec kernels: decodes every
  * committed htscodecs golden vector (arith, tok3, fqzcomp) and
  * reports per-file status — used to localise failures outside the
  * ScalaTest harness.
  */
object CodecProbe {
  def main(args: Array[String]): Unit = {
    val base = "/root/reference/ext/htslib-1.22.1/htscodecs/tests"
    val which = if (args.nonEmpty) args(0) else "arith"
    which match {
      case "arith" =>
        for (f <- new java.io.File(s"$base/dat/arith").listFiles().sortBy(_.getName)) {
          val comp = java.nio.file.Files.readAllBytes(f.toPath)
          try {
            val got = graft.kernel.ArithDynamic.decode(comp)
            println(s"${f.getName}: OK ${got.length} bytes")
          } catch { case e: Throwable => println(s"${f.getName}: FAIL $e") }
        }
      case "tok3" =>
        for (f <- new java.io.File(s"$base/names/tok3").listFiles().sortBy(_.getName)) {
          val comp = java.nio.file.Files.readAllBytes(f.toPath)
          try {
            val got = graft.kernel.NameTok3.decode(comp)
            println(s"${f.getName}: OK ${got.length} bytes")
          } catch { case e: Throwable => println(s"${f.getName}: FAIL $e") }
        }
      case "fqz" =>
        for (f <- new java.io.File(s"$base/dat/fqzcomp").listFiles().sortBy(_.getName)) {
          val comp = java.nio.file.Files.readAllBytes(f.toPath)
          try {
            val (got, lens) = graft.kernel.FqzComp.decodeWithLengths(comp)
            println(s"${f.getName}: OK ${got.length} bytes, ${lens.length} reads")
          } catch { case e: Throwable => println(s"${f.getName}: FAIL $e") }
        }
    }
  }
}
