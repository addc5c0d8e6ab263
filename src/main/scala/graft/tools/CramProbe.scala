package graft.tools

import graft.kernel.{BamCodec, CramCodec, SamCodec}
import java.io.{BufferedInputStream, FileInputStream}

/** Scratch probe: decode the reference's committed htslib test CRAMs
  * and field-compare against their BAM/SAM twins. Not part of the
  * driver contract.
  */
object CramProbe {
  private val dir = "/root/reference/ext/htslib-1.22.1/test"

  private def cramRecords(path: String, fasta: Option[String],
      generateMd: Boolean = true): Vector[SamCodec.SamRecord] = {
    val ref = fasta.map(f => CramCodec.loadFasta(new FileInputStream(f)))
    val rd = new CramCodec.Reader(
      new BufferedInputStream(new FileInputStream(path)), ref, path, generateMd)
    rd.map(SamCodec.parseLine(_, includeSeqQual = true)).toVector
  }

  private def bamRecords(path: String): Vector[SamCodec.SamRecord] = {
    new BamCodec.Reader(new BufferedInputStream(new FileInputStream(path)),
      includeSeqQual = true).toVector
  }

  private def samRecords(path: String): Vector[SamCodec.SamRecord] = {
    scala.io.Source.fromFile(path).getLines()
      .filterNot(l => l.isEmpty || SamCodec.isHeaderLine(l))
      .map(SamCodec.parseLine(_, includeSeqQual = true)).toVector
  }

  private def compare(name: String, got: Vector[SamCodec.SamRecord],
      want: Vector[SamCodec.SamRecord]): Unit = {
    if (got.length != want.length) {
      println(s"PROBE $name: FAIL row count ${got.length} vs ${want.length}")
      return
    }
    var bad = 0
    for (((g, w), i) <- got.zip(want).zipWithIndex if bad < 5) {
      if (g != w && !(g.qual.isDefined && w.qual.isDefined &&
          g.copy(qual = None) == w.copy(qual = None) &&
          g.qual.get.sameElements(w.qual.get))) {
        bad += 1
        println(s"PROBE $name row $i MISMATCH")
        println(s"  got : $g")
        println(s"  want: $w")
      }
    }
    if (bad == 0) println(s"PROBE $name: OK (${got.length} records)")
  }

  def main(args: Array[String]): Unit = {
    try compare("range_vs_bam",
      cramRecords(s"$dir/range.cram", Some(s"$dir/ce.fa")),
      bamRecords(s"$dir/range.bam"))
    catch { case e: Throwable => println(s"PROBE range_vs_bam: ERROR $e"); e.printStackTrace() }

    for ((cram, sam, fa) <- Seq(
        ("ce#5b_java.cram", "ce#5b.sam", Some(s"$dir/ce.fa")),
        ("auxf#values_java.cram", "auxf#values.sam", Some(s"$dir/auxf.fa")),
        ("xx#large_aux_java.cram", "xx#large_aux.sam", Some(s"$dir/xx.fa")))) {
      // the SAM twins are the pre-CRAM originals without MD/NM; htslib's
      // equivalent comparison uses its `nomd` option the same way
      try compare(cram, cramRecords(s"$dir/$cram", fa, generateMd = false),
        samRecords(s"$dir/$sam"))
      catch { case e: Throwable => println(s"PROBE $cram: ERROR $e"); e.printStackTrace() }
    }
  }
}
