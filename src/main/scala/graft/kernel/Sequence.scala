package graft.kernel

/** Pure nucleotide-sequence kernels — no Spark dependencies.
  *
  * Semantics ported from the reference's sequence functions
  * (reference: src/sequence_functions.cpp:12-288): full IUPAC
  * complement tables (case-preserving, `-`/`.` self-mapping), strict
  * validation with 1-based position reporting (DNA rejects U, RNA
  * rejects T), and IUPAC→regex character-class expansion.
  */
object Sequence {

  final class InvalidBaseException(msg: String) extends IllegalArgumentException(msg)

  private def buildComplement(uPairs: Seq[(Char, Char)]): Array[Char] = {
    val t = new Array[Char](256) // 0 = invalid
    val iupac = Seq('R' -> 'Y', 'Y' -> 'R', 'S' -> 'S', 'W' -> 'W', 'K' -> 'M',
      'M' -> 'K', 'B' -> 'V', 'D' -> 'H', 'H' -> 'D', 'V' -> 'B', 'N' -> 'N')
    for ((a, b) <- uPairs ++ iupac) {
      t(a) = b; t(a.toLower) = b.toLower
    }
    t('-') = '-'; t('.') = '.'
    t
  }

  private val dnaComplement =
    buildComplement(Seq('A' -> 'T', 'T' -> 'A', 'G' -> 'C', 'C' -> 'G'))
  private val rnaComplement =
    buildComplement(Seq('A' -> 'U', 'U' -> 'A', 'G' -> 'C', 'C' -> 'G'))

  private def buildRegexp(bases: String): Array[String] = {
    val t = new Array[String](256) // null = invalid
    val four = bases // "ACGT" or "ACGU"
    val classes = Map(
      'R' -> "AG", 'Y' -> s"C${four(3)}", 'S' -> "CG", 'W' -> s"A${four(3)}",
      'K' -> s"G${four(3)}", 'M' -> "AC", 'B' -> s"CG${four(3)}",
      'D' -> s"AG${four(3)}", 'H' -> s"AC${four(3)}", 'V' -> "ACG",
      'N' -> four)
    for (b <- four) { t(b) = b.toString; t(b.toLower) = b.toLower.toString }
    for ((c, members) <- classes) {
      t(c) = s"[$members]"; t(c.toLower) = s"[${members.toLowerCase}]"
    }
    t('-') = "."; t('.') = "."
    t
  }

  private val dnaRegexp = buildRegexp("ACGT")
  private val rnaRegexp = buildRegexp("ACGU")

  private def revComp(seq: String, table: Array[Char], molecule: String): String = {
    val n = seq.length
    val out = new Array[Char](n)
    var i = 0
    while (i < n) {
      val base = seq.charAt(n - 1 - i)
      val comp = if (base < 256) table(base) else 0.toChar
      if (comp == 0)
        throw new InvalidBaseException(
          s"Invalid $molecule base '$base' at position ${n - i}")
      out(i) = comp
      i += 1
    }
    new String(out)
  }

  private def asRegexp(seq: String, table: Array[String], molecule: String): String = {
    val sb = new StringBuilder(seq.length * 2)
    var i = 0
    while (i < seq.length) {
      val base = seq.charAt(i)
      val re = if (base < 256) table(base) else null
      if (re == null)
        throw new InvalidBaseException(
          s"Invalid $molecule base '$base' at position ${i + 1}")
      sb.append(re)
      i += 1
    }
    sb.toString
  }

  def dnaReverseComplement(seq: String): String = revComp(seq, dnaComplement, "DNA")
  def rnaReverseComplement(seq: String): String = revComp(seq, rnaComplement, "RNA")
  def dnaAsRegexp(seq: String): String = asRegexp(seq, dnaRegexp, "DNA")
  def rnaAsRegexp(seq: String): String = asRegexp(seq, rnaRegexp, "RNA")
}
