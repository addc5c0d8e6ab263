package graft.functions

import graft.kernel.Cigar.InvalidCigarException
import org.apache.spark.unsafe.types.UTF8String

/** Codegen-callable CIGAR/MD kernels over UTF8String bytes.
  *
  * These are the hot-path twins of graft.kernel.Cigar (same semantics,
  * property-tested against it): parsing straight off Spark's internal
  * UTF8String avoids the per-row String materialization and the
  * catalyst↔Scala conversion a UDF pays, and lets the native
  * expressions in CigarExpressions stay inside WholeStageCodegen.
  * CIGAR/MD are pure ASCII so byte-wise parsing is exact.
  *
  * Reference semantics: src/alignment_functions.cpp:11-337,
  * src/include/alignment_functions_internal.hpp:19-216.
  */
object CigarCodegen {

  // packed stats indices for the single-pass parser
  private final val MATCHES = 0; private final val MATCH_OPS = 1
  private final val MISMATCH_OPS = 2; private final val INSERTIONS = 3
  private final val DELETIONS = 4; private final val GAP_OPENS = 5
  private final val ALIGN_COLS = 6; private final val SOFT = 7
  private final val HARD = 8

  private def isStar(u: UTF8String): Boolean =
    u.numBytes == 1 && u.getByte(0) == '*'

  /** Single-pass byte parse; mirrors kernel.Cigar.parseCigar. */
  private def parse(u: UTF8String): Array[Long] = {
    val st = new Array[Long](9)
    if (u.numBytes == 0 || isStar(u)) return st
    var opLen = 0L
    var prevOp: Byte = 0
    var i = 0
    val n = u.numBytes
    while (i < n) {
      val c = u.getByte(i)
      if (c >= '0' && c <= '9') {
        if (opLen > (Long.MaxValue - 9) / 10)
          throw new InvalidCigarException("CIGAR operation length exceeds maximum")
        opLen = opLen * 10 + (c - '0')
      } else {
        if (opLen == 0)
          throw new InvalidCigarException("Invalid CIGAR string: operation without length")
        (c: @annotation.switch) match {
          case 'M' => st(MATCHES) += opLen; st(ALIGN_COLS) += opLen
          case '=' => st(MATCHES) += opLen; st(MATCH_OPS) += opLen; st(ALIGN_COLS) += opLen
          case 'X' => st(MATCHES) += opLen; st(MISMATCH_OPS) += opLen; st(ALIGN_COLS) += opLen
          case 'I' =>
            st(INSERTIONS) += opLen; st(ALIGN_COLS) += opLen
            if (prevOp != 'I') st(GAP_OPENS) += 1
          case 'D' =>
            st(DELETIONS) += opLen; st(ALIGN_COLS) += opLen
            if (prevOp != 'D') st(GAP_OPENS) += 1
          case 'N' | 'P' => // spliced skip / padding: ignored
          case 'S' => st(SOFT) += opLen
          case 'H' => st(HARD) += opLen
          case other =>
            throw new InvalidCigarException(s"Invalid CIGAR operation: ${other.toChar}")
        }
        prevOp = c
        opLen = 0
      }
      i += 1
    }
    if (opLen > 0)
      throw new InvalidCigarException(
        "Invalid CIGAR string: incomplete operation (missing operation character)")
    st
  }

  /** MD tag byte parse; returns (matches, mismatches). */
  private def parseMd(u: UTF8String): (Long, Long) = {
    var matches = 0L; var mismatches = 0L; var matchLen = 0L
    var i = 0
    val n = u.numBytes
    while (i < n) {
      val c = u.getByte(i)
      if (c >= '0' && c <= '9') {
        if (matchLen > (Long.MaxValue - 9) / 10)
          throw new InvalidCigarException("MD tag match length exceeds maximum")
        matchLen = matchLen * 10 + (c - '0')
      } else if (c == '^') {
        if (matchLen > 0) { matches += matchLen; matchLen = 0 }
        i += 1
        while (i < n && isLetter(u.getByte(i))) i += 1
        i -= 1 // loop will advance
      } else if (isLetter(c)) {
        if (matchLen > 0) { matches += matchLen; matchLen = 0 }
        mismatches += 1
      }
      i += 1
    }
    if (matchLen > 0) matches += matchLen
    (matches, mismatches)
  }

  private def isLetter(b: Byte): Boolean =
    (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')

  /** The default coverage type, exposed for NULL-argument defaulting
    * in AlignmentQueryCoverage (codegen calls the accessor).
    */
  val ALIGNED_TYPE: UTF8String = UTF8String.fromString("aligned")

  private val ALIGNED = ALIGNED_TYPE
  private val MAPPED = UTF8String.fromString("mapped")
  private val GAP_EXCLUDED = UTF8String.fromString("gap_excluded")
  private val BLAST = UTF8String.fromString("blast")
  private val GAP_COMPRESSED = UTF8String.fromString("gap_compressed")

  /** Query length: M+I+S+=+X (+H when includeHardClips). "*"/empty → 0. */
  def queryLength(cigar: UTF8String, includeHardClips: Boolean): Long = {
    if (cigar.numBytes == 0 || isStar(cigar)) return 0L
    val st = parse(cigar)
    st(MATCHES) + st(INSERTIONS) + st(SOFT) + (if (includeHardClips) st(HARD) else 0L)
  }

  /** Query coverage; qlen always includes hard clips. */
  def queryCoverage(cigar: UTF8String, covType: UTF8String): Double = {
    if (cigar.numBytes == 0 || isStar(cigar)) return 0.0
    val st = parse(cigar)
    val qlen = st(MATCHES) + st(INSERTIONS) + st(SOFT) + st(HARD)
    if (qlen == 0) return 0.0
    val covered =
      if (ALIGNED.equals(covType)) st(MATCHES)
      else if (MAPPED.equals(covType)) st(MATCHES) + st(INSERTIONS)
      else throw new InvalidCigarException(
        s"Invalid coverage type: $covType. Must be 'aligned' or 'mapped'.")
    covered.toDouble / qlen.toDouble
  }

  /** Sequence identity; null (boxed) → SQL NULL. nmNull marks an absent
    * NM tag. Semantics identical to kernel.Cigar.seqIdentity.
    */
  def seqIdentity(cigar: UTF8String, nmNull: Boolean, nm: Long,
      md: UTF8String, idType: UTF8String): java.lang.Double = {
    if (cigar.numBytes == 0 || isStar(cigar)) return null
    val st =
      try parse(cigar)
      catch { case _: InvalidCigarException => return null }
    if (GAP_EXCLUDED.equals(idType)) {
      if (md == null || md.numBytes == 0) return null
      val (mdMatch, mdMis) =
        try parseMd(md)
        catch { case _: InvalidCigarException => return null }
      val total = mdMatch + mdMis
      if (total <= 0) null
      else java.lang.Double.valueOf(mdMatch.toDouble / total.toDouble)
    } else if (BLAST.equals(idType)) {
      if (nmNull || nm < 0) return null
      if (st(ALIGN_COLS) <= 0) return null
      if (nm > st(ALIGN_COLS)) return null
      java.lang.Double.valueOf((st(ALIGN_COLS) - nm).toDouble / st(ALIGN_COLS).toDouble)
    } else if (GAP_COMPRESSED.equals(idType)) {
      if (nmNull || nm < 0) return null
      val m = st(MATCHES)
      val g = st(INSERTIONS) + st(DELETIONS)
      val o = st(GAP_OPENS)
      if (nm > m + g) return null
      val denom = m + o
      if (denom <= 0) null
      else java.lang.Double.valueOf((m - nm + g).toDouble / denom.toDouble)
    } else {
      throw new InvalidCigarException(
        "Invalid type parameter for alignment_seq_identity. " +
          s"Must be 'gap_excluded', 'blast', or 'gap_compressed' (got '$idType').")
    }
  }
}
