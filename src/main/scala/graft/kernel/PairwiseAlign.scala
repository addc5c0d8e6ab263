package graft.kernel

/** Global gap-affine pairwise alignment — no Spark dependencies.
  *
  * Semantics ported from the reference's WFA2 wrapper
  * (reference: src/WFA2Aligner.cpp:1-203, test/cpp/test_WFA2Aligner
  * .cpp): penalty minimization with match=0, mismatch>0, gap =
  * gap_open + gap_extend×len (gap_open ≥ 0, gap_extend > 0); extended
  * CIGAR (`=`/`X`/`I`/`D`, I consumes query); `-` gap characters in
  * the aligned-sequence reconstruction. WFA is an acceleration of this
  * exact objective — a Gotoh O(nm) DP returns the same optimal score
  * (SURVEY §2D: score-equivalence in scope, WFA internals not).
  */
object PairwiseAlign {

  final case class Full(score: Int, cigar: String, queryAligned: String, subjectAligned: String)

  final class Aligner(mismatch: Int = 4, gapOpen: Int = 6, gapExtend: Int = 2)
      extends Serializable {
    require(mismatch > 0, "mismatch must be > 0")
    require(gapOpen >= 0, "gap_open must be >= 0")
    require(gapExtend > 0, "gap_extend must be > 0")

    private val Inf = Int.MaxValue / 4

    /** Optimal penalty (0 = perfect). */
    def alignScore(query: String, subject: String): Int = alignFull(query, subject).score

    def alignCigar(query: String, subject: String): (Int, String) = {
      val f = alignFull(query, subject)
      (f.score, f.cigar)
    }

    /** Full DP with traceback. M/I/D layers (Gotoh). */
    def alignFull(query: String, subject: String): Full = {
      val n = query.length
      val m = subject.length
      if (n == 0 && m == 0) return Full(0, "", "", "")

      // dp layers: mLayer = last op diagonal, iLayer = gap in subject
      // (query-consuming, 'I'), dLayer = gap in query ('D')
      val mL = Array.fill(n + 1, m + 1)(Inf)
      val iL = Array.fill(n + 1, m + 1)(Inf)
      val dL = Array.fill(n + 1, m + 1)(Inf)
      mL(0)(0) = 0
      for (i <- 1 to n) iL(i)(0) = gapOpen + gapExtend * i
      for (j <- 1 to m) dL(0)(j) = gapOpen + gapExtend * j

      var i = 1
      while (i <= n) {
        var j = 1
        while (j <= m) {
          val sub = if (query.charAt(i - 1) == subject.charAt(j - 1)) 0 else mismatch
          val bestterm = math.min(mL(i - 1)(j - 1), math.min(iL(i - 1)(j - 1), dL(i - 1)(j - 1)))
          mL(i)(j) = if (bestterm >= Inf) Inf else bestterm + sub
          val fromM = if (mL(i - 1)(j) >= Inf) Inf else mL(i - 1)(j) + gapOpen + gapExtend
          val fromD = if (dL(i - 1)(j) >= Inf) Inf else dL(i - 1)(j) + gapOpen + gapExtend
          val contI = if (iL(i - 1)(j) >= Inf) Inf else iL(i - 1)(j) + gapExtend
          iL(i)(j) = math.min(math.min(fromM, contI), fromD)
          val fromM2 = if (mL(i)(j - 1) >= Inf) Inf else mL(i)(j - 1) + gapOpen + gapExtend
          val fromI2 = if (iL(i)(j - 1) >= Inf) Inf else iL(i)(j - 1) + gapOpen + gapExtend
          val contD = if (dL(i)(j - 1) >= Inf) Inf else dL(i)(j - 1) + gapExtend
          dL(i)(j) = math.min(math.min(fromM2, contD), fromI2)
          j += 1
        }
        i += 1
      }

      // traceback from the best terminal layer. Gap layers take priority
      // on ties so trailing subject/query overhang serializes as one
      // contiguous terminal D/I run (e.g. "69=27D", never "68=27D1=") —
      // callers strip terminal deletions when aligning into a window.
      val score = math.min(mL(n)(m), math.min(iL(n)(m), dL(n)(m)))
      val ops = new StringBuilder // reversed op chars
      var ci = n
      var cj = m
      var layer: Char =
        if (dL(n)(m) == score) 'D' else if (iL(n)(m) == score) 'I' else 'M'
      while (ci > 0 || cj > 0) {
        layer match {
          case 'M' =>
            val sub = if (query.charAt(ci - 1) == subject.charAt(cj - 1)) 0 else mismatch
            ops.append(if (sub == 0) '=' else 'X')
            val prev = mL(ci)(cj) - sub
            layer =
              if (ci > 1 || cj > 1) {
                if (mL(ci - 1)(cj - 1) == prev) 'M'
                else if (iL(ci - 1)(cj - 1) == prev) 'I'
                else 'D'
              } else 'M'
            ci -= 1; cj -= 1
          case 'I' =>
            ops.append('I')
            val cur = iL(ci)(cj)
            layer =
              if (ci > 1 || cj > 0) {
                if (iL(ci - 1)(cj) + gapExtend == cur) 'I'
                else if (mL(ci - 1)(cj) + gapOpen + gapExtend == cur) 'M'
                else 'D'
              } else 'M'
            ci -= 1
          case 'D' =>
            ops.append('D')
            val cur = dL(ci)(cj)
            layer =
              if (cj > 1 || ci > 0) {
                if (dL(ci)(cj - 1) + gapExtend == cur) 'D'
                else if (mL(ci)(cj - 1) + gapOpen + gapExtend == cur) 'M'
                else 'I'
              } else 'M'
            cj -= 1
        }
      }
      val opStr = ops.reverseInPlace().toString

      // run-length encode to extended CIGAR + reconstruct aligned strings
      val cigar = new StringBuilder
      val qa = new StringBuilder
      val sa = new StringBuilder
      var qi = 0
      var sj = 0
      var k = 0
      while (k < opStr.length) {
        val op = opStr.charAt(k)
        var run = 0
        while (k < opStr.length && opStr.charAt(k) == op) { run += 1; k += 1 }
        cigar.append(run).append(op)
        op match {
          case '=' | 'X' =>
            qa.append(query.substring(qi, qi + run))
            sa.append(subject.substring(sj, sj + run))
            qi += run; sj += run
          case 'I' =>
            qa.append(query.substring(qi, qi + run)); sa.append("-" * run); qi += run
          case 'D' =>
            qa.append("-" * run); sa.append(subject.substring(sj, sj + run)); sj += run
        }
      }
      Full(score, cigar.toString, qa.toString, sa.toString)
    }
  }
}
