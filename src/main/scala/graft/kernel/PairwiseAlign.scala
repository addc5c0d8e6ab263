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

    /** Per-thread reusable DP buffers (the Aligner instance is shared
      * across executor task threads). @transient: rebuilt lazily after
      * deserialization on executors.
      */
    private final class Scratch {
      var mL: Array[Int] = Array.emptyIntArray
      var iL: Array[Int] = Array.emptyIntArray
      var dL: Array[Int] = Array.emptyIntArray
      def ensure(size: Int): Unit = if (mL.length < size) {
        val cap = math.max(size, mL.length * 2)
        mL = new Array[Int](cap); iL = new Array[Int](cap); dL = new Array[Int](cap)
      }
    }
    @transient private lazy val scratch = new ThreadLocal[Scratch] {
      override def initialValue(): Scratch = new Scratch
    }

    /** Optimal penalty (0 = perfect). */
    def alignScore(query: String, subject: String): Int = alignFull(query, subject).score

    def alignCigar(query: String, subject: String): (Int, String) = {
      val f = alignFull(query, subject)
      (f.score, f.cigar)
    }

    /** Full DP with traceback. M/I/D layers (Gotoh).
      *
      * The three (n+1)×(m+1) layers live in FLAT thread-local buffers
      * reused across calls: the aligner runs once per extension
      * candidate per read, and per-call `Array.fill(n+1, m+1)` ×3 was
      * ~360 KB of allocation per invocation — terabyte-scale GC churn
      * over a 500k-read workload. Only the row-0/col-0 borders need
      * re-initialization (every interior cell is written before read),
      * so reuse costs O(n+m), not O(nm). Arithmetic is unchanged —
      * scores, CIGARs and tracebacks are bit-identical.
      */
    def alignFull(query: String, subject: String): Full = {
      val n = query.length
      val m = subject.length
      if (n == 0 && m == 0) return Full(0, "", "", "")

      val stride = m + 1
      val sc = scratch.get()
      sc.ensure((n + 1) * stride)
      val mL = sc.mL
      val iL = sc.iL
      val dL = sc.dL
      // borders (interior cells are fully overwritten before any read)
      mL(0) = 0; iL(0) = Inf; dL(0) = Inf
      var b = 1
      while (b <= m) {
        mL(b) = Inf; iL(b) = Inf; dL(b) = gapOpen + gapExtend * b
        b += 1
      }
      b = 1
      while (b <= n) {
        val r = b * stride
        mL(r) = Inf; iL(r) = gapOpen + gapExtend * b; dL(r) = Inf
        b += 1
      }

      var i = 1
      while (i <= n) {
        val row = i * stride
        val prow = row - stride
        val qc = query.charAt(i - 1)
        var j = 1
        while (j <= m) {
          val sub = if (qc == subject.charAt(j - 1)) 0 else mismatch
          val bestterm = math.min(mL(prow + j - 1), math.min(iL(prow + j - 1), dL(prow + j - 1)))
          mL(row + j) = if (bestterm >= Inf) Inf else bestterm + sub
          val fromM = if (mL(prow + j) >= Inf) Inf else mL(prow + j) + gapOpen + gapExtend
          val fromD = if (dL(prow + j) >= Inf) Inf else dL(prow + j) + gapOpen + gapExtend
          val contI = if (iL(prow + j) >= Inf) Inf else iL(prow + j) + gapExtend
          iL(row + j) = math.min(math.min(fromM, contI), fromD)
          val fromM2 = if (mL(row + j - 1) >= Inf) Inf else mL(row + j - 1) + gapOpen + gapExtend
          val fromI2 = if (iL(row + j - 1) >= Inf) Inf else iL(row + j - 1) + gapOpen + gapExtend
          val contD = if (dL(row + j - 1) >= Inf) Inf else dL(row + j - 1) + gapExtend
          dL(row + j) = math.min(math.min(fromM2, contD), fromI2)
          j += 1
        }
        i += 1
      }

      // traceback from the best terminal layer. Gap layers take priority
      // on ties so trailing subject/query overhang serializes as one
      // contiguous terminal D/I run (e.g. "69=27D", never "68=27D1=") —
      // callers strip terminal deletions when aligning into a window.
      val last = n * stride + m
      val score = math.min(mL(last), math.min(iL(last), dL(last)))
      val ops = new StringBuilder // reversed op chars
      var ci = n
      var cj = m
      var layer: Char =
        if (dL(last) == score) 'D' else if (iL(last) == score) 'I' else 'M'
      while (ci > 0 || cj > 0) {
        val cell = ci * stride + cj
        layer match {
          case 'M' =>
            val sub = if (query.charAt(ci - 1) == subject.charAt(cj - 1)) 0 else mismatch
            ops.append(if (sub == 0) '=' else 'X')
            val prev = mL(cell) - sub
            layer =
              if (ci > 1 || cj > 1) {
                if (mL(cell - stride - 1) == prev) 'M'
                else if (iL(cell - stride - 1) == prev) 'I'
                else 'D'
              } else 'M'
            ci -= 1; cj -= 1
          case 'I' =>
            ops.append('I')
            val cur = iL(cell)
            layer =
              if (ci > 1 || cj > 0) {
                if (iL(cell - stride) + gapExtend == cur) 'I'
                else if (mL(cell - stride) + gapOpen + gapExtend == cur) 'M'
                else 'D'
              } else 'M'
            ci -= 1
          case 'D' =>
            ops.append('D')
            val cur = dL(cell)
            layer =
              if (cj > 1 || ci > 0) {
                if (dL(cell - 1) + gapExtend == cur) 'D'
                else if (mL(cell - 1) + gapOpen + gapExtend == cur) 'M'
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
