package graft.kernel

import scala.collection.mutable

/** Minimizer seed-and-extend aligner — no Spark dependencies.
  *
  * Semantic (not score-exact) reimplementation of the reference's
  * in-process minimap2 usage (reference: src/align_minimap2.cpp,
  * src/Minimap2Aligner.cpp, src/include/align_common.hpp): index the
  * subjects' position-preserving minimizers, seed query minimizers
  * against the index, vote on (subject, strand, diagonal), then run a
  * global gap-affine alignment of the query against the implied
  * subject window. Output follows SAM conventions: 1-based positions,
  * flag 0x10 for reverse strand, 0x4 unmapped, 0x100 secondary,
  * CIGAR with soft clips for out-of-window overhang, NM/AS tags.
  * Exact minimap2 score parity is out of scope (SURVEY §2C) — schema
  * and flag/CIGAR conventions are in scope.
  */
object SeedAligner {

  final case class Subject(name: String, sequence: String)

  /** One alignment with the full tag payload the 21-col schema needs
    * (reference: src/Minimap2Aligner.cpp:410-449 — AS=score, XS=second
    * best or -1, XM=mismatches, XO=gap opens, XG=gap extensions
    * (len-1 per run), NM=edit distance, MD per SAM spec).
    */
  final case class Hit(
      subjectName: String,
      position: Long, // 1-based
      flags: Int,
      cigar: String,
      nm: Long,
      score: Long,
      mapq: Short,
      mismatches: Long = 0L,
      gapOpens: Long = 0L,
      gapExtends: Long = 0L,
      md: String = "",
      xs: Long = -1L)

  /** Inverted minimizer index over subjects (driver-built, broadcast-
    * sized — the reference materializes subjects in RAM the same way).
    */
  final class Index(val subjects: Vector[Subject], val k: Int, val w: Int,
      val salt: Long) extends Serializable {
    // minimizer hash -> Seq[(subject idx, kmer start)]
    val postings: Map[Long, Vector[(Int, Int)]] = {
      val m = new mutable.HashMap[Long, mutable.ArrayBuffer[(Int, Int)]]()
      for ((s, si) <- subjects.zipWithIndex) {
        // nucleotide-space seeds (like minimap2's 2-bit alphabet) —
        // RY-space seeding collapses A↔G/C↔T and let decoy loci out-
        // vote the true one (Minimap2GoldenSpec, round 6)
        val (hs, ps) = Rype.nucStrandMinimizers(s.sequence, k, w, salt)
        for (i <- hs.indices)
          m.getOrElseUpdate(hs(i), new mutable.ArrayBuffer) += ((si, ps(i).toInt))
      }
      m.view.mapValues(_.toVector).toMap
    }
  }

  def buildIndex(subjects: Seq[(String, String)], k: Int = 16, w: Int = 5,
      salt: Long = Rype.DefaultSalt): Index =
    new Index(subjects.map { case (n, s) => Subject(n, s) }.toVector, k, w, salt)

  private val pairAligner = new PairwiseAlign.Aligner() // defaults 4/6/2

  /** Align one query; returns hits best-first (primary first, then
    * secondaries up to maxSecondary). Empty when no seeds.
    */
  def align(index: Index, query: String, maxSecondary: Int = 5): Seq[Hit] = {
    if (query == null || query.length < index.k) return Seq.empty
    val candidates = new mutable.HashMap[(Int, Boolean, Int), Int]() // (subj, rc, diag) -> votes
    def seed(seq: String, rc: Boolean): Unit = {
      val (hs, ps) = Rype.nucStrandMinimizers(seq, index.k, index.w, index.salt)
      for (i <- hs.indices; (si, spos) <- index.postings.getOrElse(hs(i), Vector.empty)) {
        val diag = spos - ps(i).toInt
        val key = (si, rc, diag & ~15) // bucket diagonals by 16 to absorb indels
        candidates(key) = candidates.getOrElse(key, 0) + 1
      }
    }
    seed(query, rc = false)
    seed(Rype.reverseComplementLenient(query), rc = true)
    if (candidates.isEmpty) return Seq.empty

    // A mappable locus needs a chain of seeds, not one lucky k-mer:
    // minimap2's min_cnt (2 under the short-read preset) drops single-
    // seed chains, which is also what makes unmappably short reads
    // produce NO output (reference pin: 12 bp reads at k=5 align to
    // nothing, test/sql/align_minimap2.test:169-174).
    val chainable = candidates.toSeq.filter(_._2 >= MinChainVotes)
    if (chainable.isEmpty) return Seq.empty

    // Extend the top candidates by votes, then let ALIGNMENT SCORE
    // pick the winners. maxSecondary limits the OUTPUT, not the
    // extension set (pruning before extension let a vote-tied decoy
    // shadow the true locus when maxSecondary=0 — Minimap2GoldenSpec).
    val ranked = chainable.sortBy { case ((si, _, diag), votes) => (-votes, si, diag) }
      .take(math.max(1 + maxSecondary, ExtensionBreadth))
    val hits = ranked.flatMap { case ((si, rc, diagBucket), _) =>
      val subject = index.subjects(si)
      val q = if (rc) Rype.reverseComplementLenient(query) else query
      // subject window implied by the diagonal, padded for indels
      val pad = 16 + q.length / 8
      val start0 = math.max(0, diagBucket - pad)
      val end0 = math.min(subject.sequence.length, diagBucket + q.length + pad)
      if (end0 <= start0) None
      else {
        val window = subject.sequence.substring(start0, end0)
        val f = pairAligner.alignFull(q, window)
        // convert leading/trailing D runs into position offset / trim
        val nc = normalizeCigar(f.cigar)
        if (nc.matched == 0 || nc.matched - nc.penalty < MinAlignScore) None
        else Some(Hit(subject.name, (start0 + nc.offset + 1).toLong,
          if (rc) 0x10 else 0, nc.cigarString, nc.nm, nc.matched - nc.penalty, 0,
          nc.mismatches, nc.gapOpens, nc.gapExtends,
          mdTag(nc.runs, window, nc.offset)))
      }
    }
    val sorted = hits.sortBy(h => (-h.score, h.subjectName, h.position)).distinct
    sorted.zipWithIndex.map { case (h, i) =>
      val mapq: Short =
        if (sorted.length == 1) 60
        else if (i == 0) math.min(60, 10 + (sorted(0).score - sorted(1).score)).toShort
        else 0
      h.copy(
        flags = h.flags | (if (i > 0) 0x100 else 0),
        mapq = mapq,
        // reference: XS = subsc when > 0, else -1 (Minimap2Aligner.cpp:414)
        xs = if (i + 1 < sorted.length && sorted(i + 1).score > 0)
          sorted(i + 1).score else -1L)
    }.take(1 + maxSecondary)
  }

  /** minimap2 sr-preset min_cnt analogue: minimum seed votes for a
    * candidate (subject, strand, diagonal) to be extended at all. */
  private val MinChainVotes = 2

  /** minimap2 -m (min chain score, default 40) analogue, applied to
    * the extension score: unmappably short or garbage alignments emit
    * no rows (reference pin: 12 bp reads at k=5 → empty,
    * test/sql/align_minimap2.test:169-174; repeat-heavy 12-mers would
    * otherwise chain on repeat postings alone). */
  private val MinAlignScore = 40

  /** How many top-voted candidates get a full extension even when the
    * caller only wants the primary — score, not votes, must choose. */
  private val ExtensionBreadth = 8

  /** Normalized CIGAR with the derived alignment statistics the tag
    * columns need (reference stat rules: src/Minimap2Aligner.cpp:32-70
    * — mismatches counts X bases, gap_opens counts I/D runs,
    * gap_extends counts (len-1) per run, edit distance counts X+I+D
    * bases).
    */
  private[kernel] final case class NormCigar(
      runs: Vector[(Int, Char)], offset: Int, nm: Long, matched: Long,
      penalty: Long, mismatches: Long, gapOpens: Long, gapExtends: Long) {
    def cigarString: String = runs.map { case (len, op) => s"$len$op" }.mkString
  }

  /** Strip leading/trailing deletions (they are subject-only overhang,
    * not part of the alignment span); derive edit stats and the
    * remaining gap-affine penalty at default 4/6/2 weights.
    */
  private[kernel] def normalizeCigar(cigar: String): NormCigar = {
    // parse runs
    val runs = new mutable.ArrayBuffer[(Int, Char)]()
    var n = 0
    for (c <- cigar) {
      if (c.isDigit) n = n * 10 + (c - '0')
      else { runs += ((n, c)); n = 0 }
    }
    var offset = 0
    if (runs.nonEmpty && runs.head._2 == 'D') { offset = runs.head._1; runs.remove(0) }
    if (runs.nonEmpty && runs.last._2 == 'D') runs.remove(runs.length - 1)
    var nm = 0L
    var matched = 0L
    var penalty = 0L
    var mismatches = 0L
    var gapOpens = 0L
    var gapExtends = 0L
    for ((len, op) <- runs) op match {
      case 'X' =>
        nm += len; matched += len; penalty += 4L * len; mismatches += len
      case 'I' | 'D' =>
        nm += len; penalty += 6L + 2L * len
        gapOpens += 1; gapExtends += math.max(len - 1, 0)
      case '=' => matched += len
      case _   =>
    }
    NormCigar(runs.toVector, offset, nm, matched, penalty, mismatches,
      gapOpens, gapExtends)
  }

  /** SAM MD tag over the normalized runs: match-run lengths
    * interleaved with the REFERENCE base at each mismatch ('0' between
    * adjacent mismatches), '^'+bases for deletions; insertions consume
    * no reference and don't appear. `offset` is the 0-based start of
    * the alignment inside `window`.
    */
  private[kernel] def mdTag(runs: Seq[(Int, Char)], window: String, offset: Int): String = {
    val sb = new StringBuilder
    var matchRun = 0
    var refPos = offset
    for ((len, op) <- runs) op match {
      case '=' => matchRun += len; refPos += len
      case 'X' =>
        var i = 0
        while (i < len) {
          sb.append(matchRun).append(window.charAt(refPos))
          matchRun = 0; refPos += 1; i += 1
        }
      case 'D' =>
        sb.append(matchRun).append('^')
          .append(window, refPos, refPos + len)
        matchRun = 0; refPos += len
      case _ => // 'I' and clips consume no reference
    }
    sb.append(matchRun)
    sb.toString
  }
}
