package graft.kernel

import scala.collection.mutable.ArrayBuffer

/** RYpe minimizer kernel — no Spark dependencies.
  *
  * Reimplements RYpe semantics (reference: README.md:1823-1960,
  * src/rype_extract.cpp:68-82, RYPE.md; the upstream Rust core is an
  * empty submodule, SURVEY §2C). The exact hash FORMAT was reverse-
  * validated round 6 against the reference's committed index
  * (data/rype/test.ryxdi — manifest k=16 w=8 salt=0x5555555555555555):
  * RY-space 1-bit encoding with purine A/G → 1, pyrimidine C/T/U → 0,
  * k-mers of k ∈ {16,32,64} bits MSB-first in a u64, and minimizer
  * value = kmer XOR salt — NO avalanche mix, the same value is both
  * the window-selection key (unsigned min over w, consecutive dupes
  * emitted once) and the stored/persisted minimizer. Rebuilding that
  * index from its FASTA reproduces all 32 committed (minimizer,
  * bucket) rows exactly (RypeGoldenSpec). Ambiguous bases (N etc.)
  * break the k-mer run — no k-mer containing them is emitted.
  */
object Rype {

  val DefaultSalt: Long = 6148914691236517205L

  def validateK(k: Int): Unit =
    require(k == 16 || k == 32 || k == 64, s"k must be 16, 32, or 64 (got $k)")
  def validateW(w: Int): Unit = require(w > 0, "w must be > 0")

  /** RY encode: 1 = purine (A/G), 0 = pyrimidine (C/T/U), -1 = invalid
    * (bit convention pinned by the committed test.ryxdi index — the
    * inverse assignment cannot reproduce its minimizer values).
    */
  def ryBit(c: Char): Int = c match {
    case 'A' | 'a' | 'G' | 'g'                         => 1
    case 'C' | 'c' | 'T' | 't' | 'U' | 'u'             => 0
    case _                                             => -1
  }

  /** Lenient DNA complement for strand handling (unknown → N). */
  private def complement(c: Char): Char = c match {
    case 'A' => 'T'; case 'T' => 'A'; case 'G' => 'C'; case 'C' => 'G'
    case 'a' => 't'; case 't' => 'a'; case 'g' => 'c'; case 'c' => 'g'
    case 'U' => 'A'; case 'u' => 'a'
    case _   => 'N'
  }

  def reverseComplementLenient(seq: String): String = {
    val out = new Array[Char](seq.length)
    var i = 0
    while (i < seq.length) {
      out(i) = complement(seq.charAt(seq.length - 1 - i))
      i += 1
    }
    new String(out)
  }

  /** (hash, position) minimizers of one strand; positions are 0-based
    * k-mer start offsets; consecutive duplicate window selections are
    * emitted once (standard minimizer sampling).
    */
  def strandMinimizers(seq: String, k: Int, w: Int, salt: Long): (Array[Long], Array[Long]) = {
    validateK(k); validateW(w)
    // RYpe format: hash = kmer ^ salt, unmixed (see object doc — the
    // committed index pins this; a mixed hash stores different values)
    strandMinimizersGeneralK(seq, k, w, salt, mixHash = false)
  }

  /** strandMinimizers without the RYpe k ∈ {16,32,64} spec constraint —
    * the aligner's seeding layer needs minimap2 preset k values (15,
    * 19, 21…); any 1 ≤ k ≤ 64 packs in the u64. `mixHash = true`
    * (the aligner's internal seeding default) avalanche-mixes the
    * salted k-mer for even window sampling on low-entropy sequence;
    * RYpe persistence/classify paths pass false — their value IS the
    * on-disk format.
    */
  def strandMinimizersGeneralK(seq: String, k: Int, w: Int, salt: Long,
      mixHash: Boolean = true): (Array[Long], Array[Long]) = {
    require(k >= 1 && k <= 64, s"k must be in [1, 64] (got $k)"); validateW(w)
    minimizersCore(seq, k, w, salt, bitsPerBase = 1, code = ryBit, mixHash)
  }

  /** 2-bit nucleotide code (A=0 C=1 G=2 T/U=3, -1 invalid) — the
    * alphabet minimap2 seeds in. RY-space seeding would make an
    * A↔G/C↔T-substituted decoy indistinguishable from the true locus
    * at the seed level (found round 6 by Minimap2GoldenSpec: query2's
    * RY pattern equals ref1's shifted by one base).
    */
  def nucCode(c: Char): Int = c match {
    case 'A' | 'a' => 0
    case 'C' | 'c' => 1
    case 'G' | 'g' => 2
    case 'T' | 't' | 'U' | 'u' => 3
    case _ => -1
  }

  /** Nucleotide-space (hash, position) minimizers for aligner seeding;
    * k ≤ 32 (2 bits/base). Always avalanche-mixed — these hashes are
    * transient seeds, not a persisted format.
    */
  def nucStrandMinimizers(seq: String, k: Int, w: Int, salt: Long): (Array[Long], Array[Long]) = {
    require(k >= 1 && k <= 32, s"nucleotide k must be in [1, 32] (got $k)"); validateW(w)
    minimizersCore(seq, k, w, salt, bitsPerBase = 2, code = nucCode, mixHash = true)
  }

  private def minimizersCore(seq: String, k: Int, w: Int, salt: Long,
      bitsPerBase: Int, code: Char => Int, mixHash: Boolean): (Array[Long], Array[Long]) = {
    if (seq == null || seq.length < k) return (Array.empty, Array.empty)
    val n = seq.length
    val kBits = bitsPerBase * k
    val mask = if (kBits == 64) -1L else (1L << kBits) - 1
    // rolling k-mer hashes per start position
    val kmerHash = new Array[Long](n - k + 1)
    val kmerValid = new Array[Boolean](n - k + 1)
    var kmer = 0L
    var validRun = 0 // consecutive valid bases ending at i
    var i = 0
    while (i < n) {
      val b = code(seq.charAt(i))
      if (b < 0) { validRun = 0; kmer = 0L }
      else {
        kmer = ((kmer << bitsPerBase) | b) & mask
        validRun += 1
      }
      val start = i - k + 1
      if (start >= 0) {
        if (validRun >= k) {
          kmerHash(start) = if (mixHash) TextKernel.mix64(kmer ^ salt) else kmer ^ salt
          kmerValid(start) = true
        }
      }
      i += 1
    }
    val hashes = new ArrayBuffer[Long]()
    val positions = new ArrayBuffer[Long]()
    val numKmers = n - k + 1
    var lastEmitted = -1
    var win = 0
    while (win + w <= numKmers || (win == 0 && numKmers > 0 && numKmers < w)) {
      val end = math.min(win + w, numKmers)
      var minIdx = -1
      var j = win
      while (j < end) {
        if (kmerValid(j) && (minIdx < 0 ||
          java.lang.Long.compareUnsigned(kmerHash(j), kmerHash(minIdx)) < 0)) minIdx = j
        j += 1
      }
      if (minIdx >= 0 && minIdx != lastEmitted) {
        hashes += kmerHash(minIdx)
        positions += minIdx.toLong
        lastEmitted = minIdx
      }
      if (numKmers < w) win = numKmers // single short window
      else win += 1
    }
    (hashes.toArray, positions.toArray)
  }

  /** Unsigned-sorted distinct minimizer set of one strand. */
  def minimizerSet(seq: String, k: Int, w: Int, salt: Long): Array[Long] = {
    val (hashes, _) = strandMinimizers(seq, k, w, salt)
    val distinct = hashes.distinct
    java.util.Arrays.sort(distinct)
    // java sort is signed; rotate to unsigned order
    unsignedSort(distinct)
  }

  private def unsignedSort(a: Array[Long]): Array[Long] = {
    val boxed = a.map(Long.box)
    java.util.Arrays.sort(boxed, (x: java.lang.Long, y: java.lang.Long) =>
      java.lang.Long.compareUnsigned(x, y))
    boxed.map(_.longValue())
  }

  /** Both strands, deduped+sorted (rype_extract_minimizer_set shape). */
  def extractMinimizerSet(seq: String, k: Int, w: Int, salt: Long): (Array[Long], Array[Long]) =
    (minimizerSet(seq, k, w, salt),
      minimizerSet(reverseComplementLenient(seq), k, w, salt))

  /** Classification score of a query set against a bucket set:
    * |query ∩ bucket| / |query| (0 when the query set is empty).
    */
  def score(querySet: Array[Long], bucketSet: Set[Long]): Double =
    if (querySet.isEmpty) 0.0
    else querySet.count(bucketSet.contains).toDouble / querySet.length
}
