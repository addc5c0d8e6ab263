package graft.tools

import graft.kernel.Rype
import graft.queries.LayerB

/** Regenerates the pinned oracle rows for b20_rype_extract /
  * b21_rype_classify / b32 (`sbt "runMain graft.tools.RypePin"`).
  *
  * These oracles pin expected rows as VALUES literals instead of
  * re-deriving them in SQL. This tool recomputes the expectations from
  * the KERNEL directly — b21's classification (set scores, threshold)
  * is re-derived here from plain Scala collections, independently of
  * the distributed inverted-index join the engine uses. Inputs are the
  * deterministic synthetic genomes, so the rows are stable. Since
  * round 6 the kernel's hash FORMAT itself is anchored to the
  * reference's committed test.ryxdi index (RypeGoldenSpec), so these
  * pins are regression pins on top of an externally-validated format,
  * no longer the sole authority.
  */
object RypePin {
  def main(args: Array[String]): Unit = {
    // b20: 3 genomes of 400 bp, k=16 w=5
    val b20 = LayerB.syntheticGenomes(3, 400).zipWithIndex.map { case (g, i) =>
      val (f, r) = Rype.extractMinimizerSet(g, 16, 5, Rype.DefaultSalt)
      s"('seq$i', ${f.length}, ${r.length})"
    }
    println("b20 VALUES: " + b20.mkString(", "))

    // b21: 3 genomes of 800 bp as buckets; 3 reads of 150 bp per
    // genome at offsets 0/120/240; threshold 0.5 on max(fwd, rc) score
    val genomes = LayerB.syntheticGenomes(3, 800)
    val buckets = genomes.zipWithIndex.map { case (g, i) =>
      val (f, r) = Rype.extractMinimizerSet(g, 16, 5, Rype.DefaultSalt)
      (s"bucket$i", (f ++ r).toSet)
    }
    val rows = for {
      (g, i) <- genomes.zipWithIndex
      j <- 0 until 3
      read = g.substring(j * 120, j * 120 + 150)
      (fwd, rc) = Rype.extractMinimizerSet(read, 16, 5, Rype.DefaultSalt)
      (bname, bset) <- buckets
      if math.max(Rype.score(fwd, bset), Rype.score(rc, bset)) >= 0.5
    } yield s"('b${i}_r$j', '$bname')"
    println("b21 VALUES: " + rows.mkString(", "))

    // b32: strand minimizers (position-preserving variant) — 2 genomes
    // of 150 bp, k=16 w=5; pin counts, position arrays (JSON), and the
    // first/last hash per strand. len(hashes)==len(positions) by
    // construction in the kernel (rype_extract.cpp invariant).
    val b32 = LayerB.syntheticGenomes(2, 150).zipWithIndex.map { case (g, i) =>
      val (fh, fp) = Rype.strandMinimizers(g, 16, 5, Rype.DefaultSalt)
      val (rh, rp) = Rype.strandMinimizers(
        Rype.reverseComplementLenient(g), 16, 5, Rype.DefaultSalt)
      def js(a: Array[Long]) = "[" + a.mkString(",") + "]"
      s"('seq$i', ${fh.length}, '${js(fp)}', ${fh.head}, ${fh.last}, " +
        s"${rh.length}, '${js(rp)}', ${rh.head}, ${rh.last})"
    }
    println("b32 VALUES: " + b32.mkString(", "))
  }
}
