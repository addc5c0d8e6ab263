package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** SAM-flag predicates (13 canonical names + htslib aliases).
  *
  * Reference: src/alignment_flag_functions.cpp:7-168 — plain bit tests
  * on the 16-bit SAM flag word; `is_primary` = NOT secondary (0x100)
  * AND NOT supplementary (0x800).
  *
  * Implemented as native Catalyst column expressions (bitwiseAND), NOT
  * UDFs: they stay inside whole-stage codegen and remain eligible for
  * predicate pushdown/constant folding. SQL names are registered as
  * Spark 4 SQL UDFs (`CREATE FUNCTION ... RETURN <expr>`), which the
  * analyzer inlines back into plain expressions — same performance as
  * writing the bit test by hand.
  */
object AlignmentFlags {

  private def bit(flags: Column, mask: Int): Column =
    flags.bitwiseAND(lit(mask)) =!= 0

  def alignmentIsPaired(flags: Column): Column        = bit(flags, 0x1)
  def alignmentIsProperPair(flags: Column): Column    = bit(flags, 0x2)
  def alignmentIsUnmapped(flags: Column): Column      = bit(flags, 0x4)
  def alignmentIsMateUnmapped(flags: Column): Column  = bit(flags, 0x8)
  def alignmentIsReverse(flags: Column): Column       = bit(flags, 0x10)
  def alignmentIsMateReverse(flags: Column): Column   = bit(flags, 0x20)
  def alignmentIsRead1(flags: Column): Column         = bit(flags, 0x40)
  def alignmentIsRead2(flags: Column): Column         = bit(flags, 0x80)
  def alignmentIsSecondary(flags: Column): Column     = bit(flags, 0x100)
  def alignmentIsQcFailed(flags: Column): Column      = bit(flags, 0x200)
  def alignmentIsDuplicate(flags: Column): Column     = bit(flags, 0x400)
  def alignmentIsSupplementary(flags: Column): Column = bit(flags, 0x800)
  def alignmentIsPrimary(flags: Column): Column =
    (flags.bitwiseAND(lit(0x100)) === 0) && (flags.bitwiseAND(lit(0x800)) === 0)

}
