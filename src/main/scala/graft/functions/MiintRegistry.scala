package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.lit

/** One-call registration of the full MIINT scalar/aggregate SQL surface
  * (reference: src/miint_extension.cpp:65-117 registration list).
  * Column APIs live on the individual objects; this makes the same
  * names usable from spark.sql.
  */
object MiintRegistry {

  val version = "0.2.0-spark"

  /** miint_version() — reference: src/miint_extension.cpp:57-63. */
  def miintVersion(): Column = lit(version)

  /** bowtie2_available() — PATH probe; reference: src/align_bowtie2
    * .cpp:257-259. Always false here (no external binary in scope).
    */
  def bowtie2Available(): Boolean =
    sys.env.getOrElse("PATH", "").split(java.io.File.pathSeparator)
      .exists(dir => new java.io.File(dir, "bowtie2").canExecute)

  /** One shared definition of the whole surface (GraftFunctionBuilders)
    * — identical to what spark.sql.extensions=graft.GraftExtensions
    * injects cluster-wide.
    */
  def registerAll(spark: SparkSession): Unit =
    GraftFunctionBuilders.registerAll(spark.sessionState.functionRegistry)
}
