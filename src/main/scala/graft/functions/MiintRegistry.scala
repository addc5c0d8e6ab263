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

  /** Resolve a bowtie2-family binary: the `graft.bowtie2.dir` system
    * property (tests, custom installs) takes precedence over a PATH
    * probe. Returns the absolute path so callers never depend on the
    * child process inheriting a particular PATH.
    */
  def bowtie2Binary(name: String): Option[String] =
    sys.props.get("graft.bowtie2.dir") match {
      case Some(dir) =>
        // explicit override is authoritative: a missing/non-executable
        // candidate is a misconfiguration, not a cue to silently run
        // whatever different version happens to sit on PATH
        Some(new java.io.File(dir, name)).filter(_.canExecute)
          .map(_.getAbsolutePath)
      case None =>
        sys.env.getOrElse("PATH", "")
          .split(java.io.File.pathSeparator).iterator
          .map(dir => new java.io.File(dir, name)).find(_.canExecute)
          .map(_.getAbsolutePath)
    }

  /** bowtie2_available() — binary probe; reference: src/align_bowtie2
    * .cpp:257-259.
    */
  def bowtie2Available(): Boolean = bowtie2Binary("bowtie2").isDefined

  /** One shared definition of the whole surface (GraftFunctionBuilders)
    * — identical to what spark.sql.extensions=graft.GraftExtensions
    * injects cluster-wide.
    */
  def registerAll(spark: SparkSession): Unit =
    GraftFunctionBuilders.registerAll(spark.sessionState.functionRegistry)
}
