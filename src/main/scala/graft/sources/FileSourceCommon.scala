package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import java.io.InputStream

/** Shared bits for the file-backed DataSource V2 readers.
  *
  * Mirrors the reference's table-function conventions
  * (reference: src/table_function_common.cpp:64-92): glob expansion
  * with ALPHABETICAL sort (deterministic partition→file mapping), one
  * input partition per file (the Spark scheduler is the work-stealer
  * the reference implements by hand, SURVEY §4.2).
  */
object FileSourceCommon {

  /** Expand a comma-separated list of paths/globs, sorted per-glob. */
  def expandPaths(spec: String): Seq[String] = {
    val conf = new Configuration()
    spec.split(",").map(_.trim).filter(_.nonEmpty).flatMap { one =>
      val p = new Path(one)
      val fs = p.getFileSystem(conf)
      val matches = Option(fs.globStatus(p)).getOrElse(Array.empty)
      if (matches.isEmpty) {
        if (!fs.exists(p)) throw new IllegalArgumentException(s"No files match: $one")
        Seq(one)
      } else matches.map(_.getPath.toString).sorted.toSeq
    }.toSeq
  }

  /** Resolve the path spec from DataSource V2 options: single-path
    * load() sets `path`; multi-path load(a, b, …) sets `paths` as a
    * JSON ARRAY (not a comma list). Returns a comma-joined spec for
    * expandPaths.
    */
  def pathSpec(options: Map[String, String], source: String): String =
    options.get("path") match {
      case Some(p) => p
      case None =>
        options.get("paths") match {
          case Some(j) if j.trim.startsWith("[") =>
            import org.json4s.jackson.JsonMethods
            import org.json4s.{DefaultFormats, JArray}
            implicit val formats: DefaultFormats.type = DefaultFormats
            JsonMethods.parse(j).asInstanceOf[JArray].extract[Seq[String]].mkString(",")
          case Some(p) => p
          case None =>
            throw new IllegalArgumentException(s"$source: path option required")
        }
    }

  /** Lenient variant for streaming discovery: an unmatched glob means
    * "no files yet", not an error.
    */
  def expandPathsLenient(spec: String): Seq[String] = {
    val conf = new Configuration()
    spec.split(",").map(_.trim).filter(_.nonEmpty).flatMap { one =>
      val p = new Path(one)
      val fs = p.getFileSystem(conf)
      Option(fs.globStatus(p)).getOrElse(Array.empty)
        .map(_.getPath.toString).sorted.toSeq
    }.toSeq
  }

  def openStream(path: String): InputStream = {
    val p = new Path(path)
    p.getFileSystem(new Configuration()).open(p)
  }
}
