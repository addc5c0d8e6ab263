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

  /** Canonical partition/display path for stdin input. `-` is
    * canonicalized to this, so `filepath` columns report `/dev/stdin`
    * for either spelling (reference: test/shell/read_fastx_stdin.sh
    * tests 6-7). */
  val StdinPath = "/dev/stdin"

  /** Reference accepts `-` and `/dev/stdin` as stdin designators
    * (reference: src/table_function_common.cpp stdin handling,
    * test/shell/read_*_stdin.sh). */
  def isStdinToken(s: String): Boolean = {
    val t = s.trim
    t == "-" || t == "/dev/stdin" || t == "file:///dev/stdin"
  }

  /** Where the one-shot stdin snapshot lives. Deterministic from the
    * application id so EXECUTORS can recompute it without any shipped
    * state: resolved against the default Hadoop FS (local disk in
    * local mode; the shared FS on a real cluster, where the driver's
    * stdin would otherwise be unreachable from other machines). */
  private def stdinSnapshotPath(conf: Configuration): Path = {
    val appId = Option(org.apache.spark.SparkEnv.get)
      .map(_.conf.getAppId).getOrElse("standalone")
    new Path(conf.get("hadoop.tmp.dir", "/tmp"), s"graft-stdin-$appId")
  }

  /** Snapshot stdin to the default FS, once per application. stdin is
    * a one-shot stream: the first planning consumes it; re-planning
    * (each Spark action re-plans the scan) and task retries re-read
    * the snapshot, which is what makes stdin usable under Spark's
    * execution model at all. */
  private def snapshotStdin(): Unit = synchronized {
    val conf = new Configuration()
    val p = stdinSnapshotPath(conf)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) {
      val out = fs.create(p, true)
      try System.in.transferTo(out) finally out.close()
      fs.deleteOnExit(p)
    }
  }

  /** Test hook: forget a consumed stdin snapshot so the next read
    * snapshots a fresh (test-injected) System.in. */
  def resetStdinSnapshot(): Unit = synchronized {
    val conf = new Configuration()
    val p = stdinSnapshotPath(conf)
    val fs = p.getFileSystem(conf)
    if (fs.exists(p)) fs.delete(p, false)
  }

  /** Expand a comma-separated list of paths/globs, sorted per-glob.
    * `allowStdin`: sources the reference reads from stdin (fastx,
    * alignments, newick) pass true; a stdin token is then snapshotted
    * and canonicalized to [[StdinPath]]. Mixing stdin with other
    * inputs is an error either way (reference rejects it: "stdin").
    */
  def expandPaths(spec: String, allowStdin: Boolean = false): Seq[String] = {
    val conf = new Configuration()
    val specs = spec.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    if (specs.exists(isStdinToken)) {
      if (specs.length > 1)
        throw new IllegalArgumentException(
          "stdin cannot be combined with other inputs")
      if (!allowStdin)
        throw new IllegalArgumentException(
          s"stdin is not supported by this source: $spec")
      snapshotStdin()
      return Seq(StdinPath)
    }
    specs.flatMap { one =>
      val p = new Path(one)
      val fs = p.getFileSystem(conf)
      val matches = Option(fs.globStatus(p)).getOrElse(Array.empty)
      if (matches.isEmpty) {
        if (!fs.exists(p)) throw new IllegalArgumentException(s"No files match: $one")
        Seq(one)
      } else matches.map(_.getPath.toString).sorted.toSeq
    }
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
    * "no files yet", not an error. stdin is a one-shot stream — it can
    * never feed a file-arrival micro-batch source.
    */
  def expandPathsLenient(spec: String): Seq[String] = {
    val conf = new Configuration()
    spec.split(",").map(_.trim).filter(_.nonEmpty).flatMap { one =>
      if (isStdinToken(one))
        throw new IllegalArgumentException("stdin cannot be used with streaming")
      val p = new Path(one)
      val fs = p.getFileSystem(conf)
      Option(fs.globStatus(p)).getOrElse(Array.empty)
        .map(_.getPath.toString).sorted.toSeq
    }.toSeq
  }

  def openStream(path: String): InputStream = {
    val conf = new Configuration()
    val p = if (isStdinToken(path)) stdinSnapshotPath(conf) else new Path(path)
    p.getFileSystem(conf).open(p)
  }
}
