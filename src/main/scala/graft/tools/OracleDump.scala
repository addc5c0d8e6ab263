package graft.tools

import java.nio.file.{Files, Paths}

/** Dumps the bench queries' oracle SQL as JSON (name -> SQL) so the
  * DuckDB side of a local A/B bench can run the exact same statements
  * the driver's correctness gate uses. */
object OracleDump {
  def main(args: Array[String]): Unit = {
    val out = args.lift(0).getOrElse("/root/repo/tmp/bench_oracle.json")
    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case '\r' => "\\r"; case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""
    val json = graft.SparkEntry.benchQueries
      .flatMap(d => d.oracle.map(sql => s"${q(d.name)}: ${q(sql)}"))
      .mkString("{", ",", "}")
    Option(Paths.get(out).getParent).foreach(Files.createDirectories(_))
    Files.writeString(Paths.get(out), json)
    println(s"[oracledump] wrote $out")
  }
}
