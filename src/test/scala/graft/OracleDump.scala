package graft

/** Dev tool (test scope): dump the registry's oracle SQL texts to a JSON
  * file without running any query — feeds the local DuckDB old-vs-new
  * parity check while converting oracles to the portable SQL subset.
  * `sbt "Test/runMain graft.OracleDump /tmp/oracles.json"`.
  */
object OracleDump {
  def main(args: Array[String]): Unit = {
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = Registry.all.collect { case QueryDef(n, _, Some(o), _) =>
      s"${q(n)}: ${q(o)}"
    }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(args(0)), json)
    println(s"dumped ${Registry.all.count(_.oracle.isDefined)} oracles to ${args(0)}")
  }
}
