package graft.pipeline

/**
 * CLI helpers mirroring the reference's argument handling:
 * `strtobool` (neo4j_beam/util.py:61-74, the vendored distutils
 * semantics used for `--neo4j_use_tls`, pipeline.py:214-218) and a
 * `--flag value` / bare `--flag` parser covering the reference's
 * argparse surface (pipeline.py:185-291), including `store_true` flags
 * like `--debug`.
 */
object Cli {

  /** String → boolean with the exact truth-value sets of the vendored
    * distutils strtobool: y/yes/t/true/on/1 and n/no/f/false/off/0,
    * case-insensitive; anything else is an error. */
  def strtobool(v: String): Boolean = v.toLowerCase match {
    case "y" | "yes" | "t" | "true" | "on" | "1"  => true
    case "n" | "no" | "f" | "false" | "off" | "0" => false
    case other =>
      throw new IllegalArgumentException(s"invalid truth value '$other'")
  }

  /** Parse `--k v` pairs; a `--flag` followed by another flag (or
    * end-of-args) is a bare boolean flag and maps to "true"
    * (argparse action="store_true"). */
  def parseArgs(args: Array[String]): Map[String, String] = {
    val out = Map.newBuilder[String, String]
    var i = 0
    while (i < args.length) {
      val a = args(i)
      if (a.startsWith("--")) {
        val k = a.stripPrefix("--")
        if (i + 1 < args.length && !args(i + 1).startsWith("--")) {
          out += k -> args(i + 1); i += 2
        } else { out += k -> "true"; i += 1 }
      } else i += 1
    }
    out.result()
  }

  /** Comma-separated list flag (reference: node_tables/edge_tables,
    * pipeline.py:246-262 `str(x).split(",")` with strip). */
  def splitList(v: String): Seq[String] =
    v.split(',').toSeq.map(_.trim).filter(_.nonEmpty)
}
