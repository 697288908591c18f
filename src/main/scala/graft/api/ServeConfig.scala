package graft.api

import java.nio.file.{Files, Paths}

/** Server configuration file parity with the reference's TOML config
  * (`config.default.toml` + `cmd/fossil/config.go` + the database-block
  * resolution in `cmd/fossil/server/server.go:43-70`):
  *
  * {{{
  * [fossil]
  * port = 8001
  * prom-port = 2112
  * host = "fossil://localhost:8001/default"
  * local = true
  * verbose = 2
  *
  * [database]
  * directory = "./data"
  *
  * [database.test]
  * [database.tester]
  * }}}
  *
  * Resolution rules (mirroring the reference exactly):
  *   - database names = the `[database.<name>]` sub-blocks; "default" is
  *     added when plain keys (e.g. `directory`) sit directly under
  *     `[database]` or when no blocks exist at all;
  *   - the default database's directory is `database.directory`
  *     (falling back to `./data`); a named block without its own
  *     `directory` inherits the default's;
  *   - each database's store root is `<directory>/<name>` (the
  *     reference's `path.Join(v.Directory, v.Name)`,
  *     `pkg/server/server.go:48`).
  *
  * The parser covers the TOML subset the reference config uses — `[a.b]`
  * section headers, `key = value` with string/integer/boolean values,
  * `#` comments — and rejects lines outside it loudly rather than
  * guessing (a typo'd config must not silently serve defaults).
  */
final case class ServeConfig(
    port: Int,
    promPort: Int,
    host: String,
    local: Boolean,
    verbose: Int,
    /** name → resolved store root (`<directory>/<name>`). */
    databases: Map[String, String]) {

  /** Connection-default database: "default" when present (the reference's
    * `fossil://.../default` host), else the first name alphabetically. */
  def defaultDb: String =
    if (databases.contains("default")) "default" else databases.keys.min
}

object ServeConfig {

  def parseFile(path: String): ServeConfig =
    parse(new String(Files.readAllBytes(Paths.get(path)), "UTF-8"))

  def parse(toml: String): ServeConfig = {
    val kv = parseToml(toml)
    def str(k: String, dflt: String) = kv.getOrElse(k, dflt)
    def int(k: String, dflt: Int) = kv.get(k).map(_.toInt).getOrElse(dflt)
    def bool(k: String, dflt: Boolean) =
      kv.get(k).map(_.toBoolean).getOrElse(dflt)

    // database blocks: any key "database.<name>.<sub>" or the bare block
    // marker "database.<name>." emitted for empty [database.x] sections
    val blockNames = kv.keys
      .filter(_.startsWith("database."))
      .map(_.stripPrefix("database."))
      .filter(_.contains("."))
      .map(_.takeWhile(_ != '.'))
      .toSet
    // a BARE `[database]` header (no keys) emits the empty marker
    // "database." whose stripped remainder is "" — that must not read as
    // a plain key, or an empty section would declare a phantom "default"
    // database alongside the named blocks
    val plainDbKeys = kv.keys.exists { k =>
      val rest = k.stripPrefix("database.")
      k.startsWith("database.") && rest.nonEmpty && !rest.contains(".")
    }
    val names =
      if (blockNames.isEmpty || plainDbKeys) blockNames + "default"
      else blockNames

    val defaultDir = str("database.directory", "./data")
    val databases = names.map { n =>
      val dir =
        if (n == "default") defaultDir
        else str(s"database.$n.directory", defaultDir)
      n -> Paths.get(dir, n).toString
    }.toMap

    ServeConfig(
      port = int("fossil.port", 8001),
      promPort = int("fossil.prom-port", 2112),
      host = str("fossil.host", ""),
      local = bool("fossil.local", false),
      verbose = int("fossil.verbose", 0),
      databases = databases)
  }

  /** Flat `section.key → value` map of the TOML subset. Empty sections
    * contribute a `<section>.` marker key so `[database.x]` with no body
    * still declares the database. */
  private[api] def parseToml(toml: String): Map[String, String] = {
    var section = ""
    val out = Map.newBuilder[String, String]
    toml.linesIterator.zipWithIndex.foreach { case (raw, ix) =>
      val line = stripComment(raw).trim
      if (line.nonEmpty) {
        if (line.startsWith("[") && line.endsWith("]")) {
          section = line.substring(1, line.length - 1).trim
          require(section.nonEmpty && !section.exists(c => c == '[' || c == ']'),
            s"line ${ix + 1}: malformed section header '$raw'")
          out += s"$section." -> ""
        } else line.split("=", 2) match {
          case Array(k, v) if k.trim.nonEmpty =>
            val key = if (section.isEmpty) k.trim else s"$section.${k.trim}"
            out += key -> unquote(v.trim)
          case _ => throw new IllegalArgumentException(
            s"line ${ix + 1}: expected 'key = value' or '[section]', got '$raw'")
        }
      }
    }
    out.result()
  }

  /** Drop a `#` comment, respecting `#` inside double-quoted strings. */
  private def stripComment(line: String): String = {
    var inStr = false
    val cut = line.indexWhere { c =>
      if (c == '"') { inStr = !inStr; false } else c == '#' && !inStr
    }
    if (cut < 0) line else line.substring(0, cut)
  }

  private def unquote(v: String): String =
    if (v.length >= 2 && v.startsWith("\"") && v.endsWith("\""))
      v.substring(1, v.length - 1)
    else v
}
