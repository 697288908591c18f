package graft.api

import java.net.URI

/** Connection-string dispatch, mirroring the reference's
  * `pkg/proto/connectionstring.go:34-74` shapes:
  *
  *   - `./path/to/local/db` (bare path)       → local embedded store
  *   - `file://./path/to/local/db`            → local embedded store
  *   - `fossil://<host[:port]>[/<db_name>]`   → wire client ([[RemoteClient]])
  *
  * Like the reference, the fossil form defaults the database name to
  * `default` and rejects nested database paths (`/a/b`); unrecognized
  * schemes are errors. The default port is the reference server's 8001
  * (`cmd/fossil/server/server.go:75` — Go's dialer gets host:port verbatim,
  * so the default lives here instead).
  */
object ConnectionString {
  val DefaultPort = 8001
  val DefaultDb = "default"

  sealed trait Target
  /** Serverless embedded store rooted at `path` ([[LocalClient]]). */
  final case class Local(path: String) extends Target
  /** Wire target (`fossil://`): TCP to host:port, then `USE db`. */
  final case class Remote(host: String, port: Int, db: String) extends Target

  def parse(connStr: String): Target = {
    val s = if (connStr == null || connStr.isEmpty) "./" else connStr
    if (s.startsWith("fossil://")) {
      val u = new URI(s)
      val host = Option(u.getHost).filter(_.nonEmpty).getOrElse(
        throw new IllegalArgumentException(s"missing host in '$s'"))
      val port = if (u.getPort > 0) u.getPort else DefaultPort
      val db = Option(u.getPath).getOrElse("") match {
        case "" | "/" => DefaultDb
        case p if p.stripPrefix("/").contains("/") =>
          // reference: `invalid database <path>` for nested paths
          throw new IllegalArgumentException(s"invalid database $p")
        case p => p.stripPrefix("/")
      }
      Remote(host, port, db)
    } else if (s.startsWith("file://")) Local(s.stripPrefix("file://"))
    else if (s.contains("://"))
      throw new IllegalArgumentException(
        s"unrecognized scheme: ${s.substring(0, s.indexOf("://"))}")
    else Local(s)
  }
}
