package graft.api

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.fql.Compiler

/** Client session holding named stores — the `USE` command surface.
  *
  * The reference keeps per-connection database state on the server
  * (`pkg/server/server.go:108-125`) and addresses databases by connection
  * string (`pkg/proto/connectionstring.go:34-74`: `fossil://host[:port]/db`
  * for the wire path, `file:///path` / bare path for serverless local).
  * This embedded analog supports the serverless shapes: every named store
  * is a [[LocalClient]] over its own [[graft.engine.ParquetStore]] root,
  * and `USE <name>` switches which one the session's commands hit. The
  * wire front-end ([[WireServer]]) keeps one Session per connection.
  */
final class Session(val spark: SparkSession, clock: Compiler.Clock = Compiler.systemClock) {

  private val stores = mutable.LinkedHashMap.empty[String, LocalClient]
  private var active: Option[String] = None

  /** Fire-and-forget: the write-only collection mode of
    * `docs/overview.md:45-53` — a connection that declares it is limited
    * to write commands (APPEND/CREATE/USE plus the VERSION handshake) so
    * ingest paths can never stall behind reads. Per-connection state like
    * the USE database; flipped by the wire `MODE` command. */
  var fireAndForget: Boolean = false

  /** Resolve a connection string to a filesystem store root via the shared
    * [[ConnectionString]] dispatch (serverless subset of
    * `pkg/proto/connectionstring.go:34-74`): `file://` and bare paths are
    * local roots; `fossil://` targets belong to [[RemoteClient]] and are
    * rejected here rather than silently treated as a directory name. */
  def resolveRoot(connectionString: String): String =
    ConnectionString.parse(connectionString) match {
      case ConnectionString.Local(path) => path
      case r: ConnectionString.Remote =>
        throw new IllegalArgumentException(
          s"fossil://${r.host}:${r.port}/${r.db} is a wire target — " +
            "sessions attach local stores; use RemoteClient for servers")
    }

  /** ATTACH a named store (idempotent for the same root; re-attaching a
    * name to a DIFFERENT root is an error, mirroring the reference's
    * one-database-per-name registry). Auto-activates the first store.
    * The already-attached name short-circuits BEFORE constructing a client
    * (a ParquetStore construction reads catalog.json from disk). */
  def attach(name: String, connectionString: String): LocalClient = {
    val root = resolveRoot(connectionString)
    stores.get(name) match {
      case Some(c) if c.root == root => c
      case _ => attach(name, new LocalClient(spark, root, clock))
    }
  }

  /** ATTACH an existing client under a name — lets several sessions share
    * ONE client (and thus one live catalog) per store root, the multi-
    * connection shape [[WireServer]] needs: per-connection store instances
    * would each snapshot catalog.json at connect time and clobber each
    * other's topics on persist. */
  def attach(name: String, client: LocalClient): LocalClient = {
    stores.get(name) match {
      case Some(c) if c.root == client.root => c
      case Some(c) =>
        throw new IllegalArgumentException(
          s"store '$name' is already attached to ${c.root}; refusing to rebind to ${client.root}")
      case None =>
        stores(name) = client
        if (active.isEmpty) active = Some(name)
        client
    }
  }

  /** USE: switch the active store. */
  def use(name: String): LocalClient = {
    if (!stores.contains(name))
      throw new IllegalArgumentException(
        s"unknown store '$name' — attach it first (known: ${stores.keys.mkString(", ")})")
    active = Some(name)
    client
  }

  def activeName: Option[String] = active

  /** The active store's client; commands route here. */
  def client: LocalClient = active.flatMap(stores.get).getOrElse(
    throw new IllegalStateException("no store attached — ATTACH/USE one first"))

  // -- command surface over the active store --
  def query(fql: String): DataFrame = client.query(fql)
  def listTopics: Seq[(String, String)] = client.listTopics

  /** Attached store names — `LIST databases` enumerates the session's
    * registry like the reference enumerates the server `dbMap`
    * (`pkg/server/response.go:38-44`). Attachment order (the reference
    * iterates an unordered Go map; a stable order is strictly more useful). */
  def listDatabases: Seq[String] = stores.keys.toSeq
}
