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

  /** Resolve a connection string to a filesystem store root.
    * Accepted shapes (serverless subset of
    * `pkg/proto/connectionstring.go:34-74`): `file:///abs/path`,
    * `file://rel/path`, or a bare path. */
  def resolveRoot(connectionString: String): String =
    if (connectionString.startsWith("file://")) {
      val rest = connectionString.stripPrefix("file://")
      if (rest.startsWith("/")) rest else rest // file:///abs keeps leading /
    } else connectionString

  /** ATTACH a named store (idempotent for the same root; re-attaching a
    * name to a different root is an error, mirroring the reference's
    * one-database-per-name registry). Auto-activates the first store. */
  def attach(name: String, connectionString: String): LocalClient = {
    val root = resolveRoot(connectionString)
    stores.get(name) match {
      case Some(c) => c
      case None =>
        val c = new LocalClient(spark, root, clock)
        stores(name) = c
        if (active.isEmpty) active = Some(name)
        c
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
}
