package graft.connector

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Spark SQL catalog over fossil stores — the catalog/schema exposure half
  * of the connector (r16 verdict item 1): register once,
  *
  *   spark.sql.catalog.fossil = graft.connector.FossilCatalog
  *   spark.sql.catalog.fossil.db.main = /path/to/store        // per-db roots
  *   spark.sql.catalog.fossil.root   = /path/to/default/store // db "default"
  *
  * and every topic — and every topic PREFIX — is a SQL table with the
  * canonical entry schema:
  *
  *   SELECT * FROM fossil.main.events.click      -- one topic
  *   SELECT * FROM fossil.main.events            -- prefix read, combined type
  *   SHOW NAMESPACES IN fossil.main              -- topic tree, level by level
  *   SHOW TABLES IN fossil.main.events           -- topics under the prefix
  *
  * Identifier mapping: `fossil.<db>.<seg>....<seg>` — the namespace's tail
  * segments plus the table name spell the topic path, so topic paths need
  * no backticks. Roots may be ParquetStore roots OR native fossil
  * databases (same auto-detection as `spark.read.format("fossil")`); the
  * catalog is READ-ONLY by design — writes go through the library/client
  * (single-writer store contract), so create/alter/drop refuse by name. */
class FossilCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var dbs: Map[String, String] = Map.empty // db name -> root

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    val opts = options.asCaseSensitiveMap().asScala
    dbs = opts.collect {
      case (k, v) if k.toLowerCase(java.util.Locale.ROOT).startsWith("db.") =>
        k.substring(3) -> v
    }.toMap ++ opts.collectFirst {
      case (k, v) if k.equalsIgnoreCase("root") => "default" -> v
    }
    require(dbs.nonEmpty,
      s"catalog $name needs at least one store: set spark.sql.catalog.$name" +
        s".db.<name>=<root> or spark.sql.catalog.$name.root=<root>")
  }

  override def name(): String = catalogName

  private def rootOf(db: String): String = dbs.getOrElse(db,
    throw new org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException(
      Array(db)))

  /** Resolved tables memoized per (root, prefix) with a control-plane
    * freshness stamp: Spark issues several catalog calls per statement
    * (tableExists → loadTable → listings), and a cold resolve on a NATIVE
    * root is a full control-plane open including WAL replay. The stamp is
    * the (mtime, size) of the files whose content the cached table
    * actually captures — `catalog.json` for a store root (data files are
    * re-listed per scan, so only topic/schema registry freshness matters),
    * `metadata` + `wal.log` for a native root (whose decoded control plane
    * DOES hold the WAL-borne rows). Stale stamp → re-resolve. */
  private val tableCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), (Seq[Long], FossilTableBase)]

  private def freshnessStamp(root: String): Seq[Long] =
    Seq("catalog.json", "metadata", "wal.log", "database").flatMap { f =>
      graft.engine.StoreFs.stamp(s"$root/$f") match {
        case Some((mtime, len)) => Seq(mtime, len)
        case None => Seq(-1L, -1L)
      }
    }

  private def tableOf(db: String, prefix: String): FossilTableBase = {
    val root = rootOf(db)
    val key = (root, prefix)
    val stamp = freshnessStamp(root)
    val cached = tableCache.get(key)
    if (cached != null && cached._1 == stamp) cached._2
    else {
      val t = FossilDataSource.resolve(Map("path" -> root, "prefix" -> prefix))
      tableCache.put(key, (stamp, t))
      t
    }
  }

  /** namespace tail + name → topic path ("/"-rooted). */
  private def topicPath(segs: Seq[String]): String = "/" + segs.mkString("/")

  // ---- namespaces: db level, then the topic tree level by level ---------

  override def listNamespaces(): Array[Array[String]] =
    dbs.keys.toArray.sorted.map(Array(_))

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    if (namespace.isEmpty) return listNamespaces()
    val prefix = if (namespace.length == 1) "/" else topicPath(namespace.tail.toSeq)
    val t = tableOf(namespace.head, prefix)
    val depth = namespace.length - 1
    // child namespace = next path segment of any topic strictly below it;
    // dedupe on the segment NAME (a Set[String]) — Array[String] rows have
    // reference equality, so .distinct over them never collapses anything
    t.prefixTopics.iterator
      .map(_.stripPrefix("/").split("/").toSeq)
      .filter(_.length > depth + 1)
      .filter(segs => topicPath(segs.take(depth)) == prefix || depth == 0)
      .map(_(depth))
      .toSet.toArray.sorted
      .map(seg => namespace :+ seg)
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.length match {
      case 0 => true
      case 1 => dbs.contains(namespace.head)
      case _ => dbs.contains(namespace.head) && {
        val prefix = topicPath(namespace.tail.toSeq)
        tableOf(namespace.head, prefix).prefixTopics.nonEmpty
      }
    }

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] = {
    if (!namespaceExists(namespace))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException(namespace)
    val m = new util.HashMap[String, String]()
    if (namespace.length >= 1 && dbs.contains(namespace.head))
      m.put("root", dbs(namespace.head))
    m
  }

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit = refuse("CREATE NAMESPACE")
  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit = refuse("ALTER NAMESPACE")
  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean =
    refuse("DROP NAMESPACE")

  // ---- tables: every topic and every prefix ------------------------------

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    require(namespace.nonEmpty, "a fossil table lives under a database namespace")
    val prefix = if (namespace.length == 1) "/" else topicPath(namespace.tail.toSeq)
    val t = tableOf(namespace.head, prefix)
    val depth = namespace.length - 1
    // tables directly AT this level: topics whose path has exactly one
    // more segment than the namespace
    t.prefixTopics.iterator
      .map(_.stripPrefix("/").split("/").toSeq)
      .filter(_.length == depth + 1)
      .map(segs => Identifier.of(namespace, segs.last))
      .toArray
  }

  override def tableExists(ident: Identifier): Boolean =
    ident.namespace().nonEmpty && dbs.contains(ident.namespace().head) && {
      val prefix = topicPath(ident.namespace().tail.toSeq :+ ident.name())
      tableOf(ident.namespace().head, prefix).prefixTopics.nonEmpty
    }

  override def loadTable(ident: Identifier): Table = {
    if (ident.namespace().isEmpty || !dbs.contains(ident.namespace().head))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident)
    val prefix = topicPath(ident.namespace().tail.toSeq :+ ident.name())
    val t = tableOf(ident.namespace().head, prefix)
    if (t.prefixTopics.isEmpty)
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident)
    t
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table =
    refuse("CREATE TABLE")
  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    refuse("ALTER TABLE")
  override def dropTable(ident: Identifier): Boolean = refuse("DROP TABLE")
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    refuse("RENAME TABLE")

  private def refuse(op: String): Nothing = throw new UnsupportedOperationException(
    s"$op: the fossil catalog is READ-ONLY — the store has a single-writer " +
      "contract per root; create topics and append through the library/client " +
      "(LocalClient / wire APPEND / streaming ingest)")
}
