package graft.engine

import scala.collection.concurrent.TrieMap

import FossilSchema._

/** Topic registry: hierarchical topic paths → schemas, with parent-schema
  * inheritance and conflict rejection.
  *
  * Semantics per `docs/schema.md:41-58` and the reference walk
  * (`pkg/database/db.go:88-106,452-483`):
  *   - topics auto-create on first append, inheriting the nearest ancestor's
  *     non-default schema, else defaulting to `string`;
  *   - setting a schema that conflicts with an ancestor's non-default schema
  *     is an error;
  *   - prefix queries over mixed-schema topics merge via [[FossilSchema.combine]].
  *
  * This is driver-side metadata (thousands of topics, not billions of rows) —
  * a concurrent map is the right scale; the data itself lives in Spark.
  */
final class Catalog extends Serializable {
  private val topics = TrieMap.empty[String, SType]

  def normalize(path: String): String = {
    val p = if (path.endsWith("/") && path.length > 1) path.dropRight(1) else path
    if (!p.startsWith("/")) throw new IllegalArgumentException(s"topic must start with '/': $path")
    p
  }

  /** Nearest ancestor (excluding self) carrying a non-default schema. */
  private def parentSchema(path: String): Option[SType] = {
    var p = path
    while (p.contains('/') && p != "/") {
      p = p.substring(0, p.lastIndexOf('/')) match { case "" => "/"; case x => x }
      topics.get(p).filter(_ != FossilSchema.default) match {
        case some @ Some(_) => return some
        case None =>
      }
    }
    None
  }

  /** Explicit CREATE with schema; rejects conflicts with inherited schema. */
  def create(path: String, schema: SType = FossilSchema.default): SType = {
    val p = normalize(path)
    parentSchema(p) match {
      case Some(inherited) if schema != FossilSchema.default && schema != inherited =>
        throw new IllegalArgumentException(
          s"schema ${schema.ddl} on $p conflicts with inherited ${inherited.ddl}")
      case Some(inherited) if schema == FossilSchema.default =>
        // an EXISTING topic keeps its schema — overwriting with the parent's
        // would orphan data already written under the old schema group
        topics.getOrElseUpdate(p, inherited)
      case _ =>
        topics.get(p) match {
          case Some(existing) if existing != schema && schema != FossilSchema.default =>
            throw new IllegalArgumentException(
              s"topic $p already has schema ${existing.ddl}")
          case Some(existing) => existing
          case None => topics.put(p, schema); schema
        }
    }
  }

  def createDdl(path: String, ddl: String): SType = create(path, FossilSchema.parse(ddl))

  /** Restore a persisted entry verbatim — no inheritance walk, no conflict
    * checks (they already ran when the entry was first created; replaying
    * them against a sorted snapshot can produce different results). */
  def restore(path: String, schema: SType): Unit = topics.put(normalize(path), schema)

  /** Implicit create on append: inherit or default (`db.go:452-483`). */
  def ensure(path: String): SType = {
    val p = normalize(path)
    topics.getOrElseUpdate(p, parentSchema(p).getOrElse(FossilSchema.default))
  }

  /** The schema [[ensure]] WOULD assign, WITHOUT mutating the registry —
    * lets append validate every topic first and only register them all
    * once the whole batch is known-good (a rejected append must not leave
    * phantom auto-created topics behind). */
  def effective(path: String): SType = {
    val p = normalize(path)
    topics.getOrElse(p, parentSchema(p).getOrElse(FossilSchema.default))
  }

  def schemaOf(path: String): Option[SType] = topics.get(normalize(path))

  def list: Seq[(String, SType)] = topics.toSeq.sortBy(_._1)

  /** All known topics matching a query prefix: exact topic or descendants —
    * `/a/b` matches `/a/b` and `/a/b/...` (`pkg/query/plan/metadata.go:75-82`). */
  def topicsUnder(prefix: String): Seq[String] = {
    val p = normalize(prefix)
    if (p == "/") topics.keys.toSeq.sorted
    else topics.keys.filter(t => t == p || t.startsWith(p + "/")).toSeq.sorted
  }

  /** Merged schema for a prefix scan (`pkg/database/db.go:414-450`).
    *
    * Schemas are DEDUPLICATED before combining, matching
    * `ParquetStore.entries` (which combines distinct on-disk schema
    * groups, not per-topic repeats): `combine` mirrors the reference's
    * pairwise widening where composites are always ambiguous, so without
    * the dedupe a prefix holding two topics with the SAME composite
    * schema would read back opaque — while the library path serves typed
    * structs. Identity between the two paths requires combining the
    * distinct schema SET. */
  def combinedSchema(prefix: String): SType =
    FossilSchema.combineAll(topicsUnder(prefix).flatMap(topics.get).distinct)
}
