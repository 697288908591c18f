package graft.engine

import org.scalatest.funsuite.AnyFunSuite

import FossilSchema._

/** Topic-hierarchy schema semantics per `docs/schema.md:41-58` and
  * `pkg/database/db.go:88-106,452-483` (inheritance, conflicts, Combine). */
class CatalogSpec extends AnyFunSuite {

  test("default schema is string") {
    val c = new Catalog
    assert(c.ensure("/foo") == FossilSchema.default)
    assert(FossilSchema.default == SString)
  }

  test("children inherit nearest non-default ancestor schema") {
    val c = new Catalog
    c.createDdl("/sensors/temp", "float64")
    assert(c.ensure("/sensors/temp/garage") == SFloat64)
    assert(c.ensure("/sensors/other") == SString)
  }

  test("conflicting child schema is rejected") {
    val c = new Catalog
    c.createDdl("/sensors/temp", "float64")
    assertThrows[IllegalArgumentException](c.createDdl("/sensors/temp/garage", "int32"))
  }

  test("combine widens numerics, mixes to ambiguous") {
    val c = new Catalog
    c.createDdl("/m/a", "int32")
    c.createDdl("/m/b", "int64")
    assert(c.combinedSchema("/m") == SInt64)
    c.createDdl("/m/c", "string")
    assert(c.combinedSchema("/m") == SAmbiguous)
  }

  test("prefix matching: /a/b matches itself and descendants only") {
    val c = new Catalog
    Seq("/a/b", "/a/b/c", "/a/bc", "/a").foreach(c.ensure)
    assert(c.topicsUnder("/a/b") == Seq("/a/b", "/a/b/c"))
  }

  test("trailing slash normalizes") {
    val c = new Catalog
    c.ensure("/x/y")
    assert(c.topicsUnder("/x/y/") == Seq("/x/y"))
  }
}
