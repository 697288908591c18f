package graft.functions

import graft.SparkSpec

class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("graft_dot is callable from SQL after registration") {
    GraftExtensions.register(spark)
    Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
      .createOrReplaceTempView("vx")
    val r = spark.sql("SELECT graft_dot(a, b) AS d FROM vx").as[Double].head()
    assert(r == 11.0)
    // registration is idempotent
    GraftExtensions.register(spark)
  }

  test("DotProduct interpreted eval matches codegen path") {
    val df = Seq((Array(0.5, -1.5, 2.0), Array(4.0, 2.0, 0.25))).toDF("a", "b")
    val v = df.select(VectorExpressions.dot($"a", $"b")).as[Double].head()
    assert(v == 0.5 * 4.0 + -1.5 * 2.0 + 2.0 * 0.25)
  }

  test("extension injector applies cleanly") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw
  }
}
