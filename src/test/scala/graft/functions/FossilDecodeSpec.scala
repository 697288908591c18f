package graft.functions

import graft.SparkSpec
import graft.engine.Codec
import graft.engine.FossilSchema._

/** Wire-format bytes → typed Spark values, round-tripped through the
  * engine's own encoder inside a DataFrame plan. */
class FossilDecodeSpec extends SparkSpec {
  import spark.implicits._

  test("scalar decode in a plan") {
    val rows = Seq(1.5, -2.25, 1e12).map(v => Codec.encode(SFloat64, v))
    val out = rows.toDF("b")
      .select(FossilDecode("float64", $"b").as("v")).as[Double].collect().toSeq
    assert(out == Seq(1.5, -2.25, 1e12))
  }

  test("fixed array decode") {
    val bytes = Codec.encode(SArray(3, SInt32), Seq(7, -8, 9))
    val out = Seq(bytes).toDF("b")
      .select(FossilDecode("[3]int32", $"b").as("v")).as[Seq[Int]].head()
    assert(out == Seq(7, -8, 9))
  }

  test("composite decode to struct with sorted keys") {
    val sch = SComposite(List("name" -> SString, "coords" -> SArray(2, SInt32)))
    val bytes = Codec.encode(sch, Map("name" -> "garage", "coords" -> Seq(3, 4)))
    val df = Seq(bytes).toDF("b")
      .select(FossilDecode("""{"name": string, "coords": [2]int32}""", $"b").as("v"))
    val row = df.select("v.*").collect()(0)
    assert(row.getSeq[Int](row.fieldIndex("coords")).toList == List(3, 4))
    assert(row.getAs[String]("name") == "garage")
  }

  test("unsigned widens like the reference") {
    val bytes = Codec.encode(SUInt32, 0xFFFFFFFFL)
    val out = Seq(bytes).toDF("b")
      .select(FossilDecode("uint32", $"b").as("v")).as[Long].head()
    assert(out == 0xFFFFFFFFL)
  }
}
