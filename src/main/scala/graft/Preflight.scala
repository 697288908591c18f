package graft

import org.apache.spark.sql.SparkSession

/** Testdata-drift preflight: the driver regenerates /root/testdata between
  * rounds and has already changed a column's physical type once (round 9:
  * `events.ts` TIMESTAMP(NANOS) → TIMESTAMP_MICROS), which silently cost 34
  * battery rows. Before Verify runs a single query, print every table's
  * actual schema and one named `DRIFT` diagnostic per missing/retyped
  * column — so intentional drift shows up as one clear line in the check
  * log instead of a pile of missing correctness keys.
  *
  * Accepted-type sets are deliberately wide: they encode what the engine
  * can ABSORB (e.g. `ts` may arrive as raw int64 nanos, µs timestamp, or
  * NTZ — Tables.events normalizes all three), not one frozen generation of
  * the fixtures. Key columns accept int or long.
  */
object Preflight {

  private val Int = Set("integer", "long")
  private val Num = Set("double", "float")
  private val Ts = Set("timestamp", "timestamp_ntz", "long", "date")
  private val Str = Set("string")

  /** table -> (column -> accepted Spark typeNames) */
  private val expected: Map[String, Map[String, Set[String]]] = Map(
    "events" -> Map(
      "event_id" -> Int, "ts" -> Ts, "user_id" -> Int,
      "event_type" -> Str, "value" -> Num, "props" -> Str),
    "lineitem" -> Map(
      "l_orderkey" -> Int, "l_partkey" -> Int, "l_suppkey" -> Int,
      "l_linenumber" -> Int, "l_quantity" -> Num, "l_extendedprice" -> Num,
      "l_discount" -> Num, "l_tax" -> Num, "l_returnflag" -> Str,
      "l_linestatus" -> Str, "l_shipdate" -> Ts),
    "orders" -> Map(
      "o_orderkey" -> Int, "o_custkey" -> Int, "o_orderstatus" -> Str,
      "o_totalprice" -> Num, "o_orderdate" -> Ts, "o_orderpriority" -> Str),
    "customer" -> Map(
      "c_custkey" -> Int, "c_name" -> Str, "c_nationkey" -> Int,
      "c_acctbal" -> Num, "c_mktsegment" -> Str),
    "supplier" -> Map(
      "s_suppkey" -> Int, "s_name" -> Str, "s_nationkey" -> Int,
      "s_acctbal" -> Num),
    "part" -> Map(
      "p_partkey" -> Int, "p_name" -> Str, "p_brand" -> Str,
      "p_type" -> Str, "p_size" -> Int, "p_retailprice" -> Num),
    "nation" -> Map(
      "n_nationkey" -> Int, "n_name" -> Str, "n_regionkey" -> Int),
    "region" -> Map("r_regionkey" -> Int, "r_name" -> Str),
    "documents" -> Map(
      "doc_id" -> Int, "text" -> Str, "lang" -> Str, "source" -> Str,
      "n_chars" -> Int),
    "embeddings" -> Map(
      "vec_id" -> Int, "embedding" -> Set("array"), "label" -> Int)
  )

  /** Prints one schema line per table and one `DRIFT` line per deviation;
    * returns the diagnostics so callers can decide to abort or proceed. */
  def check(spark: SparkSession, dir: String): Seq[String] = {
    val drifts = collection.mutable.ArrayBuffer.empty[String]
    expected.toSeq.sortBy(_._1).foreach { case (table, cols) =>
      try {
        val schema = spark.read.parquet(s"$dir/$table.parquet").schema
        System.err.println(s"[preflight] $table :: " +
          schema.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", "))
        val byName = schema.map(f => f.name -> f.dataType).toMap
        cols.foreach { case (name, accepted) =>
          byName.get(name) match {
            case None =>
              drifts += s"$table.$name: MISSING (expected one of ${accepted.mkString("/")})"
            case Some(dt) if !accepted.contains(dt.typeName) =>
              drifts += s"$table.$name: expected one of ${accepted.mkString("/")}, got ${dt.simpleString}"
            case _ =>
          }
        }
      } catch {
        case e: Throwable =>
          drifts += s"$table: UNREADABLE (${e.getMessage.takeWhile(_ != '\n')})"
      }
    }
    drifts.foreach(d => System.err.println(s"[preflight] DRIFT: $d"))
    if (drifts.isEmpty)
      System.err.println(s"[preflight] all ${expected.size} tables match expected shapes")
    drifts.toSeq
  }
}
