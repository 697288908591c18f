package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.fql.{Ast, Compiler, Parser}

/** Continuous FQL: the same parse → compile path as batch, over a streaming
  * entries frame. filter/map stages compile 1:1 (stateless narrow ops),
  * `sample` becomes the stateful per-topic greedy operator, `reduce` is
  * rejected (unbounded state) in favor of windowed aggregation.
  */
object StreamingFql {
  def query(fql: String, entries: DataFrame,
      clock: Compiler.Clock = Compiler.systemClock): DataFrame =
    Compiler.compile(Parser.parse(fql), entries, clock)

  def parse(fql: String): Ast.Query = Parser.parse(fql)
}

/** Bridge used by the compiler for streaming-specific physical choices. */
object StreamingAdapter {

  /** Streaming greedy sample over a canonical `(time, topic, value)` frame:
    * converts to the typed entry stream, runs the stateful operator, and
    * restores the canonical shape. Value must be numeric (cast to double —
    * the typed state operator needs a concrete encoder). */
  def greedySample(entries: DataFrame, intervalNs: Long): DataFrame = {
    import entries.sparkSession.implicits._
    entries.schema(Compiler.ValueCol).dataType match {
      case _: org.apache.spark.sql.types.NumericType =>
      case other => throw new graft.fql.FqlException(
        s"streaming sample() requires a numeric value column, got ${other.simpleString}")
    }
    val typed = entries.select(
      unix_micros(col(Compiler.TimeCol)).as("t_us"),
      col(Compiler.TopicCol).as("topic"),
      col(Compiler.ValueCol).cast("double").as("value"))
      .as[StreamingIngest.Entry]
    StreamingIngest.greedySample(typed, Math.floorDiv(intervalNs, 1000L))
      .select(
        timestamp_micros(col("t_us")).as(Compiler.TimeCol),
        col("topic").as(Compiler.TopicCol),
        col("value").as(Compiler.ValueCol))
  }
}
