package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-range (interval) join: pair each point row with every interval row
  * whose `[start, end)` contains the point's time, on an optional equi-key.
  *
  * Scale design: a naive theta-join is O(points × intervals) nested-loop —
  * unusable at scale. Instead both sides are expanded/assigned to fixed-width
  * time buckets and joined on bucket equality (hash shuffle join), then the
  * exact range predicate filters within buckets. Bucket width should be on
  * the order of the typical interval length; intervals spanning k buckets
  * fan out k rows (bounded, explicit).
  */
object RangeJoin {

  /** @param points    frame with a `pointTime` timestamp column
    * @param intervals frame with `startTime`/`endTime` timestamp columns
    * @param bucketUs  bucket width in microseconds */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      pointTime: String,
      startTime: String,
      endTime: String,
      bucketUs: Long): DataFrame = {

    val p = points.withColumn("__pb", (unix_micros(col(pointTime)) / bucketUs).cast("long"))
    val iv = intervals
      .withColumn("__sb", (unix_micros(col(startTime)) / bucketUs).cast("long"))
      // end exclusive: last covered bucket is the one holding end-1µs
      .withColumn("__eb", ((unix_micros(col(endTime)) - 1) / bucketUs).cast("long"))
      .withColumn("__ib", explode(sequence(col("__sb"), col("__eb"))))
      .drop("__sb", "__eb")

    p.join(iv, p("__pb") === iv("__ib") &&
        p(pointTime) >= iv(startTime) && p(pointTime) < iv(endTime))
      .drop("__pb", "__ib")
  }
}
