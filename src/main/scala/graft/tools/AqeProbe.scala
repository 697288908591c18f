package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Quick probe: is AQE partition coalescing actually firing for the
  * battery's small shuffles under the Bench session confs? Prints the
  * post-shuffle task counts observed for a groupBy and a window over a
  * ~5 MB shuffle. */
object AqeProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("adaptive.enabled=" + spark.conf.get("spark.sql.adaptive.enabled"))
    println("coalescePartitions.enabled=" +
      spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled"))
    println("parallelismFirst=" +
      spark.conf.get("spark.sql.adaptive.coalescePartitions.parallelismFirst"))
    println("minPartitionSize=" +
      spark.conf.get("spark.sql.adaptive.coalescePartitions.minPartitionSize"))
    println("advisoryPartitionSizeInBytes=" +
      spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes"))

    val probe = new org.apache.spark.scheduler.SparkListener {
      val counts = new java.util.concurrent.ConcurrentHashMap[Int, Int]
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        counts.put(e.stageInfo.stageId, e.stageInfo.numTasks)
    }
    spark.sparkContext.addSparkListener(probe)

    val df = spark.range(200000)
      .select(col("id"), md5(col("id").cast("string")).as("s"),
        (col("id") % 1000).as("k"))
    df.groupBy("k").agg(count(lit(1)).as("n"), max("s").as("m"))
      .write.format("noop").mode("overwrite").save()
    Thread.sleep(500)
    import scala.jdk.CollectionConverters._
    println("groupBy stages -> tasks: " +
      probe.counts.asScala.toSeq.sortBy(_._1).mkString(", "))
    probe.counts.clear()

    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("k").orderBy("id")
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      .write.format("noop").mode("overwrite").save()
    Thread.sleep(500)
    println("window stages -> tasks: " +
      probe.counts.asScala.toSeq.sortBy(_._1).mkString(", "))
    spark.stop()
  }
}
