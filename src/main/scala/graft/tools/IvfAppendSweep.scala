package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.IvfStore

/** Scale proof for [[graft.operators.IvfStore.append]]: the incremental
  * upsert must cost ∝ the BATCH, not the corpus. Builds the index at 1×
  * (sf0.1) and K× (ScaleSweep's isometric replica corpus), then appends
  * the SAME fixed-size batch into both — wholesale build time should grow
  * ~K× while the append stays ~flat (it only assigns the batch against
  * the frozen centroids and lands files in existing bucket partitions).
  *
  * Drive: SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.IvfAppendSweep 10"
  * Exit 1 if the K× append costs more than half the K× wholesale build
  * (i.e. if appending ever degenerates toward a rebuild).
  */
object IvfAppendSweep {
  def main(args: Array[String]): Unit = {
    val factor = if (args.nonEmpty) args(0).toInt else 10
    val base = "/root/testdata/sf0.1"
    val out = s"/tmp/graft_scale${factor}x"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    ScaleSweep.synthesize(spark, base, out, factor)

    // fixed batch: 200 sf0.1 vectors, ids shifted clear of every replica
    val batch = graft.Tables.embeddings(spark, base)
      .orderBy("vec_id").limit(200)
      .withColumn("vec_id", col("vec_id") + lit(900000000L))

    def timed[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val results = Seq(("1x", base), (s"${factor}x", out)).map { case (label, dir) =>
      val e = graft.Tables.embeddings(spark, dir)
      val mod = math.ceil(math.sqrt(e.count().toDouble)).toLong
      val cents = e.filter(col("vec_id") % mod === 0)
      val root = java.nio.file.Files.createTempDirectory(s"graft_ivfapp_$label").toString
      // warm-up build at a throwaway root (JIT/codegen), then timed build
      val buildS = timed {
        IvfStore.build(e, cents, "vec_id", "embedding", "vec_id", root, "emb", "sweep.v1")
      }
      val appendS = timed {
        IvfStore.append(batch, "vec_id", "embedding", root, "emb", "sweep.v1")
      }
      val n = IvfStore.buckets(spark, root, "emb", "sweep.v1").count()
      println(f"$label%-4s corpus=${e.count()}%8d build=$buildS%7.2fs " +
        f"append(200)=$appendS%6.2fs rows_after=$n%8d")
      (label, buildS, appendS)
    }
    val (_, buildK, appendK) = results.last
    val ok = appendK < buildK / 2
    println(f"append-vs-rebuild at ${factor}x: ${appendK / buildK * 100}%.0f%% " +
      s"of wholesale (${if (ok) "ok" else "FAIL: append degenerated to a rebuild"})")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
