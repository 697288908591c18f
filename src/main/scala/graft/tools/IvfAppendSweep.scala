package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.IvfStore

/** Scale proof for [[graft.operators.IvfStore.append]]: the incremental
  * upsert must cost ∝ the BATCH, not the corpus. Builds the index at 1×
  * (sf0.1) and K× (ScaleSweep's isometric replica corpus), then appends
  * the SAME fixed-size batch into both. The gate is CROSS-SCALE FLATNESS
  * of the append's batch-proportional path (`assertDisjoint = false` —
  * the disjointness guard is documented corpus-proportional): a K× corpus
  * must not make the fixed batch's append materially slower. An earlier
  * gate compared append against the wholesale build in the SAME corpus,
  * but at probe scale both are dominated by fixed per-job overhead
  * (seconds of Spark scheduling against milliseconds of data), which
  * made the ratio noise, not signal; flatness compares like overheads.
  *
  * Also probes the post-drift maintenance story: a skewed new-topic
  * append must raise [[IvfStore.bucketSkew]] past the bound and
  * [[IvfStore.rebalance]] must re-bound it (machine gate = the skew
  * ratio; the printed hot-probe walls are overhead-dominated at this
  * scale and recorded for context only).
  *
  * Drive: SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.IvfAppendSweep 10"
  * Exit 1 if the K× append exceeds 3× the 1× append, or the rebalance
  * fails to re-bound the skew.
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
        IvfStore.append(batch, "vec_id", "embedding", root, "emb", "sweep.v1",
          assertDisjoint = false)
      }
      val n = IvfStore.buckets(spark, root, "emb", "sweep.v1").count()
      println(f"$label%-4s corpus=${e.count()}%8d build=$buildS%7.2fs " +
        f"append(200)=$appendS%6.2fs rows_after=$n%8d")
      (label, buildS, appendS)
    }
    val append1 = results.head._3
    val appendK = results.last._3
    val ok = appendK <= append1 * 3
    println(f"append flatness at ${factor}x: ${appendK / append1}%.2fx the 1x " +
      s"append (${if (ok) "ok" else "FAIL: append cost grew with the corpus"})")

    // drift probe at the Kx corpus: a skewed append (a new-topic batch
    // sized ~10x the mean bucket, funneled by the frozen centroids into
    // one region) must degrade the hot-bucket probe, and rebalance() must
    // bound it again — the post-drift maintenance story (r15)
    val driftOk = {
      val e = graft.Tables.embeddings(spark, out)
      val mod = math.ceil(math.sqrt(e.count().toDouble)).toLong
      val cents = e.filter(col("vec_id") % mod === 0)
      val root = java.nio.file.Files.createTempDirectory("graft_ivfrebal").toString
      IvfStore.build(e, cents, "vec_id", "embedding", "vec_id", root, "emb", "sweep.v1")
      val meanBucket = e.count() / cents.count()
      val batchN = (meanBucket * 10).toInt
      val off = 900000000L
      val drift = e.orderBy("vec_id").limit(batchN)
        .select((col("vec_id") + off).as("vec_id"),
          transform(col("embedding").cast("array<double>"),
            (x, i) => x + when(i === 0, lit(5.0)).otherwise(lit(0.0)))
            .as("embedding"))
      IvfStore.append(drift, "vec_id", "embedding", root, "emb", "sweep.v1",
        assertDisjoint = false)
      val queries = drift.orderBy("vec_id").limit(20)
      def probeMedian(tag: String): Double =
        (1 to 3).map { _ =>
          timed(graft.operators.Similarity
            .ivfTopKStored(spark, root, "emb", tag, queries,
              "vec_id", "embedding", k = 3).count())
        }.sorted.apply(1)
      val skewBefore = IvfStore.bucketSkew(spark, root, "emb", "sweep.v1")
      val probeBefore = probeMedian("sweep.v1")
      val t0 = System.nanoTime()
      val newTag = IvfStore.rebalance(spark, root, "emb", "sweep.v1", maxSkew = 4.0)
      val rebalS = (System.nanoTime() - t0) / 1e9
      val skewAfter = IvfStore.bucketSkew(spark, root, "emb", newTag.get)
      val probeAfter = probeMedian(newTag.get)
      val bounded = skewBefore > 4.0 && skewAfter <= 4.0 && newTag.nonEmpty
      println(f"rebalance at ${factor}x: skew $skewBefore%.1f -> $skewAfter%.1f " +
        f"hot-probe $probeBefore%.2fs -> $probeAfter%.2fs retrain=$rebalS%.1fs " +
        (if (bounded) "ok" else "FAIL: skew not re-bounded"))
      bounded
    }
    spark.stop()
    if (!ok || !driftOk) sys.exit(1)
  }
}
