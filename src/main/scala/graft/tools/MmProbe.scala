package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Multimodal

/** Stage attribution for the multimodal rows' scale ratios (round-15
  * verdict item 8: mm_resize's 100× sweep ratio 5.5 "mildly superlinear
  * for a per-row map — likely fixture I/O, settle it").
  *
  * Times each prefix of the mm_resize chain independently at 1× and K×
  * on the SAME synthesized corpus the sweep uses, median of 3:
  *   scan    — read documents, consume text bytes (pure parquet I/O)
  *   wrap    — + headerWrappedDocs (the oracle FIXTURE construction:
  *             per-row byte concat of a spec-correct media header)
  *   resize  — + contain-fit resize (header re-emit + payload slice)
  *   decode  — + decodeMeta round-trip (the full battery row sans sort)
  *   full    — the battery row itself (adds the orderBy, which the
  *             count() aggregate lets EliminateSorts drop)
  * The per-stage DELTAS at each scale say which stage carries any
  * super-linear growth; stages before `resize` are fixture, not operator.
  *
  * Drive: SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.MmProbe 100"
  */
object MmProbe {
  def main(args: Array[String]): Unit = {
    val factor = if (args.nonEmpty) args(0).toInt else 100
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

    val stages: Seq[(String, String => Unit)] = Seq(
      ("scan", dir => {
        Tables.documents(spark, dir)
          .agg(sum(octet_length(col("text")))).first(); ()
      }),
      ("wrap", dir => {
        Multimodal.headerWrappedDocs(Tables.documents(spark, dir))
          .toDF().agg(sum(length(col("bytes")))).first(); ()
      }),
      ("resize", dir => {
        Multimodal.resize(
            Multimodal.headerWrappedDocs(Tables.documents(spark, dir)), 64, 64)
          .toDF().agg(sum(length(col("bytes")))).first(); ()
      }),
      ("decode", dir => {
        Multimodal.decodeMeta(Multimodal.resize(
            Multimodal.headerWrappedDocs(Tables.documents(spark, dir)), 64, 64))
          .toDF().count(); ()
      }),
      ("full", dir => {
        graft.SparkEntry.queries("mm_resize")(spark, dir).count(); ()
      }))

    // JIT/codegen warm-up on the small corpus, as the sweep does
    stages.foreach { case (_, f) =>
      try f("/root/testdata/sf0.001") catch { case _: Throwable => () }
    }

    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    // pass-major sampling (the sweep's decorrelation rule): one loud I/O
    // window inflates one pass of every stage, not all samples of one
    val samples = (0 until 3).map { _ =>
      stages.map { case (name, f) =>
        def t(dir: String): Double = {
          val t0 = System.nanoTime(); f(dir); (System.nanoTime() - t0) / 1e9
        }
        name -> (t(base), t(out))
      }.toMap
    }
    val rows = stages.map { case (name, _) =>
      val t1 = med(samples.map(_(name)._1))
      val tk = med(samples.map(_(name)._2))
      (name, t1, tk)
    }
    println(f"${"stage"}%-8s ${"1x"}%8s ${factor + "x"}%9s ${"ratio"}%7s ${"d1x"}%8s ${"d" + factor + "x"}%9s ${"dratio"}%7s")
    var (p1, pk) = (0.0, 0.0)
    val json = rows.map { case (name, t1, tk) =>
      val (d1, dk) = (t1 - p1, tk - pk); p1 = t1; pk = tk
      println(f"$name%-8s $t1%8.3f $tk%9.3f ${tk / math.max(t1, 1e-9)}%7.2f " +
        f"$d1%8.3f $dk%9.3f ${dk / math.max(d1, 1e-9)}%7.2f")
      f""""$name":{"t1x":$t1%.4f,"t${factor}x":$tk%.4f}"""
    }
    val path = "target/mm_probe.json"
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      s"""{"factor":$factor,"cpus":$cpus,"stages":{${json.mkString(",")}}}\n"""
        .getBytes("UTF-8"))
    println(s"wrote $path")
    spark.stop()
  }
}
