package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-cost probe for the exact-substring family at sf0.1: separates
  * window-frame cost, grouped-collect cost, and pair-explode cost, and
  * A/Bs the key/generator variants (HOF vs native generator; md5 hex vs
  * long-key grouping) so regression work targets the real bottleneck.
  * Findings that drove the r14 reshape: the interpreted wordShingles HOF
  * was 60% of wall time (0.83 → 0.35 s with the generator), and long agg
  * keys beat the 32-byte hex string by ~35% end-to-end. */
object SubstrProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def time(label: String)(f: => Long): Unit = {
      (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        val dt = (System.nanoTime() - t0) / 1e9
        (dt, n)
      }.sortBy(_._1).apply(1) match {
        case (dt, n) => println(f"$label%-28s median=$dt%.3f rows=$n")
      }
    }

    import graft.operators.{Dedup, TextOps}
    // stage 1: window frame alone (tokenize + shingle + md5, the
    // windowFrame formulation inlined — it is private to operators);
    // `old` keeps the replaced HOF form for A/B
    val old = docs.select(col("doc_id").as("id"), col("text").as("__text"))
      .select(col("id"), TextOps.tokens(col("__text")).as("__toks"))
      .select(col("id"), explode(TextOps.wordShingles(col("__toks"), 10)).as("g"))
      .select(col("id"), TextOps.md5s(col("g")).as("h"))
    time("windowFrame OLD hof")(old.count())
    val w = docs.select(col("doc_id").as("id"), col("text").as("__text"))
      .select(col("id"), TextOps.tokens(col("__text")).as("__toks"))
      .select(col("id"), graft.functions.SubstringGenerators
        .wordShingleWindows(col("__toks"), 10).as("g"))
      .select(col("id"), TextOps.md5s(col("g")).as("h"))
    time("windowFrame count")(w.count())
    // stage 1b: window frame + one h-keyed codegen count agg (hot_windows shape)
    time("count-agg by h")(w.groupBy("h").agg(count(lit(1))).count())
    // stage 2: grouped collect (capped agg) — the one exchange + object agg
    val g = w.groupBy("h")
      .agg(graft.functions.CappedCollect.collectSortedCapped(col("h"), 1024).as("__ids"))
      .filter(col("__ids").isNotNull)
    time("capped-collect by h")(g.count())
    // stock collect_list for comparison
    time("collect_list by h")(
      w.groupBy("h").agg(sort_array(collect_list(col("id"))).as("__ids"))
        .filter(size(col("__ids")) <= 1024).count())
    // stage 3: full pairs
    time("substringPairs full")(
      Dedup.substringPairs(docs, "doc_id", "text", 10).count())
    // long (xxhash64) keys instead of md5 hex strings on the same stages
    val w64 = docs.select(col("doc_id").as("id"), col("text").as("__text"))
      .select(col("id"), TextOps.tokens(col("__text")).as("__toks"))
      .select(col("id"), graft.functions.SubstringGenerators
        .wordShingleWindows(col("__toks"), 10).as("g"))
      .select(col("id"), xxhash64(col("g")).as("h"))
    time("windowFrame64 count")(w64.count())
    time("capped-collect64 by h")(
      w64.groupBy("h")
        .agg(graft.functions.CappedCollect
          .collectSortedCapped(col("id"), 1024).as("__ids"))
        .filter(col("__ids").isNotNull).count())
    // 16-byte binary md5 keys: keeps the 128-bit exactness claim, halves
    // the key bytes vs the 32-char hex string
    val wB = docs.select(col("doc_id").as("id"), col("text").as("__text"))
      .select(col("id"), TextOps.tokens(col("__text")).as("__toks"))
      .select(col("id"), graft.functions.SubstringGenerators
        .wordShingleWindows(col("__toks"), 10).as("g"))
      .select(col("id"), unhex(TextOps.md5s(col("g"))).as("h"))
    time("capped-collectB16 by h")(
      wB.groupBy("h")
        .agg(graft.functions.CappedCollect
          .collectSortedCapped(col("id"), 1024).as("__ids"))
        .filter(col("__ids").isNotNull).count())
    time("pairsB16 full")(
      wB.groupBy("h")
        .agg(graft.functions.CappedCollect
          .collectSortedCapped(col("id"), 1024).as("__ids"))
        .filter(col("__ids").isNotNull)
        .filter(size(col("__ids")) >= 2)
        .select(graft.functions.SubstringGenerators
          .arrayPairs(col("__ids")).as(Seq("a", "b")))
        .groupBy("a", "b").agg(count(lit(1))).count())
    // two independently-seeded xxhash64 halves: 128 combined bits over
    // two primitive long agg keys
    val w2 = docs.select(col("doc_id").as("id"), col("text").as("__text"))
      .select(col("id"), TextOps.tokens(col("__text")).as("__toks"))
      .select(col("id"), graft.functions.SubstringGenerators
        .wordShingleWindows(col("__toks"), 10).as("g"))
      .select(col("id"), xxhash64(col("g")).as("h1"),
        xxhash64(col("g"), lit(1)).as("h2"))
    time("pairs2x64 full")(
      w2.groupBy("h1", "h2")
        .agg(graft.functions.CappedCollect
          .collectSortedCapped(col("id"), 1024).as("__ids"))
        .filter(col("__ids").isNotNull)
        .filter(size(col("__ids")) >= 2)
        .select(graft.functions.SubstringGenerators
          .arrayPairs(col("__ids")).as(Seq("a", "b")))
        .groupBy("a", "b").agg(count(lit(1))).count())
    time("pairs64 full")(
      w64.groupBy("h")
        .agg(graft.functions.CappedCollect
          .collectSortedCapped(col("id"), 1024).as("__ids"))
        .filter(col("__ids").isNotNull)
        .filter(size(col("__ids")) >= 2)
        .select(graft.functions.SubstringGenerators
          .arrayPairs(col("__ids")).as(Seq("a", "b")))
        .groupBy("a", "b").agg(count(lit(1))).count())
    spark.stop()
  }
}
