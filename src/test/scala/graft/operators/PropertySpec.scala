package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Property tests: distributed operators vs naive single-threaded reference
  * implementations on seeded random data — guards the partitioning and
  * carry logic, not just hand-picked cases. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(77)

  test("greedyPerTopic matches a sequential per-topic fold on random streams") {
    (1 to 6).foreach { _ =>
      val topics = Seq("A", "B", "C")
      val rows = (1 to 300).map { _ =>
        (rnd.between(0L, 500L) * 1000000L, topics(rnd.nextInt(3)), rnd.nextDouble())
      }.distinct
      val intervalUs = rnd.between(5L, 60L) * 1000000L

      val df = rows.toDF("t_us", "topic", "value")
        .select(timestamp_micros($"t_us").as("time"), $"topic", $"value")
      val got = Sample.greedyPerTopic(df, intervalUs * 1000L)
        .select(unix_micros($"time"), $"topic").as[(Long, String)].collect().toSet

      // naive reference: per topic, sort by time and carry.
      // (.toSeq matters: Map.flatMap over pair results builds a Map and
      // collapses equal timestamps across topics)
      val expected = rows.groupBy(_._2).toSeq.flatMap { case (topic, rs) =>
        var last = Long.MinValue
        rs.sortBy(_._1).flatMap { case (t, _, _) =>
          if (last == Long.MinValue || t >= last + intervalUs) { last = t; Some((t, topic)) }
          else None
        }
      }.toSet
      // ties within a topic at the same t_us: both keep exactly one — compare
      // kept timestamps per topic (values may differ on ties)
      assert(got == expected, s"interval=$intervalUs")
    }
  }

  test("distributed components match driver union-find on random graphs") {
    // same edge list through both paths (localThreshold gates which runs);
    // any divergence in the propagation loop, convergence detection, or
    // partitioning shows up as a survivor mismatch
    for (trial <- 1 to 3) {
      val n = 30 + rnd.nextInt(40)
      val edges = Seq.fill(n) {
        (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong)
      }.filter { case (a, b) => a != b }
      val df = edges.toDF("a", "b")
      val local = Dedup.connectedComponents(df, localThreshold = Long.MaxValue)
        .as[(Long, Long)].collect().toMap
      val dist = Dedup.connectedComponents(df, maxIters = 40, localThreshold = 0)
        .as[(Long, Long)].collect().toMap
      assert(local == dist, s"trial $trial: $local vs $dist")
    }
  }

  test("RangeJoin matches a naive interval scan on random data") {
    (1 to 5).foreach { _ =>
      val points = (1 to 60).map(_ => rnd.between(0L, 400L) * 1000000L).distinct
      val intervals = (1 to 25).map { i =>
        val s = rnd.between(0L, 380L) * 1000000L
        (i.toLong, s, s + rnd.between(1L, 50L) * 1000000L)
      }
      val bucketUs = rnd.between(2L, 40L) * 1000000L

      val p = points.toDF("p_us").select(timestamp_micros($"p_us").as("pt"))
      val iv = intervals.toDF("id", "s_us", "e_us")
        .select($"id", timestamp_micros($"s_us").as("s"), timestamp_micros($"e_us").as("e"))
      val got = RangeJoin.pointInInterval(p, iv, "pt", "s", "e", bucketUs)
        .select(unix_micros($"pt"), $"id").as[(Long, Long)].collect().toSet

      val expected = (for {
        t <- points
        (id, s, e) <- intervals
        if t >= s && t < e
      } yield (t, id)).toSet
      assert(got == expected, s"bucket=$bucketUs")
    }
  }

  test("AsOfJoin matches a naive most-recent-match scan on random data") {
    (1 to 6).foreach { _ =>
      val keys = Seq("k1", "k2")
      val left = (1 to 80).map(i =>
        (i.toLong, keys(rnd.nextInt(2)), rnd.between(0L, 1000L) * 1000000L))
      val right = (1 to 60).map(i =>
        (keys(rnd.nextInt(2)), rnd.between(0L, 1000L) * 1000000L, i.toDouble))
        // unique (key, time) so the expected "latest" row is unambiguous
        .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq

      val l = left.toDF("id", "k", "t_us")
        .select($"id", $"k", timestamp_micros($"t_us").as("t"))
      val r = right.toDF("k", "q_us", "payload")
        .select($"k", timestamp_micros($"q_us").as("qt"), $"payload")

      val got = AsOfJoin.lastOnOrBefore(l, r, Seq("k"), "t", "qt")
        .select($"id", $"payload").as[(Long, Option[Double])].collect().toMap

      val expected = left.map { case (id, k, t) =>
        val candidates = right.filter(x => x._1 == k && x._2 <= t)
        id -> (if (candidates.isEmpty) None
               else Some(candidates.maxBy(_._2)._3))
      }.toMap
      assert(got == expected)
    }
  }
}
