package graft.operators


import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Bucketing for co-located joins: both sides written bucketed on the join
  * key join WITHOUT a shuffle exchange — the pre-partitioning strategy for
  * repeated large-fact joins at 100 TB (pay one shuffle at write time,
  * none per query). */
class BucketedJoinSpec extends SparkSpec {

  test("join of co-bucketed tables plans no shuffle exchange") {
    // default warehouse dir (spark-warehouse/, gitignored); tables dropped below
    val dir = "/root/testdata/sf0.001"

    Tables.orders(spark, dir).write
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("b_orders")
    Tables.customer(spark, dir).write
      .bucketBy(8, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("b_customer")

    // disable broadcast so the co-located path is what gets planned
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("b_orders")
        .join(spark.table("b_customer"),
          col("o_custkey") === col("c_custkey"))
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
      assert(!plan.contains("Exchange hashpartitioning"),
        s"co-bucketed join should not shuffle:\n$plan")
      // and it is correct
      val expected = Tables.orders(spark, dir)
        .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
        .count()
      assert(j.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
