package graft.ops

import graft.SparkSuite

/** Co-located joins via bucketing (SURVEY.md §4 physical notes): two
  * tables bucketed on the join key join WITHOUT a shuffle — the pattern
  * that amortizes the quad table's subject partitioning across all nine
  * pipelines at 100 TB.
  */
class BucketingSpec extends SparkSuite {

  test("join of co-bucketed tables plans no Exchange") {
    val s = spark
    import s.implicits._
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    try {
      (1 to 1000).map(i => (i.toLong % 100, s"o$i")).toDF("custkey", "o")
        .write.bucketBy(8, "custkey").sortBy("custkey")
        .mode("overwrite").saveAsTable("b_orders")
      (0L until 100L).map(i => (i, s"c$i")).toDF("custkey", "c")
        .write.bucketBy(8, "custkey").sortBy("custkey")
        .mode("overwrite").saveAsTable("b_customer")
      // disable broadcast so the join strategy is decided by bucketing
      val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = spark.table("b_orders")
          .join(spark.table("b_customer"), "custkey")
        val plan = joined.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange"),
          s"bucketed join still shuffles:\n$plan")
        assert(joined.count() == 1000)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
