package graft

import org.apache.spark.sql.SparkSession

// Throwaway plan inspection — not part of the library surface.
object DebugPlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = ops.Registry.byName("q_entity_pipeline").run(spark, "/root/testdata/sf0.01")
    df.write.format("noop").mode("overwrite").save() // let AQE finalize
    val plan = df.queryExecution.executedPlan.toString
    println("[debug] SortMergeJoin count: " + plan.split("\n").count(_.contains("SortMergeJoin")))
    println("[debug] BroadcastHashJoin count: " + plan.split("\n").count(_.contains("BroadcastHashJoin")))
    println("[debug] Exchange count: " + plan.split("\n").count(_.contains("Exchange")))
    println("[debug] checkpoint scans: " + plan.split("\n").count(_.contains("Scan ExistingRDD")))
    spark.stop()
  }
}
