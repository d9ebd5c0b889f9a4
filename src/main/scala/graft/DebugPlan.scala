package graft

import org.apache.spark.sql.SparkSession

// Throwaway plan inspection — not part of the library surface.
object DebugPlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.graft.pipelineInput", "checkpoint")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = ops.Registry.byName("q_entity_pipeline").run(spark, "/root/testdata/sf0.1")
    df.write.format("noop").mode("overwrite").save()
    // AQE-final plan of the executed write is not reachable from df;
    // approximate by the pre-AQE physical plan's structure.
    val plan = df.queryExecution.executedPlan.toString
    def cnt(p: String) = plan.split("\n").count(_.contains(p))
    println("[debug] base aggregates planned: " +
      plan.split("\n").count(l => l.contains("HashAggregate") && l.contains("__t")))
    println("[debug] Exchange: " + cnt("Exchange"))
    println("[debug] checkpoint scans: " + cnt("Scan ExistingRDD"))
  }
}
