package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// Throwaway plan inspection — not part of the library surface.
object DebugPlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")

    def shape(tag: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      val plan = df.queryExecution.executedPlan.toString
      def cnt(p: String) = plan.split("\n").count(_.contains(p))
      df.write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[debug] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        s"hash=${cnt("HashAggregate")} sort=${cnt("SortAggregate")} obj=${cnt("ObjectHashAggregate")}")
    }

    shape("min(string)")(li.groupBy(col("l_orderkey"))
      .agg(min(col("l_returnflag"))))
    shape("min(struct(int,string))")(li.groupBy(col("l_orderkey"))
      .agg(min(struct(col("l_linenumber"), col("l_returnflag")))))
    shape("min(encoded string)")(li.groupBy(col("l_orderkey"))
      .agg(min(concat(lpad(col("l_linenumber"), 2, "0"), col("l_returnflag")))))
  }
}
