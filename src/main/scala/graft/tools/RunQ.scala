package graft.tools

import org.apache.spark.sql.SparkSession

/** Run one registered query and print its rows — the quick "what does
  * this gate actually return on this corpus" loop (ExplainQ shows the
  * plan; this shows the data).
  *
  * Usage: runMain graft.tools.RunQ <queryName> [sfDir] [maxRows]
  */
object RunQ {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: runMain graft.tools.RunQ <queryName> [sfDir] [maxRows]")
      sys.exit(2)
    }
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val maxRows = if (args.length > 2) args(2).toInt else 50
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val q = graft.SparkEntry.queries.getOrElse(name,
      { System.err.println(s"unknown query $name"); sys.exit(2) })
    val df = q(spark, sfDir)
    df.show(maxRows, truncate = false)
    println(s"rows: ${df.count()}")
    spark.stop()
  }
}
