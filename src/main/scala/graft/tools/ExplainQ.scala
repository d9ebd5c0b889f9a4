package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan inspector: prints the formatted physical plan of a registered
  * query plus summary counts (exchanges, scans, joins, codegen spans)
  * — the feedback loop for "is this the plan you'd want" iteration.
  *
  * Usage: runMain graft.tools.ExplainQ <queryName> [sfDir]
  */
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.ops.Registry.byName(name).run(spark, sfDir)
    val formatted = org.apache.spark.sql.execution.ExplainMode
      .fromString("formatted")
    val text = df.queryExecution.explainString(formatted)
    println(text)
    // Count from the formatted text, not the SparkPlan tree:
    // `sparkPlan` predates EnsureRequirements (no Exchange nodes yet)
    // and `executedPlan` is an AdaptiveSparkPlanExec that hides its
    // inner plan from `children` — the formatted string is the one
    // view that includes the prepared plan AND cached-relation
    // (ensurePersisted) subtrees. Node detail lines look like
    // "(123) NodeName [codegen id : n]".
    val nodeLines = text.linesIterator
      .map(_.trim).filter(_.matches("""\(\d+\) .*""")).toSeq
      .map(_.replaceFirst("""\(\d+\) """, ""))
    def n(frag: String): Int = nodeLines.count(_.contains(frag))
    println(s"[explain] nodes=${nodeLines.size} " +
      s"shuffles=${n("Exchange") - n("BroadcastExchange")} " +
      s"broadcasts=${n("BroadcastExchange")} " +
      s"scans=${n("Scan")} joins=${n("Join")} " +
      s"codegen_spans=${nodeLines.flatMap(l =>
        "codegen id : (\\d+)".r.findFirstMatchIn(l).map(_.group(1))).distinct.size}")
    spark.stop()
  }
}
