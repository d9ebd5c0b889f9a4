package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan inspector: prints the formatted physical plan of a registered
  * query plus summary counts (shuffles, broadcasts, scans, joins)
  * — the feedback loop for "is this the plan you'd want" iteration.
  *
  * Usage:
  *   runMain graft.tools.ExplainQ <queryName> [sfDir]  — one query, full plan
  *   runMain graft.tools.ExplainQ all [sfDir]          — summary table of
  *     every registered query (markdown rows on stdout). Gates whose
  *     BUILDER executes work are skipped: the streaming replays run
  *     their whole query inside `run` (the plan of the memory-sink
  *     read-back is not the operator's plan), and q_jdbc_sink executes
  *     a Derby round trip.
  */
object ExplainQ {
  private val executingGates =
    Set("q_stream_sync", "q_stream_multisync", "q_stream_sessionize",
      "q_stream_dedup", "q_stream_join", "q_stream_join_outer",
      "q_stream_decontaminate", "q_stream_ingest_dedup",
      "q_stream_ingest_rebuild", "q_stream_ingest_ann", "q_jdbc_sink")

  private def counts(text: String): (Int, Int, Int, Int, Int) = {
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
    (nodeLines.size, n("Exchange") - n("BroadcastExchange"),
      n("BroadcastExchange"), n("Scan"), n("Join"))
  }

  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println(
        "usage: runMain graft.tools.ExplainQ <queryName>|all [sfDir]")
      sys.exit(2)
    }
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
    val formatted = org.apache.spark.sql.execution.ExplainMode
      .fromString("formatted")
    if (name == "all") {
      println("| query | nodes | shuffles | broadcasts | scans | joins |")
      println("| --- | --- | --- | --- | --- | --- |")
      graft.ops.Registry.all.map(_.name).sorted.foreach { q =>
        if (executingGates(q))
          // ASCII on purpose: an em-dash here reaches PLANS.md as "?"
          // when sbt's console charset isn't UTF-8 (the r15 doc-drift).
          println(s"| $q | builder | builder | builder | builder | builder |")
        else {
          val r = try {
            val df = graft.ops.Registry.byName(q).run(spark, sfDir)
            val (no, sh, bc, sc, jn) = counts(df.queryExecution.explainString(formatted))
            s"| $q | $no | $sh | $bc | $sc | $jn |"
          } catch { case e: Exception =>
            // Pad to the header's 6 columns so one failure doesn't
            // break the whole markdown table's rendering.
            val msg = Option(e.getMessage).getOrElse(e.getClass.getSimpleName)
              .replace("|", "/").take(60)
            s"| $q | failed: $msg | — | — | — | — |"
          }
          println(r)
          spark.catalog.clearCache()
        }
      }
    } else {
      val df = graft.ops.Registry.byName(name).run(spark, sfDir)
      val text = df.queryExecution.explainString(formatted)
      println(text)
      val (no, sh, bc, sc, jn) = counts(text)
      println(s"[explain] nodes=$no shuffles=$sh broadcasts=$bc scans=$sc joins=$jn")
    }
    spark.stop()
  }
}
