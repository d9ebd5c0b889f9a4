package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line.
  *
  * Methodology (round-2/3 advice): each query is forced through a
  * `noop`-format write — `count()` lets Catalyst prune unreferenced
  * projections, so scalar-heavy queries would benchmark a column-pruned
  * scan instead of the operator. One warm-up pass precedes measurement
  * (JIT + parquet footer cache), then the median of 3 timed runs is
  * reported so single-run JIT/GC noise cannot fake a regression.
  * Failed queries are reported with ok:false and excluded from the total
  * so a broken query can never masquerade as a fast one.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // pipeline-input materialization mode (see Patterns.ensurePersisted)
      .config("spark.graft.pipelineInput",
        sys.env.getOrElse("GRAFT_PIPELINE_INPUT", "checkpoint"))
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries TIMESTAMP(NANOS) — surfaced as LONG nanos.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def once(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    // Local-dev filter: bench only the named queries (comma-separated).
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)

    case class R(name: String, sec: Double, ok: Boolean)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      try {
        once(fn) // warm-up, untimed
        val times = Seq.fill(iters)(once(fn)).sorted
        R(name, times(times.size / 2), ok = true)
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          R(name, 0.0, ok = false)
      }
    }
    val qs = results
      .map(r => s""""${r.name}":${if (r.ok) f"${r.sec}%.3f" else s"""{"sec":${f"${r.sec}%.3f"},"ok":false}"""}""")
      .mkString("{", ",", "}")
    val total = results.filter(_.ok).map(_.sec).sum
    val nFail = results.count(!_.ok)
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$nFail,"sf":"$sfDir"}""")
    spark.stop()
    if (nFail > 0) sys.exit(1)
  }
}
