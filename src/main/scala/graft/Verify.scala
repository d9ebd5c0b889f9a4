package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // args: sfDir outDir [comma-separated query-name filter (local dev)]
    val (sfDir, outDir) = (args(0), args(1))
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // data-sized shuffles: start wide, AQE coalesces (see Tuning)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        graft.run.Tuning.initialPartitions(sfDir).toString)
      .config("spark.sql.session.timeZone", "UTC")
      // legacy testdata compat: ns-encoded events.ts surfaces as LONG nanos
      // (a no-op on the current TIMESTAMP_MICROS testdata — Td.tsUs adapts).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // free checkpoint/broadcast blocks between queries (see Bench)
      .config("spark.cleaner.periodicGC.interval", "30s")
      // generated-class cache: battery >> default 100 entries (see Bench)
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // Drop this query's cached pipeline inputs (ensurePersisted's
      // default persists per distinct canonical plan, and ~100 queries
      // share one session here — without this the CacheManager grows
      // monotonically and spilled blocks accumulate on disk for the
      // whole run), then let the ContextCleaner drop checkpoint blocks.
      spark.catalog.clearCache()
      System.gc()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
