package graft
import org.apache.spark.sql.SparkSession
/** Benchmark main: runs every registered query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line. Failed queries are
  * reported with ok:false and excluded from the total so a broken query
  * can never masquerade as a fast one. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    case class R(name: String, sec: Double, ok: Boolean)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false
        }
      R(name, (System.nanoTime() - t0) / 1e9, ok)
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
