package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Stage-level profile of one registered query: runs it once (same
  * noop-write forcing as Bench) under a listener and prints each
  * stage's wall time, task time, records and shuffle volumes, largest
  * first — the "where do the seconds go" view `explain` can't give.
  *
  * Usage: `runMain graft.tools.ProfileQuery <queryName> [sfDir]`.
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ProfileQuery <queryName> [sfDir]")
    val name = args(0)
    val sfDir =
      if (args.length > 1) args(1)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "256")
      .config("spark.memory.storageFraction", "0.2")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    final case class St(id: Int, name: String, wallMs: Long, taskMs: Long,
                        records: Long, shuffleReadMb: Double, shuffleWriteMb: Double)
    val stages = mutable.ArrayBuffer.empty[St]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        val wall = (for (a <- i.completionTime; b <- i.submissionTime)
          yield a - b).getOrElse(0L)
        val m = i.taskMetrics
        stages += St(i.stageId, i.name.takeWhile(_ != '\n').take(90), wall,
          m.executorRunTime, m.inputMetrics.recordsRead,
          m.shuffleReadMetrics.totalBytesRead / 1e6,
          m.shuffleWriteMetrics.bytesWritten / 1e6)
      }
    })

    val fn = graft.SparkEntry.queries(name)
    if (sys.env.contains("GRAFT_PROFILE_EXPLAIN"))
      println(fn(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    val t0 = System.nanoTime()
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    val cold = (System.nanoTime() - t0) / 1e9
    val coldStages = stages.length
    val t1 = System.nanoTime()
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    val warm = (System.nanoTime() - t1) / 1e9
    println(f"[profile] $name cold=$cold%.2fs ($coldStages stages) warm=$warm%.2fs (${stages.length - coldStages} stages)")
    val warmStages = stages.drop(coldStages)
    println(f"${"stage"}%6s ${"wall_s"}%8s ${"task_s"}%8s ${"records"}%12s ${"shRd_MB"}%9s ${"shWr_MB"}%9s  name")
    warmStages.sortBy(-_.wallMs).take(30).foreach { s =>
      println(f"${s.id}%6d ${s.wallMs / 1e3}%8.2f ${s.taskMs / 1e3}%8.2f ${s.records}%12d ${s.shuffleReadMb}%9.1f ${s.shuffleWriteMb}%9.1f  ${s.name}")
    }
    val wallSum = warmStages.map(_.wallMs).sum / 1e3
    println(f"[profile] warm stage-wall sum=$wallSum%.1fs (gaps to $warm%.1fs = driver/planning/codegen)")
    spark.stop()
  }
}
