package graft.run

import java.util.concurrent.atomic.{AtomicLong, AtomicReference}

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}

/** Progress/stats listener (SURVEY.md §2.10 #87).
  *
  * The reference tracks statementIndex / processedBatches and logs % +
  * ETA every 100 batches (typescript/src/2_database_load.ts:104-113,
  * stats.ts:1-16). The Spark-native equivalent is a `SparkListener`:
  * records and bytes come from task metrics — no instrumentation inside
  * operators, no driver-side counting loops.
  */
final class StatsListener(totalRecordsHint: Option[Long] = None) extends SparkListener {
  val recordsRead = new AtomicLong(0)
  val bytesRead = new AtomicLong(0)
  val recordsWritten = new AtomicLong(0)
  val shuffleBytes = new AtomicLong(0)
  val tasksCompleted = new AtomicLong(0)
  val lastStage = new AtomicReference[String]("")

  override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
    val m = t.taskMetrics
    if (m != null) {
      recordsRead.addAndGet(m.inputMetrics.recordsRead)
      bytesRead.addAndGet(m.inputMetrics.bytesRead)
      recordsWritten.addAndGet(m.outputMetrics.recordsWritten)
      shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      tasksCompleted.incrementAndGet()
    }
  }

  override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
    lastStage.set(s.stageInfo.name)

  /** Progress fraction against the hint, when one was provided —
    * mirrors statementIndex ÷ numberOfStatements (stats.ts:9-11). */
  def progress: Option[Double] =
    totalRecordsHint.filter(_ > 0).map(t => recordsRead.get.toDouble / t)

  def summary: String =
    s"records_read=${recordsRead.get} bytes_read=${bytesRead.get} " +
      s"records_written=${recordsWritten.get} shuffle_bytes=${shuffleBytes.get} " +
      s"tasks=${tasksCompleted.get}" +
      progress.map(p => f" progress=${p * 100}%.1f%%").getOrElse("")
}
