package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Td
import graft.sim.Similarity

/** Measures the bulk (non-broadcast) PQ search path with a genuinely
  * large probe batch — the r14 verdict's open scale question: the
  * `pqSearch(broadcastProbes = false)` strategy split exists FOR big
  * probe sets (offline join-everything-to-its-neighbors jobs), but had
  * only ever run under the 5-probe oracle gate. Here the probe batch
  * is a deterministic `vec_id % <mod> = 0` slice of the corpus itself
  * (default 10%), searched against the PQ index via the (cell)
  * equi-join — never probes × corpus.
  *
  * Prints one row per phase: build secs, bulk-search secs (count of
  * (probe, neighbor) rows as the action), and rows/probe as a sanity
  * check that every probe produced topK hits.
  *
  * The same measurement covers `ivfSearch(broadcastProbes = false)`
  * (full-precision candidates, no ADC stage) via `mode=ivf`.
  *
  * Usage: runMain graft.tools.BulkProbe <sfDir> [probeMod] [topK] [shortlist] [mode]
  */
object BulkProbe {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println(
        "usage: runMain graft.tools.BulkProbe <sfDir> [probeMod] [topK] [shortlist] [pq|ivf|size]")
      sys.exit(2)
    }
    val sfDir = args(0)
    val probeMod = if (args.length > 1) args(1).toInt else 10
    val topK = if (args.length > 2) args(2).toInt else 3
    val shortlist = if (args.length > 3) args(3).toInt else -1
    val mode = if (args.length > 4) args(4) else "pq"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        graft.run.Tuning.initialPartitions(sfDir).toString)
      .config("spark.memory.storageFraction", "0.2")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", sys.env.getOrElse("BULK_PROBE_UI", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Per-stage wall/task-time reporter: the dominant stage names the
    // bottleneck without the (disabled) UI.
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val i = sc.stageInfo
          val secs = (i.completionTime.getOrElse(0L) -
            i.submissionTime.getOrElse(0L)) / 1e3
          if (secs > 2.0) {
            val m = i.taskMetrics
            println(f"  stage ${i.stageId}%4d ${secs}%6.1f s " +
              s"tasks=${i.numTasks} " +
              f"cpu=${m.executorCpuTime / 1e9}%.1f " +
              f"in=${m.inputMetrics.recordsRead} " +
              f"sr=${m.shuffleReadMetrics.recordsRead} " +
              f"sw=${m.shuffleWriteMetrics.recordsWritten} " +
              f"out=${m.outputMetrics.recordsWritten}")
            // RDD scope names reveal which operators ran in this stage.
            println("        rdds: " + i.rddInfos.map(_.name).distinct
              .mkString(", ").take(200))
          }
        }
      })

    val emb = Td(spark, sfDir, "embeddings")
    val n = emb.count()
    // dim from the data, not a constant — the high-dim PQ-vs-IVF dial
    // feeds this tool 512/768-dim ScaleUp corpora (--dim).
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val probes = emb.filter(col("vec_id") % probeMod === 0)
    val nProbes = probes.count()
    println(s"corpus n=$n dim=$dim probes=$nProbes (1/$probeMod) topK=$topK mode=$mode")

    if (mode == "size") {
      // At-rest index-size measurement (the r16 refutation re-scoped
      // PQ's value to index FOOTPRINT — ~m bytes/vector of codes vs
      // dim×4 of full float vectors — but no byte number existed).
      // Saves both indexes and walks the files: `index/` is the
      // candidate-generation table each search scans (the honest
      // apples-to-apples footprint); PQ's `corpus/` — the exact
      // re-rank side a deployment may keep on cheaper storage — is
      // reported separately, as is the flat corpus parquet itself.
      def du(dir: String): Long = {
        val root = java.nio.file.Paths.get(dir)
        val st = java.nio.file.Files.walk(root)
        try st.filter(p => java.nio.file.Files.isRegularFile(p))
          .mapToLong(p => java.nio.file.Files.size(p)).sum()
        finally st.close()
      }
      graft.ops.Scratch.withDir("graft_size_ivf") { ivfDir =>
        graft.ops.Scratch.withDir("graft_size_pq") { pqDir =>
          val ivf = Similarity.ivfBuild(emb, dim = dim)
          Similarity.ivfSave(ivf, ivfDir)
          val pq = Similarity.pqBuild(emb, shortlist = shortlist, dim = dim)
          Similarity.pqSave(pq, pqDir)
          val bi = du(s"$ivfDir/index")
          val bp = du(s"$pqDir/index")
          val bc = du(s"$pqDir/corpus")
          println(f"at-rest: n=$n dim=$dim m=${pq.m} " +
            f"ivf_index_bytes=$bi pq_index_bytes=$bp " +
            f"ratio=${bi.toDouble / bp}%.1f " +
            f"pq_corpus_bytes=$bc " +
            f"ivf_bytes_per_vec=${bi.toDouble / n}%.1f " +
            f"pq_bytes_per_vec=${bp.toDouble / n}%.1f")
        }
      }
      spark.stop()
      return
    }

    var t0 = System.nanoTime()
    val search: () => org.apache.spark.sql.DataFrame = mode match {
      case "ivf" =>
        val model = Similarity.ivfBuild(emb, dim = dim)
        println(f"ivfBuild: ${(System.nanoTime() - t0) / 1e9}%.1f s " +
          s"cells=${model.cells} nprobe=${model.nprobe}")
        () => Similarity.ivfSearch(model, probes, topK = topK,
          broadcastProbes = false)
      case _ =>
        val model = Similarity.pqBuild(emb, shortlist = shortlist, dim = dim)
        println(f"pqBuild: ${(System.nanoTime() - t0) / 1e9}%.1f s")
        println(s"index partitions=${model.indexed.rdd.getNumPartitions} " +
          s"corpus2 partitions=${model.corpus2.rdd.getNumPartitions} " +
          s"cells=${model.cells} nprobe=${model.nprobe} shortlist=${model.shortlist}")
        () => Similarity.pqSearch(model, probes, topK = topK,
          broadcastProbes = false)
    }

    // Warm-up + N timed iterations (BULK_PROBE_ITERS, default 2); min
    // is the honest per-batch cost (the build is amortized across
    // batches by design). High-dim runs carry large JIT/GC variance on
    // early iterations — read the min, not the first number.
    val iters = sys.env.get("BULK_PROBE_ITERS").flatMap(_.toIntOption).getOrElse(2)
    (0 until (1 + iters)).foreach { i =>
      t0 = System.nanoTime()
      val pq = search()
      val rows = pq.collect().length
      val sec = (System.nanoTime() - t0) / 1e9
      val tag = if (i == 0) "warmup" else s"iter$i"
      println(f"bulkSearch[$tag]: $sec%.1f s rows=$rows rows/probe=${rows.toDouble / nProbes}%.2f")
      if (i == 0 && sys.env.contains("BULK_PROBE_EXPLAIN"))
        println(pq.queryExecution.executedPlan.toString.take(14000))
    }
    spark.stop()
  }
}
