package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.ops.Td
import graft.text.CorpusPrep

/** Scale probe for the MinHash ingestion loop (the operator behind
  * `q_stream_ingest_dedup` / `q_stream_ingest_rebuild`): drives the
  * build → (pairs → extend [→ rebuild]) chain batch-by-batch over a
  * ScaleUp corpus and prints ONE LINE PER BATCH — wall seconds split
  * into the pairing join and the extend, plus admitted/pair counts —
  * so the trend the scaladoc claims ("per-batch cost = sign the batch
  * + two bounded equi-joins + delta-sized extend") is measured, not
  * asserted. The streaming file-source harness is deliberately
  * omitted: its replay machinery is gated at sf0.1; what can break at
  * 30×/90× is the INDEX side (bucket-table growth, chained-extend plan
  * depth), which this loop exercises identically via foreachBatch's
  * own body.
  *
  * Batch plan: documents split by `doc_id % (nBatches+1)` — slice 0
  * builds the standing index, slices 1..n arrive as batches. Each
  * batch additionally carries near-dup mutations (`substring 12`) of
  * a 1-in-4 sample of the PREVIOUS slice (ids offset by +5e7, clear of
  * ScaleUp's 1e8 copy bands), so the pairing join always has real
  * matches to verify, like the gated loop.
  *
  * With `rebuild=1` the loop consumes `needsRebuild` exactly as
  * `q_stream_ingest_rebuild` does (fresh `minhashBuild` over the
  * accumulated admitted corpus when extends outgrow the build) —
  * across a doubling corpus this fires O(log n) times and the probe
  * prints the rebuild's own wall beside the batch's.
  *
  * Mode `ann` runs the IVF sibling (`q_stream_ingest_ann`'s chain:
  * `ivfSearch` top-1 cosine ≥ 0.9 → `ivfExtend` → optional rebuild)
  * over the embeddings table. The interesting scale question differs
  * from MinHash: under FROZEN geometry the per-probe candidate scan is
  * nprobe × occupancy, and occupancy grows linearly as extends pile
  * into a fixed cell count — so per-batch cost RISES without the
  * rebuild, and the rebuild (re-deriving cells ∝ √n) is what flattens
  * it. Run with rebuild 0 vs 1 to see the divergence the trigger
  * exists to prevent.
  *
  * Usage: runMain graft.tools.IngestProbe <sfDir> [nBatches] [rebuild 0|1] [minhash|ann]
  */
object IngestProbe {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println(
        "usage: runMain graft.tools.IngestProbe <sfDir> [nBatches] [rebuild 0|1] [minhash|ann]")
      sys.exit(2)
    }
    val sfDir = args(0)
    val nBatches = if (args.length > 1) args(1).toInt else 6
    val doRebuild = args.length > 2 && args(2) == "1"
    val mode = if (args.length > 3) args(3) else "minhash"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Heavy-stage reporter with SPILL metrics — names the cause when a
    // batch's cost steps instead of trending (memory boundary vs
    // candidate volume).
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val i = sc.stageInfo
          val secsW = (i.completionTime.getOrElse(0L) -
            i.submissionTime.getOrElse(0L)) / 1e3
          val m = i.taskMetrics
          if (secsW > 2.0)
            println(f"  stage ${i.stageId}%4d ${secsW}%6.1f s tasks=${i.numTasks} " +
              f"cpu=${m.executorCpuTime / 1e9}%.1f " +
              f"sr=${m.shuffleReadMetrics.recordsRead} " +
              f"spillMem=${m.memoryBytesSpilled >> 20}MB " +
              f"spillDisk=${m.diskBytesSpilled >> 20}MB")
        }
      })

    def secs[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }

    if (mode == "ann") { runAnn(spark, sfDir, nBatches, doRebuild); return }

    def quality(c: org.apache.spark.sql.Column) =
      CorpusPrep.qualityFilter(c, CorpusPrep.Quality())
    val docs = Td(spark, sfDir, "documents").select(col("doc_id"), col("text"))
    val mod = nBatches + 1
    def slice(i: Int) = docs.filter(col("doc_id") % mod === i)

    val (base, buildS) = secs {
      val b = slice(0).filter(quality(col("text"))).localCheckpoint()
      (b, Dedup.minhashBuild(b, "doc_id", "text",
        numHashes = 64, bands = 16, shingleK = 3))
    }
    var corpus = base._1
    var model = base._2
    println(f"build: n=${model.builtN} wall=${buildS}%.1f s " +
      s"(sfDir=$sfDir batches=$nBatches rebuild=$doRebuild)")

    var rebuilds = 0
    for (i <- 1 to nBatches) {
      // novel slice ∪ near-dup mutations of 1/4 of the PREVIOUS slice
      val batch = slice(i)
        .unionByName(slice(i - 1).filter(col("doc_id") % 4 === 0)
          .select((col("doc_id") + 50000000L).as("doc_id"),
            substring(col("text"), 12, 1000000).as("text")))
      val (b, signS) = secs {
        batch.filter(quality(col("text"))).localCheckpoint()
      }
      val ((pairs, nPairs), pairS) = secs {
        val p = Dedup.minhashDeltaPairs(model, b, "doc_id", "text",
          minJaccard = 0.5).localCheckpoint()
        (p, p.count())
      }
      val ((novel, nNovel), novelS) = secs {
        val nv = b.join(pairs.select(col("delta_id").as("doc_id")).distinct(),
          Seq("doc_id"), "left_anti").localCheckpoint()
        (nv, nv.count())
      }
      val (_, extendS) = secs {
        model = Dedup.minhashExtend(model, novel, "doc_id", "text")
      }
      corpus = corpus.unionByName(novel).localCheckpoint()
      var rebuildS = 0.0
      if (doRebuild && model.needsRebuild) {
        rebuilds += 1
        val (m2, rs) = secs {
          Dedup.minhashBuild(corpus, "doc_id", "text",
            numHashes = 64, bands = 16, shingleK = 3)
        }
        model = m2
        rebuildS = rs
      }
      println(f"batch $i: in=${nNovel + nPairs} pairs=$nPairs admitted=$nNovel " +
        f"indexN=${model.builtN + model.extendedN} " +
        f"sign=${signS}%.1f pair=${pairS}%.1f novel=${novelS}%.1f " +
        f"extend=${extendS}%.1f rebuild=${rebuildS}%.1f " +
        f"total=${signS + pairS + novelS + extendS + rebuildS}%.1f s")
    }
    println(s"done: rebuilds=$rebuilds finalN=${model.builtN + model.extendedN}")
    spark.stop()
  }

  /** ANN-mode loop — see the object scaladoc. */
  private def runAnn(spark: SparkSession, sfDir: String,
                     nBatches: Int, doRebuild: Boolean): Unit = {
    import graft.sim.Similarity
    def secs[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }
    val emb = Td(spark, sfDir, "embeddings").select(col("vec_id"), col("embedding"))
    val mod = nBatches + 1
    def slice(i: Int) = emb.filter(col("vec_id") % mod === i)
    def mut(c: org.apache.spark.sql.Column) =
      concat(array(c.getItem(0) + lit(0.25f)), slice_(c))
    def slice_(c: org.apache.spark.sql.Column) =
      org.apache.spark.sql.functions.slice(c, 2, 1000000)

    val (m0, buildS) = secs {
      val b = slice(0).localCheckpoint()
      (b, Similarity.ivfBuild(b))
    }
    var corpus = m0._1
    var model = m0._2
    println(f"build: n=${model.builtN} cells=${model.cells} " +
      f"nprobe=${model.nprobe} wall=${buildS}%.1f s " +
      s"(sfDir=$sfDir batches=$nBatches rebuild=$doRebuild mode=ann)")
    var rebuilds = 0
    for (i <- 1 to nBatches) {
      val (b, signS) = secs {
        slice(i)
          .unionByName(slice(i - 1).filter(col("vec_id") % 4 === 0)
            .select((col("vec_id") + 50000000L).as("vec_id"),
              mut(col("embedding")).as("embedding")))
          .localCheckpoint()
      }
      val ((pairs, nPairs), pairS) = secs {
        // bulk path: a ~10k-probe batch is the non-broadcast regime
        // the r15 strategy split exists for (see pqSearch scaladoc)
        val p = Similarity.ivfSearch(model, b, topK = 1,
            broadcastProbes = false)
          .filter(col("cos") >= 0.9)
          .select(col("probe_id"), col("neighbor_id")).localCheckpoint()
        (p, p.count())
      }
      val ((novel, nNovel), novelS) = secs {
        val nv = b.join(pairs.select(col("probe_id").as("vec_id")).distinct(),
          Seq("vec_id"), "left_anti").localCheckpoint()
        (nv, nv.count())
      }
      val (_, extendS) = secs { model = Similarity.ivfExtend(model, novel) }
      corpus = corpus.unionByName(novel).localCheckpoint()
      var rebuildS = 0.0
      if (doRebuild && model.needsRebuild) {
        rebuilds += 1
        val (m2, rs) = secs { Similarity.ivfBuild(corpus) }
        model = m2
        rebuildS = rs
      }
      println(f"batch $i: in=${nNovel + nPairs} pairs=$nPairs admitted=$nNovel " +
        f"indexN=${model.builtN + model.extendedN} cells=${model.cells} " +
        f"sign=${signS}%.1f pair=${pairS}%.1f novel=${novelS}%.1f " +
        f"extend=${extendS}%.1f rebuild=${rebuildS}%.1f " +
        f"total=${signS + pairS + novelS + extendS + rebuildS}%.1f s")
    }
    println(s"done: rebuilds=$rebuilds finalN=${model.builtN + model.extendedN}")
    spark.stop()
  }
}
