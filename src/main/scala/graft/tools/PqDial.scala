package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Td
import graft.sim.Similarity

/** Measures IVF-PQ's cells dial (round-13): at a fixed `nprobe`, more
  * cells = a smaller scanned fraction = less ADC work per probe — the
  * intended scale lever ("grow cells with n, hold nprobe") — at the
  * price of recall on UNCLUSTERED data, where recall ≈ the fraction
  * scanned. One row per cells setting: wall seconds and recall@3
  * against the exact brute-force truth, so the trade the scaladoc
  * claims is a measured curve.
  *
  * Usage: runMain graft.tools.PqDial <sfDir> [cellsList] [nprobe] [k]
  * (`k` = PQ codes per subspace — the ADC resolution dial; default 16
  * = 4-bit codes, 256 = the 8-bit industry standard.)
  */
object PqDial {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: runMain graft.tools.PqDial <sfDir> [cells,...] [nprobe]")
      sys.exit(2)
    }
    val sfDir = args(0)
    // A non-positive entry (or "derived") sweeps the corpus-derived
    // geometry: cells = max(16, ceil(sqrt(n)/2)), nprobe = max(8, ceil(sqrt(cells))).
    val cellsList: Seq[Int] =
      if (args.length > 1) args(1).split(",").toSeq
        .map(s => if (s.trim == "derived") -1 else s.trim.toInt)
      else Seq(16, 64, 256, -1)
    val nprobe = if (args.length > 2) args(2).toInt else 8
    val pqK = if (args.length > 3) args(3).toInt else 16
    val shortlist = if (args.length > 4) args(4).toInt else -1
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
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = Td(spark, sfDir, "embeddings")
    val probes = emb.filter(col("vec_id") < 5)
    val truth = Similarity.bruteTopK(emb, probes, k = 3)
      .select(col("probe_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"| cells | nprobe | scanned | secs | recall@3 |")
    println(s"| --- | --- | --- | --- | --- |")
    val n = emb.count()
    cellsList.foreach { cellsArg =>
      val derived = cellsArg <= 0
      val cells = if (derived) Similarity.derivedCells(n) else cellsArg
      val np = if (derived) Similarity.derivedNprobe(cells)
               else math.min(nprobe, cells)
      val t0 = System.nanoTime()
      val got = Similarity.ivfPqTopK(emb, probes, topK = 3,
        cells = cells, nprobe = np, k = pqK, shortlist = shortlist)
        .select(col("probe_id"), col("neighbor_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val secs = (System.nanoTime() - t0) / 1e9
      val recall = (got & truth).size.toDouble / truth.size
      val frac = np.toDouble / cells
      val tag = if (derived) " (derived)" else ""
      println(f"| $cells$tag | $np | $frac%.2f | $secs%.1f | $recall%.2f |")
      spark.catalog.clearCache(); System.gc(); Thread.sleep(200)
    }
    spark.stop()
  }
}
