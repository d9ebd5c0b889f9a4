package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Td
import graft.text.CorpusPrep

/** Measures the exact-vs-Bloom decontamination crossover for real
  * (round-12 verdict task 6): at each test-set fraction of the
  * documents corpus, times the exact broadcast-set path and the
  * Bloom-prefilter path on identical inputs and prints one table row.
  * The point where the Bloom column dips under the exact column is the
  * measured crossover that [[CorpusPrep.chooseBloom]]'s byte budget
  * approximates — the scaladoc prediction turned into a curve.
  *
  * Usage: runMain graft.tools.BloomCrossover <sfDir> [mod1,mod2,...]
  * where each mod keeps doc_id % mod == 0 as the TEST side (so mod 20
  * = the q_decontaminate split, mod 2 = half the corpus as test set).
  */
object BloomCrossover {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println(
        "usage: runMain graft.tools.BloomCrossover <sfDir> [mods]")
      sys.exit(2)
    }
    val sfDir = args(0)
    val mods: Seq[Int] =
      if (args.length > 1) args(1).split(",").toSeq.map(_.trim.toInt)
      else Seq(20, 10, 5, 3, 2)
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

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    println("| test mod | test docs | est shingles | auto local | auto cluster | exact s | bloom s |")
    println("| --- | --- | --- | --- | --- | --- | --- |")
    mods.foreach { mod =>
      val docs = Td(spark, sfDir, "documents")
      val corpus = docs.filter(col("doc_id") % mod =!= 0)
      val tests = docs.filter(col("doc_id") % mod === 0)
      val nTest = tests.count()
      val est = tests.select(sum(size(graft.functions.ShingleHashesExpr(
        graft.text.TextFunctions.normalize(col("text")), 3))))
        .head().getLong(0)
      val pickLocal =
        if (CorpusPrep.chooseBloom(est, CorpusPrep.defaultBudgetFor(spark)))
          "bloom" else "exact"
      val pickCluster =
        if (CorpusPrep.chooseBloom(est)) "bloom" else "exact"
      // The frame is CONSTRUCTED inside the timed closure:
      // contaminationBloom builds its filter eagerly (a driver head()
      // on the bloom agg), and that build is precisely the overhead
      // the crossover is weighing against the broadcast.
      def run(mk: () => org.apache.spark.sql.DataFrame): Double = {
        def once() = timed(
          mk().write.format("noop").mode("overwrite").save())
        once() // warm-up
        spark.catalog.clearCache(); System.gc(); Thread.sleep(200)
        val t = once()
        spark.catalog.clearCache(); System.gc(); Thread.sleep(200)
        t
      }
      val exactS = run(() =>
        CorpusPrep.contamination(corpus, tests, "doc_id", "text"))
      val bloomS = run(() =>
        CorpusPrep.contaminationBloom(corpus, tests, "doc_id", "text",
          expectedItems = est))
      println(f"| $mod | $nTest | $est | $pickLocal | $pickCluster | $exactS%.1f | $bloomS%.1f |")
    }
    spark.stop()
  }
}
