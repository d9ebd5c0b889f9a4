package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.text.CorpusPrep

/** Scale probe for the r19 swap of [[graft.text.CorpusPrep.prepare]]'s
  * near-dup stage to the SPANNING variant — measures the swap where it
  * actually bites: a duplicate group that EXACT dedup provably cannot
  * collapse, inside the packaged pipeline.
  *
  * [[SpanProbe]] plants byte-identical copies, but prepare runs
  * `exactDedupKeep` first, which removes those — the swap's payoff is
  * the groups that SURVIVE exact dedup with equal shingle SETS:
  * repeated-pattern boilerplate. Member i of the planted group is the
  * cyclic walk over a 6-token pattern starting at rotation i % 6 with
  * token length 12 + i/6 — every member's distinct 3-shingle set is
  * exactly the pattern's 6 cyclic grams (any cyclic walk of length ≥ 8
  * covers them all and contains nothing else), so pairwise Jaccard is
  * exactly 1.0, while every member's TEXT is distinct (injective
  * (rotation, length)) — different content hashes, so exact dedup
  * keeps them ALL and the pair stage inherits the whole group: the
  * full stage owes d²/2 output rows where the spanning stage owes d
  * stars. This is the common web-scale shape ("click here click here
  * …" boilerplate of varying run length), not an adversarial one.
  *
  * Both compositions are run end-to-end (quality filter → exact keep →
  * pair stage → connected components → keep component minima) and the
  * probe ASSERTS their survivor sets are identical (the closure
  * equality the spec pins, checked here at scale) before printing the
  * walls. The full composition is the r18-shipped `prepare` body with
  * [[Dedup.minhashNearDup]] inlined; the spanning one is today's
  * [[CorpusPrep.prepare]].
  *
  * Usage: runMain graft.tools.PrepProbe <sfDir> [mod] [dList]
  *   mod    — keep doc_id % mod == 0 of the corpus (default 9)
  *   dList  — comma list of planted group sizes (default 1000,5000)
  *
  * The full composition runs only while d²/2 stays under ~5M pairs;
  * above that the probe prints the contract arithmetic instead of
  * paying for output whose size is already known in closed form. */
object PrepProbe {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println(
        "usage: runMain graft.tools.PrepProbe <sfDir> [mod] [dList]")
      sys.exit(2)
    }
    val sfDir = args(0)
    val mod = if (args.length > 1) args(1).toInt else 9
    val ds = (if (args.length > 2) args(2) else "1000,5000")
      .split(",").map(_.trim.toInt).toSeq
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

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .filter(col("doc_id") % mod === 0)
    println(s"[prepprobe] base docs: ${docs.count()} (mod $mod)")

    // Token length >= 12 keeps every member past the quality gate
    // (>= 10 tokens, >= 50 chars, zero punct). Planted ids at 1e10 —
    // the unique-id rule (clear of every ScaleUp copy band).
    val cycle = Seq("annual", "public", "report", "of", "the", "corporation")
    val cycleArr = array(cycle.map(lit): _*)
    def fixture(d: Int): DataFrame = {
      val j = (col("id") % 6).cast("int")
      val len = (lit(12) + (col("id") / 6).cast("int")).as("L")
      val walk = concat_ws(" ",
        transform(sequence(j, j + col("L") - 1),
          k => element_at(cycleArr, (k % 6) + 1)))
      docs.unionByName(
        spark.range(d)
          .select((col("id") + 10000000000L).as("doc_id"), col("id"), len)
          .select(col("doc_id"), walk.as("text")))
        .localCheckpoint()
    }

    def time[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }

    // The r18-shipped composition: prepare's body with the FULL pair
    // stage inlined (quality → exact keep → minhashNearDup → CC →
    // component minima).
    def prepareFull(df: DataFrame): DataFrame = {
      val filtered = df.filter(
        CorpusPrep.qualityFilter(col("text"), CorpusPrep.Quality()))
      val exact = CorpusPrep.exactDedupKeep(filtered, "doc_id", "text")
      val pairs = Dedup.minhashNearDup(exact, "doc_id", "text",
        minJaccard = 0.8)
      val comps = graft.graph.ConnectedComponents.run(
        exact.select(col("doc_id").as("id")), pairs,
        srcCol = "id_a", dstCol = "id_b")
      exact.join(
        graft.graph.ConnectedComponents.keepers(comps)
          .withColumnRenamed("id", "doc_id"),
        Seq("doc_id"), "left_semi")
    }

    val FullCap = 5000000L
    for (d <- ds) {
      val f = fixture(d)
      val contract = d.toLong * (d - 1) / 2
      val (spanIds, tSpan) = time {
        CorpusPrep.prepare(f, "doc_id", "text", nearDup = true)
          .select(col("doc_id")).localCheckpoint()
      }
      val nSpan = spanIds.count()
      println(f"[prepprobe] spanning prepare d=$d: $tSpan%.1f s, " +
        s"$nSpan survivors")
      if (contract <= FullCap) {
        val (fullIds, tFull) = time {
          prepareFull(f).select(col("doc_id")).localCheckpoint()
        }
        val nFull = fullIds.count()
        val diverge = spanIds.exceptAll(fullIds).count() +
          fullIds.exceptAll(spanIds).count()
        require(diverge == 0,
          s"survivor sets diverge at d=$d: $nSpan span vs $nFull full")
        println(f"[prepprobe] full prepare d=$d: $tFull%.1f s, " +
          s"$nFull survivors (sets IDENTICAL)")
      } else
        println(s"[prepprobe] full prepare d=$d skipped: pair stage owes " +
          s"$contract in-group pairs")
      f.unpersist()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
