package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Scale probe for the duplicate-group-collapsed ("spanning") near-dup
  * variants: plants ONE exact-duplicate group of `d` copies into a
  * ScaleUp corpus slice and times each engine's full-vs-spanning pair
  * on it — the measurement behind the variants' scale claim (the full
  * contract is d²/2 pairs per group and no partitioning trick shrinks
  * it, because the output itself is the explosion; the spanning form
  * stays linear in d). The r17 MinHash probe (BENCH_NOTES r17,
  * 90×/d=20k: 35k pairs in 43.5 s where the full contract is 200M
  * rows) ran as a spark-shell script; this main makes the protocol
  * repeatable for every engine in the family.
  *
  * Usage: runMain graft.tools.SpanProbe <sfDir> [mod] [dList] [engines]
  *   mod      — keep doc_id % mod == 0 of the corpus (default 9)
  *   dList    — comma list of duplicate-group sizes (default 1000,5000)
  *   engines  — comma subset of minhash,simhash,ngram,embedding
  *
  * Full engines run only while d²/2 stays under ~5M pairs — above
  * that the probe prints the contract arithmetic instead of paying
  * for output rows whose count is already known in closed form. */
object SpanProbe {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println(
        "usage: runMain graft.tools.SpanProbe <sfDir> [mod] [dList] [engines]")
      sys.exit(2)
    }
    val sfDir = args(0)
    val mod = if (args.length > 1) args(1).toInt else 9
    val ds = (if (args.length > 2) args(2) else "1000,5000")
      .split(",").map(_.trim.toInt).toSeq
    val engines = (if (args.length > 3) args(3) else "simhash,ngram")
      .split(",").map(_.trim).toSet
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
    val nBase = docs.count()
    println(s"[spanprobe] base docs: $nBase (mod $mod)")
    // One long representative text seeds the planted group: every copy
    // is byte-identical, the worst case for the full pair contract.
    val one = docs.filter(length(col("text")) >= 200)
      .orderBy(col("doc_id")).limit(1)
      .select(col("text")).head().getString(0)

    // Planted ids sit at 1e10 — clear of every ScaleUp copy band
    // (stride 1e8, so even 90× tops out near 9e9). The r7 incident
    // rule: these engines require unique doc ids, and a collision
    // corrupts counts silently (an aliased id merges two texts'
    // tokens into one signature).
    def fixture(d: Int): DataFrame = docs.unionByName(
      spark.range(d).select((col("id") + 10000000000L).as("doc_id"),
        lit(one).as("text"))).localCheckpoint()

    def time[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }

    val FullCap = 5000000L
    for (d <- ds) {
      val f = fixture(d)
      val contract = d.toLong * (d - 1) / 2
      def report(engine: String, full: => DataFrame, span: => DataFrame): Unit = {
        if (engines(engine)) {
          if (contract <= FullCap) {
            val (nf, tf) = time(full.count())
            println(f"[spanprobe] $engine full d=$d: $tf%.1f s, $nf pairs")
          } else
            println(s"[spanprobe] $engine full d=$d skipped: contract is " +
              s"$contract in-group pairs")
          val (nsp, tsp) = time(span.count())
          println(f"[spanprobe] $engine span d=$d: $tsp%.1f s, $nsp pairs")
        }
      }
      report("minhash",
        Dedup.minhashNearDup(f, "doc_id", "text", minJaccard = 0.5),
        Dedup.minhashNearDupSpanning(f, "doc_id", "text", minJaccard = 0.5))
      report("simhash",
        Dedup.simhashNearDup(f, "doc_id", "text", maxHamming = 3),
        Dedup.simhashNearDupSpanning(f, "doc_id", "text", maxHamming = 3))
      report("ngram",
        Dedup.ngramJaccardNearDup(f, "doc_id", "text",
          shingleK = 3, minJaccard = 0.7),
        Dedup.ngramJaccardNearDupSpanning(f, "doc_id", "text",
          shingleK = 3, minJaccard = 0.7))
      if (engines("embedding")) {
        val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
          .select(col("vec_id"), col("embedding"))
          .filter(col("vec_id") % mod === 0)
        val dim = emb.select(size(col("embedding"))).head().getInt(0)
        // d byte-identical copies of one corpus vector — the repeated
        // default-embedding shape the spanning variant exists for.
        val ef = emb.unionByName(
          spark.range(d).select((col("id") + 10000000000L).as("vec_id"))
            .crossJoin(broadcast(
              emb.orderBy(col("vec_id")).limit(1).select(col("embedding")))))
          .localCheckpoint()
        report("embedding",
          Dedup.embeddingNearDup(ef, "vec_id", "embedding", dim,
            minCosine = 0.95),
          Dedup.embeddingNearDupSpanning(ef, "vec_id", "embedding", dim,
            minCosine = 0.95))
        ef.unpersist()
      }
      f.unpersist()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
