package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.dedup.Dedup
import graft.text.TextFunctions

/** The native one-pass shingle-hash kernel must be bit-identical to the
  * composed transform(array_distinct(shingles), xxhash64) chain —
  * including first-occurrence dedup order and the short/empty-text
  * whole-text-shingle fallback. */
class NativeShingleSpec extends SparkSuite {

  test("native shingle hashes equal the composed chain") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "The quick brown fox jumps over the lazy dog; the quick brown fox returns!"),
      (2L, "only two"),          // < k tokens → whole-text shingle
      (3L, ""),                  // empty → [""] token → one empty shingle
      (4L, "a a a a a"),         // heavy dedup: one distinct shingle
      (5L, "Punct,,, marks... and   MULTI    spaces")).toDF("id", "text")
    // Composed chain staged over materialized columns (the HOF rule).
    val both = docs
      .select(col("id"), col("text"),
        TextFunctions.tokens(col("text")).as("toks"))
      .withColumn("sh", array_distinct(
        TextFunctions.shinglesFromTokens(col("toks"), 3)))
      .select(col("id"),
        ShingleHashesExpr(TextFunctions.normalize(col("text")), 3).as("native"),
        transform(col("sh"), s => xxhash64(s)).as("composed"))
    both.collect().foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2),
        s"shingle hash mismatch for id=${r.getLong(0)}")
    }
  }

  test("positioned gram hashes equal the composed windowed chain; " +
    "short docs yield EMPTY (no whole-text fallback)") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "The quick brown fox jumps over the lazy dog; the quick brown fox returns!"),
      (2L, "only two"),          // < k tokens → EMPTY, not a fallback gram
      (3L, ""),
      (4L, "a a a a a"),         // repeats NOT deduped: positioned output
      (5L, "Punct,,, marks... and   MULTI    spaces")).toDF("id", "text")
    val both = docs
      .select(col("id"), TextFunctions.tokens(col("text")).as("toks"))
      .withColumn("composed",
        when(size(col("toks")) >= 3,
          transform(TextFunctions.shinglesFromTokens(col("toks"), 3),
            g => xxhash64(g)))
          .otherwise(array().cast("array<long>")))
      .select(col("id"), col("composed"),
        GramHashesExpr(
          TextFunctions.normalize(concat_ws(" ", col("toks"))), 3).as("native"))
    both.collect().foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2),
        s"gram hash mismatch for id=${r.getLong(0)}")
    }
    val short = both.filter(col("id").isin(2L, 3L)).collect()
    short.foreach(r => assert(r.getSeq[Long](2).isEmpty))
  }

  test("minhash near-dup pairs are unchanged by the native kernels") {
    val s = spark
    import s.implicits._
    val base = "the quick brown fox jumps over the lazy dog while the cat watches from the warm windowsill every single morning"
    val fixture = Seq(
      1L -> base, 2L -> base, 3L -> base.replace("morning", "evening"),
      4L -> "completely different content about distributed query engines and shuffle partitioning",
      5L -> "Totally unrelated short text").toDF("doc_id", "text")
    val pairs = Dedup.minhashNearDup(fixture, "doc_id", "text", minJaccard = 0.5)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L)))
    assert(!pairs.exists { case (x, y) => Set(x, y).intersect(Set(4L, 5L)).nonEmpty })
  }
}
