package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.dedup.Dedup

/** The native one-pass MinHash kernel must be bit-identical to the
  * composed `array_min(transform(xxhash64(seed, h)))` form it replaces
  * — same members, same order, same edge cases. */
class NativeMinHashSpec extends SparkSuite {

  test("native signature equals composed form on real text") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog repeatedly"),
      (2L, "an entirely different document about spark shuffles"),
      (3L, "short"),
      (4L, "")).toDF("id", "text")
    val staged = docs
      .select(col("id"), graft.text.TextFunctions.tokens(col("text")).as("toks"))
      .withColumn("sh", array_distinct(
        graft.text.TextFunctions.shinglesFromTokens(col("toks"), 3)))
      .withColumn("hs", Dedup.baseShingleHashes(col("sh")))
    val both = staged.select(col("id"),
      Dedup.minhashSignature(col("hs"), 64).as("native"),
      Dedup.minhashSignatureComposed(col("hs"), 64).as("composed"))
    val rows = both.collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      assert(r.getSeq[Any](1) == r.getSeq[Any](2),
        s"signature mismatch for id=${r.getLong(0)}")
    }
  }

  test("empty base-hash array yields all-null members (composed-form parity)") {
    val s = spark
    import s.implicits._
    val df = Seq(Tuple1(Seq.empty[Long])).toDF("hs")
    val out = df.select(
      Dedup.minhashSignature(col("hs"), 8).as("native"),
      Dedup.minhashSignatureComposed(col("hs"), 8).as("composed")).head()
    assert(out.getSeq[Any](0) == out.getSeq[Any](1))
    assert(out.getSeq[Any](0).forall(_ == null))
  }

  test("null input array is null out") {
    val s = spark
    import s.implicits._
    val df = Seq(Tuple1(Option.empty[Seq[Long]])).toDF("hs")
    assert(df.select(Dedup.minhashSignature(col("hs"), 8)).head().isNullAt(0))
  }
}
