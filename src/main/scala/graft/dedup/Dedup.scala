package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextFunctions

/** Deduplication operators for training-data pipelines: exact
  * (hash-groupBy), MinHash + banded LSH near-dup, and SimHash.
  *
  * Design-for-100-TB notes:
  *  - Nothing here is all-pairs. Candidate generation is always an
  *    equi-join on a bucket key (LSH band hash / SimHash chunk), so the
  *    shuffle is proportional to corpus size, and exact verification
  *    runs only inside buckets.
  *  - Band count r×b trades recall vs bucket width independently of
  *    corpus size; skewed buckets (boilerplate shingles) are the one
  *    hazard — AQE skew-join handles moderate skew, and a bucket-size
  *    cap (count+filter before the self-join) bounds the worst case.
  *  - Signatures are computed with codegen'd higher-order functions in
  *    one scan; the only wide stages are the bucket join and the
  *    pair-verify join on doc id.
  */
object Dedup {

  /** Exact dedup on normalized content hash: one row per distinct hash
    * with the keeper (min id) and the duplicate count. A map-side
    * partial-aggregate groupBy — the cheapest possible full-corpus op. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(TextFunctions.normalize(col(textCol))).as("content_hash"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("dup_cnt"))

  /** MinHash signature: H independent hash functions over an *already
    * materialized* shingle-array column, each `min(xxhash64(seed, s))`.
    *
    * Perf shape that matters: the caller must pass a plain column
    * reference, not the shingle-building expression — expanding the
    * tokenize→shingle tree once per hash seed multiplies the row cost by
    * H and pushed a 1k-doc run from ~1 s to minutes. Variadic `xxhash64`
    * takes the seed as a leading literal, so no per-shingle string
    * concat either. */
  def minhashSignature(shingleCol: Column, numHashes: Int): Column =
    array((0 until numHashes).map { seed =>
      array_min(transform(shingleCol, s => xxhash64(lit(seed), s)))
    }: _*)

  /** Banded-LSH candidate pairs with exact Jaccard verification.
    *
    * signature(H) split into `bands` rows of r = H/bands values; docs
    * sharing any (band index, band hash) bucket become candidates;
    * candidates are verified with exact Jaccard over distinct shingle
    * sets and filtered at `minJaccard`. Returns (id_a, id_b, jaccard)
    * with id_a < id_b.
    */
  def minhashNearDup(df: DataFrame, idCol: String, textCol: String,
                     numHashes: Int = 64, bands: Int = 16, shingleK: Int = 3,
                     minJaccard: Double = 0.8): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val withSig = df
      .select(
        col(idCol).as("id"),
        array_distinct(TextFunctions.shingles(col(textCol), shingleK)).as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), numHashes))

    val banded = withSig.select(
      col("id"), col("sh"),
      posexplode(array((0 until bands).map { b =>
        xxhash64(concat_ws(",", slice(col("sig"), b * r + 1, r)))
      }: _*)))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "band_hash"))

    val a = banded.select(col("band"), col("band_hash"),
      col("id").as("id_a"), col("sh").as("sh_a"))
    val b = banded.select(col("band"), col("band_hash"),
      col("id").as("id_b"), col("sh").as("sh_b"))
    val candidates = a.join(b, Seq("band", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b"))
      .dropDuplicates("id_a", "id_b")

    candidates
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** 64-bit SimHash: explode tokens, hash each, and for every bit sum
    * +1/-1 across the doc; bit j of the result is 1 iff the sum is
    * positive. Single explode + one groupBy shuffle, 64 cheap aggs. */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df.select(col(idCol).as("id"),
      explode(TextFunctions.tokens(col(textCol))).as("t"))
      .select(col("id"), xxhash64(col("t")).as("h"))
    val bitSums = (0 until 64).map { j =>
      sum(when((shiftright(col("h"), j).bitwiseAND(1)) === 1, 1).otherwise(-1)).as(s"b$j")
    }
    val bits = tok.groupBy(col("id")).agg(bitSums.head, bitSums.tail: _*)
    val hash = (0 until 64).map { j =>
      when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce((x, y) => x.bitwiseOR(y))
    bits.select(col("id"), hash.as("simhash"))
  }

  /** SimHash near-dup pairs within `maxHamming` (< 16): candidates via
    * the pigeonhole chunk trick — split the 64-bit hash into 4 16-bit
    * chunks; any pair within hamming ≤ 3 shares at least one exact
    * chunk, so the candidate join is an equi-join on (chunk idx, chunk
    * value), never a cross product. */
  def simhashNearDup(df: DataFrame, idCol: String, textCol: String,
                     maxHamming: Int = 3): DataFrame = {
    val sh = simhash(df, idCol, textCol)
    val chunked = sh.select(col("id"), col("simhash"),
      posexplode(array((0 until 4).map { j =>
        shiftright(col("simhash"), j * 16).bitwiseAND(0xFFFFL)
      }: _*)))
      .withColumnsRenamed(Map("pos" -> "chunk", "col" -> "chunk_val"))
    val a = chunked.select(col("chunk"), col("chunk_val"),
      col("id").as("id_a"), col("simhash").as("h_a"))
    val b = chunked.select(col("chunk"), col("chunk_val"),
      col("id").as("id_b"), col("simhash").as("h_b"))
    a.join(b, Seq("chunk", "chunk_val"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count(col("h_a").bitwiseXOR(col("h_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }
}
