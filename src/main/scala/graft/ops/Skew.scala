package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation patterns for hot keys (SURVEY.md §7.2 M5; the
  * reference's data has per-organization hot spots — one broadcaster
  * owns a large share of the archive, so `schema_maintainer` and the
  * per-entity child joins skew).
  *
  * First resort is AQE (`spark.sql.adaptive.skewJoin` splits oversized
  * partitions at runtime — enabled in the bench session). These helpers
  * cover the cases AQE cannot fix:
  *  - `saltedAgg`: a two-stage aggregation for hot *grouping* keys —
  *    partial aggregate on (key, salt), then final aggregate on key.
  *    AQE cannot split a single giant group.
  *  - `saltedJoin`: explicit salt fan-out for a hot join key against a
  *    small-ish right side — the right side is replicated `salt` ways,
  *    so the hot key's rows spread over `salt` partitions.
  */
object Skew {

  /** Deterministic salt in [0, buckets) derived from stable row content —
    * no Math.random (reproducible runs, resumable shuffles). */
  def salt(buckets: Int, cols: Column*): Column =
    pmod(xxhash64(cols: _*), lit(buckets.toLong)).cast("int")

  /** Two-stage aggregation: count/sum-like partial aggregates computed
    * per (key, salt), then combined per key. `aggs` maps a column name
    * to (partial, final) expressions over that name. */
  def saltedCount(df: DataFrame, key: String, buckets: Int,
                  saltSource: Column): DataFrame =
    df.withColumn("__salt", salt(buckets, saltSource))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("cnt"))

  /** Salted equi-join: left's hot keys spread over `buckets` salts; the
    * right side is replicated once per salt value (explode of a small
    * literal range — right side must be the smaller relation). */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 buckets: Int, leftSaltSource: Column): DataFrame = {
    val saltedLeft = left.withColumn("__salt", salt(buckets, leftSaltSource))
    val replicatedRight = right.withColumn("__salt",
      explode(array((0 until buckets).map(lit): _*)))
    saltedLeft.join(replicatedRight, Seq(key, "__salt")).drop("__salt")
  }
}
