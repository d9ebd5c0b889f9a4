package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Composed training-corpus preparation: quality filter → exact dedup →
  * optional near-dup removal. The standard front half of a pretraining
  * data pipeline, assembled from the engine's own operators.
  *
  * Scale shape: the quality filter is a scan-time predicate (no
  * shuffle); exact dedup is one hash groupBy; near-dup removal reuses
  * the banded-LSH candidate machinery. Every stage is a DataFrame →
  * DataFrame function, so the pipeline composes with any upstream
  * source and downstream sink.
  */
object CorpusPrep {

  /** Integer-arithmetic thresholds (ratios expressed as multiplier
    * comparisons) so the filter is engine-exact and oracle-friendly. */
  final case class Quality(
      minChars: Int = 50,
      minTokens: Int = 10,
      maxPunctTimes: Int = 5) // punct_count * maxPunctTimes <= length

  def qualityFilter(textCol: Column, q: Quality): Column =
    (length(textCol) >= q.minChars) &&
      (size(TextFunctions.regexTokens(textCol)) >= q.minTokens) &&
      (TextFunctions.punctCount(textCol) * q.maxPunctTimes <= length(textCol))

  /** Keep one representative (min id) per exact normalized-content hash. */
  def exactDedupKeep(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val hashed = df.withColumn("__h", md5(TextFunctions.normalize(col(textCol))))
    val keepers = hashed.groupBy(col("__h"))
      .agg(min(col(idCol)).as(idCol))
    hashed.join(keepers, Seq("__h", idCol), "left_semi").drop("__h")
  }

  /** Full preparation. With `nearDup`, drops the higher-id member of
    * every verified near-duplicate pair (connected pairs collapse to
    * their minimum representative transitively only per-pair — the
    * usual LSH-dedup approximation). */
  def prepare(df: DataFrame, idCol: String, textCol: String,
              quality: Quality = Quality(),
              nearDup: Boolean = false, minJaccard: Double = 0.8): DataFrame = {
    val filtered = df.filter(qualityFilter(col(textCol), quality))
    val exact = exactDedupKeep(filtered, idCol, textCol)
    if (!nearDup) exact
    else {
      val drop = Dedup.minhashNearDup(exact, idCol, textCol, minJaccard = minJaccard)
        .select(col("id_b").as(idCol)).distinct()
      exact.join(drop, Seq(idCol), "left_anti")
    }
  }
}
