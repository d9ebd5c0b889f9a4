package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus relevance scoring — TF-IDF and BM25 (absent in the reference;
  * added as first-class training-data operators: term weighting drives
  * quality filtering, near-query retrieval, and topic balancing over a
  * raw corpus).
  *
  * Scale shape: tokenize (scan-time explode) → per-(doc,term) counts
  * (one shuffle) → per-term document frequencies (second shuffle over
  * the much smaller distinct-(doc,term) set) → join scores back on
  * `term`. The corpus size N and average doc length are single-row
  * aggregates cross-joined as broadcasts, never a driver collect. The
  * tf→df→join chain is the canonical two-shuffle inverted-index build;
  * nothing is quadratic in docs or vocabulary.
  */
object Relevance {

  /** Per-(doc, term) raw counts over whitespace tokens of `textCol`.
    * Empty tokens (doubled spaces) are dropped. */
  def termFrequencies(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), explode(split(col(textCol), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** TF-IDF scores: `tf * ln(N / df)` per (doc, term). Plain raw-tf ×
    * unsmoothed idf — the variant statable in closed-form SQL, so the
    * whole operator sits under the DuckDB gate. */
  def tfIdf(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = termFrequencies(docs, idCol, textCol)
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).cast("double").as("__n"))
    tf.join(df, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("score", col("tf") * log(col("__n") / col("df")))
      .select(col(idCol), col("term"), col("tf"), col("df"), col("score"))
  }

  /** Okapi BM25 scores per (doc, term): idf smoothed as
    * `ln(1 + (N - df + 0.5)/(df + 0.5))`, tf saturated by `k1` and
    * length-normalized by `b` against the corpus mean length. */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val tf = termFrequencies(docs, idCol, textCol)
    val dlen = tf.groupBy(col(idCol)).agg(sum(col("tf")).as("dl"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = docs.agg(count(lit(1)).cast("double").as("__n"))
      .crossJoin(dlen.agg(avg(col("dl")).as("__avgdl")))
    val idf = log(lit(1.0) + (col("__n") - col("df") + 0.5) / (col("df") + 0.5))
    val tfSat = (col("tf") * (k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("__avgdl")))
    tf.join(df, Seq("term"))
      .join(dlen, Seq(idCol))
      .crossJoin(broadcast(stats))
      .withColumn("score", idf * tfSat)
      .select(col(idCol), col("term"), col("tf"), col("df"), col("dl"), col("score"))
  }

  /** CCNet-style unigram language-model quality score: each document's
    * average negative log-likelihood under the corpus's own unigram
    * distribution, `-(1/n_d) Σ_tokens ln(cnt(t)/T)`. Common fluent text
    * scores low, rare/noisy/garbled text scores high — the classic
    * cheap model-based quality signal for corpus filtering (CCNet
    * filters on wikipedia-LM perplexity; self-trained unigram NLL is
    * its closed-form, oracle-statable sibling). No smoothing needed:
    * every scored token is, by construction, in the corpus counts.
    *
    * Scale shape: the tf → corpus-count chain is the same two-shuffle
    * inverted-index build as TF-IDF; the total is a broadcast 1-row
    * aggregate. Returns (idCol, n_tok, nll). */
  def unigramNll(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = termFrequencies(docs, idCol, textCol)
    val cnt = tf.groupBy(col("term")).agg(sum(col("tf")).as("cnt"))
    val total = cnt.agg(sum(col("cnt")).cast("double").as("__t"))
    tf.join(cnt, Seq("term"))
      .crossJoin(broadcast(total))
      .groupBy(col(idCol))
      .agg(sum(col("tf")).as("n_tok"),
        (sum(col("tf") * -log(col("cnt") / col("__t"))) / sum(col("tf")))
          .as("nll"))
  }

  /** Top-k highest-scoring terms per document (score desc, term asc —
    * fully deterministic tie-break). */
  def topTerms(scored: DataFrame, idCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(col("score").desc, col("term"))
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }
}
