package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sliding-window token chunking — the document → training-sample
  * transform of an LLM data pipeline (context packing): each document
  * becomes ⌈(n − size)/stride⌉ + 1 windows of `chunkSize` tokens
  * starting every `stride` tokens, so consecutive chunks overlap by
  * `chunkSize − stride` tokens and the tail chunk is allowed to run
  * short. Goes beyond the reference's row-shaped operators (the
  * reference indexes whole documents, typescript/src/3_elasticsearch
  * _load.ts); chunking is what a training corpus needs instead.
  *
  * 100 TB shape: pure scan-side narrow transform — tokenize, one
  * `posexplode` whose fan-out is bounded by (tokens/stride) per
  * document, and a per-row `slice`. No shuffle, no state; output rows
  * are ∝ corpus token count / stride, each independent, so the
  * operator partitions exactly as the scan does.
  */
object Chunker {

  /** Chunk `textCol` into sliding windows of `chunkSize` normalized
    * whitespace tokens every `stride` tokens. Output columns: idCol,
    * `chunk_idx` (0-based), `token_start` (0-based offset of the
    * window), `chunk_text` (space-joined), `n_tokens` (≤ chunkSize;
    * short only on the tail window). `stride ≤ chunkSize` is required
    * so no token can fall between windows.
    *
    * Chunk count uses double division on integer operands: quotients
    * of 32-bit ints are ≥ 2⁻³¹ away from any integer they are not
    * exactly equal to, while a double carries 2⁻⁵² of precision at
    * this magnitude — so `ceil` cannot be off by one (unlike the
    * fractional-threshold case in Dedup, which needs an epsilon). */
  def chunk(df: DataFrame, idCol: String, textCol: String,
            chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize >= 1, s"chunkSize must be >= 1, got $chunkSize")
    require(stride >= 1 && stride <= chunkSize,
      s"stride must be in [1, chunkSize=$chunkSize], got $stride")
    val n = size(col("__toks"))
    val nChunks = when(n <= chunkSize, lit(1))
      .otherwise(ceil((n - chunkSize).cast("double") / stride).cast("int") + 1)
    val start: Column = col("chunk_idx") * stride
    df.withColumn("__toks", TextFunctions.tokens(col(textCol)))
      .select(col(idCol), col("__toks"), size(col("__toks")).as("__n"),
        explode(sequence(lit(0), nChunks - 1)).as("chunk_idx"))
      .select(col(idCol), col("chunk_idx"),
        start.as("token_start"),
        array_join(slice(col("__toks"), start + 1, lit(chunkSize)), " ")
          .as("chunk_text"),
        least(lit(chunkSize), col("__n") - start).as("n_tokens"))
  }
}
