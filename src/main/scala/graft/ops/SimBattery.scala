package graft.ops

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.sim.Similarity

/** Similarity-search and multimodal operator families over the
  * `embeddings` / `documents` tables.
  */
object SimBattery {

  /** Exact cosine top-3 for a 5-probe set — the brute-force baseline.
    * Output is rank-only (probe, rank → neighbor): cosine *values*
    * float-diverge between engines, but with 64-dim random embeddings
    * the top-3 *ordering* is stable, so ranks compare exactly. The
    * DuckDB oracle recomputes cosine in SQL from the same lists. */
  val annBrute = Q(
    "q_ann_cosine",
    Some(
      "SELECT probe_id, neighbor_id, rnk AS \"rank\" FROM (" +
        "SELECT p.vec_id AS probe_id, e.vec_id AS neighbor_id, row_number() OVER (" +
        "PARTITION BY p.vec_id ORDER BY list_cosine_similarity(p.embedding, e.embedding) DESC, e.vec_id" +
        ") AS rnk FROM embeddings p, embeddings e " +
        "WHERE p.vec_id < 5 AND e.vec_id <> p.vec_id) " +
        "WHERE rnk <= 3 ORDER BY 1, 3"),
    (s, dir) => {
      val emb = Td(s, dir, "embeddings")
      Similarity.bruteTopK(emb, emb.filter(col("vec_id") < 5), k = 3)
        .select(col("probe_id"), col("neighbor_id"), col("rank"))
        .orderBy(col("probe_id"), col("rank"))
    }
  )

  /** LSH-bucketed ANN: random-hyperplane buckets + multi-probe +
    * exact re-rank — the 100 TB path (bucket equi-join, never
    * all-pairs). Approximate ⇒ no SQL oracle; recall and plan shape
    * (no CartesianProduct) are asserted in SimilaritySpec. */
  val annLsh = Q(
    "q_ann_lsh",
    None,
    (s, dir) => {
      val emb = Td(s, dir, "embeddings")
      Similarity.lshTopK(emb, emb.filter(col("vec_id") < 5), k = 3)
        .select(col("probe_id"), col("neighbor_id"), col("rank"))
        .orderBy(col("probe_id"), col("rank"))
    }
  )

  /** Multimodal metadata path: text bytes as the opaque binary payload,
    * frame-sampled into fixed windows — byte length and frame count are
    * oracle-checked through the real binary expressions; the stubbed
    * decode is covered by MultimodalSpec. */
  val multimodalMeta = Q(
    "q_multimodal_meta",
    Some(
      "SELECT doc_id, octet_length(CAST(text AS BLOB)) AS n_bytes, " +
        "CAST(ceil(octet_length(CAST(text AS BLOB)) / 256.0) AS INT) AS n_frames " +
        "FROM documents ORDER BY 1"),
    (s, dir) => {
      val media = Td(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("media"))
      Multimodal.frameSample(media, "media", frameLen = 256, stride = 256)
        .select(col("doc_id"), octet_length(col("media")).as("n_bytes"),
          col("n_frames"))
        .orderBy(col("doc_id"))
    }
  )

  /** Embedding-cosine near-dup over the corpus ∪ a planted duplicate
    * slice: same bucket-equi-join shape as MinHash LSH, cosine verify.
    * Rows-only driver check; semantics in DedupSpec/SimilaritySpec. */
  val neardupEmbedding = Q(
    "q_neardup_embedding",
    None,
    (s, dir) => {
      val emb = Td(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val planted = emb.unionByName(
        emb.filter(col("vec_id") < 50)
          .select((col("vec_id") + 1000000).as("vec_id"), col("embedding")))
      graft.dedup.Dedup.embeddingNearDup(planted, "vec_id", "embedding",
        dim = 64, minCosine = 0.99)
        .select(col("id_a"), col("id_b"))
        .orderBy(col("id_a"), col("id_b"))
    }
  )

  /** IVF-bucketed ANN: deterministic coarse quantizer (hash-seeded
    * k-means, one refinement step), nprobe cell search, exact re-rank.
    * Approximate ⇒ rows-only check; recall asserted in SimilaritySpec. */
  val annIvf = Q(
    "q_ann_ivf",
    None,
    (s, dir) => {
      val emb = Td(s, dir, "embeddings")
      Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 5), topK = 3)
        .select(col("probe_id"), col("neighbor_id"), col("rank"))
        .orderBy(col("probe_id"), col("rank"))
    }
  )

  val all: Seq[Q] = Seq(annBrute, annLsh, multimodalMeta, neardupEmbedding, annIvf)
}
