package graft.ops

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.text.TextFunctions

/** LLM training-data operators over the `documents` table: exact dedup,
  * text analysis (token counting, quality stats, language-ID,
  * fingerprinting) with DuckDB oracles, and MinHash/SimHash near-dup as
  * structurally-checked entries (the LSH internals are not expressible
  * in portable SQL; their semantics are covered by DedupSpec fixtures).
  */
object TextBattery {

  // DuckDB needs the 'g' flag for replace-all; Spark replaces all by
  // default. Both must produce byte-identical normalized text.
  private val normSql =
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))"

  /** Exact content dedup: hash-groupBy over normalized text — keeper id
    * + duplicate count per distinct content hash. */
  val dedupExact = Q(
    "q_dedup_exact",
    Some(
      s"SELECT md5($normSql) AS content_hash, min(doc_id) AS keeper_id, " +
        "count(*) AS dup_cnt FROM documents GROUP BY 1 ORDER BY 1"),
    (s, dir) =>
      Dedup.exact(Td(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("content_hash"))
  )

  /** Quality stats: char/token/punct/stopword counts per document — the
    * cheap pre-filters of a pretraining pipeline. Integer counts only so
    * the oracle compare is exact. */
  val textStats = Q(
    "q_text_stats",
    Some(
      "SELECT doc_id, n_chars, length(text) AS len, " +
        raw"len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^\sa-zA-Z0-9]')) AS n_tok, " +
        raw"len(regexp_extract_all(text, '[^\w\s]')) AS n_punct, " +
        raw"len(regexp_extract_all(lower(text), '\b(the|a|an|and|of|to|in|is|it|that)\b')) AS n_stop " +
        "FROM documents ORDER BY 1"),
    (s, dir) =>
      Td(s, dir, "documents")
        .select(
          col("doc_id"), col("n_chars"),
          length(col("text")).as("len"),
          size(TextFunctions.regexTokens(col("text"))).as("n_tok"),
          TextFunctions.punctCount(col("text")).as("n_punct"),
          TextFunctions.stopwordCount(col("text")).as("n_stop"))
        .orderBy(col("doc_id"))
  )

  /** Language-ID heuristic: stopword-profile argmax per doc, aggregated
    * to a distribution. The oracle restates the same scoring in SQL. */
  val langIdQ = Q(
    "q_lang_id",
    Some {
      def h(words: String) = raw"len(regexp_extract_all(lower(text), '\b($words)\b'))"
      val en = h("the|and|of|to|is"); val de = h("der|die|das|und|ist")
      val fr = h("le|la|les|et|est"); val nl = h("de|het|een|en|is")
      "SELECT pred_lang, count(*) AS cnt FROM (SELECT CASE " +
        s"WHEN greatest($en,$de,$fr,$nl) = 0 THEN 'und' " +
        s"WHEN $en = greatest($en,$de,$fr,$nl) THEN 'en' " +
        s"WHEN $nl = greatest($en,$de,$fr,$nl) THEN 'nl' " +
        s"WHEN $de = greatest($en,$de,$fr,$nl) THEN 'de' " +
        "ELSE 'fr' END AS pred_lang FROM documents) GROUP BY 1 ORDER BY 1"
    },
    (s, dir) =>
      Td(s, dir, "documents")
        .select(TextFunctions.langId(col("text")).as("pred_lang"))
        .groupBy(col("pred_lang"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("pred_lang"))
  )

  /** Winnowing-style fingerprint: min shingle-hash per document —
    * rebuilt shingle-for-shingle in DuckDB list comprehensions so the
    * whole normalize→shingle→hash→min chain is oracle-checked. */
  val fingerprintQ = Q(
    "q_doc_fingerprint",
    Some(
      s"SELECT doc_id, list_min(list_transform(CASE WHEN len(string_split($normSql, ' ')) >= 3 " +
        s"THEN list_transform(range(1, len(string_split($normSql, ' ')) - 1), " +
        s"i -> array_to_string(string_split($normSql, ' ')[i:i+2], ' ')) " +
        s"ELSE [$normSql] END, s -> md5(s))) AS fp FROM documents ORDER BY 1"),
    (s, dir) =>
      Td(s, dir, "documents")
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
        .withColumn("sh", TextFunctions.shinglesFromTokens(col("toks"), 3))
        .select(col("doc_id"),
          TextFunctions.fingerprintFromShingles(col("sh")).as("fp"))
        .orderBy(col("doc_id"))
  )

  /** Documents ∪ a mutated copy (ids shifted, first chars dropped) —
    * planted near-duplicates so the LSH entries return non-empty,
    * verifiable candidate sets on any scale factor. */
  private def withPlantedDups(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val docs = Td(s, dir, "documents").select(col("doc_id"), col("text"))
    docs.unionByName(
      docs.select((col("doc_id") + 1000000).as("doc_id"),
        substring(col("text"), 12, 1000000).as("text")))
  }

  /** MinHash + banded LSH near-dup: candidates via band-bucket equi-join
    * (never all-pairs), exact Jaccard verify inside buckets. Rows-only
    * driver check; pair-level semantics covered in DedupSpec. */
  val neardupMinhash = Q(
    "q_neardup_minhash",
    None,
    (s, dir) =>
      Dedup.minhashNearDup(withPlantedDups(s, dir), "doc_id", "text",
        numHashes = 64, bands = 16, shingleK = 3, minJaccard = 0.5)
        .orderBy(col("id_a"), col("id_b"))
  )

  /** SimHash near-dup: 64-bit signatures, pigeonhole chunk candidates,
    * hamming verify. Rows-only driver check; semantics in DedupSpec. */
  val neardupSimhash = Q(
    "q_neardup_simhash",
    None,
    (s, dir) =>
      Dedup.simhashNearDup(withPlantedDups(s, dir), "doc_id", "text",
        maxHamming = 3)
        .orderBy(col("id_a"), col("id_b"))
  )

  /** Composed corpus preparation (quality filter + exact-dedup keep) —
    * oracle restates the filter conditions and the keep-min-id rule in
    * SQL. Near-dup removal (not SQL-expressible) is covered by
    * CorpusPrepSpec. */
  val corpusPrep = Q(
    "q_corpus_prep",
    Some(
      "WITH q AS (SELECT doc_id, lang, md5(" + normSql + ") AS h FROM documents " +
        "WHERE length(text) >= 50 " +
        raw"AND len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^\sa-zA-Z0-9]')) >= 10 " +
        raw"AND len(regexp_extract_all(text, '[^\w\s]')) * 5 <= length(text)) " +
        "SELECT doc_id, lang FROM q WHERE doc_id = " +
        "(SELECT min(doc_id) FROM q q2 WHERE q2.h = q.h) ORDER BY 1"),
    (s, dir) =>
      graft.text.CorpusPrep.prepare(
        Td(s, dir, "documents"), "doc_id", "text")
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))
  )

  val all: Seq[Q] = Seq(
    dedupExact, textStats, langIdQ, fingerprintQ, neardupMinhash,
    neardupSimhash, corpusPrep)
}
