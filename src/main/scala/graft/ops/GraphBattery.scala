package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.graph.ConnectedComponents

/** Graph operators under the gate. The duplicate-clustering step —
  * near-dup pairs → connected components → one keeper per cluster — is
  * stated in DuckDB as a recursive-CTE transitive closure, which is
  * exact at gate scale; the Spark side is the O(log diameter)
  * pointer-doubling algorithm that survives 100 TB.
  */
object GraphBattery {

  /** Deterministic multi-node duplicate clusters from the documents
    * table: chain consecutive doc_ids within each (source, n_chars%7)
    * group — both engines derive the identical edge list via the same
    * lag window, then compute components independently (propagation
    * rounds vs transitive closure). */
  val connectedComponents = Q(
    "q_connected_components",
    Some(
      "WITH RECURSIVE e AS (" +
        "SELECT src, doc_id AS dst FROM (" +
        "SELECT doc_id, lag(doc_id) OVER (" +
        "PARTITION BY source, n_chars % 7 ORDER BY doc_id) AS src " +
        "FROM documents) WHERE src IS NOT NULL), " +
        "und AS (SELECT src AS a, dst AS b FROM e " +
        "UNION SELECT dst, src FROM e), " +
        "reach(a, b) AS (" +
        "SELECT a, b FROM und " +
        "UNION " +
        "SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a) " +
        "SELECT d.doc_id, least(d.doc_id, coalesce(min(r.b), d.doc_id)) AS component " +
        "FROM documents d LEFT JOIN reach r ON r.a = d.doc_id " +
        "GROUP BY d.doc_id ORDER BY d.doc_id"),
    (s, dir) => {
      val docs = Td(s, dir, "documents")
      val w = Window.partitionBy(col("source"), col("n_chars") % 7)
        .orderBy(col("doc_id"))
      val edges = docs
        .select(col("doc_id").as("dst"), lag(col("doc_id"), 1).over(w).as("src"))
        .filter(col("src").isNotNull)
      val nodes = docs.select(col("doc_id").as("id"))
      ConnectedComponents.run(nodes, edges)
        .select(col("id").as("doc_id"), col("component"))
        .orderBy(col("doc_id"))
    }
  )

  /** Quality-keyed cluster representative — "keep the BEST duplicate,
    * not an arbitrary one": the same deterministic clusters as
    * `q_connected_components`, but the survivor per component is the
    * member with max n_chars (tie-break min doc_id) via
    * [[ConnectedComponents.keepersBy]]. DuckDB restates the transitive
    * closure recursively and picks with the same window rule, so a
    * wrong component label, a lost cluster member, or an unstable
    * tie-break all flip the hash. */
  val dedupKeepBest = Q(
    "q_dedup_keep_best",
    Some(
      "WITH RECURSIVE e AS (" +
        "SELECT src, doc_id AS dst FROM (" +
        "SELECT doc_id, lag(doc_id) OVER (" +
        "PARTITION BY source, n_chars % 7 ORDER BY doc_id) AS src " +
        "FROM documents) WHERE src IS NOT NULL), " +
        "und AS (SELECT src AS a, dst AS b FROM e " +
        "UNION SELECT dst, src FROM e), " +
        "reach(a, b) AS (" +
        "SELECT a, b FROM und " +
        "UNION " +
        "SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a), " +
        "comp AS (SELECT d.doc_id, " +
        "least(d.doc_id, coalesce(min(r.b), d.doc_id)) AS component " +
        "FROM documents d LEFT JOIN reach r ON r.a = d.doc_id " +
        "GROUP BY d.doc_id), " +
        "rk AS (SELECT c.doc_id, c.component, d.n_chars, " +
        "row_number() OVER (PARTITION BY c.component " +
        "ORDER BY d.n_chars DESC, c.doc_id) AS rn " +
        "FROM comp c JOIN documents d USING (doc_id)) " +
        "SELECT doc_id, component, n_chars FROM rk WHERE rn = 1 ORDER BY 1"),
    (s, dir) => {
      val docs = Td(s, dir, "documents")
      val w = Window.partitionBy(col("source"), col("n_chars") % 7)
        .orderBy(col("doc_id"))
      val edges = docs
        .select(col("doc_id").as("dst"), lag(col("doc_id"), 1).over(w).as("src"))
        .filter(col("src").isNotNull)
      val comps = ConnectedComponents.run(
        docs.select(col("doc_id").as("id")), edges)
      ConnectedComponents.keepersBy(comps,
        docs.select(col("doc_id").as("id"), col("n_chars").as("score")),
        scoreCol = "score")
        .select(col("id").as("doc_id"), col("component"),
          col("score").as("n_chars"))
        .orderBy(col("doc_id"))
    }
  )

  val all: Seq[Q] = Seq(connectedComponents, dedupKeepBest)
}
