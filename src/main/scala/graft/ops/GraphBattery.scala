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

  val all: Seq[Q] = Seq(connectedComponents)
}
