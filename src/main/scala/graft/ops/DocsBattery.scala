package graft.ops

import graft.docs.IndexDocuments
import org.apache.spark.sql.functions._

/** Composed index-document job under the oracle gate (SURVEY.md §2.4,
  * §2.5, §2.8 #66 composed — reference:
  * flows/queries/update_partition.sql:6-151). */
object DocsBattery {

  val indexDoc = Q(
    "q_index_doc",
    Some(
      "SELECT c_custkey AS id, lower(c_mktsegment) AS \"index\", " +
        "to_json(struct_pack(" +
        "iri := 'urn:c/' || CAST(c_custkey AS VARCHAR), " +
        "schema_name := c_name, " +
        "identifiers := coalesce(ids, []), " +
        "children := coalesce(nc, 0), " +
        "is_flagged := coalesce(af, false), " +
        "cover := coalesce(cover_id, 'none'), " +
        "rights := CASE WHEN coalesce(hu, false) " +
        "THEN 'https://rightsstatements.org/vocab/InC/1.0/' " +
        "ELSE 'https://creativecommons.org/publicdomain/mark/1.0/' END)) AS document, " +
        "coalesce(nc, 0) AS n_children, coalesce(af, false) AS any_flag, " +
        "coalesce(dur, 0.0) AS duration_sec " +
        "FROM customer " +
        "LEFT JOIN (SELECT o_custkey, list_sort(list(CAST(o_orderkey AS VARCHAR))) AS ids, " +
        "count(*) AS nc, bool_or(o_orderstatus = 'F') AS af, " +
        "CAST(round(max(CAST(o_totalprice AS DECIMAL(18,4)) * 0.1), 2) AS DOUBLE) AS dur, " +
        "bool_or(o_orderpriority = '1-URGENT') AS hu FROM orders GROUP BY 1) agg " +
        "ON agg.o_custkey = c_custkey " +
        "LEFT JOIN (SELECT o_custkey AS ck, CAST(o_orderkey AS VARCHAR) AS cover_id FROM (" +
        "SELECT o_custkey, o_orderkey, row_number() OVER (PARTITION BY o_custkey " +
        "ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders) WHERE rn = 1) cv " +
        "ON cv.ck = c_custkey ORDER BY 1"),
    (s, dir) =>
      IndexDocuments.build(Td(s, dir, "customer"), Td(s, dir, "orders"))
        .orderBy(col("id"))
  )

  val all: Seq[Q] = Seq(indexDoc)
}
