package graft.ops

import graft.docs.IndexDocuments
import org.apache.spark.sql.functions._

/** Composed index-document job under the oracle gate (SURVEY.md §2.4,
  * §2.5, §2.8 #66 composed — reference:
  * flows/queries/update_partition.sql:6-357).
  *
  * The oracle restates the full ~13-lateral composition in closed form:
  * four aggregate subqueries (single-level, two-level roles, window
  * picks, two-hop grandchild) left-joined onto the root table — the
  * same shape the Spark plan compiles to, stated independently in
  * DuckDB SQL. */
object DocsBattery {

  private val InC = "https://rightsstatements.org/vocab/InC/1.0/"
  private val PD = "https://creativecommons.org/publicdomain/mark/1.0/"

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
        s"rights := CASE WHEN coalesce(hu, false) THEN '$InC' ELSE '$PD' END, " +
        "format := coalesce(top_format, 'none'), " +
        "premis := coalesce(premis, []::MAP(VARCHAR,VARCHAR)[]), " +
        "roles := coalesce(roles, map([],[])::MAP(VARCHAR, VARCHAR[])), " +
        "thumbs := coalesce(rfl, []::VARCHAR[]), " +
        "transcript := coalesce(tr, ''), " +
        "n_fragments := coalesce(nf, 0), " +
        "rights_statement := CASE " +
        s"WHEN list_contains(coalesce(rfl, []::VARCHAR[]), 'R') THEN '$InC' " +
        s"WHEN list_contains(coalesce(rfl, []::VARCHAR[]), 'A') THEN '$PD' " +
        "ELSE 'none' END, " +
        "date_created_min := coalesce(dmin, 'none'), " +
        "date_created_max := coalesce(dmax, 'none'), " +
        "reuse := coalesce(reuse, []::VARCHAR[]), " +
        "location := coalesce(n_name, 'unknown'))) AS document, " +
        "coalesce(nc, 0) AS n_children, coalesce(af, false) AS any_flag, " +
        "coalesce(dur, 0.0) AS duration_sec " +
        "FROM customer " +
        // Stage 1: single-level child laterals in one aggregate pass.
        "LEFT JOIN (SELECT o_custkey, list_sort(list(CAST(o_orderkey AS VARCHAR))) AS ids, " +
        "count(*) AS nc, bool_or(o_orderstatus = 'F') AS af, " +
        "CAST(round(max(CAST(o_totalprice AS DECIMAL(18,4)) * 0.1), 2) AS DOUBLE) AS dur, " +
        "bool_or(o_orderpriority = '1-URGENT') AS hu, " +
        "list_transform(list_sort(list(struct_pack(k := o_orderstatus, " +
        "v := CAST(o_orderkey AS VARCHAR)))), s -> map_from_entries([s])) AS premis, " +
        "strftime(min(o_orderdate), '%Y-%m-%d') AS dmin, " +
        "strftime(max(o_orderdate), '%Y-%m-%d') AS dmax " +
        "FROM orders GROUP BY 1) agg ON agg.o_custkey = c_custkey " +
        // Stage 2: two-level roles object.
        "LEFT JOIN (SELECT o_custkey AS rk, map_from_entries(list_sort(list(" +
        "struct_pack(k := o_orderstatus, v := names)))) AS roles FROM (" +
        "SELECT o_custkey, o_orderstatus, list_sort(list(DISTINCT o_orderpriority)) AS names " +
        "FROM orders GROUP BY 1, 2) GROUP BY 1) ro ON ro.rk = c_custkey " +
        // Stage 3: both ordered picks from one windowed scan.
        "LEFT JOIN (SELECT o_custkey AS ck, " +
        "max(CASE WHEN rn_c = 1 THEN CAST(o_orderkey AS VARCHAR) END) AS cover_id, " +
        "max(CASE WHEN rn_f = 1 THEN o_orderstatus END) AS top_format FROM (" +
        "SELECT o_custkey, o_orderkey, o_orderstatus, " +
        "row_number() OVER (PARTITION BY o_custkey " +
        "ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn_c, " +
        "row_number() OVER (PARTITION BY o_custkey ORDER BY " +
        "CASE WHEN o_orderpriority = '1-URGENT' THEN 1 " +
        "WHEN o_orderpriority = '2-HIGH' THEN 2 ELSE 3 END, o_orderkey) AS rn_f " +
        "FROM orders) WHERE rn_c = 1 OR rn_f = 1 GROUP BY 1) cv ON cv.ck = c_custkey " +
        // Stage 4: grandchild (two-hop) laterals.
        "LEFT JOIN (SELECT o_custkey AS lk, " +
        // (l_orderkey, l_linenumber) repeats in the testdata, so the
        // value itself is the deterministic tiebreak — mirroring the
        // Spark side's struct sort, whose third field is the string.
        "string_agg(CAST(l_partkey AS VARCHAR), chr(10) " +
        "ORDER BY l_orderkey, l_linenumber, CAST(l_partkey AS VARCHAR)) AS tr, " +
        "list_sort(list(DISTINCT l_returnflag)) AS rfl, " +
        "count(CASE WHEN l_returnflag = 'R' THEN 1 END) AS nf " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY 1) li " +
        "ON li.lk = c_custkey " +
        // Reuse-category lateral: UNION ALL of two sources, one
        // distinct-set agg per entity.
        "LEFT JOIN (SELECT k, list_sort(list(DISTINCT cat)) AS reuse FROM (" +
        "SELECT o_custkey AS k, 'prio:' || o_orderpriority AS cat FROM orders " +
        "WHERE o_orderstatus = 'F' " +
        "UNION ALL SELECT o_custkey, 'mode:' || l_linestatus " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "WHERE l_returnflag = 'R') GROUP BY 1) ru ON ru.k = c_custkey " +
        // Location lateral: collection side-table with an absent branch.
        "LEFT JOIN (SELECT n_nationkey, n_name FROM nation " +
        "WHERE n_nationkey < 20) loc ON loc.n_nationkey = c_nationkey " +
        "ORDER BY 1"),
    (s, dir) =>
      IndexDocuments.build(Td(s, dir, "customer"), Td(s, dir, "orders"),
        Td(s, dir, "lineitem"), Td(s, dir, "nation"))
        .orderBy(col("id"))
  )

  /** Partition truncate / rebuild / drop on the LIST-partitioned doc
    * table (SURVEY.md §2.9 #79 — reference
    * arc_db_load_index_tables_flow.py:77-112 per-org truncate+rebuild,
    * arc_db_delete_flow.py:97-130 empty-partition drop), executed
    * against real partitioned parquet: seed all five segment
    * partitions at v1, dynamic-overwrite two of them at v2 (other
    * partitions must be untouched — a non-dynamic overwrite would
    * erase them), then drop one entirely. The read-back end state is
    * the closed form the oracle states. */
  val partitionRefresh = Q(
    "q_partition_refresh",
    Some(
      "SELECT c_custkey AS id, lower(c_mktsegment) AS idx, " +
        "CASE WHEN lower(c_mktsegment) IN ('automobile', 'building') " +
        "THEN 'v2' ELSE 'v1' END AS ver FROM customer " +
        "WHERE lower(c_mktsegment) <> 'machinery' ORDER BY 1"),
    (s, dir) => {
      import org.apache.spark.sql.functions.{col, lit, lower}
      val base = java.nio.file.Files.createTempDirectory("graft_part_refresh")
        .toString + "/docs"
      val c = Td(s, dir, "customer").select(
        col("c_custkey").as("id"),
        lower(col("c_mktsegment")).as("index"))
      IndexDocuments.writePartitioned(
        c.withColumn("ver", lit("v1")), base)
      IndexDocuments.overwriteTouchedPartitions(
        c.filter(col("index").isin("automobile", "building"))
          .withColumn("ver", lit("v2")), base)
      IndexDocuments.dropPartitions(s, base, Seq("machinery"))
      s.read.parquet(base)
        .select(col("id"), col("index").as("idx"), col("ver"))
        .orderBy(col("id"))
    }
  )

  val all: Seq[Q] = Seq(indexDoc, partitionRefresh)
}
