package graft.ops

import org.apache.spark.sql.functions._

/** Join operator family (SURVEY.md §2.3).
  *
  * Broadcast policy (design-for-100×): only *bounded* dimensions are
  * `broadcast()` — nation (25 rows) and region (5 rows) at any scale
  * factor, and pre-filtered slices known to stay small. Fact-proportional
  * tables (customer, orders, lineitem) are never force-broadcast: at the
  * 100 TB target they are tens of GB and would OOM executors; AQE picks
  * shuffled-hash/sort-merge for them at runtime.
  */
object JoinBattery {

  /** Chained equi-joins through dimensions — property path `/` sequence
    * (reference: typescript/queries/av-audio.sparql:253,486 navigates
    * schema:spatial/schema:name through a mid-node) plus plain
    * subject-subject joins (av-audio.sparql:194-204). */
  val joinChain = Q(
    "q_join_chain",
    Some(
      "SELECT r_name, count(*) AS n_orders, round(sum(o_totalprice),2) AS revenue " +
        "FROM orders JOIN customer ON o_custkey = c_custkey " +
        "JOIN nation ON c_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey GROUP BY 1 ORDER BY 1"),
    (s, dir) =>
      Td(s, dir, "orders")
        // customer grows with the fact data — AQE picks its join strategy
        .join(Td(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Td(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Td(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("revenue"))
        .orderBy(col("r_name"))
  )

  /** `OPTIONAL { … }` → left outer join
    * (reference: typescript/queries/organization.sparql:69-126).
    *
    * Aggregate-before-join: orders is pre-aggregated to one row per
    * custkey and only then joined to customer, so the shuffle moves the
    * per-key aggregate (≤1 row/key) instead of the full fact table —
    * the fan-out factor cheaper at 100×. */
  val leftOuter = Q(
    "q_left_outer",
    Some(
      "SELECT c_custkey, count(o_orderkey) AS n_orders FROM customer " +
        "LEFT JOIN orders ON o_custkey = c_custkey GROUP BY 1 ORDER BY 1"),
    (s, dir) => {
      val perKey = Td(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n"))
      Td(s, dir, "customer")
        .join(perKey, col("o_custkey") === col("c_custkey"), "left")
        .select(col("c_custkey"), coalesce(col("n"), lit(0L)).as("n_orders"))
        .orderBy(col("c_custkey"))
    }
  )

  /** `RIGHT JOIN` (reference: flows/queries/update_partition.sql:298).
    * Same aggregate-before-join shape as q_left_outer: the right-outer
    * preservation of customer happens after orders is collapsed per key. */
  val rightOuter = Q(
    "q_right_outer",
    Some(
      "SELECT c_custkey, round(coalesce(sum(o_totalprice), 0), 2) AS total " +
        "FROM orders RIGHT JOIN customer ON o_custkey = c_custkey GROUP BY 1 ORDER BY 1"),
    (s, dir) => {
      val perKey = Td(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(col("o_totalprice")).as("t"))
      perKey
        .join(Td(s, dir, "customer"), col("o_custkey") === col("c_custkey"), "right")
        .select(col("c_custkey"), round(coalesce(col("t"), lit(0.0)), 2).as("total"))
        .orderBy(col("c_custkey"))
    }
  )

  /** `EXISTS` → left semi join
    * (reference: typescript/queries/av-audio.sparql:392-394 binds EXISTS
    * as a flag; the semi-join is the filtering variant). */
  val semiExists = Q(
    "q_semi_exists",
    Some(
      "SELECT c_custkey, c_name FROM customer WHERE EXISTS (" +
        "SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P') ORDER BY 1"),
    (s, dir) =>
      Td(s, dir, "customer")
        .join(
          Td(s, dir, "orders").filter(col("o_orderstatus") === "P"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
  )

  /** `FILTER NOT EXISTS` → left anti join
    * (reference: typescript/queries/deletes.sparql:63-76 — entities with
    * no allowed license). */
  val antiNotExists = Q(
    "q_anti_not_exists",
    Some(
      "SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS (" +
        "SELECT 1 FROM orders WHERE o_custkey = c_custkey) ORDER BY 1"),
    (s, dir) =>
      Td(s, dir, "customer")
        .join(Td(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
  )

  /** Delete-join: keep rows whose parent is NOT flagged — the anti-join
    * rewrite of `DELETE … USING … WHERE is_deleted`
    * (reference: flows/arc_db_delete_flow.py:34-43). */
  val deleteAntiJoin = Q(
    "q_delete_antijoin",
    Some(
      "SELECT l_returnflag, count(*) AS kept FROM lineitem WHERE NOT EXISTS (" +
        "SELECT 1 FROM orders WHERE o_orderkey = l_orderkey AND o_orderstatus = 'F') " +
        "GROUP BY 1 ORDER BY 1"),
    (s, dir) =>
      Td(s, dir, "lineitem")
        .join(
          Td(s, dir, "orders").filter(col("o_orderstatus") === "F"),
          col("l_orderkey") === col("o_orderkey"), "left_anti")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("kept"))
        .orderBy(col("l_returnflag"))
  )

  /** Object→subject navigation join: fact column referencing another
    * entity's key (reference: typescript/queries/av-audio.sparql:200-204
    * `?ie prov:wasDerivedFrom ?fragment`). */
  val navJoin = Q(
    "q_nav_join",
    Some(
      "SELECT p_brand, count(*) AS cnt, round(sum(l_quantity),2) AS qty " +
        "FROM lineitem JOIN part ON l_partkey = p_partkey " +
        "WHERE p_type = 'PROMO' GROUP BY 1 ORDER BY 1"),
    (s, dir) =>
      Td(s, dir, "lineitem")
        .join(
          broadcast(Td(s, dir, "part").filter(col("p_type") === "PROMO")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("l_quantity")), 2).as("qty"))
        .orderBy(col("p_brand"))
  )

  val all: Seq[Q] = Seq(
    joinChain, leftOuter, rightOuter, semiExists, antiNotExists, deleteAntiJoin, navJoin)
}
