package graft.ops

import org.apache.spark.sql.functions._

/** Aggregation operator family (SURVEY.md §2.4).
  *
  * Each query re-expresses one aggregate shape the reference authors in
  * SQL/SPARQL (cited per query) as a Spark plan over the driver testdata,
  * with a DuckDB oracle. Double aggregates are rounded so that
  * floating-point summation order (Spark partial aggregation vs DuckDB
  * single-stream) cannot flip the hash compare.
  */
object AggBattery {

  /** Grouped multi-aggregate (sum/avg/count) — the canonical shape of the
    * reference's partition-inventory query
    * (reference: flows/arc_db_load_index_tables_flow.py:36-48). */
  val aggSum = Q(
    "q_agg_sum",
    Some(
      "SELECT l_returnflag, l_linestatus, round(sum(l_quantity),2) AS sum_qty, " +
        "round(sum(l_extendedprice),2) AS sum_price, round(avg(l_discount),6) AS avg_disc, " +
        "count(*) AS cnt FROM lineitem GROUP BY 1,2 ORDER BY 1,2"),
    (s, dir) =>
      Td(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_price"),
          round(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("cnt"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
  )

  /** Group + post-aggregation filter (HAVING). */
  val aggHaving = Q(
    "q_agg_having",
    Some(
      "SELECT l_partkey, count(*) AS cnt, round(sum(l_quantity),2) AS sum_qty " +
        "FROM lineitem GROUP BY 1 HAVING count(*) >= 35 ORDER BY 1"),
    (s, dir) =>
      Td(s, dir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("l_quantity")), 2).as("sum_qty"))
        .filter(col("cnt") >= 35)
        .orderBy(col("l_partkey"))
  )

  /** `jsonb_agg(DISTINCT …)` → collect_set
    * (reference: flows/queries/update_partition.sql:107,256,296,336).
    * Serialized as a sorted joined string so array ordering cannot differ. */
  val collectSet = Q(
    "q_collect_set",
    Some(
      "SELECT n_name, array_to_string(list_sort(list(DISTINCT c_mktsegment)), '|') AS segments " +
        "FROM customer JOIN nation ON c_nationkey = n_nationkey GROUP BY 1 ORDER BY 1"),
    (s, dir) =>
      Td(s, dir, "customer")
        .join(broadcast(Td(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(array_join(array_sort(collect_set(col("c_mktsegment"))), "|").as("segments"))
        .orderBy(col("n_name"))
  )

  /** `jsonb_agg(…)` → collect_list
    * (reference: flows/queries/update_partition.sql:78,191-234). */
  val collectList = Q(
    "q_collect_list",
    Some(
      "SELECT s_nationkey, array_to_string(list_sort(list(s_name)), ',') AS names " +
        "FROM supplier GROUP BY 1 ORDER BY 1"),
    (s, dir) =>
      Td(s, dir, "supplier")
        .groupBy(col("s_nationkey"))
        .agg(array_join(array_sort(collect_list(col("s_name"))), ",").as("names"))
        .orderBy(col("s_nationkey"))
  )

  /** `agg(…) FILTER (WHERE …)` conditional aggregation
    * (reference: flows/queries/update_partition.sql:157-159). */
  val condAgg = Q(
    "q_cond_agg",
    Some(
      "SELECT n_name, count(*) FILTER (WHERE c_acctbal > 0) AS pos_cnt, " +
        "count(*) FILTER (WHERE c_acctbal <= 0) AS nonpos_cnt, " +
        "round(sum(c_acctbal) FILTER (WHERE c_acctbal > 0), 2) AS pos_bal " +
        "FROM customer JOIN nation ON c_nationkey = n_nationkey GROUP BY 1 ORDER BY 1"),
    (s, dir) =>
      Td(s, dir, "customer")
        .join(broadcast(Td(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          count(when(col("c_acctbal") > 0, 1)).as("pos_cnt"),
          count(when(col("c_acctbal") <= 0, 1)).as("nonpos_cnt"),
          round(sum(when(col("c_acctbal") > 0, col("c_acctbal"))), 2).as("pos_bal"))
        .orderBy(col("n_name"))
  )

  /** `string_agg(x, sep ORDER BY pos)` ordered concatenation
    * (reference: flows/queries/update_partition.sql:350 — transcript
    * assembly). Spark: sort structs by position, then join. */
  val stringAggOrdered = Q(
    "q_string_agg_ordered",
    Some(
      "SELECT s_nationkey, string_agg(s_name, '|' ORDER BY s_suppkey) AS names " +
        "FROM supplier GROUP BY 1 ORDER BY 1"),
    (s, dir) =>
      Td(s, dir, "supplier")
        .groupBy(col("s_nationkey"))
        .agg(
          array_join(
            transform(
              array_sort(collect_list(struct(col("s_suppkey"), col("s_name")))),
              x => x.getField("s_name")),
            "|").as("names"))
        .orderBy(col("s_nationkey"))
  )

  /** `MAX` over `UNION ALL` of two derived sources
    * (reference: flows/queries/update_partition.sql:84-102 — duration =
    * max(file durations ∪ fragment end-start)).
    *
    * The `* 0.1` scale factor is computed in DECIMAL on both sides:
    * double arithmetic + `round` diverges between engines on half-way
    * representations, decimal arithmetic is exact and rounds identically
    * (HALF_UP == round-half-away for both). The final value is cast back
    * to double so the serialized representation is scale-free. */
  val maxUnion = Q(
    "q_max_union",
    Some(
      "SELECT k, CAST(round(max(v),2) AS DOUBLE) AS max_v FROM (" +
        "SELECT l_orderkey AS k, CAST(l_extendedprice AS DECIMAL(18,4)) AS v FROM lineitem " +
        "UNION ALL SELECT o_orderkey AS k, CAST(o_totalprice AS DECIMAL(18,4)) * 0.1 AS v FROM orders) " +
        "GROUP BY k ORDER BY k"),
    (s, dir) => {
      val a = Td(s, dir, "lineitem")
        .select(col("l_orderkey").as("k"), col("l_extendedprice").cast("decimal(18,4)").as("v"))
      val b = Td(s, dir, "orders")
        .select(
          col("o_orderkey").as("k"),
          (col("o_totalprice").cast("decimal(18,4)") * lit(new java.math.BigDecimal("0.1"))).as("v"))
      a.unionByName(b, allowMissingColumns = false)
        .groupBy(col("k"))
        .agg(round(max(col("v")), 2).cast("double").as("max_v"))
        .orderBy(col("k"))
    }
  )

  /** `bool_or(flag)` — entity deleted if any fragment flagged
    * (reference: flows/queries/update_partition.sql:329). */
  val boolOr = Q(
    "q_bool_or",
    Some(
      "SELECT o_custkey, bool_or(o_orderstatus = 'F') AS any_f, count(*) AS cnt " +
        "FROM orders GROUP BY 1 ORDER BY 1"),
    (s, dir) =>
      Td(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(bool_or(col("o_orderstatus") === "F").as("any_f"), count(lit(1)).as("cnt"))
        .orderBy(col("o_custkey"))
  )

  /** `CASE WHEN 'x' = ANY(array_agg(col))` classification
    * (reference: flows/queries/update_partition.sql:241-245,265-269 —
    * Geluidsspoel/Beeldspoel carrier classification). */
  val anyClassify = Q(
    "q_any_classify",
    Some(
      "SELECT n_name, CASE WHEN list_contains(list(DISTINCT c_mktsegment), 'BUILDING') " +
        "THEN 'has_building' ELSE 'no_building' END AS cls FROM customer " +
        "JOIN nation ON c_nationkey = n_nationkey GROUP BY 1 ORDER BY 1"),
    (s, dir) =>
      Td(s, dir, "customer")
        .join(broadcast(Td(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          when(array_contains(collect_set(col("c_mktsegment")), "BUILDING"), "has_building")
            .otherwise("no_building").as("cls"))
        .orderBy(col("n_name"))
  )

  /** Correlated `COUNT(*)` decorrelated to groupBy + left join
    * (reference: flows/queries/update_partition.sql:304-310 — children
    * count where format LIKE '%fragment'). */
  val correlatedCount = Q(
    "q_correlated_count",
    Some(
      "SELECT o_orderkey, (SELECT count(*) FROM lineitem " +
        "WHERE l_orderkey = o_orderkey AND l_returnflag = 'R') AS r_items " +
        "FROM orders ORDER BY 1"),
    (s, dir) => {
      val cnts = Td(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R")
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("r_items"))
      Td(s, dir, "orders")
        .select(col("o_orderkey"))
        .join(cnts, col("o_orderkey") === col("l_orderkey"), "left")
        .select(col("o_orderkey"), coalesce(col("r_items"), lit(0L)).as("r_items"))
        .orderBy(col("o_orderkey"))
    }
  )

  /** Two-level grouped aggregation — inner (group,key)→count, outer
    * group→sorted "key:count" list; the roles/`jsonb_object_agg` shape
    * (reference: flows/queries/update_partition.sql:155-169,313-323). */
  val twoLevelAgg = Q(
    "q_two_level_agg",
    Some(
      "SELECT o_orderstatus, array_to_string(list_sort(" +
        "list(o_orderpriority || ':' || CAST(cnt AS VARCHAR))), ',') AS prio_counts FROM (" +
        "SELECT o_orderstatus, o_orderpriority, count(*) AS cnt FROM orders GROUP BY 1,2) " +
        "GROUP BY 1 ORDER BY 1"),
    (s, dir) =>
      Td(s, dir, "orders")
        .groupBy(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("o_orderstatus"))
        .agg(
          array_join(
            array_sort(collect_list(concat_ws(":", col("o_orderpriority"), col("cnt")))),
            ",").as("prio_counts"))
        .orderBy(col("o_orderstatus"))
  )

  /** `jsonb_build_object` → to_json(struct(…)) document assembly
    * (reference: flows/queries/update_partition.sql:6-49). */
  val jsonDoc = Q(
    "q_json_doc",
    Some(
      "SELECT c_custkey, to_json(struct_pack(c_custkey := c_custkey, c_name := c_name, " +
        "c_mktsegment := c_mktsegment))::VARCHAR AS doc FROM customer ORDER BY 1"),
    (s, dir) =>
      Td(s, dir, "customer")
        .select(
          col("c_custkey"),
          to_json(struct(col("c_custkey"), col("c_name"), col("c_mktsegment"))).as("doc"))
        .orderBy(col("c_custkey"))
  )

  /** `jsonb_object_agg(key, values)` → map_from_entries + to_json — the
    * dynamic-key object {collection_type → [names]}
    * (reference: flows/queries/update_partition.sql:313-323). Entries
    * are sorted before map construction: JSON key order follows map
    * insertion order in both engines, and collect_list order is not
    * deterministic across partitions. */
  val objectAgg = Q(
    "q_object_agg",
    Some(
      "SELECT o_orderstatus, to_json(map_from_entries(list_sort(list(" +
        "struct_pack(k := o_orderpriority, v := cnt))))) AS prio_map FROM (" +
        "SELECT o_orderstatus, o_orderpriority, count(*) AS cnt FROM orders GROUP BY 1, 2) " +
        "GROUP BY 1 ORDER BY 1"),
    (s, dir) =>
      Td(s, dir, "orders")
        .groupBy(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("o_orderstatus"))
        .agg(to_json(map_from_entries(array_sort(
          collect_list(struct(col("o_orderpriority").as("k"), col("cnt").as("v"))))))
          .as("prio_map"))
        .orderBy(col("o_orderstatus"))
  )

  /** Min/max date range per entity — the `ha_des_min/max_date_created`
    * aggregating-lateral shape (reference:
    * flows/queries/update_partition.sql:76-102 date-range laterals;
    * columns declared FIXTURES.md §B intellectual_entity). Dates are
    * exact values, so the compare needs no rounding discipline. */
  val dateRange = Q(
    "q_date_range",
    Some(
      "SELECT o_custkey, CAST(min(o_orderdate) AS DATE) AS min_created, " +
        "CAST(max(o_orderdate) AS DATE) AS max_created, " +
        "count(DISTINCT CAST(o_orderdate AS DATE)) AS active_days " +
        "FROM orders GROUP BY 1 ORDER BY 1"),
    (s, dir) =>
      Td(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(
          min(col("o_orderdate").cast("date")).as("min_created"),
          max(col("o_orderdate").cast("date")).as("max_created"),
          countDistinct(col("o_orderdate").cast("date")).as("active_days"))
        .orderBy(col("o_custkey"))
  )

  /** Sketch aggregates (SURVEY.md §2.4 #44 — absent in the reference;
    * added as the 100 TB cardinality/quantile tools): HLL++
    * `approx_count_distinct` and t-digest-style `percentile_approx`.
    * A sketch value is engine-specific, so the gate hashes the *error
    * contract* instead: both engines emit the exact answer plus a
    * boolean asserting the sketch landed inside its tolerance — the
    * oracle states `true`, Spark must earn it. Sketches are
    * deterministic for a given input set, so the booleans are stable,
    * and at rsd=0.01 a 5% miss is a >5σ event. Scale shape: fixed-size
    * mergeable state through a map-side partial agg — the whole point
    * of sketching a 100 TB column. */
  val approxDistinct = Q(
    "q_approx_distinct",
    Some(
      "SELECT event_type, count(DISTINCT user_id) AS n_users, " +
        "count(DISTINCT CAST(round(value * 100) AS BIGINT)) AS n_values, " +
        "true AS hll_ok, true AS p50_ok " +
        "FROM events GROUP BY 1 ORDER BY 1"),
    (s, dir) => {
      // Four single-pass aggregates joined on the 5-row group key —
      // NOT one agg: mixing a distinct aggregate with ANY other
      // aggregate in one groupBy makes Catalyst Expand every input row
      // per distinct clause, and stacking the percentiles on that
      // expand benched 13 s where these independent passes take ~1 s.
      val cents = round(col("value") * 100).cast("long")
      val ev = Td(s, dir, "events")
      val users = ev.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_users"))
      val values = ev.groupBy(col("event_type"))
        .agg(countDistinct(cents).as("n_values"))
      val hll = ev.groupBy(col("event_type"))
        .agg(approx_count_distinct(cents, rsd = 0.01).as("n_approx"))
      val quantiles = ev.groupBy(col("event_type"))
        .agg(percentile_approx(col("value"), lit(0.5), lit(10000)).as("p50_approx"),
          expr("percentile(value, 0.5)").as("p50_exact"))
      users.join(values, Seq("event_type"))
        .join(hll, Seq("event_type"))
        .join(quantiles, Seq("event_type"))
        .select(col("event_type"), col("n_users"), col("n_values"),
          (abs(col("n_approx") - col("n_values")) <= col("n_values") * 0.05)
            .as("hll_ok"),
          (abs(col("p50_approx") - col("p50_exact")) <= abs(col("p50_exact")) * 0.02)
            .as("p50_ok"))
        .orderBy(col("event_type"))
    }
  )

  /** Salted two-stage aggregation under the gate: `Skew.saltedCount`
    * must equal a plain GROUP BY count — the salt is an internal
    * rebalancing detail that may never change results. l_returnflag
    * has 3 giant groups (the single-hot-group shape AQE cannot split);
    * the salt spreads each over 32 buckets before the final combine. */
  val saltedAgg = Q(
    "q_salted_agg",
    Some("SELECT l_returnflag, count(*) AS cnt FROM lineitem GROUP BY 1 ORDER BY 1"),
    (s, dir) =>
      Skew.saltedCount(Td(s, dir, "lineitem"), "l_returnflag", 32,
        col("l_orderkey"))
        .orderBy(col("l_returnflag"))
  )

  val all: Seq[Q] = Seq(
    aggSum, aggHaving, collectSet, collectList, condAgg, stringAggOrdered,
    maxUnion, boolOr, anyClassify, correlatedCount, twoLevelAgg, jsonDoc,
    objectAgg, dateRange, approxDistinct, saltedAgg)
}
