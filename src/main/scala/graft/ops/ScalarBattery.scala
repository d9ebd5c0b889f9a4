package graft.ops

import org.apache.spark.sql.functions._
import graft.functions.{Functions => F}

/** Filter + scalar-function families (SURVEY.md §2.2, §2.8).
  *
  * Everything here stays inside whole-stage codegen: built-in
  * `functions._` only, no UDFs in the hot path.
  */
object ScalarBattery {

  /** `VALUES` inline table / `FILTER … IN` allow-list → isin
    * (reference: typescript/queries/av-audio.sparql:193,207-217 — entity
    * classes and the 9-license allow-list). */
  val valuesIn = Q(
    "q_values_in",
    Some(
      "SELECT o_orderpriority, count(*) AS cnt FROM orders " +
        "WHERE o_orderpriority IN ('1-URGENT','2-HIGH') GROUP BY 1 ORDER BY 1"),
    (s, dir) =>
      Td(s, dir, "orders")
        .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("o_orderpriority"))
  )

  /** `NOT IN` blacklist (reference: flows/queries/update_partition.sql:66
    * format blacklist). */
  val notIn = Q(
    "q_not_in",
    Some(
      "SELECT p_type, count(*) AS cnt FROM part " +
        "WHERE p_type NOT IN ('PROMO','ECONOMY') GROUP BY 1 ORDER BY 1"),
    (s, dir) =>
      Td(s, dir, "part")
        .filter(!col("p_type").isin("PROMO", "ECONOMY"))
        .groupBy(col("p_type"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("p_type"))
  )

  /** `strStarts` / `contains` / `!=` string predicates
    * (reference: typescript/queries/organization.sparql:66 `OR-` prefix;
    * av-audio.sparql:504 contains "peak"). */
  val strFilters = Q(
    "q_str_filters",
    Some(
      "SELECT p_brand, count(*) AS cnt FROM part " +
        "WHERE p_name LIKE 'small%' AND contains(p_name, 'g') AND p_type <> 'PROMO' " +
        "GROUP BY 1 ORDER BY 1"),
    (s, dir) =>
      Td(s, dir, "part")
        .filter(
          col("p_name").startsWith("small") &&
            col("p_name").contains("g") &&
            col("p_type") =!= "PROMO")
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("p_brand"))
  )

  /** Incremental `?since` cutoff — pushed-down timestamp filter
    * (reference: typescript/queries/av-audio.sparql:220
    * `FILTER (!BOUND(?since) || ?modified >= ?since)`). */
  val sinceFilter = Q(
    "q_since_filter",
    Some(
      "SELECT l_returnflag, count(*) AS cnt, round(sum(l_extendedprice),2) AS price " +
        "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1995-06-01' GROUP BY 1 ORDER BY 1"),
    (s, dir) =>
      Td(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1995-06-01").cast("timestamp"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("l_extendedprice")), 2).as("price"))
        .orderBy(col("l_returnflag"))
  )

  /** `LIKE '%fragment'` suffix match
    * (reference: flows/queries/update_partition.sql:309). */
  val likeSuffix = Q(
    "q_like",
    Some(
      "SELECT count(*) AS cnt FROM part WHERE p_name LIKE '%gear'"),
    (s, dir) =>
      Td(s, dir, "part")
        .filter(col("p_name").like("%gear"))
        .agg(count(lit(1)).as("cnt"))
  )

  /** Key synthesis + IRI local-name + nested IF: CONCAT/MD5/REPLACE-regex
    * and when-chains (reference: typescript/queries/av-audio.sparql:226-229
    * `IRI(CONCAT(str(?ie),"/…/",md5(…)))` and `REPLACE(str,"^.*[/]([^/]*)$","$1")`;
    * nested IF av-audio.sparql:330-334). */
  val scalarBind = Q(
    "q_scalar_bind",
    Some(
      "SELECT s_suppkey, md5(s_name) AS name_hash, " +
        "s_name || '/' || md5(CAST(s_suppkey AS VARCHAR)) AS synth_key, " +
        "regexp_extract(s_name, '([0-9]+)$', 1) AS local_name, " +
        "CASE WHEN s_acctbal < 0 THEN 'neg' WHEN s_acctbal < 5000 THEN 'mid' ELSE 'high' END AS band " +
        "FROM supplier ORDER BY 1"),
    (s, dir) =>
      Td(s, dir, "supplier")
        .select(
          col("s_suppkey"),
          md5(col("s_name")).as("name_hash"),
          F.synthKey(col("s_name"), col("s_suppkey").cast("string")).as("synth_key"),
          regexp_extract(col("s_name"), "([0-9]+)$", 1).as("local_name"),
          when(col("s_acctbal") < 0, "neg")
            .when(col("s_acctbal") < 5000, "mid")
            .otherwise("high").as("band"))
        .orderBy(col("s_suppkey"))
  )

  /** `create_slug` + lower/replace partition-name normalization
    * (reference: flows/queries/update_partition.sql:58 `graph.create_slug`;
    * flows/arc_db_load_index_tables_flow.py:39-40 lower(replace(…))). */
  val slug = Q(
    "q_slug",
    Some(
      "SELECT p_partkey, regexp_replace(lower(p_name), '[^a-z0-9]+', '-', 'g') AS slug, " +
        "lower(replace(p_brand, '#', '_')) AS part_name FROM part ORDER BY 1"),
    (s, dir) =>
      Td(s, dir, "part")
        .select(
          col("p_partkey"),
          F.createSlug(col("p_name")).as("slug"),
          lower(regexp_replace(col("p_brand"), "#", "_")).as("part_name"))
        .orderBy(col("p_partkey"))
  )

  /** `BIND(?unbound)` typed NULL + `COALESCE` typed default
    * (reference: typescript/queries/av-audio.sparql:222-227 NULL for
    * excluded licenses; person.sparql:113 confidence default 0.0). */
  val nullBind = Q(
    "q_null_bind",
    Some(
      "SELECT c_custkey, CASE WHEN c_acctbal < 0 THEN NULL ELSE round(c_acctbal,2) END AS bal_or_null, " +
        "coalesce(CASE WHEN c_acctbal < 0 THEN NULL ELSE round(c_acctbal,2) END, 0.0) AS bal_defaulted " +
        "FROM customer ORDER BY 1"),
    (s, dir) => {
      val balOrNull = when(col("c_acctbal") < 0, lit(null).cast("double"))
        .otherwise(round(col("c_acctbal"), 2))
      Td(s, dir, "customer")
        .select(
          col("c_custkey"),
          balOrNull.as("bal_or_null"),
          coalesce(balOrNull, lit(0.0)).as("bal_defaulted"))
        .orderBy(col("c_custkey"))
    }
  )

  /** JSON path access (reference:
    * flows/arc_db_load_index_tables_flow.py:209
    * `document->'schema_maintainer'->>'schema_name'`). */
  val jsonPath = Q(
    "q_json_path",
    Some(
      "SELECT event_type, avg(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS avg_k, " +
        "count(*) AS cnt FROM events GROUP BY 1 ORDER BY 1"),
    (s, dir) =>
      Td(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(
          // avg over longs = exact integer sum / exact count → one double
          // division, bit-identical in Spark and DuckDB; `round` on the
          // result is what diverges at half-way doubles, so none here.
          avg(get_json_object(col("props"), "$.k").cast("long")).as("avg_k"),
          count(lit(1)).as("cnt"))
        .orderBy(col("event_type"))
  )

  /** Timestamp arithmetic: month bucketing + per-group span in seconds
    * (reference: flows/queries/update_partition.sql:87,98 interval math;
    * typescript/src/stream.ts:30-31 durations as seconds). */
  val dateOps = Q(
    "q_date_ops",
    Some(
      "SELECT date_trunc('month', o_orderdate) AS month, count(*) AS cnt, " +
        "round(sum(o_totalprice),2) AS total FROM orders GROUP BY 1 ORDER BY 1"),
    (s, dir) =>
      Td(s, dir, "orders")
        .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("o_totalprice")), 2).as("total"))
        .orderBy(col("month"))
  )

  /** Event-time span per user — seconds between first and last event
    * (duration arithmetic family, reference:
    * flows/queries/update_partition.sql:98 `schema_end_time - schema_start_time`).
    *
    * `events.ts` arrives as either TIMESTAMP_MICROS (read TIMESTAMP_NTZ)
    * or legacy nanos-as-long — `Td.tsUs` resolves the encoding from the
    * schema and yields exact integer µs either way (see its scaladoc).
    * Both sides aggregate on that µs grid (DuckDB's `epoch_us` is the
    * same resolution); the span is then an exact integer µs difference
    * divided once by 1e6 — deterministic in both engines, no rounding
    * step. */
  val durationSpan = Q(
    "q_duration_span",
    Some(
      "SELECT user_id, (max(epoch_us(ts)) - min(epoch_us(ts))) / 1000000.0 AS span_sec, " +
        "count(*) AS cnt FROM events GROUP BY 1 ORDER BY 1"),
    (s, dir) => {
      val ev = Td(s, dir, "events")
      val us = Td.tsUs(ev)
      ev.groupBy(col("user_id"))
        .agg(
          ((max(us) - min(us)) / lit(1000000.0)).as("span_sec"),
          count(lit(1)).as("cnt"))
        .orderBy(col("user_id"))
    }
  )

  /** ISO-8601 duration parse → seconds (reference:
    * typescript/src/stream.ts:30-31 `toSeconds(parseDuration(v))` for
    * xsd:duration literals). Duration strings are synthesized from
    * lineitem numerics so the oracle can state the expected seconds in
    * closed form — the parse itself runs only on the Spark side, which is
    * exactly what the check must exercise. Rows with returnflag 'R' feed
    * garbage to assert the null-on-unparseable contract. */
  val durationParse = Q(
    "q_duration_parse",
    Some(
      "SELECT l_orderkey, l_linenumber, CASE WHEN l_returnflag = 'R' THEN NULL ELSE " +
        "l_linenumber * 86400 + (l_partkey % 24) * 3600 + l_quantity END AS dur_sec " +
        "FROM lineitem WHERE l_orderkey % 100 = 0 ORDER BY 1, 2"),
    (s, dir) => {
      val iso = when(col("l_returnflag") === "R", lit("not-a-duration"))
        .otherwise(concat(
          lit("P"), col("l_linenumber"), lit("DT"),
          col("l_partkey") % 24, lit("H"), col("l_quantity"), lit("S")))
      Td(s, dir, "lineitem")
        .filter(col("l_orderkey") % 100 === 0)
        .select(col("l_orderkey"), col("l_linenumber"),
          // the native codegen expression, under the oracle gate
          graft.functions.IsoDurationSecondsExpr(iso).as("dur_sec"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }
  )

  /** Type-coercion battery: year-clamp (year < 1 forced to year 1,
    * reference: typescript/src/stream.ts:35-39), invalid-date→null
    * (database.ts:127-131), absent-boolean→false (database.ts:132-135).
    * Dates are shifted back 1997 years so roughly half land before year 1
    * and exercise the clamp. The clamped date is serialized as an ISO
    * string on BOTH sides: pandas `datetime64[ns]` cannot represent
    * year-1 dates, so a date-typed column diverges in the driver compare
    * even when both engines computed the identical date. */
  val typeCoerce = Q(
    "q_type_coerce",
    Some(
      "SELECT o_orderkey, CAST(CASE WHEN year(o_orderdate) - 1997 < 1 " +
        "THEN make_date(1, month(o_orderdate), least(day(o_orderdate), 28)) " +
        "ELSE make_date(year(o_orderdate) - 1997, month(o_orderdate), least(day(o_orderdate), 28)) END AS VARCHAR) AS clamped, " +
        "TRY_CAST(o_orderpriority AS DATE) AS bad_date, " +
        "coalesce(CASE WHEN o_totalprice < 100000 THEN NULL ELSE TRUE END, FALSE) AS flag " +
        "FROM orders WHERE o_orderkey % 50 = 0 ORDER BY 1"),
    (s, dir) => {
      val shifted = make_date(
        year(col("o_orderdate")) - 1997,
        month(col("o_orderdate")),
        least(dayofmonth(col("o_orderdate")), lit(28)))
      Td(s, dir, "orders")
        .filter(col("o_orderkey") % 50 === 0)
        .select(
          col("o_orderkey"),
          date_format(F.clampYear(shifted), "yyyy-MM-dd").as("clamped"),
          F.dateOrNull(col("o_orderpriority")).as("bad_date"),
          F.booleanDefault(when(col("o_totalprice") < 100000, lit(null))
            .otherwise(lit(true))).as("flag"))
        .orderBy(col("o_orderkey"))
    }
  )

  val all: Seq[Q] = Seq(
    valuesIn, notIn, strFilters, sinceFilter, likeSuffix, scalarBind, slug,
    nullBind, jsonPath, dateOps, durationSpan, durationParse, typeCoerce)
}
