package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Custom scalar/aggregate functions the reference needs and Spark lacks
  * (SURVEY.md §2.8, §2.11).
  *
  * Everything is composed from built-in `org.apache.spark.sql.functions`
  * so the expressions stay inside whole-stage codegen — no Scala UDFs in
  * hot paths.
  */
object Functions {

  /** ISO-8601 duration string → seconds (Double).
    *
    * Reference behavior: typescript/src/stream.ts:30-31 converts
    * `xsd:duration` literals with iso8601-duration's
    * `toSeconds(parseDuration(v))`. That library resolves years/months
    * relative to the *current clock date*, which is nondeterministic; we
    * deliberately diverge to fixed factors (1Y = 365 d, 1M = 30 d) so the
    * function is pure. Media durations in the data (`PT1H2M3S` shapes)
    * have no Y/M component and are unaffected.
    *
    * Returns null for strings that are not ISO-8601 durations (matching
    * a parse failure upstream).
    */
  def isoDurationSeconds(c: Column): Column = {
    val num = "(\\d+(?:\\.\\d+)?)"
    val full = s"^-?P(?:${num}Y)?(?:${num}M)?(?:${num}W)?(?:${num}D)?" +
      s"(?:T(?:${num}H)?(?:${num}M)?(?:${num}S)?)?$$"
    // regexp_extract yields "" for an absent component; nullif keeps the
    // cast off that value so ANSI mode (Spark 4 default) cannot throw.
    def part(group: Int, factor: Double): Column =
      coalesce(nullif(regexp_extract(c, full, group), lit("")).cast("double"), lit(0.0)) * factor
    val seconds =
      part(1, 365.0 * 86400) + part(2, 30.0 * 86400) + part(3, 7.0 * 86400) +
        part(4, 86400.0) + part(5, 3600.0) + part(6, 60.0) + part(7, 1.0)
    val sign = when(c.startsWith("-"), -1.0).otherwise(1.0)
    // "P" alone (or "PT") is not a valid duration: require ≥1 component.
    when(c.rlike(full) && c.rlike("\\d"), seconds * sign)
  }

  /** Clamp dates before year 1 to year 1, preserving month/day
    * (reference: typescript/src/stream.ts:35-39 `setUTCFullYear(1)`). */
  def clampYear(c: Column): Column =
    when(year(c) < 1, make_date(lit(1), month(c), dayofmonth(c))).otherwise(c)

  /** Invalid date string → null (reference: typescript/src/database.ts:127-131
    * nulls non-`Date` values bound for date columns). `try_to_timestamp`
    * is the ANSI-safe parse (plain `to_date` throws on malformed input
    * under Spark 4's default ANSI mode). */
  def dateOrNull(c: Column): Column = to_date(try_to_timestamp(c))

  /** Absent boolean → false (reference: typescript/src/database.ts:132-135). */
  def booleanDefault(c: Column): Column = coalesce(c.cast("boolean"), lit(false))

  /** Lowercase-dashify slug — stands in for the `graph.create_slug`
    * Postgres UDF the reference calls but never defines
    * (reference: flows/queries/update_partition.sql:58; FIXTURES.md §B). */
  def createSlug(c: Column): Column =
    regexp_replace(lower(c), "[^a-z0-9]+", "-")

  /** IRI → last path segment, the `REPLACE(str(?x), "^.*[/]([^/]*)$", "$1")`
    * idiom (reference: typescript/queries/av-audio.sparql:226,293). */
  def iriLocalName(c: Column): Column =
    regexp_extract(c, "([^/]*)$", 1)

  /** Synthetic row key `base + "/" + md5(key)` — the
    * `IRI(CONCAT(str(?ie), "/", …, md5(str(?v))))` idiom
    * (reference: typescript/queries/av-audio.sparql:228-229,518-519). */
  def synthKey(base: Column, key: Column): Column =
    concat(base, lit("/"), md5(key))

  /** Same with a literal segment between base and hash, e.g.
    * `…/ie1/schema_license/<md5>` (reference: av-audio.sparql:228). */
  def synthKey(base: Column, segment: String, key: Column): Column =
    concat(base, lit("/" + segment + "/"), md5(key))

  /** Aggregate: pick one value per group with `nl`-language priority.
    *
    * Reference behavior (typescript/src/stream.ts:97-103): first value in
    * stream order wins, but an `nl`-tagged value overrides. Stream order
    * does not exist in a shuffled Dataset, so we use the deterministic
    * tiebreak SURVEY.md §7.4 prescribes: `nl` first, then minimum value —
    * order-independent and strictly reproducible.
    *
    * Implemented as `min(struct(priority, value))`: lexicographic struct
    * ordering picks lowest priority (nl=0), then lowest value. Null
    * values are excluded; returns null for all-null groups.
    */
  def langPreferredFirst(value: Column, lang: Column): Column =
    min(when(value.isNotNull,
      struct(when(lang === "nl", 0).otherwise(1).as("prio"), value.as("v"))))
      .getField("v")

  /** NT/Turtle string-literal escaping (W3C N-Triples §ECHAR) for
    * serializers emitting RDF text: backslash FIRST, then quote and the
    * control characters — so parsing the emitted literal yields the
    * original string byte-for-byte. `TurtleParserSpec` round-trips
    * hostile values through the real parser. */
  def ntEscapeLiteral(c: Column): Column =
    Seq(
      "\\\\" -> "\\\\\\\\", // \  → \\ (must run first)
      "\"" -> "\\\\\"",     // "  → \"
      "\\n" -> "\\\\n",     // LF → \n
      "\\r" -> "\\\\r",     // CR → \r
      "\\t" -> "\\\\t"      // TAB → \t
    ).foldLeft(c) { case (acc, (pat, rep)) => regexp_replace(acc, pat, rep) }
}
