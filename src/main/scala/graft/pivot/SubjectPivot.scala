package graft.pivot

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{Functions => F}
import graft.model.{ColType, Ns, TableSpec}

/** Subject pivot — the engine's core operator (SURVEY.md §2.4 #32).
  *
  * The reference folds *consecutive same-subject* quads into one wide
  * record: column = predicate minus the `urn:kg-to-postgres:` namespace,
  * first value wins with an `nl`-tagged value overriding, and the
  * `:tableName` quad routes the record
  * (reference: typescript/src/stream.ts:77-107; routing :90-91,
  * first/nl rule :97-103).
  *
  * Spark-first design: `groupBy(subject)` with one `langPreferredFirst`
  * aggregate per *declared* column (the static registry replaces the
  * reference's Postgres introspection). This removes the reference's
  * subject-contiguity fragility (stream.ts:78 — a re-appearing subject
  * silently produced a second record) and is order-independent; the
  * "first value" is made deterministic as min-value-within-priority
  * (SURVEY.md §7.4).
  *
  * Scale shape: ONE shuffle on `subject`, after a predicate `isin`
  * filter that prunes the scan to the table's declared predicates
  * (pushed to Parquet). Routing is an aggregate flag, not a
  * subject-list semi-join — no second shuffle, no driver collect.
  */
object SubjectPivot {

  /** Coerce a pivoted string value to the declared column type
    * (reference: typescript/src/stream.ts:29-42 + database.ts:127-135).
    * Every cast is regex- or parser-guarded: Spark 4 runs ANSI mode by
    * default, where a bare `cast` on a malformed string throws instead
    * of producing the null the reference's coercion expects. */
  def coerce(c: Column, t: ColType): Column = {
    def guarded(pattern: String, to: String): Column =
      when(c.rlike(pattern), c.cast(to))
    t match {
      case ColType.Str        => c
      case ColType.Bool       =>
        coalesce(
          when(lower(c) === "true" || c === "1", lit(true))
            .when(lower(c) === "false" || c === "0", lit(false)),
          lit(false))
      case ColType.DateT      => F.clampYear(F.dateOrNull(c))
      case ColType.TimestampT => try_to_timestamp(c)
      case ColType.IntT       => guarded("^-?\\d+$", "int")
      case ColType.DoubleT    => guarded("^-?\\d+(\\.\\d+)?([eE][+-]?\\d+)?$", "double")
      case ColType.DurationSeconds =>
        // native codegen expression (same semantics as the composed
        // form — NativeDurationSpec proves equality)
        graft.functions.IsoDurationSecondsExpr(c)
      case ColType.DecimalT   =>
        coalesce(guarded("^-?\\d+(\\.\\d+)?$", "decimal(5,4)"),
          lit(new java.math.BigDecimal("0.0")))
    }
  }

  /** Pivot the quads routed to one table into its wide DataFrame. */
  def pivotTable(quads: DataFrame, spec: TableSpec,
                 ns: String = Ns.KgToPostgres): DataFrame = {
    val colPreds = spec.cols.map { case (n, _) => ns + n }
    // Predicate pushdown: only this table's predicates + the routing
    // predicate survive the scan.
    val pruned = quads.filter(col("predicate").isin(Ns.TableName +: colPreds: _*))
    val valueAggs = spec.cols.map { case (n, t) =>
      coerce(
        F.langPreferredFirst(
          when(col("predicate") === (ns + n), col("obj")), col("lang")),
        t).as(n)
    }
    val routed = max(
      when(col("predicate") === Ns.TableName && col("obj") === spec.name, 1))
      .as("__routed")
    pruned
      .groupBy(col("subject"))
      .agg(valueAggs.head, (valueAggs.tail :+ routed): _*)
      .filter(col("__routed") === 1)
      .drop("__routed")
  }

  /** Pivot every registry table in one pass over the quads: returns one
    * DataFrame per table name. Each output is an independent plan over
    * the same (cacheable) quad input — callers processing many tables
    * should `quads.persist()` first so the scan is shared. */
  def pivotAll(quads: DataFrame, specs: Seq[TableSpec],
               ns: String = Ns.KgToPostgres): Map[String, DataFrame] =
    specs.map(spec => spec.name -> pivotTable(quads, spec, ns)).toMap

  /** Subjects carrying column quads but no `:tableName` routing quad —
    * the reference throws on these (stream.ts:131-134); we surface them
    * as a validation DataFrame so a run can fail or log with context. */
  def unrouted(quads: DataFrame): DataFrame =
    quads
      .groupBy(col("subject"))
      .agg(max(when(col("predicate") === Ns.TableName, 1).otherwise(0)).as("has_route"))
      .filter(col("has_route") === 0)
      .select(col("subject"))
}
