package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Native codegen expression vs the composed-builtins form: identical
  * semantics, plus SQL-surface registration via GraftExtensions. */
class NativeDurationSpec extends SparkSuite {

  private val cases = Seq(
    "PT1H2M3S", "P1DT2H", "P3Y", "P2M", "P1W", "-PT30S", "PT0.5S",
    "P1YT1S", "P", "PT", "not-a-duration", "1H", "PT1H1H", "PTS", null)

  test("native expression matches the composed regex form on all cases") {
    val s = spark
    import s.implicits._
    val df = cases.toDF("d")
    val out = df.select(
      Functions.isoDurationSeconds(col("d")).as("composed"),
      IsoDurationSecondsExpr(col("d")).as("native")).collect()
    out.zip(cases).foreach { case (r, c) =>
      assert(r.isNullAt(0) == r.isNullAt(1), s"null mismatch for '$c'")
      if (!r.isNullAt(0))
        assert(r.getDouble(0) == r.getDouble(1), s"value mismatch for '$c'")
    }
  }

  test("known values and rejections") {
    assert(NativeDuration.parseBoxed("PT1H2M3S") == 3723.0)
    assert(NativeDuration.parseBoxed("-PT30S") == -30.0)
    assert(NativeDuration.parseBoxed("P1Y") == 365.0 * 86400)
    assert(NativeDuration.parseBoxed("P") == null) // zero components
    assert(NativeDuration.parseBoxed("PT1H1H") == null) // repeated unit
    assert(NativeDuration.parseBoxed("P1H") == null) // time unit in date part
    assert(NativeDuration.parseBoxed("xPT1H") == null)
  }

  test("stays inside whole-stage codegen") {
    // A real scan (local Seqs fold to LocalTableScan with no stages):
    // the projection containing the expression must be codegen'd.
    val df = spark.read.parquet("/root/testdata/sf0.001/supplier.parquet")
      .select(IsoDurationSecondsExpr(
        concat(lit("PT"), col("s_suppkey"), lit("S"))).as("sec"))
    val plan = df.queryExecution.executedPlan.toString
    // `*(n)` marks a WholeStageCodegen stage in the plan string; the
    // projection carrying the expression must sit inside one.
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[iso_duration_seconds.*"),
      s"codegen lost:\n$plan")
    // and it must actually evaluate through the generated path
    assert(df.limit(3).collect().forall(!_.isNullAt(0)))
  }

  test("SQL surface via extension function registration") {
    GraftExtensions.functions.foreach { case (id, info, builder) =>
      if (!spark.sessionState.functionRegistry.functionExists(id))
        spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
    val r = spark.sql(
      "SELECT iso_duration_seconds('PT2H') AS sec, iso_duration_seconds('nope') AS bad")
      .collect().head
    assert(r.getDouble(0) == 7200.0)
    assert(r.isNullAt(1))
  }
}
