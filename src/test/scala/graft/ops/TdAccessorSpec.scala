package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType, TimestampNTZType}

import graft.SparkSuite

/** Locks the schema-adaptive event-time accessors to one semantic
  * across every `ts` encoding the testdata has shipped (round-9
  * regeneration changed it under us once): the same instant must yield
  * the same integer µs/ms and the same timestamp regardless of whether
  * the column arrives as nanos-as-long, TIMESTAMP, or TIMESTAMP_NTZ —
  * sessions run UTC, so NTZ-as-UTC equals the DuckDB oracle's
  * `epoch_us` reading. */
class TdAccessorSpec extends SparkSuite {

  // instants in µs: epoch, a 2023 date with sub-second µs, a sub-ms
  // one, plus 200 seeded random instants — the equivalence must hold
  // on the whole grid, not on round numbers. Domain: ±9.0e15 µs
  // (±ca. 285 years around epoch), the intersection of the encodings'
  // ranges — nanos-as-long saturates at ±2^63 ns ≈ year 2262, so wider
  // instants are unrepresentable in the LEGACY encoding by
  // construction (not an accessor defect).
  private val usValues: Seq[Long] = {
    val rnd = new scala.util.Random(42L)
    Seq(0L, 1700000000123456L, 999L) ++
      Seq.fill(200)(rnd.nextLong() % 9_000_000_000_000_000L)
  }

  private def encodings: Seq[(String, DataFrame)] = {
    import spark.implicits._
    val fromLong = usValues.map(_ * 1000L).toDF("ts") // legacy nanos
    val fromTs = usValues.toDF("us")
      .select(timestamp_micros(col("us")).as("ts"))
    val fromNtz = fromTs.select(col("ts").cast(TimestampNTZType).as("ts"))
    Seq("nanos-long" -> fromLong, "timestamp" -> fromTs, "ntz" -> fromNtz)
  }

  test("tsUs yields identical integer microseconds on every encoding") {
    import spark.implicits._
    for ((label, df) <- encodings) {
      val got = df.select(Td.tsUs(df).as("us")).as[Long].collect().sorted
      assert(got.toSeq == usValues.sorted, s"encoding $label")
    }
  }

  test("tsMs truncates to the same millisecond grid on every encoding") {
    import spark.implicits._
    // FLOOR to the grid (the convention all paths share — unix_millis
    // floors; truncation would differ on pre-epoch instants)
    val wantMs = usValues.map(Math.floorDiv(_, 1000L)).sorted
    for ((label, df) <- encodings) {
      val got = df.select(Td.tsMs(df).as("ms")).as[Long].collect().sorted
      assert(got.toSeq == wantMs, s"encoding $label")
    }
  }

  test("tsStamp yields the same instants on every encoding") {
    import spark.implicits._
    for ((label, df) <- encodings) {
      val got = df.select(unix_micros(Td.tsStamp(df)).as("us"))
        .as[Long].collect().sorted
      assert(got.toSeq == usValues.sorted, s"encoding $label")
    }
  }

  test("NTZ parquet round-trip (the current testdata encoding) adapts") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ntz").toString
    val ntz = encodings.collectFirst { case ("ntz", df) => df }.get
    ntz.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.schema("ts").dataType == TimestampNTZType,
      "parquet writer no longer round-trips NTZ — revisit Td accessors")
    val got = back.select(Td.tsUs(back).as("us")).as[Long].collect().sorted
    assert(got.toSeq == usValues.sorted)
  }

  test("an unsupported ts type fails loudly, naming the column") {
    val df = spark.createDataFrame(
      java.util.List.of[org.apache.spark.sql.Row](),
      StructType(Seq(StructField("ts", StringType))))
    val e = intercept[IllegalArgumentException](Td.tsUs(df))
    assert(e.getMessage.contains("`ts`"))
  }
}
