package graft

import org.apache.spark.sql.types._

import graft.ops.Td

/** Testdata contract probe.
  *
  * Round 9 regressed 7 queries because the driver regenerated the
  * testdata with `events.ts` re-encoded (nanos-as-long →
  * TIMESTAMP_MICROS/NTZ) and the failure surfaced as seven unrelated
  * `AnalysisException`s. This spec pins the *expected* Spark-side type
  * of every column the batteries touch, so the next silent regeneration
  * produces ONE failure that names the drifted column, not seven
  * mysterious ones.
  *
  * Event-time columns accept any member of the encoding family that
  * `Td.tsUs`/`tsStamp`/`tsMs` adapt to (timestamp, timestamp_ntz,
  * nanos-as-long under the legacy flag) — drift *within* the family is
  * handled by the accessors and only drift *outside* it is a failure.
  */
class SchemaProbeSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private val eventTime: Set[DataType] =
    Set(TimestampType, TimestampNTZType, LongType)

  /** expected type per column: Left(exact) or Right(allowed family) */
  private val expected: Map[String, Seq[(String, Either[DataType, Set[DataType]])]] = Map(
    "region" -> Seq(
      "r_regionkey" -> Left(IntegerType),
      "r_name" -> Left(StringType)),
    "nation" -> Seq(
      "n_nationkey" -> Left(IntegerType),
      "n_name" -> Left(StringType),
      "n_regionkey" -> Left(IntegerType)),
    "customer" -> Seq(
      "c_custkey" -> Left(LongType),
      "c_name" -> Left(StringType),
      "c_nationkey" -> Left(IntegerType),
      "c_acctbal" -> Left(DoubleType),
      "c_mktsegment" -> Left(StringType)),
    "supplier" -> Seq(
      "s_suppkey" -> Left(LongType),
      "s_name" -> Left(StringType),
      "s_nationkey" -> Left(IntegerType),
      "s_acctbal" -> Left(DoubleType)),
    "part" -> Seq(
      "p_partkey" -> Left(LongType),
      "p_name" -> Left(StringType),
      "p_brand" -> Left(StringType),
      "p_type" -> Left(StringType),
      "p_size" -> Left(IntegerType),
      "p_retailprice" -> Left(DoubleType)),
    "orders" -> Seq(
      "o_orderkey" -> Left(LongType),
      "o_custkey" -> Left(LongType),
      "o_orderstatus" -> Left(StringType),
      "o_totalprice" -> Left(DoubleType),
      "o_orderdate" -> Right(eventTime + DateType),
      "o_orderpriority" -> Left(StringType)),
    "lineitem" -> Seq(
      "l_orderkey" -> Left(LongType),
      "l_partkey" -> Left(LongType),
      "l_suppkey" -> Left(LongType),
      "l_linenumber" -> Left(IntegerType),
      "l_quantity" -> Left(DoubleType),
      "l_extendedprice" -> Left(DoubleType),
      "l_discount" -> Left(DoubleType),
      "l_tax" -> Left(DoubleType),
      "l_returnflag" -> Left(StringType),
      "l_linestatus" -> Left(StringType),
      "l_shipdate" -> Right(eventTime + DateType)),
    "events" -> Seq(
      "event_id" -> Left(LongType),
      "ts" -> Right(eventTime),
      "user_id" -> Left(LongType),
      "event_type" -> Left(StringType),
      "value" -> Left(DoubleType),
      "props" -> Left(StringType)),
    "documents" -> Seq(
      "doc_id" -> Left(LongType),
      "text" -> Left(StringType),
      "lang" -> Left(StringType),
      "source" -> Left(StringType),
      "n_chars" -> Left(LongType)),
    "embeddings" -> Seq(
      "vec_id" -> Left(LongType),
      "embedding" -> Left(ArrayType(FloatType, containsNull = true)),
      "label" -> Left(IntegerType))
  )

  for ((table, cols) <- expected.toSeq.sortBy(_._1)) {
    test(s"testdata contract: $table") {
      assume(new java.io.File(s"$dir/$table.parquet").exists(),
        s"testdata table $table absent at $dir")
      val schema = Td(spark, dir, table).schema
      val drift = new scala.collection.mutable.ListBuffer[String]
      for ((name, want) <- cols) {
        schema.find(_.name == name) match {
          case None => drift += s"$table.$name: MISSING (testdata regeneration dropped it?)"
          case Some(f) => want match {
            case Left(t) if f.dataType != t =>
              drift += s"$table.$name: expected $t, testdata now has ${f.dataType} — " +
                "the driver regenerated the parquet with a new encoding; " +
                "adapt the batteries (see Td accessors) before trusting query failures"
            case Right(family) if !family.contains(f.dataType) =>
              drift += s"$table.$name: ${f.dataType} is outside the supported " +
                s"event-time family $family — extend Td.tsUs/tsStamp/tsMs for it"
            case _ => ()
          }
        }
      }
      val extra = schema.map(_.name).toSet -- cols.map(_._1).toSet
      if (extra.nonEmpty)
        info(s"new unexpected columns (not a failure): ${extra.mkString(", ")}")
      assert(drift.isEmpty, "\n" + drift.mkString("\n"))
    }
  }
}
