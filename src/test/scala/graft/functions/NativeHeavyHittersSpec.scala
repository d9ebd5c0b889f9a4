package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

class NativeHeavyHittersSpec extends SparkSuite {
  import spark.implicits._

  // Zipf-ish stream: item i appears ~N/(i+1) times.
  private def stream(n: Int, seed: Long): Seq[Long] = {
    val r = new scala.util.Random(seed)
    Seq.fill(n)(math.min(49L, math.floor(1.0 / (r.nextDouble() + 1e-9)).toLong))
  }

  test("every item with frequency > n/k survives, under any partitioning") {
    val data = stream(20000, 5)
    val exact = data.groupBy(identity).map { case (v, xs) => v -> xs.size.toLong }
    val k = 10
    val heavy = exact.filter { case (_, c) => c * k > data.size }.keySet
    assert(heavy.nonEmpty, "fixture must contain heavy items")
    for (parts <- Seq(1, 4, 13)) {
      val summary = data.toDF("v").repartition(parts)
        .agg(MisraGriesExpr(col("v"), k).as("s"))
        .select(explode(col("s")).as("e"))
        .select(col("e.item")).as[Long].collect().toSet
      assert(heavy.subsetOf(summary), s"lost a heavy hitter at parts=$parts")
      assert(summary.size <= k - 1, s"summary exceeded k-1 at parts=$parts")
    }
  }

  test("weights underestimate true counts by at most n/k") {
    val data = stream(20000, 7)
    val k = 10
    val exact = data.groupBy(identity).map { case (v, xs) => v -> xs.size.toLong }
    val got = data.toDF("v").repartition(8)
      .agg(MisraGriesExpr(col("v"), k).as("s"))
      .select(explode(col("s")).as("e"))
      .select(col("e.item"), col("e.weight")).as[(Long, Long)].collect()
    got.foreach { case (item, w) =>
      val truth = exact.getOrElse(item, 0L)
      assert(w <= truth, s"overestimate for $item")
      assert(truth - w <= data.size / k + 1, s"error bound blown for $item")
    }
  }

  test("non-long input is rejected at analysis time, not on an executor") {
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      Seq("a", "b").toDF("v").agg(MisraGriesExpr(col("v"), 5)).collect()
    }
    assert(err.getMessage.toLowerCase.contains("type"))
  }

  test("summary presentation is weight desc then item asc") {
    val data = Seq.fill(100)(1L) ++ Seq.fill(100)(2L) ++ Seq.fill(5)(3L)
    val got = data.toDF("v").agg(MisraGriesExpr(col("v"), 5).as("s"))
      .select(explode(col("s")).as("e"))
      .select(col("e.item"), col("e.weight")).as[(Long, Long)].collect().toSeq
    assert(got.map(_._1).take(2) === Seq(1L, 2L)) // ties broken by item asc
    assert(got === got.sortBy { case (i, w) => (-w, i) })
  }
}
