package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

class SkewSpec extends SparkSuite {

  test("saltedCount equals plain count per key") {
    val s = spark
    import s.implicits._
    // hot key: 10k rows on one key, trickle on others
    val df = ((1 to 10000).map(i => ("hot", i)) ++ (1 to 7).map(i => (s"cold$i", i)))
      .toDF("k", "v")
    val plain = df.groupBy("k").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(df, "k", buckets = 8, saltSource = col("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("saltedJoin equals plain join") {
    val s = spark
    import s.implicits._
    val left = ((1 to 5000).map(i => ("hot", i)) ++ Seq(("cold", 1))).toDF("k", "v")
    val right = Seq(("hot", "H"), ("cold", "C"), ("absent", "A")).toDF("k", "tag")
    val plain = left.join(right, Seq("k")).groupBy("k", "tag").count()
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val salted = Skew.saltedJoin(left, right, "k", buckets = 8,
      leftSaltSource = col("v")).groupBy("k", "tag").count()
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(salted == plain)
  }

  test("salt is deterministic and within range") {
    val s = spark
    import s.implicits._
    val df = (1 to 100).toDF("v")
    val salts = df.select(Skew.salt(8, col("v")).as("s")).collect().map(_.getInt(0))
    assert(salts.forall(x => x >= 0 && x < 8))
    val again = df.select(Skew.salt(8, col("v")).as("s")).collect().map(_.getInt(0))
    assert(salts.sameElements(again))
  }
}
