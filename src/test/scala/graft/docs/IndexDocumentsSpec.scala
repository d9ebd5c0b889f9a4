package graft.docs

import graft.SparkSuite

/** Partition lifecycle: dynamic overwrite touches only present
  * partitions; empty-partition drop removes directories. */
class IndexDocumentsSpec extends SparkSuite {

  test("dynamic partition overwrite rewrites only touched partitions") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("docs").toString + "/docs"
    val v1 = Seq((1L, "or_a", "doc-a1"), (2L, "or_b", "doc-b1"))
      .toDF("id", "index", "document")
    IndexDocuments.writePartitioned(v1, dir)
    // refresh ONLY or_a
    val v2 = Seq((1L, "or_a", "doc-a2")).toDF("id", "index", "document")
    IndexDocuments.overwriteTouchedPartitions(v2, dir)
    val out = spark.read.parquet(dir).collect()
      .map(r => r.getAs[String]("index") -> r.getAs[String]("document")).toMap
    assert(out == Map("or_a" -> "doc-a2", "or_b" -> "doc-b1"))
  }

  test("dropPartitions removes org partitions entirely") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("docs").toString + "/docs"
    val v1 = Seq((1L, "or_a", "a"), (2L, "or_b", "b")).toDF("id", "index", "document")
    IndexDocuments.writePartitioned(v1, dir)
    IndexDocuments.dropPartitions(spark, dir, Seq("or_b"))
    val left = spark.read.parquet(dir).collect().map(_.getAs[String]("index")).toSet
    assert(left == Set("or_a"))
  }
}
