package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSuite
import graft.model.{ColType, Ns, Quad, TableSpec}

/** Micro-batch incremental sync: two batches through the pivot+merge
  * engine, second batch overwrites the touched entity. */
class StreamingSyncSpec extends SparkSuite {

  test("foreachBatch incremental sync merges batches per entity") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val spec = TableSpec("graph.stream_entity",
      Seq("schema_name" -> ColType.Str), pk = Seq("subject"))
    val dir = java.nio.file.Files.createTempDirectory("streamsync").toString

    val input = MemoryStream[Quad]
    val query = StreamingSync.start(input.toDF(), Seq(spec),
      s"$dir/tables", s"$dir/ckpt",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(100))

    def route(subj: String) =
      Quad(subj, Ns.TableName, "graph.stream_entity", null, null, null)
    def name(subj: String, v: String) =
      Quad(subj, Ns.KgToPostgres + "schema_name", v, null, null, null)

    try {
      input.addData(route("e1"), name("e1", "first"), route("e2"), name("e2", "two"))
      query.processAllAvailable()
      input.addData(route("e1"), name("e1", "updated"))
      query.processAllAvailable()
    } finally query.stop()

    val out = spark.read.parquet(s"$dir/tables/graph_stream_entity")
      .collect().map(r => r.getAs[String]("subject") -> r.getAs[String]("schema_name"))
      .toMap
    assert(out == Map("e1" -> "updated", "e2" -> "two"))
  }

  test("restart from the checkpoint CONTINUES the stream: committed " +
    "batches are not re-read, the resumed batch id advances, end state " +
    "matches a single run") {
    // The durability contract a continuous 100 TB sync leans on: kill
    // the query between micro-batches, start a NEW query on the same
    // checkpoint, and the file source must resume past every committed
    // batch (a from-scratch restart would re-read slice 1 as batch 0;
    // the commits log distinguishes the two outcomes unambiguously).
    val s = spark
    import s.implicits._

    val spec = TableSpec("graph.restart_entity",
      Seq("schema_name" -> ColType.Str), pk = Seq("subject"))
    val dir = java.nio.file.Files.createTempDirectory("streamrestart").toString
    val (feed, tables, ckpt) = (s"$dir/feed", s"$dir/tables", s"$dir/ckpt")

    def route(subj: String) =
      Quad(subj, Ns.TableName, "graph.restart_entity", null, null, null)
    def name(subj: String, v: String) =
      Quad(subj, Ns.KgToPostgres + "schema_name", v, null, null, null)
    val quadSchema = org.apache.spark.sql.Encoders.product[Quad].schema
    def feedStream = s.readStream.schema(quadSchema).parquet(feed)

    // run 1: slice 1 only (AvailableNow terminates when drained)
    Seq(route("e1"), name("e1", "first"), route("e2"), name("e2", "two"))
      .toDF().write.mode("append").parquet(feed)
    val q1 = StreamingSync.start(feedStream, Seq(spec), tables, ckpt)
    q1.awaitTermination()
    val mid = spark.read.parquet(s"$tables/graph_restart_entity")
      .collect().map(r => r.getAs[String]("subject") -> r.getAs[String]("schema_name"))
      .toMap
    assert(mid == Map("e1" -> "first", "e2" -> "two"))

    // the query object is gone; slice 2 lands while nothing is running
    Seq(route("e1"), name("e1", "updated"), route("e3"), name("e3", "three"))
      .toDF().write.mode("append").parquet(feed)

    // run 2: a brand-new query on the SAME checkpoint
    val q2 = StreamingSync.start(feedStream, Seq(spec), tables, ckpt)
    q2.awaitTermination()
    val out = spark.read.parquet(s"$tables/graph_restart_entity")
      .collect().map(r => r.getAs[String]("subject") -> r.getAs[String]("schema_name"))
      .toMap
    assert(out == Map("e1" -> "updated", "e2" -> "two", "e3" -> "three"))

    // proof of continuation: run 2 committed exactly batch 1 (a scratch
    // restart would have re-read everything as a fresh batch 0)
    val commits = new java.io.File(s"$ckpt/commits").list()
      .filterNot(_.startsWith(".")).toSet
    assert(commits == Set("0", "1"),
      s"expected the restarted query to continue at batch 1, commits=$commits")
  }
}
