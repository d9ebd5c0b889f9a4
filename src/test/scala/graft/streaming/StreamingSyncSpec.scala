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
}
