package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.delete.DeleteFlow
import graft.model.{ColType, Ns, Quad, TableSpec}
import graft.pivot.SubjectPivot
import graft.sink.Upsert

/** Golden end-to-end scenario (SURVEY.md §5 #2): view quads → pivot →
  * full-sync load → incremental batch → delete flow, asserting final
  * table state and the incremental ≡ full-on-union property across the
  * whole engine, not per-operator.
  */
class EndToEndSpec extends SparkSuite {

  private val ieSpec = TableSpec("graph.intellectual_entity", Seq(
    "schema_identifier" -> ColType.Str, "schema_name" -> ColType.Str,
    "schema_duration" -> ColType.DurationSeconds), pk = Seq("subject"))
  private val licSpec = TableSpec("graph.schema_license", Seq(
    "intellectual_entity_id" -> ColType.Str, "schema_license" -> ColType.Str),
    pk = Nil, entityKey = Some("intellectual_entity_id"),
    deps = Seq("graph.intellectual_entity"))

  private def route(s: String, table: String) =
    Quad(s, Ns.TableName, table, null, null, null)
  private def q(s: String, p: String, o: String, lang: String = null) =
    Quad(s, Ns.KgToPostgres + p, o, lang, null, null)
  private def lic(ie: String, l: String) = Seq(
    route(s"$ie/lic/$l", "graph.schema_license"),
    q(s"$ie/lic/$l", "intellectual_entity_id", ie),
    q(s"$ie/lic/$l", "schema_license", l))

  private val batch1: Seq[Quad] = Seq(
    route("ie1", "graph.intellectual_entity"),
    q("ie1", "schema_identifier", "id-1"),
    q("ie1", "schema_name", "Name One"),
    q("ie1", "schema_name", "Naam Een", lang = "nl"),
    q("ie1", "schema_duration", "PT1H"),
    route("ie2", "graph.intellectual_entity"),
    q("ie2", "schema_identifier", "id-2"),
    q("ie2", "schema_name", "Name Two")) ++
    lic("ie1", "VIAA-PUBLIEK-METADATA-ALL") ++
    lic("ie2", "VIAA-PUBLIEK-METADATA-ALL") ++ lic("ie2", "BEZOEKERTOOL-CONTENT")

  // incremental: ie2 renamed and loses one license; ie3 arrives
  private val batch2: Seq[Quad] = Seq(
    route("ie2", "graph.intellectual_entity"),
    q("ie2", "schema_identifier", "id-2"),
    q("ie2", "schema_name", "Name Two Renamed"),
    route("ie3", "graph.intellectual_entity"),
    q("ie3", "schema_identifier", "id-3"),
    q("ie3", "schema_name", "Name Three")) ++
    lic("ie2", "VIAA-PUBLIEK-METADATA-ALL") ++
    lic("ie3", "VIAA-ONDERWIJS")

  private def toDF(rows: Seq[Quad]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF()
  }

  private def load(current: Map[String, DataFrame], quads: Seq[Quad],
                   fullSync: Boolean): Map[String, DataFrame] = {
    val staged = SubjectPivot.pivotAll(toDF(quads), Seq(ieSpec, licSpec))
    Upsert.applyAll(current, staged, Seq(ieSpec, licSpec), fullSync).toMap
  }

  test("full sync then incremental merge: pivot + nl-override + key-clear") {
    val afterFull = load(Map.empty, batch1, fullSync = true)
    val afterIncr = load(afterFull, batch2, fullSync = false)

    val ie = afterIncr("graph.intellectual_entity").collect()
      .map(r => r.getAs[String]("subject") -> r.getAs[String]("schema_name")).toMap
    assert(ie == Map(
      "ie1" -> "Naam Een", // nl-override survived the load
      "ie2" -> "Name Two Renamed", // PK merge updated
      "ie3" -> "Name Three")) // inserted

    val lics = afterIncr("graph.schema_license").collect()
      .map(r => (r.getAs[String]("intellectual_entity_id"),
        r.getAs[String]("schema_license"))).toSet
    // key-clear: ie2's old BEZOEKERTOOL row is gone, ie1 untouched
    assert(lics == Set(
      ("ie1", "VIAA-PUBLIEK-METADATA-ALL"),
      ("ie2", "VIAA-PUBLIEK-METADATA-ALL"),
      ("ie3", "VIAA-ONDERWIJS")))

    val dur = afterIncr("graph.intellectual_entity")
      .filter("subject = 'ie1'").collect().head.getAs[Double]("schema_duration")
    assert(dur == 3600.0) // native duration coercion through the pivot
  }

  test("incremental run ∘ full run ≡ full run on union (disjoint entities)") {
    // batch2 touches ie2; restrict to the disjoint part for the identity
    val b2new = batch2.filterNot(_.subject.contains("ie2"))
    val viaIncr = load(load(Map.empty, batch1, fullSync = true), b2new, fullSync = false)
    val viaFull = load(Map.empty, batch1 ++ b2new, fullSync = true)
    Seq(ieSpec, licSpec).foreach { spec =>
      // name-sorted projection: the key-clear using-join moves the merge
      // key first, which is a column-order difference, not a data one
      def rows(df: DataFrame) = {
        val cols = df.columns.sorted.map(col)
        df.select(cols: _*).collect().map(_.toString).sorted
      }
      val a = rows(viaIncr(spec.name))
      val b = rows(viaFull(spec.name))
      assert(a.sameElements(b),
        s"divergence in ${spec.name}:\n${a.mkString("\n")}\n--vs--\n${b.mkString("\n")}")
    }
  }

  test("delete flow removes flagged entities from the loaded state") {
    val state = load(Map.empty, batch1, fullSync = true)
    val sourceQuads = toDF(Seq(
      Quad("frag-ie2", DeleteFlow.V.Modified, "2024-02-01", null, null, null),
      Quad("frag-ie2", DeleteFlow.V.DateDeleted, "2024-02-01", null, null, null),
      Quad("frag-ie2", DeleteFlow.V.Pid, "ie2", null, null, null)))
    val flags = DeleteFlow.flagDeletes(sourceQuads, Some("2024-01-01"), prefixIdBase = "")
    val entities = state("graph.intellectual_entity")
      .withColumnRenamed("subject", "id")
    val fragments = state("graph.schema_license") // any child keyed by entity id
    val (kept, childKept) = DeleteFlow.applyDeletes(entities, fragments, flags)
    assert(kept.collect().map(_.getAs[String]("id")).toSet == Set("ie1"))
    assert(childKept.collect()
      .map(_.getAs[String]("intellectual_entity_id")).toSet == Set("ie1"))
  }
}
