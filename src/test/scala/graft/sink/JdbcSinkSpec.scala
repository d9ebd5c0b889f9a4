package graft.sink

import org.scalatest.funsuite.AnyFunSuite

import graft.model.{ColType, TableSpec}

class JdbcSinkSpec extends AnyFunSuite {

  private val spec = TableSpec("graph.thing",
    Seq("id" -> ColType.Str, "schema_name" -> ColType.Str,
      "schema_birth_date" -> ColType.DateT))
  private val child = TableSpec("graph.schema_license",
    Seq("intellectual_entity_id" -> ColType.Str, "schema_license" -> ColType.Str),
    pk = Nil, entityKey = Some("intellectual_entity_id"))

  test("MERGE INTO dialect") {
    val sql = JdbcSink.upsertSql(spec, "tmp_thing", JdbcSink.MergeInto)
    assert(sql == "MERGE INTO graph.thing t USING tmp_thing s ON t.id = s.id " +
      "WHEN MATCHED THEN UPDATE SET schema_name = s.schema_name, " +
      "schema_birth_date = s.schema_birth_date " +
      "WHEN NOT MATCHED THEN INSERT (id, schema_name, schema_birth_date) " +
      "VALUES (s.id, s.schema_name, s.schema_birth_date)")
  }

  test("ON CONFLICT dialect") {
    val sql = JdbcSink.upsertSql(spec, "tmp_thing", JdbcSink.OnConflict)
    assert(sql == "INSERT INTO graph.thing (id, schema_name, schema_birth_date) " +
      "SELECT id, schema_name, schema_birth_date FROM tmp_thing " +
      "ON CONFLICT (id) DO UPDATE SET schema_name = EXCLUDED.schema_name, " +
      "schema_birth_date = EXCLUDED.schema_birth_date")
  }

  test("key-clear delete for child tables; upsert refuses PK-less specs") {
    assert(JdbcSink.keyClearSql(child, "tmp_lic") ==
      "DELETE FROM graph.schema_license WHERE intellectual_entity_id IN " +
        "(SELECT DISTINCT intellectual_entity_id FROM tmp_lic)")
    intercept[IllegalArgumentException](
      JdbcSink.upsertSql(child, "tmp_lic", JdbcSink.MergeInto))
  }
}
