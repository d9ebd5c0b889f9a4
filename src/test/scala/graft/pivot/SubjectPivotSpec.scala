package graft.pivot

import org.apache.spark.sql.DataFrame

import graft.SparkSuite
import graft.model.{ColType, Ns, TableSpec, Quad}

/** Pivot semantics per FIXTURES.md §A fixture cases
  * (reference: typescript/src/stream.ts:77-107). */
class SubjectPivotSpec extends SparkSuite {
  import ColType._

  private val ns = Ns.KgToPostgres
  private def quads(rows: Seq[Quad]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF()
  }

  private val spec = TableSpec("graph.intellectual_entity_mini", Seq(
    "schema_name" -> Str, "schema_identifier" -> Str,
    "schema_duration" -> DurationSeconds, "schema_date_created" -> DateT,
    "is_deleted" -> Bool, "schema_position" -> IntT))

  private def quad(s: String, p: String, o: String, lang: String = null): Quad =
    Quad(s, ns + p, o, lang, null, null)
  private def route(s: String): Quad =
    Quad(s, Ns.TableName, "graph.intellectual_entity_mini", null, null, null)

  private val fixture = Seq(
    route("ie1"),
    quad("ie1", "schema_name", "Journal 1998"),
    quad("ie1", "schema_name", "Journaal 1998", lang = "nl"), // nl must win
    quad("ie1", "schema_identifier", "qs25b0dn3k"),
    quad("ie1", "schema_duration", "PT1H2M3S"),  // → 3723.0 s
    quad("ie1", "schema_date_created", "0000-06-15"), // year 0 → clamped to 1
    quad("ie1", "schema_position", "7"),
    route("ie2"),
    quad("ie2", "schema_name", "bbb"),
    quad("ie2", "schema_name", "aaa"), // two untagged: deterministic min
    quad("ie2", "schema_date_created", "not-a-date"), // → null
    // is_deleted absent on both → false (database.ts:132-135)
    Quad("ie3", ns + "schema_name", "no route", null, null, null) // no :tableName
  )

  test("pivot: routing, nl-override, coercion, defaults") {
    val out = SubjectPivot.pivotTable(quads(fixture), spec)
      .orderBy("subject").collect()
    assert(out.length == 2) // ie3 unrouted → dropped
    val ie1 = out(0)
    assert(ie1.getAs[String]("subject") == "ie1")
    assert(ie1.getAs[String]("schema_name") == "Journaal 1998") // nl wins
    assert(ie1.getAs[String]("schema_identifier") == "qs25b0dn3k")
    assert(ie1.getAs[Double]("schema_duration") == 3723.0)
    assert(ie1.getAs[java.sql.Date]("schema_date_created").toLocalDate.getYear == 1)
    assert(ie1.getAs[Boolean]("is_deleted") == false)
    assert(ie1.getAs[Int]("schema_position") == 7)
    val ie2 = out(1)
    assert(ie2.getAs[String]("schema_name") == "aaa") // deterministic min
    assert(ie2.getAs[java.sql.Date]("schema_date_created") == null)
    assert(ie2.getAs[Boolean]("is_deleted") == false)
  }

  test("unrouted surfaces subjects lacking :tableName") {
    val bad = SubjectPivot.unrouted(quads(fixture)).collect().map(_.getString(0))
    assert(bad.toSet == Set("ie3"))
  }

  test("pivot is input-order-insensitive (seeded permutations)") {
    // Property the reference cannot offer: its pivot depends on stream
    // order (stream.ts:78); ours must not. 8 random permutations.
    val expected = SubjectPivot.pivotTable(quads(fixture), spec)
      .orderBy("subject").collect().toSeq
    (1 to 8).foreach { seed =>
      val shuffled = new scala.util.Random(seed).shuffle(fixture)
      val got = SubjectPivot.pivotTable(quads(shuffled), spec)
        .orderBy("subject").collect().toSeq
      assert(got == expected, s"order-sensitivity at seed $seed")
    }
  }

  test("multi-table routing splits by :tableName") {
    val two = fixture ++ Seq(
      Quad("f1", Ns.TableName, "graph.file_mini", null, null, null),
      Quad("f1", ns + "schema_name", "file one", null, null, null))
    val fileSpec = TableSpec("graph.file_mini", Seq("schema_name" -> Str))
    val m = SubjectPivot.pivotAll(quads(two), Seq(spec, fileSpec))
    assert(m("graph.file_mini").collect().map(_.getAs[String]("subject")).toSet == Set("f1"))
    assert(m(spec.name).collect().map(_.getAs[String]("subject")).toSet == Set("ie1", "ie2"))
  }
}
