package graft.view

import org.apache.spark.sql.DataFrame

import graft.SparkSuite
import graft.model.{Ns, Quad}

class CollectionPipelineSpec extends SparkSuite {
  import CollectionPipeline.V

  private def t(s: String, p: String, o: String): Quad = Quad(s, p, o, null, null, null)
  private val S = V.SchemaNs

  private val fixture = Seq(
    t("ie1", V.IsPartOf, "coll:series1"),
    t("coll:series1", Ns.RdfType, S + "CreativeWorkSeries"),
    t("coll:series1", V.Name, "Journaal"),
    t("ie2", V.IsPartOf, "coll:season1"),
    t("coll:season1", Ns.RdfType, S + "CreativeWorkSeason"),
    t("coll:season1", V.SeasonNumber, "3"),
    t("ie3", V.IsPartOf, "coll:weird"),
    t("coll:weird", Ns.RdfType, S + "SomethingElse"), // → fallback
    t("coll:series1", V.AlternateName, "t Journaal"))

  private def quads: DataFrame = {
    val s = spark
    import s.implicits._
    fixture.toDF()
  }

  test("error-trick type mapping translated as when-chain") {
    val types = CollectionPipeline(quads)("graph.collection").collect()
      .map(r => r.getAs[String]("id") -> r.getAs[String]("collection_type")).toMap
    assert(types("coll:series1") == "series")
    assert(types("coll:season1") == "season")
    assert(types("coll:weird") == "collection") // COALESCE fallback branch
  }

  test("season number coerced to int; link + extras tables") {
    val tables = CollectionPipeline(quads)
    val season = tables("graph.collection")
      .filter("id = 'coll:season1'").collect().head
    assert(season.getAs[Int]("schema_season_number") == 3)
    val links = tables("graph.schema_is_part_of").collect()
      .map(r => r.getAs[String]("intellectual_entity_id") -> r.getAs[String]("type")).toMap
    assert(links("ie1") == "series" && links("ie2") == "season")
    assert(tables("graph.newspaper_schema_alternate_name").count() == 1)
  }
}
