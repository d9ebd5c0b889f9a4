package graft.view

import org.apache.spark.sql.DataFrame

import graft.SparkSuite
import graft.model.Quad

class PersonPipelineSpec extends SparkSuite {
  import PersonPipeline.V

  private def t(s: String, p: String, o: String): Quad = Quad(s, p, o, null, null, null)

  private val fixture = Seq(
    t("ie1", V.Mentions, "urn:mention/m1"),
    t("urn:mention/m1", V.Confidence, "0.87"),
    t("urn:mention/m1", V.Name, "Jan Jansens"),
    t("urn:mention/m1", V.Highlight, "urn:hl/1"),
    t("urn:hl/1", V.X, "10.5"),
    t("urn:hl/1", V.Y, "20"),
    t("ie2", V.Mentions, "urn:mention/m2"), // no confidence → default 0.0
    t("urn:mention/m2", V.Name, "An Peeters"))

  private def quads: DataFrame = {
    val s = spark
    import s.implicits._
    fixture.toDF()
  }

  test("inverse path reaches entities from mentions; confidence defaults") {
    val m = PersonPipeline(quads)("graph.schema_mentions").collect()
      .map(r => r.getAs[String]("thing_id") ->
        (r.getAs[String]("intellectual_entity_id"),
          r.getAs[java.math.BigDecimal]("confidence"))).toMap
    assert(m("urn:mention/m1")._1 == "ie1")
    assert(m("urn:mention/m1")._2.doubleValue() == 0.87)
    assert(m("urn:mention/m2")._2.doubleValue() == 0.0) // typed default
  }

  test("highlight link + coords tables") {
    val tables = PersonPipeline(quads)
    val link = tables("graph.schema_mentions_highlight").collect()
    assert(link.length == 1 && link.head.getAs[String]("highlight_id") == "urn:hl/1")
    val hl = tables("graph.highlight").collect().head
    assert(hl.getAs[Double]("x") == 10.5 && hl.getAs[Double]("y") == 20.0)
    assert(tables("graph.thing").count() == 2)
  }
}
