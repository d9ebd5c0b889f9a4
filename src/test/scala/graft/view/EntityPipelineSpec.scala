package graft.view

import org.apache.spark.sql.DataFrame

import graft.SparkSuite
import graft.model.{Ns, Quad}

/** Parameterized AV/newspaper skeleton over a synthetic source fixture
  * (reference: typescript/queries/av-audio.sparql). */
class EntityPipelineSpec extends SparkSuite {
  import EntityPipeline.Vocab._

  private def t(s: String, p: String, o: String, lang: String = null): Quad =
    Quad(s, p, o, lang, null, null)

  private val audioType = "https://schema.org/AudioObject"
  private val fixture = Seq(
    // ie1: audio entity, licensed, with rep → 2 files (one peak json)
    t("ie1", Ns.RdfType, audioType),
    t("ie1", Identifier, "qs25b0dn3k"),
    t("ie1", Name, "Journaal", "nl"),
    t("ie1", License, "VIAA-PUBLIEK-METADATA-ALL"),
    t("ie1", License, "VIAA-PUBLIEK-CONTENT"), // NULL'd for AV
    t("ie1", Modified, "2024-02-01"),
    t("ie1", Keywords, "nieuws"),
    t("ie1", Keywords, "archief"),
    t("ie1", Genre, "journaal"),
    // roles: the TWO-node structure (av-audio.sparql:328-343) — ie →
    // creator → role node (a schema:Role, roleName) → creator → thing
    // (a schema:Thing, name). The direct ie→creator→thing triple below
    // is the OLD flattened shape kept as a decoy: it must yield NO row.
    t("ie1", Creator, "urn:role/1"),
    t("urn:role/1", Ns.RdfType, SchemaRole),
    t("urn:role/1", RoleName, "maker"),
    t("urn:role/1", Creator, "urn:thing/jan"),
    t("urn:thing/jan", Ns.RdfType, SchemaThing),
    t("urn:thing/jan", Name, "Jan"),
    t("ie1", Creator, "urn:thing/jan"),
    t("ie1", FragmentPid, "pid-ie1"),
    t("ie1", PremisId, "urn:primary:qs25b0dn3k"),
    t("rep1", Represents, "ie1"),
    t("rep1", Includes, "file1"),
    t("rep1", Includes, "file2"),
    t("file1", MimeType, "audio/mpeg"),
    t("file1", OriginalName, "journaal.mp3"),
    t("file1", Duration, "PT1H2M3S"),
    t("file2", MimeType, "application/json"),
    t("file2", OriginalName, "journaal_peak.json"),
    // ie2: unlicensed → excluded from base
    t("ie2", Ns.RdfType, audioType),
    t("ie2", Identifier, "nolicense"),
    t("ie2", Modified, "2024-02-01"),
    // ie3: licensed but stale modification
    t("ie3", Ns.RdfType, audioType),
    t("ie3", License, "VIAA-PUBLIEK-METADATA-ALL"),
    t("ie3", Modified, "2020-01-01"))

  private def quads: DataFrame = {
    val s = spark
    import s.implicits._
    fixture.toDF()
  }

  test("base match: type VALUES + license allow-list + since cutoff") {
    val tables = EntityPipeline(quads, EntityPipeline.avAudio,
      ViewParams(since = Some("2024-01-01")))
    val ids = tables("graph.intellectual_entity").collect()
      .map(_.getAs[String]("id")).toSet
    assert(ids == Set("ie1")) // ie2 unlicensed, ie3 stale
  }

  test("license NULL rule: AV families null excluded licenses, keep rows") {
    val av = EntityPipeline(quads, EntityPipeline.avAudio)("graph.schema_license")
      .collect().map(_.getAs[String]("schema_license")).toSet
    assert(av == Set("VIAA-PUBLIEK-METADATA-ALL", null))
    val np = EntityPipeline(quads,
      EntityPipeline.newspaper.copy(entityTypes = Seq(audioType)))("graph.schema_license")
      .collect().map(_.getAs[String]("schema_license")).toSet
    assert(np == Set("VIAA-PUBLIEK-METADATA-ALL", "VIAA-PUBLIEK-CONTENT"))
  }

  test("peak files: audio keeps them, video config drops them") {
    val audioFiles = EntityPipeline(quads, EntityPipeline.avAudio)("graph.file")
      .collect().map(_.getAs[String]("id")).toSet
    assert(audioFiles == Set("file1", "file2"))
    val videoCfg = EntityPipeline.avVideo.copy(
      entityTypes = Seq(audioType),
      mimeTypes = Seq("audio/mpeg", "application/json"))
    val videoFiles = EntityPipeline(quads, videoCfg)("graph.file")
      .collect().map(_.getAs[String]("id")).toSet
    assert(videoFiles == Set("file1")) // peak json dropped
  }

  test("duration parses to seconds; two-node roles keyed by role node") {
    val tables = EntityPipeline(quads, EntityPipeline.avAudio)
    val f1 = tables("graph.file").filter("id = 'file1'").collect().head
    assert(f1.getAs[Double]("schema_duration") == 3723.0)
    val roles = tables("graph.schema_role").collect()
    assert(roles.length == 1) // the flattened decoy produced no row
    assert(roles.head.getAs[String]("type") == "schema_creator")
    // CONSTRUCT `:id ?role` (av-audio.sparql:94): the id IS the role node
    assert(roles.head.getAs[String]("id") == "urn:role/1")
    assert(roles.head.getAs[String]("schema_role_name") == "maker")
    assert(roles.head.getAs[String]("thing_id") == "urn:thing/jan")
    val things = tables("graph.thing").collect()
    assert(things.map(r => (r.getAs[String]("id"), r.getAs[String]("schema_name")))
      .toSet == Set(("urn:thing/jan", "Jan")))
  }

  test("premis identifier classification: primary vs local name") {
    val prem = EntityPipeline(quads, EntityPipeline.avAudio)("graph.premis_identifier")
      .collect()
    assert(prem.head.getAs[String]("type") == "primary")
  }

  test("UNION branch machinery: branches union per target table") {
    val tables = EntityPipeline(quads, EntityPipeline.avAudio)
    val kw = tables("graph.schema_keywords").collect()
      .map(_.getAs[String]("schema_keywords")).toSet
    assert(kw == Set("nieuws", "archief"))
    assert(tables("graph.schema_genre").count() == 1)
    // includes rows survive only when rep and file both survive
    val inc = tables("graph.includes").collect()
      .map(r => (r.getAs[String]("representation_id"), r.getAs[String]("file_id"))).toSet
    assert(inc == Set(("rep1", "file1"), ("rep1", "file2")))
  }
}
