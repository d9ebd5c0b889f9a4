package graft.view

import org.apache.spark.sql.DataFrame

import graft.SparkSuite
import graft.model.{Ns, Quad}

/** M0 vertical slice: organization construct pipeline over a synthetic
  * source-KG fixture (reference: typescript/queries/organization.sparql:59-127).
  */
class OrganizationPipelineSpec extends SparkSuite {
  import OrganizationPipeline.V

  private def t(s: String, p: String, o: String, lang: String = null): Quad =
    Quad(s, p, o, lang, null, null)

  private val org1 = "urn:org/1"
  private val org2 = "urn:org/2"
  private val fixture: Seq[Quad] = Seq(
    t(org1, Ns.RdfType, V.Organization),
    t(org1, V.PrefLabel, "VRT archief", "nl"),
    t(org1, V.PrefLabel, "VRT archive", "en"),
    t(org1, V.Identifier, "OR-w66976m"),
    t(org1, V.Description, "publieke omroep"),
    t(org1, V.Classification, "https://example.org/klass/Publieke_Omroep"),
    t(org1, V.HasSite, "urn:site/1"),
    t("urn:site/1", V.SiteAddress, "urn:addr/1"),
    t("urn:addr/1", V.StreetAddress, "Reyerslaan 52"),
    t("urn:addr/1", V.AddressLocality, "Brussel"),
    t("urn:addr/1", V.PostalCode, "1043"),
    t(org1, V.ContactPoint, "urn:cp/1"),
    t("urn:cp/1", V.Email, "archief@example.be"),
    t("urn:cp/1", V.ContactType, "ontsluiting"),
    // org2: no nl label → must be excluded from the base match
    t(org2, Ns.RdfType, V.Organization),
    t(org2, V.PrefLabel, "Only English", "en"),
    t(org2, V.Identifier, "OR-aaaaaaa"),
    // non-OR identifier subject → excluded
    t("urn:org/3", Ns.RdfType, V.Organization),
    t("urn:org/3", V.PrefLabel, "Geen OR", "nl"),
    t("urn:org/3", V.Identifier, "XX-123"))

  private def quads: DataFrame = {
    val s = spark
    import s.implicits._
    fixture.toDF()
  }

  test("base match requires type + nl label + OR- identifier") {
    val out = OrganizationPipeline(quads)("graph.organization").collect()
    assert(out.map(_.getAs[String]("id")).toSet == Set(org1))
    val r = out.head
    assert(r.getAs[String]("skos_pref_label") == "VRT archief")
    assert(r.getAs[String]("org_identifier") == "OR-w66976m")
    assert(r.getAs[String]("dcterms_description") == "publieke omroep")
    assert(r.getAs[String]("org_classification") == "Publieke_Omroep") // iri local name bind
    assert(r.getAs[String]("foaf_homepage") == null) // OPTIONAL absent → null
  }

  test("postal address path org:hasSite/org:siteAddress") {
    val tables = OrganizationPipeline(quads)
    val addr = tables("graph.schema_postal_address").collect()
    assert(addr.length == 1)
    assert(addr.head.getAs[String]("id") == "urn:addr/1")
    assert(addr.head.getAs[String]("organization_id") == org1)
    assert(addr.head.getAs[String]("schema_street_address") == "Reyerslaan 52")
    assert(addr.head.getAs[String]("schema_address_country") == null)
    val link = tables("graph.organization_has_postal_address").collect()
    assert(link.head.getAs[String]("postal_address_id") == "urn:addr/1")
  }

  test("contact point table") {
    val cp = OrganizationPipeline(quads)("graph.schema_contact_point").collect()
    assert(cp.length == 1)
    assert(cp.head.getAs[String]("schema_email") == "archief@example.be")
    assert(cp.head.getAs[String]("schema_telephone") == null)
  }

  test("or_ids scoping filters the whole pipeline") {
    val none = OrganizationPipeline(quads, ViewParams(orIds = Seq("OR-other")))
    assert(none("graph.organization").count() == 0)
    val hit = OrganizationPipeline(quads, ViewParams(orIds = Seq("OR-w66976m")))
    assert(hit("graph.organization").count() == 1)
  }
}
