package graft.view

import graft.SparkSuite
import graft.model.Quad

class IiifPipelineSpec extends SparkSuite {
  import IiifPipeline.V

  test("inverse copy traversal + stored-at URL path") {
    val s = spark
    import s.implicits._
    val quads = Seq(
      Quad("ie1", V.HasIIIFCopy, "img1", null, null, null),
      Quad("img1", V.StoredAt, "loc1", null, null, null),
      Quad("loc1", V.RdfValue, "https://iiif.example/1.jpg", null, null, null),
      Quad("img1", V.MimeType, "image/jpeg", null, null, null),
      Quad("ie2", V.HasIIIFCopy, "img2", null, null, null) // no URL → left join null
    ).toDF()
    val out = IiifPipeline(quads).collect()
      .map(r => r.getAs[String]("intellectual_entity_id") ->
        (r.getAs[String]("url"), r.getAs[String]("mime"))).toMap
    assert(out("ie1") == ("https://iiif.example/1.jpg", "image/jpeg"))
    assert(out("ie2") == (null, null))
  }
}
