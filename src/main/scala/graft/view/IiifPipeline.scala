package graft.view

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IIIF copy pipeline (reference: typescript/queries/iiif.sparql).
  *
  * Distinctive shapes: the inverse path `^haObj:hasIIIFCopy`
  * (iiif.sparql:96) — images are reached from the IIIF copy backwards to
  * the entity — and the storage-URL sequence path
  * `premis:storedAt/rdf:value` (iiif.sparql:72 via av-audio.sparql:486
  * same idiom). Output feeds the entity's thumbnail/image columns.
  */
object IiifPipeline {

  object V {
    val HasIIIFCopy = "https://data.hetarchief.be/ns/object/hasIIIFCopy"
    val StoredAt = "http://www.loc.gov/premis/rdf/v3/storedAt"
    val RdfValue = "http://www.w3.org/1999/02/22-rdf-syntax-ns#value"
    val MimeType = "http://www.ebu.ch/metadata/ontologies/ebucore/ebucore#hasMimeType"
  }
  import Patterns._
  import V._

  /** → one row per (entity, IIIF image URL, mime). */
  def apply(quadsIn: DataFrame, params: ViewParams = ViewParams()): DataFrame = {
    // 3 pattern slices read this input; persist once (Patterns scaladoc).
    val quads = ensurePersisted(quadsIn)
    // ?img ^haObj:hasIIIFCopy ?ie — hasIIIFCopy points entity → copy;
    // the inverse traversal keys the match on the copy side (s = img).
    val copyOf = invPath(quads, HasIIIFCopy, "ie")
      .select(col("ie").as("intellectual_entity_id"), col("s").as("img"))
    val urls = seqPath(quads, StoredAt, RdfValue, "url")
      .select(col("s").as("img"), col("url"))
    val mimes = po(quads, MimeType, "mime")
      .select(col("s").as("img"), col("mime"))
    copyOf
      .join(urls, Seq("img"), "left")
      .join(mimes, Seq("img"), "left")
      .select(col("intellectual_entity_id"), col("img").as("iiif_id"),
        col("url"), col("mime"))
  }
}
