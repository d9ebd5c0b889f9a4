package graft.view

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{Functions => F}

/** Parameterized entity construct pipeline — the shared skeleton of the
  * reference's av-audio / av-video / av-complex / newspaper queries
  * (typescript/queries/av-audio.sparql, 521 LoC; the four differ only in
  * entity-type VALUES, MIME VALUES, and peak-file handling — verified by
  * diff, SURVEY.md §2.2).
  *
  * The ~25 UNION branches per query (av-audio.sparql:231-520) are
  * data-driven here: each optional attribute family is a `BranchSpec`,
  * and branches targeting the same table union; the leading empty `{}`
  * branch of the SPARQL (the cross-product identity keeping the base
  * match alive) is the base entity row itself. This is what keeps 4
  * queries × 25 branches from becoming 5k lines of copy-paste
  * (SURVEY.md §7.4).
  */
object EntityPipeline {

  object Vocab {
    val SchemaNs = "https://schema.org/"
    val Identifier = SchemaNs + "identifier"
    val Name = SchemaNs + "name"
    val Description = SchemaNs + "description"
    val Maintainer = SchemaNs + "maintainer"
    val Modified = SchemaNs + "dateModified"
    val License = SchemaNs + "license"
    val Keywords = SchemaNs + "keywords"
    val Genre = SchemaNs + "genre"
    val InLanguage = SchemaNs + "inLanguage"
    val Abstract = SchemaNs + "abstract"
    val AlternateName = SchemaNs + "alternateName"
    val DateCreated = SchemaNs + "dateCreated"
    val DatePublished = SchemaNs + "datePublished"
    val Spatial = SchemaNs + "spatial"
    val Temporal = SchemaNs + "temporal"
    val CopyrightNotice = SchemaNs + "copyrightNotice"
    val CopyrightHolder = SchemaNs + "copyrightHolder"
    val PrefLabel = "http://www.w3.org/2004/02/skos/core#prefLabel"
    val Available = "http://purl.org/dc/terms/available"
    val IsPartOfRel = "https://data.hetarchief.be/ns/object/isPartOf"
    val HasCaptioning = "http://www.ebu.ch/metadata/ontologies/ebucore/ebucore#hasCaptioning"
    val OpenCaptions = "http://www.ebu.ch/metadata/ontologies/ebucore/ebucore#OpenCaptions"
    val Duration = SchemaNs + "duration"
    val Creator = SchemaNs + "creator"
    val Contributor = SchemaNs + "contributor"
    val Publisher = SchemaNs + "publisher"
    val DctFormat = "http://purl.org/dc/terms/format"
    val PremisId = "http://www.loc.gov/premis/rdf/v3/identifier"
    val FragmentPid = "https://data.hetarchief.be/ns/mh/fragmentPid"
    val DerivedFrom = "http://www.w3.org/ns/prov#wasDerivedFrom"
    val Represents = "http://www.loc.gov/premis/rdf/v3/represents"
    val Includes = "http://www.ebu.ch/metadata/ontologies/ebucore/ebucore#includes"
    val MimeType = "http://www.ebu.ch/metadata/ontologies/ebucore/ebucore#hasMimeType"
    val OriginalName = "http://www.loc.gov/premis/rdf/v3/originalName"
  }
  import Vocab._

  /** One UNION branch: an attribute family feeding one child table
    * column (av-audio.sparql:53-91 CONSTRUCT blocks). `langFilter`
    * models the nl-only literal branches (av-audio.sparql:235,277-283);
    * `via` models a `/`-sequence path through a mid node
    * (av-audio.sparql:253 `schema:spatial/schema:name`,
    * :311-324 copyright holder → prefLabel|name — the `|` alternative is
    * two BranchSpec rows targeting the same table, which the per-table
    * union machinery merges exactly like the SPARQL `{} UNION`). */
  final case class BranchSpec(table: String, pred: String, valueCol: String,
                              langFilter: Option[String] = None,
                              via: Option[String] = None)

  /** An `EXISTS { ?s <p1>/<p2> <obj> }` boolean bind on the entity row
    * (av-audio.sparql:392-394 `BIND(EXISTS { ?pc
    * ebucore:hasCaptioning/rdf:type ebucore:OpenCaptions } AS …)`). */
  final case class FlagSpec(flagCol: String, p1: String, p2: String, obj: String)

  /** The four reference queries as configs (entity-type VALUES
    * av-audio.sparql:193, MIME VALUES :491, peaks :504,
    * license NULL rule :222-227 vs newspaper.sparql:212). */
  final case class Config(
      name: String,
      entityTypes: Seq[String],
      mimeTypes: Seq[String],
      includePeaks: Boolean,
      nullLicenses: Seq[String], // licenses BIND'd to NULL for this family
      licenses: Seq[String] = graft.delete.DeleteFlow.DefaultAllowedLicenses)

  val avAudio = Config("av-audio",
    Seq(SchemaNs + "AudioObject"),
    Seq("audio/mpeg", "audio/wav", "application/json"), // peaks are json
    includePeaks = true,
    nullLicenses = Seq("VIAA-PUBLIEK-CONTENT", "Publiek-Domein"))
  val avVideo = avAudio.copy(name = "av-video",
    entityTypes = Seq(SchemaNs + "VideoObject", SchemaNs + "MediaObject"),
    mimeTypes = Seq("video/mp4"), includePeaks = false)
  val avComplex = avAudio.copy(name = "av-complex",
    entityTypes = Seq(SchemaNs + "MediaObject", SchemaNs + "CreativeWork"),
    mimeTypes = Seq("video/mp4", "audio/mpeg", "application/json"),
    includePeaks = true)
  val newspaper = Config("newspaper",
    Seq(SchemaNs + "Newspaper"),
    Seq("image/jpeg", "application/xml"),
    includePeaks = false,
    nullLicenses = Nil) // newspapers keep the public licenses

  /** Default child-table branches — the reference's UNION attribute
    * families (av-audio.sparql:231-324), data-driven: plain literals,
    * nl-filtered literals, `/`-paths through mid nodes, and the
    * copyright-holder prefLabel|name alternative as two rows on one
    * table. */
  def defaultBranches: Seq[BranchSpec] = Seq(
    BranchSpec("graph.schema_keywords", Keywords, "schema_keywords"),
    BranchSpec("graph.schema_genre", Genre, "schema_genre"),
    BranchSpec("graph.schema_in_language", InLanguage, "schema_in_language"),
    BranchSpec("graph.dcterms_format", DctFormat, "dcterms_format"),
    // nl-only literal branches (av-audio.sparql:233-236,277-283)
    BranchSpec("graph.schema_alternate_name", AlternateName,
      "schema_alternate_name", langFilter = Some("nl")),
    // sequence-path branch (av-audio.sparql:253 spatial/name)
    BranchSpec("graph.schema_spatial", SchemaNs + "name", "schema_spatial",
      via = Some(Spatial)),
    BranchSpec("graph.schema_temporal", Temporal, "schema_temporal"),
    // copyright holder: prefLabel | name through the holder node
    // (av-audio.sparql:311-324) — two rows, one table, unioned
    BranchSpec("graph.schema_copyright_holder", PrefLabel,
      "schema_copyright_holder", via = Some(CopyrightHolder)),
    BranchSpec("graph.schema_copyright_holder", SchemaNs + "name",
      "schema_copyright_holder", via = Some(CopyrightHolder)))

  /** Default EXISTS-flag binds (av-audio.sparql:392-394 captioning). */
  def defaultFlags: Seq[FlagSpec] = Seq(
    FlagSpec("has_open_captions", HasCaptioning, graft.model.Ns.RdfType,
      OpenCaptions))

  import Patterns._

  def apply(quadsIn: DataFrame, cfg: Config,
            params: ViewParams = ViewParams(),
            branches: Seq[BranchSpec] = defaultBranches,
            flags: Seq[FlagSpec] = defaultFlags): Map[String, DataFrame] = {
    // ~12 derived frames slice this input; persist once, not recompute 12×.
    val quads = Patterns.ensurePersisted(quadsIn)

    // Base match: typed entity + allowed license + incremental cutoff
    // (av-audio.sparql:193-220) — ONE aggregation pass: all three
    // conditions are bool_or flags over one predicate-pruned scan +
    // one groupBy(subject) shuffle, instead of two distincts plus two
    // semi-joins (4 shuffle stages) of the unfused form.
    val isTyped = col("predicate") === graft.model.Ns.RdfType &&
      col("obj").isin(cfg.entityTypes: _*)
    val isLicensed = col("predicate") === License &&
      col("obj").isin(cfg.licenses: _*)
    val sinceHit = params.since match {
      case None         => lit(true)
      case Some(cutoff) => col("predicate") === Modified && col("obj") >= lit(cutoff)
    }
    val scanFilter =
      if (params.since.isDefined)
        isTyped || isLicensed || (col("predicate") === Modified)
      else isTyped || isLicensed
    // NOT materialized, although ~12 consumers semi-join against it:
    // measured at sf0.1, an eager localCheckpoint here ADDS a blocking
    // job per invocation (median 3.5 s → 5.1 s) — the recomputed base
    // aggregations all run inside one job and overlap, while a
    // checkpoint serializes them behind a barrier. The quad input
    // checkpoint above already bounds the recompute cost.
    // The explicit isNotNull matters: semi-join consumers push
    // IsNotNull(subject) into THEIR copy of this subtree while the
    // left-outer consumer does not, and the differing filters break
    // canonical-plan matching — so ReuseExchange cannot share the base
    // aggregation and every consumer re-runs it. With the filter stated
    // here, all consumers see the identical subtree and the shuffle is
    // computed once (subjects are never null, so semantics are
    // unchanged).
    val base = quads
      .filter(scanFilter && col("subject").isNotNull)
      .groupBy(col("subject"))
      .agg(bool_or(isTyped).as("__t"), bool_or(isLicensed).as("__l"),
        bool_or(sinceHit).as("__m"))
      .filter(col("__t") && col("__l") && col("__m"))
      .select(col("subject").as("s"))

    // Entity-row scalar OPTIONALs (av-audio.sparql:221-300): plain
    // single-value binds, nl-filtered literals (description/abstract,
    // :277-283), dates, availability, copyright notice, is-part-of —
    // each an aggregate-to-one left join, so the base row never fans out.
    val ieScalars: Seq[(String, String, Option[String])] = Seq(
      (Identifier, "schema_identifier", None),
      (Name, "schema_name", None),
      (Description, "schema_description", None),
      (Maintainer, "schema_maintainer", None),
      (Abstract, "schema_abstract", Some("nl")),
      (DateCreated, "schema_date_created", None),
      (DatePublished, "schema_date_published", None),
      (Available, "dcterms_available", None),
      (CopyrightNotice, "schema_copyright_notice", None),
      (IsPartOfRel, "relation_is_part_of", None))
    // ONE conditional-agg pass for all scalar OPTIONALs (10 predicates
    // → 1 shuffle + 1 join, not 10 of each — see Patterns.optionalSingles).
    val ieJoined = base.join(optionalSingles(quads, ieScalars), Seq("s"), "left")
    val ieFlagged = flags.foldLeft(ieJoined) { (acc, f) =>
      acc.join(existsFlag(quads, f.p1, f.p2, f.obj, f.flagCol), Seq("s"), "left")
        .withColumn(f.flagCol, coalesce(col(f.flagCol), lit(false)))
    }
    val ie = ieFlagged.select(
      (col("s").as("id") +: ieScalars.map { case (_, c, _) => col(c) }) ++
        flags.map(f => col(f.flagCol)): _*)

    // License child rows with the family's NULL rule: excluded licenses
    // produce a row with a NULL value (BIND(?unbound) — :222-227), they
    // do not drop the row.
    val licenseRows = po(quads, License, "schema_license")
      .join(base, Seq("s"), "left_semi")
      .select(col("s").as("intellectual_entity_id"),
        when(col("schema_license").isin(cfg.nullLicenses: _*), lit(null))
          .otherwise(col("schema_license")).as("schema_license"))

    // premis identifiers with type classification (nested IF,
    // av-audio.sparql:286-297): primary ↔ the MediaHaven PID predicate.
    val premisRows = po(quads, PremisId, "value")
      .join(base, Seq("s"), "left_semi")
      .select(col("s").as("intellectual_entity_id"),
        F.iriLocalName(col("value")).as("type_raw"), col("value"))
      .select(col("intellectual_entity_id"),
        when(col("value").startsWith("urn:primary:"), "primary")
          .otherwise(col("type_raw")).as("type"),
        col("value"))
    val fragmentRows = po(quads, FragmentPid, "mh_fragment_identifier")
      .join(base, Seq("s"), "left_semi")
      .select(col("s").as("intellectual_entity_id"),
        col("mh_fragment_identifier"), lit(false).as("is_deleted"))

    // Roles: role type derived from the predicate (nested IF →
    // when-chain, av-audio.sparql:330-334); synthesized row key
    // (IRI(CONCAT(...md5...)), :228-229).
    val roleRows = Seq(Creator -> "schema_creator", Contributor -> "schema_contributor",
      Publisher -> "schema_publisher")
      .map { case (pred, roleType) =>
        po(quads, pred, "thing_id")
          .join(base, Seq("s"), "left_semi")
          .select(
            F.synthKey(col("s"), roleType, col("thing_id")).as("id"),
            lit(roleType).as("type"),
            col("s").as("intellectual_entity_id"),
            col("thing_id"))
      }
      .reduce(_ unionByName _)

    // Representation → file navigation (object→subject joins,
    // av-audio.sparql:194-204,483-492) with the MIME VALUES and the
    // family's peak-file rule (:491,504).
    val rep = po(quads, Represents, "ie")
      .join(base.select(col("s").as("ie")), Seq("ie"), "left_semi")
      .select(col("s").as("id"), col("ie").as("premis_represents"))
    val fileMime = po(quads, MimeType, "ebucore_has_mime_type")
      .filter(col("ebucore_has_mime_type").isin(cfg.mimeTypes: _*))
    val fileName = optionalSingle(quads, OriginalName, "premis_original_name")
    val fileDur = optionalSingle(quads, Duration, "dur_raw")
    val files = fileMime
      .join(fileName, Seq("s"), "left")
      .join(fileDur, Seq("s"), "left")
      .filter(
        if (cfg.includePeaks) lit(true)
        else !coalesce(col("premis_original_name"), lit("")).contains("peak"))
      .select(col("s").as("id"), col("ebucore_has_mime_type"),
        col("premis_original_name"),
        graft.functions.IsoDurationSecondsExpr(col("dur_raw")).as("schema_duration"))
    val includesRows = po(quads, Includes, "file_id")
      .join(rep.select(col("id").as("s")), Seq("s"), "left_semi")
      .join(files.select(col("id").as("file_id")), Seq("file_id"), "left_semi")
      .select(col("s").as("representation_id"), col("file_id"))

    // Generic UNION branches, grouped per target table: plain predicate
    // slices, `/`-paths (via), and lang-filtered literals. Branches
    // sharing a table union — exactly the SPARQL's `{} UNION` arms.
    val branchTables: Map[String, DataFrame] = branches.groupBy(_.table).map {
      case (table, specs) =>
        table -> specs.map { b =>
          val rows = b.via match {
            case Some(mid) => seqPath(quads, mid, b.pred, b.valueCol)
            case None      => po(quads, b.pred, b.valueCol)
          }
          val filtered = b.langFilter match {
            case Some(lang) => rows.filter(col(s"${b.valueCol}_lang").startsWith(lang))
            case None       => rows
          }
          filtered.join(base, Seq("s"), "left_semi")
            .select(col("s").as("intellectual_entity_id"), col(b.valueCol))
        }.reduce(_ unionByName _)
    }

    Map(
      "graph.intellectual_entity" -> ie,
      "graph.schema_license" -> licenseRows,
      "graph.premis_identifier" -> premisRows,
      "graph.mh_fragment_identifier" -> fragmentRows,
      "graph.schema_role" -> roleRows,
      "graph.representation" -> rep,
      "graph.file" -> files,
      "graph.includes" -> includesRows
    ) ++ branchTables
  }
}
