package graft.delete

import org.apache.spark.sql.DataFrame

import graft.SparkSuite
import graft.model.Quad

/** Delete-flag synthesis: both UNION branches + the bound-since guard
  * (reference: deletes.sparql:27-79, arc_db_delete_flow.py:27-61). */
class DeleteFlowSpec extends SparkSuite {
  import DeleteFlow.V

  private val prefix = "urn:ie/"
  private def t(s: String, p: String, o: String): Quad = Quad(s, p, o, null, null, null)

  // frag1: tombstoned (branch a). frag2: entity lost its license (branch b).
  // frag3: modified but licensed → survives. frag4: tombstoned but stale.
  private val fixture = Seq(
    t("frag1", V.Modified, "2024-02-01"),
    t("frag1", V.DateDeleted, "2024-02-01"),
    t("frag1", V.Pid, "pid-one"),
    t("frag2", V.Modified, "2024-02-02"),
    t("frag2", V.DerivedFrom, "urn:ie/two"),
    t("frag3", V.Modified, "2024-02-03"),
    t("frag3", V.DerivedFrom, "urn:ie/three"),
    t("urn:ie/three", V.License, "VIAA-PUBLIEK-METADATA-ALL"),
    t("frag4", V.Modified, "2023-01-01"),
    t("frag4", V.DateDeleted, "2023-01-01"),
    t("frag4", V.Pid, "pid-stale"))

  private def quads: DataFrame = {
    val s = spark
    import s.implicits._
    fixture.toDF()
  }

  test("unbound since → no flags (deletes are incremental-only)") {
    assert(DeleteFlow.flagDeletes(quads, None, prefix).count() == 0)
  }

  test("branch a: tombstoned fragment flags entity via synthesized key") {
    val flags = DeleteFlow.flagDeletes(quads, Some("2024-01-01"), prefix)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(flags.contains(("urn:ie/pid-one", "frag1"))) // iri(concat(prefix, pid))
    assert(!flags.exists(_._2 == "frag4")) // stale modification not re-flagged
  }

  test("branch b: NOT EXISTS allowed license flags the derived entity") {
    val flags = DeleteFlow.flagDeletes(quads, Some("2024-01-01"), prefix)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(flags.contains(("urn:ie/two", "frag2")))
    assert(!flags.exists(_._1 == "urn:ie/three")) // licensed entity survives
  }

  test("applyDeletes removes flagged entities and their fragment rows") {
    val s = spark
    import s.implicits._
    val entities = Seq("urn:ie/pid-one", "urn:ie/two", "urn:ie/three")
      .toDF("id")
    val fragments = Seq(
      ("urn:ie/pid-one", "frag1"), ("urn:ie/two", "frag2"),
      ("urn:ie/two", "frag2b"), ("urn:ie/three", "frag3"))
      .toDF("intellectual_entity_id", "mh_fragment_identifier")
    val flags = DeleteFlow.flagDeletes(quads, Some("2024-01-01"), prefix)
    val (e2, f2) = DeleteFlow.applyDeletes(entities, fragments, flags)
    assert(e2.collect().map(_.getString(0)).toSet == Set("urn:ie/three"))
    // ALL fragments of a flagged entity go, not only the flagged row
    assert(f2.collect().map(_.getString(1)).toSet == Set("frag3"))
  }
}
