package graft.run

import org.apache.spark.sql.DataFrame

import graft.model.TableSpec
import graft.sink.Upsert

/** Phase orchestration helpers (SURVEY.md §3.1, §2.1 #8, §2.9 #82,
  * §2.10 #91). The Prefect DAG collapses to plain code ordering; these
  * are the pieces with actual semantics.
  */
object Runner {

  /** Run parameters — the `full_sync` / `last_modified` / `or_ids` axis
    * threaded through every reference phase (flows/main_flow.py:14-199).
    * Quirk #91 (arc_db_load_flow.py:72-74): full_sync *with* or_ids
    * demotes to merge-everything — tables are NOT truncated, since a
    * truncate would drop other organizations' rows. */
  final case class RunParams(
      fullSync: Boolean = false,
      since: Option[String] = None,
      orIds: Seq[String] = Nil) {
    def effectiveFullSync: Boolean = fullSync && orIds.isEmpty
    def effectiveSince: Option[String] =
      if (fullSync && orIds.nonEmpty) Some("0001-01-01T00:00:00") // datetime.min
      else since
  }

  /** Intersecting-schema static sources (§2.1 #8, database.ts:35-45,
    * 2_database_load.ts:196-202): tables present in both the `static`
    * seed set and the graph targets are merged as extra staged input —
    * appended to the staged batch, never truncated or dropped. */
  def withStaticSources(staged: Map[String, DataFrame],
                        static: Map[String, DataFrame]): Map[String, DataFrame] =
    (staged.keySet ++ static.keySet).map { name =>
      name -> ((staged.get(name), static.get(name)) match {
        case (Some(s), Some(st)) => s.unionByName(st, allowMissingColumns = true)
        case (Some(s), None)     => s
        case (None, Some(st))    => st
        case _                   => throw new IllegalStateException(name)
      })
    }.toMap

  /** Org-rename detection (§2.9 #82,
    * arc_db_load_index_tables_flow.py:156-227): compare the organization
    * dimension's current label against the name stored inside each
    * partition's documents; a mismatch means the whole partition must be
    * truncated and rebuilt. Returns the org ids needing rebuild. */
  def renamedOrgs(orgDim: DataFrame, storedDocs: DataFrame): Seq[String] = {
    import org.apache.spark.sql.functions._
    val stored = storedDocs
      .select(col("index"),
        get_json_object(col("document"), "$.schema_maintainer.schema_name")
          .as("stored_name"))
      .groupBy(col("index"))
      .agg(first(col("stored_name"), ignoreNulls = true).as("stored_name"))
    orgDim
      .select(lower(col("org_identifier")).as("index"),
        col("skos_pref_label").as("current_name"))
      .join(stored, Seq("index"))
      .filter(col("stored_name").isNotNull &&
        col("current_name") =!= col("stored_name"))
      .select(col("index"))
      .collect().map(_.getString(0)).toSeq
  }

  /** One sync phase: staged view output + static seeds → merged target
    * states in FK order (SURVEY.md §3.3 Spark shape). */
  def sync(current: Map[String, DataFrame], staged: Map[String, DataFrame],
           static: Map[String, DataFrame], specs: Seq[TableSpec],
           params: RunParams): Seq[(String, DataFrame)] =
    Upsert.applyAll(current, withStaticSources(staged, static), specs,
      params.effectiveFullSync)
}
