package graft.docs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Index-document builder — the composed denormalization job
  * (reference: flows/queries/update_partition.sql: doc assembly :6-49,
  * aggregating laterals :76-357, window pick :136-151, partitioned
  * upsert :362-366; orchestration arc_db_load_index_tables_flow.py:229-282).
  *
  * The reference runs one ~360-line SQL statement *per organization
  * partition* in a Python loop. Spark-first shape: build every document
  * in ONE job — each correlated lateral becomes a decorrelated
  * `groupBy(entity).agg(...)` joined back (aggregate-before-join: the
  * shuffle moves one row per entity, not the child fan-out), the
  * priority pick is a window, and the partition loop disappears into
  * `partitionBy(index)` at write time.
  *
  * Exercised over the testdata star schema (customer = root entity,
  * orders = children): the composition — multi-lateral + window + JSON
  * doc + partition key — is the operator under test; JSON field types
  * are strings/ints/bools only, because float formatting inside JSON
  * diverges across engines.
  */
object IndexDocuments {

  /** One document row per root entity:
    * (id, index, document, n_children, any_flag, duration_sec). */
  def build(customer: DataFrame, orders: DataFrame): DataFrame = {
    // Lateral 1 (jsonb_agg shape): sorted child identifiers per entity.
    // Lateral 2 (count + bool_or shape): children count, deleted-ish flag.
    // Lateral 3 (MAX over UNION ALL shape, update_partition.sql:84-102):
    // duration in DECIMAL so the arithmetic is engine-exact.
    // Lateral 4 (rights mapping, :263-273): license/status set → one
    // rights-statement URL via when-chain over the aggregated set.
    val perKey = orders.groupBy(col("o_custkey")).agg(
      sort_array(collect_list(col("o_orderkey").cast("string"))).as("identifiers"),
      count(lit(1)).as("n_children"),
      bool_or(col("o_orderstatus") === "F").as("any_flag"),
      round(max(col("o_totalprice").cast("decimal(18,4)") *
        lit(new java.math.BigDecimal("0.1"))), 2).cast("double").as("duration_sec"),
      bool_or(col("o_orderpriority") === "1-URGENT").as("has_urgent"))

    // Window pick (update_partition.sql:136-151 shape): latest child.
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    val cover = orders
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey").cast("string").as("cover_id"))

    customer
      .join(perKey, col("c_custkey") === perKey("o_custkey"), "left")
      .drop(perKey("o_custkey"))
      .join(cover, col("c_custkey") === cover("o_custkey"), "left")
      .drop(cover("o_custkey"))
      .select(
        col("c_custkey").as("id"),
        // LIST partition key: lower(org_identifier)
        // (arc_db_load_index_tables_flow.py:39-40)
        lower(col("c_mktsegment")).as("index"),
        to_json(struct(
          concat(lit("urn:c/"), col("c_custkey")).as("iri"),
          col("c_name").as("schema_name"),
          coalesce(col("identifiers"), array().cast("array<string>")).as("identifiers"),
          coalesce(col("n_children"), lit(0L)).as("children"),
          coalesce(col("any_flag"), lit(false)).as("is_flagged"),
          coalesce(col("cover_id"), lit("none")).as("cover"),
          when(coalesce(col("has_urgent"), lit(false)),
            "https://rightsstatements.org/vocab/InC/1.0/")
            .otherwise("https://creativecommons.org/publicdomain/mark/1.0/")
            .as("rights")
        )).as("document"),
        coalesce(col("n_children"), lit(0L)).as("n_children"),
        coalesce(col("any_flag"), lit(false)).as("any_flag"),
        coalesce(col("duration_sec"), lit(0.0)).as("duration_sec"))
  }

  /** Partitioned write (LIST partition per org,
    * arc_db_load_index_tables_flow.py:70-74 → `partitionBy("index")`). */
  def writePartitioned(docs: DataFrame, path: String): Unit =
    docs.write.mode("overwrite").partitionBy("index").parquet(path)

  /** Partition-scoped refresh (SURVEY.md §2.9 #79): dynamic partition
    * overwrite rewrites ONLY the partitions present in `docs` — the
    * Spark form of the reference's per-org partition truncate+rebuild
    * (arc_db_load_index_tables_flow.py:77-112). Other orgs' partitions
    * are untouched. */
  def overwriteTouchedPartitions(docs: DataFrame, path: String): Unit =
    docs.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("index")
      .parquet(path)

  /** Drop partitions for orgs with no remaining records — the delete
    * flow's empty-partition cleanup (arc_db_delete_flow.py:97-130). */
  def dropPartitions(spark: org.apache.spark.sql.SparkSession, path: String,
                     indexes: Seq[String]): Unit = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    indexes.foreach { idx =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/index=$idx"), true)
    }
  }
}
