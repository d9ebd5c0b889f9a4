package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered correctness/bench query.
  *
  * `run` builds the DataFrame over the testdata directory `dir`;
  * `oracle` is the equivalent DuckDB SQL over the same tables (None for
  * operators that are not SQL-expressible — the driver then records a
  * weaker rows-only check).
  *
  * Column names are aliased identically on both sides because the
  * driver's comparator sorts columns by name before hashing values.
  */
final case class Q(
    name: String,
    oracle: Option[String],
    run: (SparkSession, String) => DataFrame
)

/** Testdata table loader (TESTDATA.md: one parquet file per table). */
object Td {
  def apply(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")
}
