package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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

/** Env-knob parsing with attributable failures: a bare
  * `NumberFormatException` from `sys.env(...).toInt` names neither the
  * variable nor the bad value, so a typo'd scale-run knob dies
  * unattributably mid-battery. (Round-11 advice.)
  */
object Env {
  private def parse[A](name: String, kind: String, conv: String => A): Option[A] =
    sys.env.get(name).map { v =>
      try conv(v.trim)
      catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"env knob $name must be $kind, got '$v'")
      }
    }
  def intOr(name: String, default: Int): Int = parse(name, "an integer", _.toInt).getOrElse(default)
  def longOr(name: String, default: Long): Long = parse(name, "an integer", _.toLong).getOrElse(default)
}

/** Per-JVM cache of deterministic streaming feed directories.
  *
  * The streaming replay queries build their file-source feeds from the
  * testdata alone, so the feed for a given (query, sfDir) pair is
  * byte-identical across invocations — but the bench re-runs each query
  * 4x (warm-up + timed) and was paying the slice-writing jobs every
  * time, measuring feed construction instead of the operator. Caching
  * the built feed keeps the timed runs on the streaming machinery
  * itself and stops per-run temp directories from accumulating.
  * (Per-run state — checkpoint dirs, output tables, memory sinks —
  * stays per-run; only the immutable input feed is shared.)
  *
  * Key discipline: the key must encode EVERY feed-defining parameter
  * (subsample modulus, slice boundaries, sentinel offsets, …), not
  * just query-name + sfDir — otherwise a slicing change landing
  * without a key bump makes a long-lived JVM silently serve the stale
  * pre-change feed, and the resulting oracle mismatch gets
  * misattributed to the operator under test. Callers spell the
  * parameters out in the key string so a change to either is visible
  * in the same diff hunk.
  */
object FeedCache {
  private val dirs = new java.util.concurrent.ConcurrentHashMap[String, String]()
  def apply(key: String)(build: String => Unit): String =
    dirs.computeIfAbsent(key, _ => {
      val dir = java.nio.file.Files.createTempDirectory("graft_feed").toString
      build(dir)
      dir
    })
}

/** Scoped scratch directories for gates that exercise an at-rest
  * round trip (index save/load): the body must leave nothing lazy
  * that still reads `dir` — persist gates eagerly materialize the
  * loaded-index result (`localCheckpoint`) before returning — because
  * the directory is deleted on exit. Without this, every bench
  * iteration leaked a full saved index (normalized corpus included)
  * into `java.io.tmpdir` — often tmpfs on the bench boxes. */
object Scratch {
  def withDir[A](prefix: String)(body: String => A): A = {
    val dir = java.nio.file.Files.createTempDirectory(prefix)
    try body(dir.toString)
    finally {
      import java.nio.file.{Files, Path}
      import java.util.Comparator
      val s = Files.walk(dir)
      try s.sorted(Comparator.reverseOrder[Path]())
        .forEach(p => Files.deleteIfExists(p))
      finally s.close()
    }
  }
}

/** Testdata table loader (TESTDATA.md: one parquet file per table). */
object Td {
  def apply(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Event-time accessors, adaptive to the physical type the parquet
    * writer chose for `events.ts`. The testdata has shipped it two
    * ways so far: TIMESTAMP(NANOS) surfaced as nanos-since-epoch LONG
    * (under `spark.sql.legacy.parquet.nanosAsLong=true`), and — since
    * the round-9 regeneration — TIMESTAMP_MICROS with
    * isAdjustedToUTC=0, which Spark reads as TIMESTAMP_NTZ. A real
    * user's parquet (Spark's, DuckDB's, pandas' default writers) is
    * the MICROS form. Resolving the type from the DataFrame schema at
    * plan-build time keeps every battery green on either encoding and
    * costs nothing at run time.
    *
    * All three accessors agree with the DuckDB oracle exactly:
    * `tsUs` is integer µs identical to `epoch_us(ts)` (DuckDB reads
    * ns-parquet at µs precision too, so µs is the common grid), and
    * sessions run with `spark.sql.session.timeZone=UTC`, making the
    * NTZ→instant cast the identity the oracle's naive-as-UTC reading
    * implies.
    */
  def tsUs(df: DataFrame, name: String = "ts"): Column =
    df.schema(name).dataType match {
      case TimestampType    => unix_micros(col(name))
      case TimestampNTZType => unix_micros(col(name).cast(TimestampType))
      // legacy nanos-as-long: exact integer FLOOR division (the time-
      // grid convention everywhere — `unix_millis`/`unix_micros` floor,
      // DuckDB's `//` floors; plain `div` truncates toward zero and
      // would disagree one grid cell on pre-epoch instants). Stays in
      // integer arithmetic: ns magnitudes ~1.7e18 overflow double's
      // 2^53 exact range.
      case LongType         => floorDiv(name, 1000L)
      case other => throw new IllegalArgumentException(
        s"unsupported event-time type for `$name`: $other " +
          "(expected timestamp, timestamp_ntz, or nanos-as-long)")
    }

  /** Exact integer floor division of a LONG column: subtract the
    * (always non-negative) `pmod` remainder first, so `div` acts on an
    * exact multiple where truncation and floor coincide. All-integer —
    * a double detour would lose ns-magnitude (~2^63) exactness.
    * `div` has no Column-API form, so the name is backtick-quoted into
    * the SQL fragment (doubled backticks escape) — a column named with
    * spaces/dots/hyphens binds correctly instead of failing to parse. */
  private def floorDiv(name: String, k: Long): Column = {
    val q = "`" + name.replace("`", "``") + "`"
    expr(s"($q - pmod($q, ${k}L)) div ${k}L")
  }

  /** Event-time as a µs-precision `TimestampType` column (for
    * `window()` / `session_window()` / watermark feeds). */
  def tsStamp(df: DataFrame, name: String = "ts"): Column =
    df.schema(name).dataType match {
      case TimestampType    => col(name)
      case TimestampNTZType => col(name).cast(TimestampType)
      case LongType         => timestamp_micros(floorDiv(name, 1000L))
      case other => throw new IllegalArgumentException(
        s"unsupported event-time type for `$name`: $other")
    }

  /** Event-time truncated to integer epoch-millis (the streaming
    * state grid — matches the oracle's `epoch_us(ts) // 1000`). */
  def tsMs(df: DataFrame, name: String = "ts"): Column =
    df.schema(name).dataType match {
      case TimestampType    => unix_millis(col(name))
      case TimestampNTZType => unix_millis(col(name).cast(TimestampType))
      case LongType         => floorDiv(name, 1000000L)
      case other => throw new IllegalArgumentException(
        s"unsupported event-time type for `$name`: $other")
    }
}
