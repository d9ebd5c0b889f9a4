package graft.sink

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.model.{ColType, TableSpec}

/** The generated Postgres dialect executed against a REAL PostgreSQL.
  *
  * The reference's target engine is Postgres (typescript/src/database.ts):
  * `INSERT … ON CONFLICT` upsert (database.ts:46-49,222-223), `MERGE
  * INTO` upsert (database.ts:214-221, USE_MERGE=true), and the
  * key-clear `DELETE … WHERE key IN (SELECT DISTINCT …)` issued before
  * child-row inserts (database.ts:186-212). Derby and DuckDB specs
  * cover the two upsert grammars on stand-in engines; this spec runs
  * all three statements on the real thing — a throwaway initdb cluster
  * on a unix socket, driven through `psql` (no JDBC driver dependency;
  * the build's dependency list is frozen).
  *
  * Cancels cleanly (`assume`) when the postgres binaries are absent.
  * When the suite runs as root (this container), the server-side
  * binaries run under `nobody` via `su` — postgres refuses to run as
  * root — with the cluster directory chowned accordingly.
  */
class PostgresDialectSpec extends AnyFunSuite with BeforeAndAfterAll {

  import scala.sys.process._

  private def findBin(name: String): Option[String] =
    (sys.env.getOrElse("PATH", "").split(":").toSeq ++
      Seq("/usr/local/bin", "/usr/bin", "/usr/lib/postgresql/15/bin"))
      .map(d => new java.io.File(d, name))
      .find(_.canExecute).map(_.getAbsolutePath)

  private val initdb = findBin("initdb")
  private val pgCtl = findBin("pg_ctl")
  private val psql = findBin("psql")
  private val isRoot = sys.props.getOrElse("user.name", "") == "root"

  /** The assertions read the command tag of EVERY statement in a
    * multi-statement `-c` string — client behavior psql only gained in
    * 15 (older psql prints just the last result, which would fail the
    * "INSERT 0 2" expectations with a confusing diff). Probe the CLIENT
    * version and cancel, not fail, on an old psql even against a new
    * server. */
  private lazy val psqlMajor: Int =
    psql.flatMap { bin =>
      try {
        val out = Seq(bin, "--version").!!
        "(\\d+)".r.findFirstIn(out.split("\\s+").reverse.headOption.getOrElse(""))
          .orElse("(\\d+)".r.findFirstIn(out)).map(_.toInt)
      } catch { case _: Exception => None }
    }.getOrElse(0)

  private var dir: java.io.File = _
  private var started = false

  /** Run a server-side command (initdb/pg_ctl), demoted from root. */
  private def serverCmd(cmd: String): Int =
    (if (isRoot) Seq("su", "nobody", "-s", "/bin/sh", "-c", s"cd / && $cmd")
     else Seq("/bin/sh", "-c", cmd)).! // scalastyle:ignore

  override def beforeAll(): Unit = {
    if (Seq(initdb, pgCtl, psql).forall(_.isDefined)) {
      dir = java.nio.file.Files.createTempDirectory("graft_pg").toFile
      if (isRoot) Seq("chown", "-R", "nobody", dir.getAbsolutePath).!
      val rc1 = serverCmd(s"${initdb.get} -D $dir/data -A trust -U graft " +
        s"> $dir/initdb.log 2>&1")
      val rc2 = if (rc1 == 0)
        serverCmd(s"${pgCtl.get} -D $dir/data -l $dir/pg.log " +
          s"-o '-k $dir -c listen_addresses=' start")
      else rc1
      started = rc2 == 0
    }
  }

  override def afterAll(): Unit = {
    if (started) serverCmd(s"${pgCtl.get} -D $dir/data -m immediate stop")
    if (dir != null) Seq("rm", "-rf", dir.getAbsolutePath).!
  }

  /** Execute SQL, return stdout rows as `col|col` strings. */
  private def sql(statements: String): Seq[String] = {
    assume(started, "no live postgres — binaries absent or cluster " +
      "failed to start (see initdb.log/pg.log in the temp dir)")
    assume(psqlMajor >= 15,
      s"psql client $psqlMajor < 15 prints only the last command tag " +
        "in a multi-statement -c string; the per-statement tag " +
        "assertions would fail spuriously")
    val out = new StringBuilder
    val rc = (Seq(psql.get, "-h", dir.getAbsolutePath, "-U", "graft",
      "-d", "postgres", "-v", "ON_ERROR_STOP=1", "-At", "-c", statements) !
      ProcessLogger(l => out.append(l).append('\n'), l => out.append(l).append('\n')))
    assert(rc == 0, s"psql failed (rc=$rc):\n$out\nSQL:\n$statements")
    out.toString.linesIterator.filter(_.nonEmpty).toSeq
  }

  private val spec = TableSpec("graph.thing",
    Seq("id" -> ColType.Str, "schema_name" -> ColType.Str))

  private def freshTables(): Unit = sql(
    s"""DROP SCHEMA IF EXISTS graph CASCADE;
       CREATE SCHEMA graph;
       CREATE TABLE graph.thing (id VARCHAR PRIMARY KEY, schema_name VARCHAR);
       DROP TABLE IF EXISTS tmp_thing;
       CREATE TABLE tmp_thing (id VARCHAR, schema_name VARCHAR);
       INSERT INTO graph.thing VALUES ('a', 'old-a'), ('b', 'old-b');
       INSERT INTO tmp_thing VALUES ('b', 'new-b'), ('c', 'new-c');""")

  test("ON CONFLICT dialect executes on live Postgres") {
    freshTables()
    val rows = sql(
      JdbcSink.upsertSql(spec, "tmp_thing", JdbcSink.OnConflict) + ";\n" +
        "SELECT id, schema_name FROM graph.thing ORDER BY id;")
    // "INSERT 0 2" is the command tag: 2 rows routed through the
    // ON CONFLICT arm (one update, one insert)
    assert(rows == Seq("INSERT 0 2", "a|old-a", "b|new-b", "c|new-c"))
  }

  test("MERGE INTO dialect executes on live Postgres (PG15+)") {
    freshTables()
    val rows = sql(
      JdbcSink.upsertSql(spec, "tmp_thing", JdbcSink.MergeInto) + ";\n" +
        "SELECT id, schema_name FROM graph.thing ORDER BY id;")
    assert(rows == Seq("MERGE 2", "a|old-a", "b|new-b", "c|new-c"))
  }

  test("key-clear DELETE executes on live Postgres") {
    freshTables()
    val childSpec = TableSpec("graph.thing",
      Seq("id" -> ColType.Str, "schema_name" -> ColType.Str),
      entityKey = Some("id"))
    val rows = sql(
      JdbcSink.keyClearSql(childSpec, "tmp_thing") + ";\n" +
        "SELECT id, schema_name FROM graph.thing ORDER BY id;")
    assert(rows == Seq("DELETE 1", "a|old-a"))
  }
}
