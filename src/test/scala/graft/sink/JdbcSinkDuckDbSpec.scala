package graft.sink

import org.scalatest.funsuite.AnyFunSuite

import graft.model.{ColType, TableSpec}

/** The Postgres `ON CONFLICT` dialect executed against a REAL engine.
  *
  * Derby (JdbcSinkDerbySpec) executes the `MERGE INTO` dialect but has
  * no `ON CONFLICT`; DuckDB's upsert grammar IS the Postgres one
  * (`INSERT … ON CONFLICT (pk) DO UPDATE SET c = EXCLUDED.c`), so the
  * reference's USE_MERGE=false path (typescript/src/database.ts:46-49,
  * 222-223) runs here end to end: create → seed → stage → ON CONFLICT
  * upsert → read back.
  *
  * The DuckDB JDBC driver is loaded reflectively from the machine's
  * local artifact cache — no build dependency is added (the build's
  * dependency list is frozen), and the spec cancels cleanly via
  * `assume` when the jar is absent, so the suite stays green on
  * machines without it. Resolution order: the `GRAFT_DUCKDB_JDBC_JAR`
  * env var if set, otherwise a filename-pattern walk of the local
  * coursier cache (`~/.cache/coursier`) — deliberately host-agnostic,
  * so it finds `duckdb_jdbc-*.jar` under whatever mirror the cache
  * was populated from.
  */
class JdbcSinkDuckDbSpec extends AnyFunSuite {

  private def findCachedJar(): Option[java.io.File] = {
    val root = java.nio.file.Paths.get(
      sys.props("user.home"), ".cache", "coursier")
    if (!java.nio.file.Files.isDirectory(root)) return None
    val found = new java.util.concurrent.atomic.AtomicReference[java.io.File]
    java.nio.file.Files.walkFileTree(root, new java.nio.file.SimpleFileVisitor[java.nio.file.Path] {
      override def visitFile(p: java.nio.file.Path,
          a: java.nio.file.attribute.BasicFileAttributes): java.nio.file.FileVisitResult = {
        val n = p.getFileName.toString
        if (n.startsWith("duckdb_jdbc-") && n.endsWith(".jar")) {
          found.set(p.toFile)
          java.nio.file.FileVisitResult.TERMINATE
        } else java.nio.file.FileVisitResult.CONTINUE
      }
      override def visitFileFailed(p: java.nio.file.Path,
          e: java.io.IOException): java.nio.file.FileVisitResult =
        java.nio.file.FileVisitResult.CONTINUE
    })
    Option(found.get)
  }

  private val jar: Option[java.io.File] =
    sys.env.get("GRAFT_DUCKDB_JDBC_JAR").map(new java.io.File(_))
      .orElse(findCachedJar())

  private def withDuck[A](f: java.sql.Connection => A): A = {
    assume(jar.exists(_.isFile),
      "duckdb jdbc jar not found — set GRAFT_DUCKDB_JDBC_JAR to its " +
        "path, or populate the local coursier cache with duckdb_jdbc")
    val cl = new java.net.URLClassLoader(
      Array(jar.get.toURI.toURL), getClass.getClassLoader)
    val drv = cl.loadClass("org.duckdb.DuckDBDriver")
      .getDeclaredConstructor().newInstance().asInstanceOf[java.sql.Driver]
    val conn = drv.connect("jdbc:duckdb:", new java.util.Properties)
    try f(conn)
    finally conn.close()
  }

  private def rows(st: java.sql.Statement, sql: String): List[(String, String)] = {
    val rs = st.executeQuery(sql)
    Iterator.continually(rs)
      .takeWhile(_.next()).map(r => (r.getString(1), r.getString(2))).toList
  }

  test("ON CONFLICT dialect executes: staged wins on PK, misses insert") {
    val spec = TableSpec("graph.thing",
      Seq("id" -> ColType.Str, "schema_name" -> ColType.Str))
    withDuck { conn =>
      val st = conn.createStatement()
      st.execute("CREATE SCHEMA graph")
      st.execute("CREATE TABLE graph.thing (id VARCHAR PRIMARY KEY, " +
        "schema_name VARCHAR)")
      st.execute("CREATE TABLE tmp_thing (id VARCHAR, schema_name VARCHAR)")
      st.execute("INSERT INTO graph.thing VALUES ('a', 'old-a'), ('b', 'old-b')")
      st.execute("INSERT INTO tmp_thing VALUES ('b', 'new-b'), ('c', 'new-c')")
      st.execute(JdbcSink.upsertSql(spec, "tmp_thing", JdbcSink.OnConflict))
      assert(rows(st, "SELECT id, schema_name FROM graph.thing ORDER BY id")
        == List("a" -> "old-a", "b" -> "new-b", "c" -> "new-c"))
    }
  }

  test("ON CONFLICT with composite PK: the (id, index) doc-table shape") {
    // the reference's indexed-document table upserts on (id, index)
    // (arc_index-style keyed doc rows) — the conflict target is the
    // composite key, not a single column
    val spec = TableSpec("docs",
      Seq("id" -> ColType.Str, "idx" -> ColType.Str, "body" -> ColType.Str),
      pk = Seq("id", "idx"))
    withDuck { conn =>
      val st = conn.createStatement()
      st.execute("CREATE TABLE docs (id VARCHAR, idx VARCHAR, body VARCHAR, " +
        "PRIMARY KEY (id, idx))")
      st.execute("CREATE TABLE tmp_docs (id VARCHAR, idx VARCHAR, body VARCHAR)")
      st.execute("INSERT INTO docs VALUES ('d1', 'a', 'old'), ('d1', 'b', 'old')")
      st.execute("INSERT INTO tmp_docs VALUES ('d1', 'b', 'new'), ('d2', 'a', 'new')")
      st.execute(JdbcSink.upsertSql(spec, "tmp_docs", JdbcSink.OnConflict))
      val rs = st.executeQuery("SELECT id, idx, body FROM docs ORDER BY 1, 2")
      val got = Iterator.continually(rs).takeWhile(_.next())
        .map(r => (r.getString(1), r.getString(2), r.getString(3))).toList
      assert(got == List(("d1", "a", "old"), ("d1", "b", "new"),
        ("d2", "a", "new")))
    }
  }

  test("key-clear delete executes on DuckDB: touched entities fully replaced") {
    val child = TableSpec("lic",
      Seq("intellectual_entity_id" -> ColType.Str, "schema_license" -> ColType.Str),
      pk = Nil, entityKey = Some("intellectual_entity_id"))
    withDuck { conn =>
      val st = conn.createStatement()
      st.execute("CREATE TABLE lic (intellectual_entity_id VARCHAR, " +
        "schema_license VARCHAR)")
      st.execute("CREATE TABLE tmp_lic (intellectual_entity_id VARCHAR, " +
        "schema_license VARCHAR)")
      st.execute("INSERT INTO lic VALUES ('e1', 'L1'), ('e1', 'L2'), ('e2', 'L3')")
      st.execute("INSERT INTO tmp_lic VALUES ('e1', 'L9')")
      st.execute(JdbcSink.keyClearSql(child, "tmp_lic"))
      st.execute("INSERT INTO lic SELECT * FROM tmp_lic")
      assert(rows(st,
        "SELECT intellectual_entity_id, schema_license FROM lic ORDER BY 1, 2")
        == List("e1" -> "L9", "e2" -> "L3"))
    }
  }
}
