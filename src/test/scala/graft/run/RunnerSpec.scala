package graft.run

import graft.SparkSuite
import graft.model.{ColType, TableSpec}

class RunnerSpec extends SparkSuite {

  test("RunParams quirk #91: full_sync + or_ids demotes to merge-everything") {
    val p = Runner.RunParams(fullSync = true, orIds = Seq("OR-x"))
    assert(!p.effectiveFullSync)
    assert(p.effectiveSince.contains("0001-01-01T00:00:00"))
    assert(Runner.RunParams(fullSync = true).effectiveFullSync)
    assert(Runner.RunParams(since = Some("2024-01-01")).effectiveSince
      .contains("2024-01-01"))
  }

  test("static seed tables union into staged batches") {
    val s = spark
    import s.implicits._
    val staged = Map("t.a" -> Seq(("1", "g")).toDF("id", "v"))
    val static = Map(
      "t.a" -> Seq(("2", "s")).toDF("id", "v"),
      "t.b" -> Seq(("3", "s")).toDF("id", "v"))
    val out = Runner.withStaticSources(staged, static)
    assert(out("t.a").count() == 2)
    assert(out("t.b").count() == 1)
  }

  test("org-rename detection compares dim label vs stored document name") {
    val s = spark
    import s.implicits._
    val dim = Seq(
      ("OR-A", "New Name"), ("OR-B", "Same Name")).toDF("org_identifier", "skos_pref_label")
    val docs = Seq(
      ("or-a", """{"schema_maintainer":{"schema_name":"Old Name"}}"""),
      ("or-b", """{"schema_maintainer":{"schema_name":"Same Name"}}"""))
      .toDF("index", "document")
    assert(Runner.renamedOrgs(dim, docs) == Seq("or-a"))
  }

  test("stats listener observes records through a real job") {
    val listener = new StatsListener(totalRecordsHint = Some(100L))
    spark.sparkContext.addSparkListener(listener)
    try {
      val s = spark
      import s.implicits._
      (1 to 50).toDF("n").agg(org.apache.spark.sql.functions.sum("n")).collect()
      // listener delivery is async; poll briefly
      val deadline = System.currentTimeMillis() + 10000
      while (listener.tasksCompleted.get() == 0 && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(listener.tasksCompleted.get() > 0)
      assert(listener.summary.contains("tasks="))
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
