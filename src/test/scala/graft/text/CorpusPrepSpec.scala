package graft.text

import graft.SparkSuite

class CorpusPrepSpec extends SparkSuite {

  private val good =
    "this is a reasonably long document with plenty of ordinary words " +
      "that passes every quality threshold easily and then some"

  test("quality filter drops short, token-poor and punct-heavy docs") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, good),
      (2L, "too short"),
      (3L, "!!!! ???? ;;;; ::: @@@@ #### %%%% ^^^^ &&&& **** (((( )))) {{{{"),
      (4L, "a b c d e f g h i j k l m n o p q r s t u v w x y z a b c d e f g h")
    ).toDF("doc_id", "text")
    val kept = CorpusPrep.prepare(df, "doc_id", "text")
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(kept.contains(1L))
    assert(!kept.contains(2L)) // minChars
    assert(!kept.contains(3L)) // punct ratio
    assert(kept.contains(4L))  // many tokens, long enough, no punct
  }

  test("exact dedup keeps min id; near-dup stage drops the higher twin") {
    val s = spark
    import s.implicits._
    val near = good.replace("some", "more")
    val df = Seq(
      (10L, good), (11L, good), // exact pair
      (12L, near),              // near-dup of 10
      (13L, "a completely different long document about distributed engines " +
        "with shuffle partitioning and adaptive execution at large scale")
    ).toDF("doc_id", "text")
    val exactOnly = CorpusPrep.prepare(df, "doc_id", "text")
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(exactOnly == Set(10L, 12L, 13L)) // 11 collapsed into 10
    val withNear = CorpusPrep.prepare(df, "doc_id", "text",
      nearDup = true, minJaccard = 0.5)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(withNear == Set(10L, 13L)) // 12 removed as near-dup of 10
  }

  test("near-dup removal keeps one doc per transitive CLUSTER, not per pair") {
    val s = spark
    import s.implicits._
    // 20 and 22 are both near 21 but farther from each other: the
    // per-pair "drop the higher id" shortcut would keep {20, 22}; the
    // component contract keeps only the cluster minimum 20.
    val mid = good
    val a = "HEAD " + good.substring(5)
    val b = good.substring(0, good.length - 5) + " TAIL"
    val df = Seq((20L, a), (21L, mid), (22L, b)).toDF("doc_id", "text")
    val kept = CorpusPrep.prepare(df, "doc_id", "text",
      nearDup = true, minJaccard = 0.5)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(kept == Set(20L))
  }

  test("ngram novelty separates boilerplate from unique text") {
    val s = spark
    import s.implicits._
    val boiler = "all rights reserved contact us for details"
    val df = Seq(
      (1L, boiler),                              // fully duplicated below
      (2L, boiler),                              // → novelty 0 for both
      (3L, "completely original prose about engine internals")
    ).toDF("doc_id", "text")
    val got = CorpusPrep.ngramNovelty(df, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("novelty")).toMap
    assert(got(1L) === 0.0)
    assert(got(2L) === 0.0)
    assert(got(3L) === 1.0)
  }

  test("decontamination counts shared shingles and drops overlapping docs") {
    val s = spark
    import s.implicits._
    val evalDoc = "the capital of france is paris and the capital of italy is rome"
    val corpus = Seq(
      // contains the eval doc verbatim inside longer text → contaminated
      (1L, "some preamble text here " + evalDoc + " and a trailing sentence"),
      (2L, good),
      (3L, "another clean document about completely unrelated engine topics")
    ).toDF("doc_id", "text")
    val tests = Seq((100L, evalDoc)).toDF("doc_id", "text")
    val report = CorpusPrep.contamination(corpus, tests, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("n_hits"), r.getAs[Boolean]("clean"))).toMap
    assert(report(1L)._1 >= 10 && !report(1L)._2)
    assert(report(2L) == ((0L, true)))
    assert(report(3L) == ((0L, true)))
    val kept = CorpusPrep.decontaminate(corpus, tests, "doc_id", "text")
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(kept == Set(2L, 3L))
  }

  test("bloom-prefiltered contamination is identical to exact — " +
    "even with a deliberately tiny, collision-heavy filter") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(23)
    val words = Array("engine", "spark", "corpus", "token", "shard",
      "bloom", "join", "hash", "scan", "merge", "paris", "rome")
    def doc() = Seq.fill(15 + rnd.nextInt(10))(words(rnd.nextInt(words.length)))
      .mkString(" ")
    val corpus = (1L to 40L).map(i => (i, doc())).toDF("doc_id", "text")
    val tests = (100L to 105L).map(i => (i, doc())).toDF("doc_id", "text")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("id").collect().map(r =>
        (r.getAs[Long]("id"), r.getAs[Long]("n_hits"),
          r.getAs[Boolean]("clean"))).toSeq
    val exact = canon(CorpusPrep.contamination(corpus, tests, "doc_id", "text"))
    assert(exact.exists(_._2 > 0), "fixture must produce real hits")
    assert(canon(CorpusPrep.contaminationBloom(
      corpus, tests, "doc_id", "text")) === exact)
    // A starved filter (expectedItems=1, fpp near 1) floods the
    // prefilter with false positives; the confirming exact join must
    // still yield the identical report — no-false-negatives is the
    // correctness contract, fp-rate only costs shuffle volume.
    assert(canon(CorpusPrep.contaminationBloom(
      corpus, tests, "doc_id", "text",
      fpp = 0.9, expectedItems = 1L)) === exact)
  }

  test("auto dispatch: exact path inside the broadcast budget, Bloom " +
    "beyond it, identical reports either way") {
    val s = spark
    import s.implicits._
    // Crossover rule is pure and pinned exactly at the budget: the
    // exact set is 8 bytes/hash, so est*8 <= budget stays exact.
    assert(!CorpusPrep.chooseBloom(8L, broadcastBytes = 64L))       // == budget
    assert(CorpusPrep.chooseBloom(9L, broadcastBytes = 64L))        // one past
    assert(!CorpusPrep.chooseBloom(8_000_000L))  // 64 MB default: 8M hashes fit
    assert(CorpusPrep.chooseBloom(9_000_000L))
    // Topology-aware default: a local session widens the budget 8×
    // (measured r13: a single JVM's broadcast is a pointer hand-off,
    // exact still wins at ~114 MB sets; the 64 MB figure models
    // per-executor replication on a cluster).
    assert(CorpusPrep.defaultBudgetFor(spark) ==
      CorpusPrep.DefaultBroadcastBudget * 8)
    // Executor-aware cluster budget (r13 verdict #3): per-copy budget
    // holds 64 MB up to the 16-executor reference, shrinks with the
    // replicated-total cap beyond it, floors at 4 MB.
    assert(CorpusPrep.budgetFor(isLocal = true, executors = 1) ==
      CorpusPrep.DefaultBroadcastBudget * 8)
    assert(CorpusPrep.budgetFor(isLocal = false, executors = 1) ==
      CorpusPrep.DefaultBroadcastBudget)
    assert(CorpusPrep.budgetFor(isLocal = false, executors = 16) ==
      CorpusPrep.DefaultBroadcastBudget) // cap / 16 == the default
    assert(CorpusPrep.budgetFor(isLocal = false, executors = 64) ==
      CorpusPrep.ReplicatedBroadcastCap / 64) // 16 MB per copy
    assert(CorpusPrep.budgetFor(isLocal = false, executors = 1024) ==
      CorpusPrep.MinBroadcastBudget) // floor: tiny sets always broadcast
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (2L, good)).toDF("doc_id", "text")
    val tests = Seq(
      (100L, "quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("id").collect().map(r =>
        (r.getAs[Long]("id"), r.getAs[Long]("n_hits"),
          r.getAs[Boolean]("clean"))).toSeq
    val exact = canon(CorpusPrep.contamination(corpus, tests, "doc_id", "text"))
    assert(exact.exists(_._2 > 0), "fixture must produce real hits")
    // default budget → exact; 1-byte budget → forced onto the Bloom
    // path; both must equal the exact report (and decontaminate, which
    // routes through the dispatch, must agree under both budgets).
    assert(canon(CorpusPrep.contaminationAuto(
      corpus, tests, "doc_id", "text")) === exact)
    assert(canon(CorpusPrep.contaminationAuto(
      corpus, tests, "doc_id", "text", broadcastBytes = 1L)) === exact)
    val keptExact = CorpusPrep.decontaminate(corpus, tests, "doc_id", "text")
      .collect().map(_.getAs[Long]("doc_id")).toSet
    val keptBloom = CorpusPrep.decontaminate(corpus, tests, "doc_id", "text",
      broadcastBytes = 1L)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(keptExact == Set(2L))
    assert(keptBloom == keptExact)
  }

  test("mixture resampling hits target proportions, keeps under-target " +
    "strata whole, and is deterministic") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    // 1000 'web' rows vs 100 'book' rows, equal target weights: web
    // must downsample to ~100 (rate 0.55: (1/2)*1100/1000), books keep
    // everything (rate (1/2)*1100/100 = 5.5 -> clamped to 1).
    val df = ((1L to 1000L).map(i => (i, "web")) ++
      (2001L to 2100L).map(i => (i, "book"))).toDF("doc_id", "src")
    val kept = CorpusPrep.mixResample(df, "doc_id", "src", lit(1.0))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("src")))
    val bySrc = kept.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySrc("book") == 100, "under-target stratum must keep every row")
    val webRate = bySrc("web").toDouble / 1000
    assert(math.abs(webRate - 0.55) < 0.06,
      s"web keep-rate $webRate should track min(1, 0.5*1100/1000)=0.55")
    // determinism: the md5 keep rule is seed-free
    val again = CorpusPrep.mixResample(df, "doc_id", "src", lit(1.0))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("src")))
    assert(again.toSet == kept.toSet)
  }

  test("shard packing respects the token budget up to one-doc overshoot") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(1L)
    val df = (1L to 500L).map(i => (i, 10L + rnd.nextInt(90)))
      .toDF("doc_id", "n_tok")
    val packed = CorpusPrep.packShards(df, "doc_id", "n_tok",
      tokensPerShard = 300L, buckets = 4)
      .collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("shard"),
        r.getAs[Long]("n_tok")))
    val byShard = packed.groupBy(t => (t._1, t._2))
      .view.mapValues(_.map(_._3).sum).toMap
    val maxDoc = packed.map(_._3).max
    // every doc lands in exactly one shard; shard totals never exceed
    // budget + one document (greedy first-fit by start offset)
    assert(packed.length == 500)
    byShard.foreach { case (k, tot) =>
      assert(tot <= 300L + maxDoc, s"shard $k holds $tot tokens")
    }
    // non-final shards are filled to at least budget − maxDoc (a doc
    // spanning the boundary "steals" its overshoot from the next shard)
    val lastShard = byShard.keys.groupBy(_._1).view.mapValues(_.map(_._2).max)
    byShard.foreach { case ((b, sh), tot) =>
      if (sh != lastShard(b))
        assert(tot >= 300L - maxDoc, s"shard ($b,$sh) underfilled: $tot")
    }
  }

  test("stratified sampling is deterministic, hash-based, and per-stratum") {
    val s = spark
    import s.implicits._
    val df = (1L to 2000L).map(i => (i, if (i % 2 == 0) "en" else "zz"))
      .toDF("doc_id", "lang")
    def sample() = CorpusPrep.stratifiedSample(df, "doc_id", "lang",
      Map("en" -> 0.5), defaultRate = 0.05)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    val a = sample()
    assert(a == sample(), "hash-based sampling must be exactly repeatable")
    val en = a.count(_ % 2 == 0).toDouble / 1000
    val zz = a.count(_ % 2 == 1).toDouble / 1000
    assert(math.abs(en - 0.5) < 0.08, s"en rate was $en")
    assert(math.abs(zz - 0.05) < 0.04, s"zz rate was $zz")
    // appending rows never changes the verdict on existing rows
    val bigger = (1L to 3000L).map(i => (i, if (i % 2 == 0) "en" else "zz"))
      .toDF("doc_id", "lang")
    val b = CorpusPrep.stratifiedSample(bigger, "doc_id", "lang",
      Map("en" -> 0.5), defaultRate = 0.05)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(b.filter(_ <= 2000L) == a)
  }

  test("prepare spanClip: shared boilerplate runs are clipped from " +
    "survivors and mostly-boilerplate docs are dropped") {
    val s = spark
    import s.implicits._
    val boiler = "subscribe to our newsletter for updates and follow " +
      "the channel to never miss a new episode of the series"
    val df = Seq(
      (1L, s"a long and genuinely unique article about adaptive shuffle " +
        s"partitioning in distributed engines $boiler"),
      (2L, s"another wholly distinct essay on columnar storage layouts " +
        s"vectorized execution pipelines and late materialization " +
        s"strategies for analytical scans $boiler"),
      // Doc 3 is boilerplate + a couple of words: coverage > threshold.
      (3L, s"$boiler thanks everyone")
    ).toDF("doc_id", "text")
    val out = CorpusPrep.prepare(df, "doc_id", "text",
      spanClip = true, spanK = 8, maxSpanCoverage = 0.6)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text")).toMap
    assert(out.keySet === Set(1L, 2L))
    // The shared run is gone from both survivors; the unique prose stays.
    assert(!out(1L).contains("newsletter") && !out(2L).contains("newsletter"))
    assert(out(1L).contains("adaptive shuffle partitioning"))
    assert(out(2L).contains("columnar storage layouts"))
  }
}
