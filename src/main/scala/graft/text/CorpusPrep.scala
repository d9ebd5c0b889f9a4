package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Composed training-corpus preparation: quality filter → exact dedup →
  * optional near-dup removal. The standard front half of a pretraining
  * data pipeline, assembled from the engine's own operators.
  *
  * Scale shape: the quality filter is a scan-time predicate (no
  * shuffle); exact dedup is one hash groupBy; near-dup removal reuses
  * the banded-LSH candidate machinery. Every stage is a DataFrame →
  * DataFrame function, so the pipeline composes with any upstream
  * source and downstream sink.
  */
object CorpusPrep {

  /** Integer-arithmetic thresholds (ratios expressed as multiplier
    * comparisons) so the filter is engine-exact and oracle-friendly. */
  final case class Quality(
      minChars: Int = 50,
      minTokens: Int = 10,
      maxPunctTimes: Int = 5) // punct_count * maxPunctTimes <= length

  def qualityFilter(textCol: Column, q: Quality): Column =
    (length(textCol) >= q.minChars) &&
      (size(TextFunctions.regexTokens(textCol)) >= q.minTokens) &&
      (TextFunctions.punctCount(textCol) * q.maxPunctTimes <= length(textCol))

  /** Keep one representative (min id) per exact normalized-content
    * hash. NULL-text rows all pass through as their own singleton
    * keepers — the dedup family's shared NULL contract
    * ([[graft.dedup.Dedup.exact]]). A NULL hash must not reach the
    * semi-join (non-null-safe equality would silently drop every
    * NULL-text row), so it is coalesced to a PER-ROW unique key
    * ("null:" + id — no collision with 32-hex md5 values): each
    * NULL-text row is then its own group's trivial keeper through the
    * one shared groupBy + semi-join path — no second scan branch, and
    * no all-NULLs-to-one-reducer skew key. (In [[prepare]] NULL text
    * is unreachable — [[qualityFilter]] is NULL-strict — but
    * exactDedupKeep is public.) */
  def exactDedupKeep(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val hashed = df.withColumn("__h",
      coalesce(md5(TextFunctions.normalize(col(textCol))),
        concat(lit("null:"), col(idCol).cast("string"))))
    val keepers = hashed.groupBy(col("__h"))
      .agg(min(col(idCol)).as(idCol))
    hashed.join(keepers, Seq("__h", idCol), "left_semi").drop("__h")
  }

  /** Benchmark decontamination report: per corpus document, how many of
    * its distinct k-gram shingles appear in ANY test-set document —
    * the standard "n-gram overlap with eval data" check of a
    * pretraining pipeline. Returns (id, n_hits, clean) for every corpus
    * row.
    *
    * Scale shape: the test set is small by definition, so its distinct
    * shingle-hash set broadcasts; the corpus side is one scan + explode
    * + broadcast semi-join + groupBy on the doc id — no corpus
    * self-join, no all-pairs, and only 8-byte hashes move. */
  def contamination(corpus: DataFrame, tests: DataFrame, idCol: String,
                    textCol: String, shingleK: Int = 3): DataFrame = {
    def sh(d: DataFrame) = d.select(col(idCol).as("id"),
      graft.functions.ShingleHashesExpr(
        TextFunctions.normalize(col(textCol)), shingleK).as("hs"))
    val testToks = broadcast(
      sh(tests).select(explode(col("hs")).as("tok")).distinct())
    // hs is already distinct per doc, so count(*) after the semi-join
    // IS the distinct contaminated-shingle count.
    val hits = sh(corpus).select(col("id"), explode(col("hs")).as("tok"))
      .join(testToks, Seq("tok"), "left_semi")
      .groupBy(col("id")).agg(count(lit(1)).as("n_hits"))
    corpus.select(col(idCol).as("id"))
      .join(hits, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .withColumn("clean", col("n_hits") === 0)
  }

  /** [[contamination]] with a Bloom prefilter — the 100 TB shape for
    * when even the DISTINCT test-shingle hash set is too large to
    * broadcast as an exact set (10⁹ longs ≈ 8 GB; a 1%-fpp Bloom over
    * them ≈ 1.2 GB, and the fpp dial trades it lower). The corpus-side
    * explode is pruned by `might_contain` BEFORE the exact semi-join,
    * so the shuffle carries only true hits + false positives instead
    * of every corpus shingle; the exact join then removes the false
    * positives, making the result PROVABLY identical to
    * [[contamination]] (a Bloom has no false negatives). Both sides
    * are native Catalyst (`bloom_filter_agg` / `might_contain`), so
    * the prefilter stays inside whole-stage codegen — no UDF.
    *
    * `expectedItems`/`fpp` size the filter; the default derives the
    * item estimate from a cheap non-distinct count (an upper bound —
    * oversizing only wastes bits, never correctness). */
  def contaminationBloom(corpus: DataFrame, tests: DataFrame, idCol: String,
                         textCol: String, shingleK: Int = 3,
                         fpp: Double = 0.01,
                         expectedItems: Long = 0L): DataFrame = {
    def sh(d: DataFrame) = d.select(col(idCol).as("id"),
      graft.functions.ShingleHashesExpr(
        TextFunctions.normalize(col(textCol)), shingleK).as("hs"))
    val testToks = sh(tests).select(explode(col("hs")).as("tok"))
    val est = math.max(1L,
      if (expectedItems > 0L) expectedItems else testToks.count())
    // Spark's optimal-bits formula, matching BloomFilter.create(n, fpp).
    val bits = math.max(64L,
      math.ceil(-est.toDouble * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
    // BloomFilterAggregate/BloomFilterMightContain are the expressions
    // behind Spark's own runtime-filter injection — internal (not in
    // the public FunctionRegistry), so they are constructed directly.
    val bridge = org.apache.spark.sql.graftbridge.ColumnBridge
    import org.apache.spark.sql.catalyst.expressions.Literal
    val bloomBytes = testToks
      .agg(bridge.column(
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          bridge.expression(col("tok")), Literal(est), Literal(bits))
          .toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]](0)
    // Exact-set side of the confirming join: NOT broadcast — the whole
    // point is the set may exceed broadcast limits; the Bloom already
    // cut the shuffled corpus side down to hits+fp.
    val testSet = testToks.distinct()
    val hits = sh(corpus).select(col("id"), explode(col("hs")).as("tok"))
      .filter(bridge.column(
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          Literal.create(bloomBytes, org.apache.spark.sql.types.BinaryType),
          bridge.expression(col("tok")))))
      .join(testSet, Seq("tok"), "left_semi")
      .groupBy(col("id")).agg(count(lit(1)).as("n_hits"))
    corpus.select(col(idCol).as("id"))
      .join(hits, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .withColumn("clean", col("n_hits") === 0)
  }

  /** Exact-vs-Bloom dispatch rule for decontamination (r12 verdict
    * task: auto-select). The exact path broadcasts the distinct
    * test-shingle hash set; it wins whenever that set actually fits a
    * broadcast (measured at 90×: Bloom build is pure overhead there,
    * 67.3 vs 55.1 s, because the 8-byte-hash set still broadcasts).
    * The Bloom path wins only once the exact set outgrows the
    * broadcast budget. The estimate is the NON-distinct shingle count
    * (an upper bound on the distinct set — a cheap scan of the small
    * side, no shuffle), times 8 bytes per hash; oversizing the
    * estimate can only flip the choice toward Bloom early, never
    * break correctness (both paths are provably identical).
    *
    * Pure function so the crossover decision is spec-pinnable. */
  def chooseBloom(estTestShingles: Long,
                  broadcastBytes: Long = DefaultBroadcastBudget): Boolean =
    estTestShingles * 8L > broadcastBytes

  /** 64 MB of 8-byte hashes ≈ 8M distinct test shingles. This is a
    * CLUSTER-posture budget: the exact set is replicated to every
    * executor and first collected on the driver, so its true cost is
    * set-bytes × executor count in network+memory. On a single local
    * JVM the broadcast is a pointer hand-off, and the measured 90×
    * crossover curve (BENCH_NOTES r13) shows the exact path still
    * winning by ~1.6× at the largest locally-constructible set
    * (~114 MB) — hence [[defaultBudgetFor]] widens the budget 8× when
    * the session is local. */
  val DefaultBroadcastBudget: Long = 64L << 20

  /** Cap on TOTAL replicated broadcast bytes across the cluster: every
    * executor (plus the driver) holds a copy of the exact set, so the
    * aggregate memory+network cost is set-bytes × executor count. The
    * cap equals the 64 MB per-copy budget at a 16-executor reference
    * topology; beyond that the per-copy budget shrinks ∝ 1/executors
    * (r13 verdict #3 — the old budget read only `isLocal` and silently
    * kept 64 MB per copy at ANY cluster width). */
  val ReplicatedBroadcastCap: Long = 1L << 30

  /** Floor on the per-copy budget: a few MB broadcasts cheaply at any
    * width (TorrentBroadcast is peer-to-peer), so the 1/executors rule
    * must not drive tiny sets onto the Bloom path's extra build pass. */
  val MinBroadcastBudget: Long = 4L << 20

  /** Pure budget derivation, spec-pinnable (the live wrapper is
    * [[defaultBudgetFor]]): local = one JVM, broadcast is a pointer
    * hand-off, budget widens 8×; cluster = per-copy budget bounded by
    * both the 64 MB default and the replicated-total cap / executors,
    * floored at [[MinBroadcastBudget]]. */
  def budgetFor(isLocal: Boolean, executors: Int): Long =
    if (isLocal) DefaultBroadcastBudget * 8
    else math.max(MinBroadcastBudget,
      math.min(DefaultBroadcastBudget,
        ReplicatedBroadcastCap / math.max(1, executors)))

  /** Topology-aware default for [[contaminationAuto]]'s budget: reads
    * the live executor count from the status tracker (minus the
    * driver's own entry; falls back to the single-executor budget when
    * the probe is unavailable). */
  def defaultBudgetFor(spark: org.apache.spark.sql.SparkSession): Long = {
    val sc = spark.sparkContext
    val executors =
      try math.max(1, sc.statusTracker.getExecutorInfos.length - 1)
      catch { case _: Exception => 1 }
    budgetFor(sc.isLocal, executors)
  }

  /** [[contamination]] with the exact/Bloom choice made from a size
    * estimate of the test-shingle set (see [[chooseBloom]]). The
    * estimate is computed once and fed to the Bloom path's sizing so
    * the small side is never scanned twice. `broadcastBytes` ≤ 0 means
    * "derive from topology" ([[defaultBudgetFor]]). */
  def contaminationAuto(corpus: DataFrame, tests: DataFrame, idCol: String,
                        textCol: String, shingleK: Int = 3,
                        broadcastBytes: Long = -1L): DataFrame = {
    val est = tests.select(
      sum(size(graft.functions.ShingleHashesExpr(
        TextFunctions.normalize(col(textCol)), shingleK))).as("n"))
      .head().getAs[Any](0) match {
        case null => 0L
        case n: Long => n
        case n: Int => n.toLong
      }
    val budget =
      if (broadcastBytes > 0L) broadcastBytes
      else defaultBudgetFor(corpus.sparkSession)
    if (chooseBloom(est, budget))
      contaminationBloom(corpus, tests, idCol, textCol, shingleK,
        expectedItems = math.max(1L, est))
    else contamination(corpus, tests, idCol, textCol, shingleK)
  }

  /** Drop corpus documents sharing more than `maxShared` distinct
    * shingles with the test set. Routes through [[contaminationAuto]]
    * so the exact/Bloom prefilter choice tracks the test-set size
    * instead of being a caller knob. */
  def decontaminate(corpus: DataFrame, tests: DataFrame, idCol: String,
                    textCol: String, shingleK: Int = 3,
                    maxShared: Long = 0L,
                    broadcastBytes: Long = -1L): DataFrame =
    corpus.join(
      contaminationAuto(corpus, tests, idCol, textCol, shingleK, broadcastBytes)
        .filter(col("n_hits") > maxShared)
        .select(col("id").as(idCol)),
      Seq(idCol), "left_anti")

  /** Per-document n-gram novelty: the share of a doc's distinct
    * shingles that appear in NO other document — the corpus-level
    * repetitiveness signal (boilerplate-heavy docs score near 0,
    * genuinely novel text near 1) used for mixing weights and
    * boilerplate pruning.
    *
    * Scale shape: one explode + one shingle-df aggregation + one
    * equi-join back + one per-doc aggregation — the inverted-index
    * two-shuffle pattern (same as TF-IDF's df pass); nothing pairwise.
    * Returns (id, n_shingles, n_unique, novelty). */
  def ngramNovelty(df: DataFrame, idCol: String, textCol: String,
                   shingleK: Int = 3): DataFrame = {
    // ShingleHashesExpr emits DISTINCT hashes per doc, so the df counts
    // documents, not occurrences.
    val sh = df.select(col(idCol).as("id"),
      explode(graft.functions.ShingleHashesExpr(
        TextFunctions.normalize(col(textCol)), shingleK)).as("tok"))
    val dfreq = sh.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    sh.join(dfreq, Seq("tok"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_unique"))
      .withColumn("novelty",
        col("n_unique").cast("double") / col("n_shingles"))
  }

  /** Deterministic hash-based stratified sampling: keep a row iff the
    * first 32 bits of md5(id) fall below the stratum's rate — seed-free
    * and engine-neutral (any engine computing the same md5 keeps the
    * same rows), stable under reruns, appends, and repartitioning,
    * which a `rand()`-based sample is not. The rate lookup is a
    * codegen'd when-chain (strata configs are small); the filter runs
    * scan-side, so nothing shuffles. floor() keeps the integer
    * threshold exact across engines that round casts differently. */
  /** First 32 bits of md5(id) as an unsigned long in [0, 2^32) — the
    * shared engine-neutral hash of [[stratifiedSample]] and
    * [[packShards]]; any drift between the two (or their DuckDB oracle
    * restatements `CAST('0x'||substr(md5(…),1,8) AS UBIGINT)`) breaks
    * cross-engine determinism. */
  private def md5U32(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long")

  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
                       rates: Map[String, Double],
                       defaultRate: Double): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    df.filter(md5U32(col(idCol)) < floor(rate * lit(4294967296L)).cast("long"))
  }

  /** Mixture resampling — hit a TARGET per-stratum mix by deterministic
    * hash-based downsampling: stratum r with unnormalized target weight
    * w_r keeps each row with rate min(1, (w_r/ΣW)·(N/n_r)), so after
    * sampling the strata sit in the target proportions (up to strata
    * already under target, which keep everything — pure downsampling
    * never fabricates rows). This is the data-mixing step of a
    * pretraining pipeline (upweight rare high-quality sources, cap the
    * dominant crawl), with [[stratifiedSample]]'s md5 keep-rule, so the
    * sample is seed-free, reproducible, append-stable, and
    * engine-exact.
    *
    * `weightCol` is any expression constant within a stratum (a
    * when-chain over names, a parsed index, a joined config table).
    *
    * Scale shape: one groupBy over strata (tiny output), a 1-row total
    * — both broadcast back — and one scan-time filter on the corpus;
    * no driver collect, no shuffle of the corpus itself. */
  def mixResample(df: DataFrame, idCol: String, strataCol: String,
                  weightCol: Column): DataFrame = {
    val strata = df.groupBy(col(strataCol))
      .agg(count(lit(1)).as("__n"), max(weightCol).as("__w"))
    val totals = strata.agg(sum(col("__n")).as("__total"),
      sum(col("__w")).as("__sumw"))
    // Double-op ORDER mirrors the oracle restatement exactly
    // (w / Σw * N / n): same IEEE sequence ⇒ identical rates ⇒
    // identical floor(rate·2³²) thresholds.
    val rates = strata.crossJoin(broadcast(totals))
      .withColumn("__rate",
        least(lit(1.0),
          col("__w") / col("__sumw") * col("__total") / col("__n")))
      .select(col(strataCol), col("__rate"))
    df.join(broadcast(rates), Seq(strataCol))
      .filter(md5U32(col(idCol)) <
        floor(col("__rate") * lit(4294967296L)).cast("long"))
      .drop("__rate")
  }

  /** Token-budget shard packing: assign each document to an output
    * shard holding ≈ `tokensPerShard` tokens — the sharding step before
    * sequence packing in a pretraining pipeline. A document starts the
    * shard its cumulative token offset falls in (greedy first-fit in
    * id order), so shard sizes overshoot by at most one document.
    *
    * Scale shape: a global greedy pack is inherently sequential, so the
    * corpus is first split into `buckets` deterministic md5 buckets
    * (engine-neutral, like [[stratifiedSample]]) and packed per bucket
    * with one window cumsum — each bucket's pack parallelizes
    * independently and the window shuffle is the only wide stage.
    * Shard identity is (bucket, shard) — stable under appends of
    * higher ids, reproducible across engines and reruns. */
  def packShards(df: DataFrame, idCol: String, tokenCountCol: String,
                 tokensPerShard: Long, buckets: Int = 1024): DataFrame = {
    val bucket = (md5U32(col(idCol)) % buckets).as("bucket")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket")).orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    df.select(col(idCol), col(tokenCountCol).as("n_tok"), bucket)
      .withColumn("cum", sum(col("n_tok")).over(w))
      .withColumn("shard",
        floor((col("cum") - col("n_tok")) / tokensPerShard).cast("long"))
      .select(col(idCol), col("bucket"), col("shard"), col("n_tok"))
  }

  /** Full preparation. With `nearDup`, verified near-duplicate pairs
    * are clustered into connected components
    * ([[graft.graph.ConnectedComponents]]) and only each component's
    * minimum id survives — the per-pair "drop the higher id" shortcut
    * keeps BOTH of {3, 5} in a transitive cluster {3, 5, 10} linked
    * through 10, because neither loses a direct comparison. Component
    * clustering is the correct keep-one-per-duplicate-set contract. */
  def prepare(df: DataFrame, idCol: String, textCol: String,
              quality: Quality = Quality(),
              nearDup: Boolean = false, minJaccard: Double = 0.8,
              spanClip: Boolean = false, spanK: Int = 8,
              maxSpanCoverage: Double = 0.5): DataFrame = {
    val filtered = df.filter(qualityFilter(col(textCol), quality))
    val exact = exactDedupKeep(filtered, idCol, textCol)
    val deduped =
      if (!nearDup) exact
      else {
        // SPANNING variant, deliberately: exactDedupKeep above only
        // removes byte-identical normalized content, but docs that
        // normalize to EQUAL SHINGLE SETS (case/punctuation/whitespace
        // boilerplate variants — the common shape at web scale)
        // survive it and would re-enter the full variant's d²/2 pair
        // contract. The spanning collapse keeps such groups linear;
        // its pair graph is closure-equal to the full contract
        // (spec-pinned, DedupSpec), and the components consumer below
        // depends only on the closure — so this swap cannot move the
        // output, only the pair volume.
        val pairs = Dedup.minhashNearDupSpanning(exact, idCol, textCol,
          minJaccard = minJaccard)
        val comps = graft.graph.ConnectedComponents.run(
          exact.select(col(idCol).as("id")), pairs,
          srcCol = "id_a", dstCol = "id_b")
        exact.join(
          graft.graph.ConnectedComponents.keepers(comps)
            .withColumnRenamed("id", idCol),
          Seq(idCol), "left_semi")
      }
    if (!spanClip) deduped
    else {
      // Substring-level pass AFTER document-level dedup: find runs of
      // spanK tokens shared across ≥2 surviving docs, clip them out of
      // each doc's ORIGINAL text (raw-run clip — casing/punctuation
      // survive; a doc with zero spans passes through byte-identical,
      // see Dedup.clipSpans), and drop docs that are mostly such
      // boilerplate. The surviving docs carry the CLIPPED text —
      // prepare's contract stays "rows you would train on".
      val spans = Dedup.repeatedSpans(deduped, idCol, textCol, k = spanK)
      val clipped = Dedup.clipSpans(deduped, spans, idCol, textCol,
        maxCoverage = maxSpanCoverage)
      deduped.join(
        clipped.filter(col("kept"))
          .select(col("id").as(idCol), col("text_clipped")),
        Seq(idCol))
        .drop(textCol)
        .withColumnRenamed("text_clipped", textCol)
    }
  }
}
