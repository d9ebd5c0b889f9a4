package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Per-cell top-k cosine kernel backing the bulk IVF search path
  * ([[graft.sim.Similarity.ivfSearch]] with `broadcastProbes = false`).
  *
  * The row-per-candidate cell join was measured CPU-bound at 90×/18k
  * probes: 228M candidate rows × ~2.8 µs of join/row machinery per
  * candidate = ~630 CPU-seconds per search batch, with the join's
  * sort/shuffle spilling once the index outgrew the broadcast
  * threshold (BENCH_NOTES r17). This kernel moves the candidate scan
  * INSIDE one expression evaluated per (probe, cell) row: the cell's
  * vectors arrive as one array-of-structs column, the kernel scores
  * every entry with the very same fused [[NativeVector.cosine]] the
  * row-at-a-time path used (bit-identical cos values — ranking
  * boundaries cannot move) and keeps only the per-cell top-k, so the
  * downstream merge window sees probes × nprobe × k rows instead of
  * probes × nprobe × occupancy. Global top-k is preserved exactly:
  * every vector lives in one cell, and the global top-k is a subset
  * of the union of per-cell top-ks.
  *
  * Tie/ordering contract (must match the window `orderBy(cos desc,
  * neighbor_id)`): candidates rank by cos descending, neighbor_id
  * ascending on ties. Entries whose cosine is NULL (zero-norm
  * degenerate vectors) are skipped — the window path ranked them
  * after every finite candidate (`NULLS LAST`), so results differ
  * only for probes with fewer than k finite candidates in a cell, in
  * which case this path simply omits the degenerate filler rows.
  * Entries whose cosine is NaN (a NaN vector component) are likewise
  * skipped — a documented DIVERGENCE from the raw rank-window form,
  * which ranks NaN ABOVE every finite value (Spark's NaN ordering)
  * and so returns NaN rows at the head; admitting NaN here would
  * poison the insertion buffer (every comparison against NaN is
  * false) and silently drop finite candidates, the one behavior
  * neither form should have. The library's broadcast search paths
  * apply the same NaN skip before their windows
  * ([[graft.sim.Similarity]]'s `dropNanCos`), so the two strategies
  * stay result-identical on NaN corpora.
  * Entries whose id equals `probeId` are skipped (the
  * `probe_id =!= neighbor_id` filter, applied pre-rank as before). */
object NativeTopK {

  /** `cells` is array<struct<neighbor_id: long, cv: array<float|double>>>.
    * Returns array<struct<neighbor_id: long, cos: double>>, at most k
    * entries, sorted (cos desc, id asc). */
  def topKCellCos(probeId: Long, pv: ArrayData, cells: ArrayData,
                  k: Int, pF: Boolean, cF: Boolean): ArrayData = {
    val n = cells.numElements()
    val topIds = new Array[Long](k)
    val topCos = new Array[Double](k)
    var size = 0
    var i = 0
    while (i < n) {
      val s = cells.getStruct(i, 2)
      val id = s.getLong(0)
      if (id != probeId) {
        val c = NativeVector.cosine(pv, s.getArray(1), pF, cF)
        // NaN cosines (a NaN vector component) are skipped alongside
        // the NULL zero-norm skip: a NaN admitted while the buffer is
        // not yet full would park at the tail, and once size == k
        // every later candidate compares against NaN (all comparisons
        // false) and is rejected — poisoning the heap and dropping
        // finite candidates. See the divergence contract above.
        if (c != null && !java.lang.Double.isNaN(c.doubleValue())) {
          val cos = c.doubleValue()
          // admit iff better than the current k-th (or heap not full);
          // "better" = (cos, -id) lexicographically larger
          if (size < k || cos > topCos(size - 1) ||
              (cos == topCos(size - 1) && id < topIds(size - 1))) {
            var j = if (size < k) size else k - 1
            while (j > 0 && (cos > topCos(j - 1) ||
                (cos == topCos(j - 1) && id < topIds(j - 1)))) {
              topCos(j) = topCos(j - 1); topIds(j) = topIds(j - 1)
              j -= 1
            }
            topCos(j) = cos; topIds(j) = id
            if (size < k) size += 1
          }
        }
      }
      i += 1
    }
    val out = new Array[Any](size)
    i = 0
    while (i < size) {
      out(i) = InternalRow(topIds(i), topCos(i))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Catalyst expression for [[NativeTopK.topKCellCos]]. Children:
  * (probe_id: long, pv: array<float|double>, cells:
  * array<struct<long, array<float|double>>>); `k` is a literal. */
case class TopKCellCosExpr(first: Expression, second: Expression,
                           third: Expression, k: Int)
    extends TernaryExpression {

  require(k >= 1, "k must be >= 1")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("neighbor_id", LongType, nullable = false),
      StructField("cos", DoubleType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "topk_cell_cos"

  @transient private lazy val pF =
    NativeVector.isFloatArray(second.dataType)
  @transient private lazy val cF = third.dataType match {
    case ArrayType(st: StructType, _) =>
      NativeVector.isFloatArray(st.fields(1).dataType)
    case other => throw new IllegalArgumentException(
      s"expected array of (id, vector) structs, got $other")
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    def vecOk(dt: DataType) = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (first.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"topk_cell_cos requires a BIGINT probe id (got ${first.dataType.simpleString})")
    else if (!vecOk(second.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"topk_cell_cos requires an array<float|double> probe vector (got ${second.dataType.simpleString})")
    else third.dataType match {
      case ArrayType(st: StructType, _)
          if st.fields.length == 2 && st.fields(0).dataType == LongType &&
            vecOk(st.fields(1).dataType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        "topk_cell_cos requires cells as array<struct<neighbor_id: " +
          s"bigint, cv: array<float|double>>> (got ${other.simpleString})")
    }
  }

  override def nullSafeEval(pid: Any, pv: Any, cells: Any): Any =
    NativeTopK.topKCellCos(pid.asInstanceOf[Long],
      pv.asInstanceOf[ArrayData], cells.asInstanceOf[ArrayData], k, pF, cF)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (pid, pv, cells) =>
      s"${ev.value} = graft.functions.NativeTopK.topKCellCos(" +
        s"$pid, $pv, $cells, $k, $pF, $cF);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): TopKCellCosExpr =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object TopKCellCosExpr {
  def apply(probeId: Column, pv: Column, cells: Column, k: Int): Column =
    ColumnBridge.column(new TopKCellCosExpr(
      ColumnBridge.expression(probeId), ColumnBridge.expression(pv),
      ColumnBridge.expression(cells), k))
}

/** PQ siblings of the cosine kernel, backing the bulk
  * [[graft.sim.Similarity.pqSearch]] path. The PQ shortlist CANNOT be
  * shrunk per cell the way the IVF top-k can (derived shortlist n/100
  * outgrows cell occupancy ~2·√n past n ≈ 40k, so per-cell truncation
  * keeps everything) — the win is the ROW SHAPE, not the row count:
  * the candidate scan leaves the per-(probe, cell) row as ONE compact
  * sorted array instead of occupancy exploded rows, so the shuffle to
  * the per-probe merge moves |probes| × nprobe array rows where the
  * window form shuffled every candidate (measured 90×/18k probes:
  * 228M rows, 557–1822 CPU-s in the shortlist window stage alone —
  * BENCH_NOTES r17). Scoring reuses [[NativeVector.adcSum]]
  * bit-identically; ordering matches the window's
  * (adc desc, neighbor_id asc) exactly. */
object NativeAdc {

  /** Sorted index order for parallel (adcs, ids) arrays: adc
    * descending, id ascending on ties — the shortlist window's
    * ordering. */
  private def sortedIdx(ids: Array[Long], adcs: Array[Double],
                        n: Int): Array[Integer] = {
    val idx = new Array[Integer](n)
    var i = 0
    while (i < n) { idx(i) = Integer.valueOf(i); i += 1 }
    java.util.Arrays.sort(idx, new java.util.Comparator[Integer] {
      override def compare(x: Integer, y: Integer): Int = {
        val c = java.lang.Double.compare(adcs(y.intValue), adcs(x.intValue))
        if (c != 0) c
        else java.lang.Long.compare(ids(x.intValue), ids(y.intValue))
      }
    })
    idx
  }

  /** `cells` is array<struct<neighbor_id: long, codes: array<int>>>.
    * Returns the cell's candidates scored by ADC, sorted (adc desc,
    * id asc), truncated to `s`, excluding the probe's own id. Entries
    * whose ADC is NULL (malformed codes) are skipped — the window
    * form ranked them behind every finite candidate.
    *
    * The ADC table is decoded to primitive rows ONCE per (probe,
    * cell) row, then each candidate scores with raw lookups — the
    * same doubles added in the same order as
    * [[NativeVector.adcSum]] (values bit-identical, spec-pinned),
    * without `getArray` allocating a wrapper per subspace per
    * candidate (occupancy × m allocations per row at bulk scale).
    * Honestly graded: measured timing-NEUTRAL at 90× local[32]
    * (kernel-stage CPU ~equal across runs; local JIT escape analysis
    * likely elides the wrappers already) — kept because it bounds
    * allocation pressure on executors where it may not. */
  def adcTopS(probeId: Long, dtable: ArrayData, cells: ArrayData,
              s: Int): ArrayData = {
    val m = dtable.numElements()
    val dt = new Array[Array[Double]](m)
    var decoded = true
    var j = 0
    while (decoded && j < m) {
      if (dtable.isNullAt(j)) decoded = false
      else {
        val row = dtable.getArray(j)
        var p = 0
        val kk = row.numElements()
        while (decoded && p < kk) {
          if (row.isNullAt(p)) decoded = false
          p += 1
        }
        if (decoded) dt(j) = row.toDoubleArray()
      }
      j += 1
    }
    // A table with null rows/elements (never produced by pqSearch —
    // MatVecDots emits containsNull=false — but reachable for direct
    // kernel users) takes the element-checking adcSum path so the
    // skip-vs-score decision is identical at every index.
    if (!decoded) return adcTopSSlow(probeId, dtable, cells, s)
    val n = cells.numElements()
    val ids = new Array[Long](n)
    val adcs = new Array[Double](n)
    var cnt = 0
    var i = 0
    while (i < n) {
      val st = cells.getStruct(i, 2)
      val id = st.getLong(0)
      if (id != probeId) {
        val codes = st.getArray(1)
        // Inlined adcSum over the decoded table: identical null/range
        // contract (any mismatch or bad code ⇒ the candidate is
        // skipped, like a NULL adc).
        var acc = 0.0
        var ok = codes.numElements() == m
        j = 0
        while (ok && j < m) {
          if (codes.isNullAt(j) || dt(j) == null) ok = false
          else {
            val c = codes.getInt(j)
            if (c < 0 || c >= dt(j).length) ok = false
            else acc += dt(j)(c)
          }
          j += 1
        }
        if (ok) {
          ids(cnt) = id; adcs(cnt) = acc; cnt += 1
        }
      }
      i += 1
    }
    emitSorted(ids, adcs, cnt, s)
  }

  /** Element-checking fallback for degenerate ADC tables — scores via
    * [[NativeVector.adcSum]] per candidate (the exact original
    * contract), paying its per-subspace wrapper allocations. */
  private def adcTopSSlow(probeId: Long, dtable: ArrayData,
                          cells: ArrayData, s: Int): ArrayData = {
    val n = cells.numElements()
    val ids = new Array[Long](n)
    val adcs = new Array[Double](n)
    var cnt = 0
    var i = 0
    while (i < n) {
      val st = cells.getStruct(i, 2)
      val id = st.getLong(0)
      if (id != probeId) {
        val a = NativeVector.adcSum(st.getArray(1), dtable)
        if (a != null) {
          ids(cnt) = id; adcs(cnt) = a.doubleValue(); cnt += 1
        }
      }
      i += 1
    }
    emitSorted(ids, adcs, cnt, s)
  }

  private def emitSorted(ids: Array[Long], adcs: Array[Double],
                         cnt: Int, s: Int): ArrayData = {
    val idx = sortedIdx(ids, adcs, cnt)
    val keep = math.min(cnt, s)
    val out = new Array[Any](keep)
    var i = 0
    while (i < keep) {
      val j = idx(i).intValue
      out(i) = InternalRow(ids(j), adcs(j))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** `arrs` is array<array<struct<neighbor_id, adc>>> — one sorted
    * per-cell array per visited cell (each indexed vector lives in
    * exactly one cell, so ids never repeat across arrays). K-way
    * merges them and returns the global top-`s` neighbor ids in
    * (adc desc, id asc) order — exactly the ids the shortlist window
    * kept. */
  def mergeTopS(arrs: ArrayData, s: Int): ArrayData = {
    val k = arrs.numElements()
    val cells = new Array[ArrayData](k)
    val heads = new Array[Int](k)
    var total = 0
    var i = 0
    while (i < k) {
      cells(i) = arrs.getArray(i)
      total += cells(i).numElements()
      i += 1
    }
    val keep = math.min(total, s)
    val out = new Array[Long](keep)
    var emitted = 0
    while (emitted < keep) {
      var best = -1
      var bestAdc = 0.0
      var bestId = 0L
      i = 0
      while (i < k) {
        if (heads(i) < cells(i).numElements()) {
          val st = cells(i).getStruct(heads(i), 2)
          val id = st.getLong(0)
          val adc = st.getDouble(1)
          if (best < 0 || adc > bestAdc ||
              (adc == bestAdc && id < bestId)) {
            best = i; bestAdc = adc; bestId = id
          }
        }
        i += 1
      }
      out(emitted) = bestId
      heads(best) += 1
      emitted += 1
    }
    new GenericArrayData(out)
  }
}

/** Catalyst expression for [[NativeAdc.adcTopS]]. Children: (probe_id:
  * long, dtable: array<array<double>>, cells: array<struct<long,
  * array<int>>>); `s` (the shortlist width) is a literal. */
case class AdcTopSExpr(first: Expression, second: Expression,
                       third: Expression, s: Int)
    extends TernaryExpression {

  require(s >= 1, "shortlist must be >= 1")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("neighbor_id", LongType, nullable = false),
      StructField("adc", DoubleType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "adc_top_s"

  override def checkInputDataTypes(): TypeCheckResult = {
    if (first.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"adc_top_s requires a BIGINT probe id (got ${first.dataType.simpleString})")
    else if (!(second.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _ => false
    }))
      TypeCheckResult.TypeCheckFailure(
        s"adc_top_s requires an array<array<double>> ADC table (got ${second.dataType.simpleString})")
    else third.dataType match {
      case ArrayType(st: StructType, _)
          if st.fields.length == 2 && st.fields(0).dataType == LongType &&
            (st.fields(1).dataType match {
              case ArrayType(IntegerType, _) => true
              case _ => false
            }) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        "adc_top_s requires cells as array<struct<neighbor_id: bigint, " +
          s"codes: array<int>>> (got ${other.simpleString})")
    }
  }

  override def nullSafeEval(pid: Any, dtable: Any, cells: Any): Any =
    NativeAdc.adcTopS(pid.asInstanceOf[Long],
      dtable.asInstanceOf[ArrayData], cells.asInstanceOf[ArrayData], s)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (pid, dtable, cells) =>
      s"${ev.value} = graft.functions.NativeAdc.adcTopS(" +
        s"$pid, $dtable, $cells, $s);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): AdcTopSExpr =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object AdcTopSExpr {
  def apply(probeId: Column, dtable: Column, cells: Column, s: Int): Column =
    ColumnBridge.column(new AdcTopSExpr(
      ColumnBridge.expression(probeId), ColumnBridge.expression(dtable),
      ColumnBridge.expression(cells), s))
}

/** Catalyst expression for [[NativeAdc.mergeTopS]]. Child: the
  * collect_list of per-cell sorted arrays; `s` is a literal. Returns
  * array<long> — the global shortlist's neighbor ids in rank order. */
case class MergeTopSExpr(child: Expression, s: Int)
    extends UnaryExpression {

  require(s >= 1, "shortlist must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "merge_top_s"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(ArrayType(st: StructType, _), _)
        if st.fields.length == 2 && st.fields(0).dataType == LongType &&
          st.fields(1).dataType == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      "merge_top_s requires array<array<struct<neighbor_id: bigint, " +
        s"adc: double>>> (got ${other.simpleString})")
  }

  override def nullSafeEval(arrs: Any): Any =
    NativeAdc.mergeTopS(arrs.asInstanceOf[ArrayData], s)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arrs =>
      s"${ev.value} = graft.functions.NativeAdc.mergeTopS($arrs, $s);")

  override protected def withNewChildInternal(newChild: Expression): MergeTopSExpr =
    copy(child = newChild)
}

object MergeTopSExpr {
  def apply(arrs: Column, s: Int): Column =
    ColumnBridge.column(new MergeTopSExpr(ColumnBridge.expression(arrs), s))
}
