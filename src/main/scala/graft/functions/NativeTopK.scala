package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
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
        if (c != null) {
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
