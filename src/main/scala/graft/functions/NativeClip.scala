package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass raw-text span clip backing [[ClipRunsExpr]] — the apply
  * step of Lee-et-al-style substring dedup that removes the duplicated
  * substring from the ORIGINAL text instead of replacing every doc
  * with its normalized form.
  *
  * Token model: the i-th maximal ASCII-alphanumeric run (`[A-Za-z0-9]+`)
  * of the raw text corresponds 1:1 to the i-th whitespace token of
  * `TextFunctions.normalize`d text — normalize lowercases and maps
  * every non-[a-z0-9] character to a space, so normalized tokens ARE
  * the lowercased alnum runs. Span coordinates produced over the
  * normalized stream (`Dedup.repeatedSpans`) therefore index directly
  * into the raw runs, and clipping a covered run removes its original
  * characters — casing, digits and surrounding punctuation of KEPT
  * tokens survive untouched.
  *
  * Separator rule: a dropped run takes its TRAILING separator with it
  * (`sep₀ + Σ_{i kept} runᵢ + sepᵢ₊₁`), so clipping never doubles
  * whitespace or leaves the dropped token's delimiter behind; leading
  * text before the first run is always kept.
  *
  * Unicode caveat (documented contract): run detection is strictly
  * ASCII. A character whose FULL lowercase mapping introduces ASCII
  * alnum (e.g. 'İ' → "i̇", 'K' → 'k') tokenizes differently under
  * normalize than under the raw scan, shifting alignment by one token
  * for that doc. Such characters do not occur in ASCII corpora; for
  * mixed-script corpora run the clip over pre-normalized text instead.
  */
object NativeClip {

  @inline private def isTokenChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')

  /** `spans` is an array of (span_start, span_end) LONG structs over
    * 0-based token indices, inclusive on both ends, disjoint but in
    * arbitrary order (collect_list). Null or empty spans → the text
    * unchanged (byte-identical: no-span docs must not be rewritten). */
  def clipRuns(text: UTF8String, spans: ArrayData): UTF8String = {
    if (spans == null || spans.numElements() == 0) return text
    val n = spans.numElements()
    val starts = new Array[Long](n)
    val ends = new Array[Long](n)
    var i = 0
    while (i < n) {
      val r = spans.getStruct(i, 2)
      starts(i) = r.getLong(0)
      ends(i) = r.getLong(1)
      i += 1
    }
    val order = Array.range(0, n).sortBy(starts)
    val s = text.toString
    val sb = new java.lang.StringBuilder(s.length)
    var p = 0
    var run = -1 // index of the run currently being scanned
    var sp = 0   // pointer into the start-sorted (disjoint) spans
    while (p < s.length) {
      if (isTokenChar(s.charAt(p))) {
        run += 1
        val rs = p
        while (p < s.length && isTokenChar(s.charAt(p))) p += 1
        while (sp < n && ends(order(sp)) < run) sp += 1
        val covered =
          sp < n && starts(order(sp)) <= run && run <= ends(order(sp))
        if (covered) {
          // drop the run AND its trailing separator
          while (p < s.length && !isTokenChar(s.charAt(p))) p += 1
        } else {
          sb.append(s, rs, p)
          val ss = p
          while (p < s.length && !isTokenChar(s.charAt(p))) p += 1
          sb.append(s, ss, p)
        }
      } else {
        // leading separator before the first run
        val ss = p
        while (p < s.length && !isTokenChar(s.charAt(p))) p += 1
        sb.append(s, ss, p)
      }
    }
    UTF8String.fromString(sb.toString)
  }
}

/** Native Catalyst expression: (raw text, token-index spans) → text
  * with the covered alnum runs clipped out (see [[NativeClip.clipRuns]]).
  * Null-tolerance is asymmetric by design: null text → null, null/empty
  * spans → the text unchanged — a left join against the (tiny) spans
  * table feeds this directly, no coalesce-to-typed-empty-array needed. */
case class ClipRunsExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = left.nullable
  override def prettyName: String = "clip_runs"

  override def eval(input: InternalRow): Any = {
    val t = left.eval(input)
    if (t == null) null
    else {
      val sp = right.eval(input)
      NativeClip.clipRuns(t.asInstanceOf[UTF8String],
        if (sp == null) null else sp.asInstanceOf[ArrayData])
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    ev.copy(code = code"""
      ${leftGen.code}
      boolean ${ev.isNull} = ${leftGen.isNull};
      UTF8String ${ev.value} = null;
      if (!${ev.isNull}) {
        ${rightGen.code}
        ${ev.value} = graft.functions.NativeClip.clipRuns(
          ${leftGen.value},
          ${rightGen.isNull} ? null :
            (org.apache.spark.sql.catalyst.util.ArrayData) ${rightGen.value});
      }
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ClipRunsExpr =
    copy(left = newLeft, right = newRight)
}

object ClipRunsExpr {
  /** Column-API entry point: `text` raw, `spans` an
    * array<struct<span_start: long, span_end: long>> column. */
  def apply(text: Column, spans: Column): Column =
    ColumnBridge.column(
      new ClipRunsExpr(ColumnBridge.expression(text), ColumnBridge.expression(spans)))
}
