package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass ISO-8601 duration parser backing [[IsoDurationSecondsExpr]].
  *
  * Same semantics as [[Functions.isoDurationSeconds]] (the composed
  * regex form): fixed factors 1Y=365d, 1M=30d (documented divergence
  * from the reference's clock-relative resolution,
  * typescript/src/stream.ts:30-31), null for anything that is not an
  * ISO duration with ≥1 component. One character scan instead of seven
  * regex extractions.
  */
object NativeDuration {

  private val dateFactors = Map('Y' -> 365.0 * 86400, 'M' -> 30.0 * 86400,
    'W' -> 7.0 * 86400, 'D' -> 86400.0)
  private val timeFactors = Map('H' -> 3600.0, 'M' -> 60.0, 'S' -> 1.0)
  private val dateOrder = "YMWD"
  private val timeOrder = "HMS"

  /** Boxed so generated Java can branch on null. */
  def parseBoxed(s: String): java.lang.Double = {
    if (s == null) return null
    var i = 0
    var sign = 1.0
    if (i < s.length && s.charAt(i) == '-') { sign = -1.0; i += 1 }
    if (i >= s.length || s.charAt(i) != 'P') return null
    i += 1
    var inTime = false
    var total = 0.0
    var components = 0
    var lastIdx = -1
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == 'T' && !inTime) { inTime = true; lastIdx = -1; i += 1 }
      else {
        val numStart = i
        while (i < s.length && (s.charAt(i).isDigit || s.charAt(i) == '.')) i += 1
        if (i == numStart || i >= s.length) return null
        val unit = s.charAt(i)
        val order = if (inTime) timeOrder else dateOrder
        val factors = if (inTime) timeFactors else dateFactors
        val idx = order.indexOf(unit)
        if (idx < 0 || idx <= lastIdx) return null // unknown or out-of-order unit
        val v =
          try s.substring(numStart, i).toDouble
          catch { case _: NumberFormatException => return null }
        total += v * factors(unit)
        components += 1
        lastIdx = idx
        i += 1
      }
    }
    if (components == 0) null else java.lang.Double.valueOf(sign * total)
  }
}

/** Native Catalyst expression: ISO-8601 duration string → seconds.
  *
  * The (b) tier of the custom-operator ladder (SURVEY.md §7.3): a real
  * `Expression` with `doGenCode`, so it stays inside whole-stage codegen
  * instead of breaking the stage the way a Scala UDF would. The
  * generated code is one static-forwarder call on [[NativeDuration]].
  */
case class IsoDurationSecondsExpr(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "iso_duration_seconds"

  override def nullSafeEval(input: Any): Any =
    NativeDuration.parseBoxed(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val resultTerm = ctx.freshName("durParsed")
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |java.lang.Double $resultTerm =
         |  graft.functions.NativeDuration.parseBoxed($c.toString());
         |if ($resultTerm == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $resultTerm.doubleValue();
         |}
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): IsoDurationSecondsExpr =
    copy(child = newChild)
}

object IsoDurationSecondsExpr {
  /** Column-API entry point. */
  def apply(c: Column): Column =
    ColumnBridge.column(new IsoDurationSecondsExpr(ColumnBridge.expression(c)))
}
