package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass consecutive-duplicate token collapse (the
  * run-length normalization of TextOps.collapseTokenRuns): returns
  * struct<clean: string, n_raw: long, n_kept: long> where `clean` is the
  * text with every run of identical whitespace tokens reduced to its
  * first occurrence, single-space separated.
  *
  * Token semantics are EXACTLY TextFunctions.tokens: maximal runs
  * between single-space characters, empties dropped (multi-space gaps
  * collapse, non-space whitespace stays inside a token). The equivalent
  * Column tree — tokens → indexed HOF filter → array_join + three
  * size() calls — is CodegenFallback (higher-order functions interpret
  * per row) and materializes the token array several times; this is one
  * generated-code character scan with no intermediate arrays, the same
  * upgrade RollingHash applies to the fingerprint loop (preferred
  * extension order, SURVEY §4.2).
  */
case class CollapseRuns(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got " +
        child.dataType.catalogString)

  override def dataType: DataType = CollapseRuns.OutType
  override def prettyName: String = "graft_collapse_runs"

  override def nullSafeEval(input: Any): Any =
    CollapseRuns.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CollapseRuns.compute($c);")

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

object CollapseRuns {
  val OutType: StructType = StructType(Seq(
    StructField("clean", StringType, nullable = false),
    StructField("n_raw", LongType, nullable = false),
    StructField("n_kept", LongType, nullable = false)))

  /** Shared by interpreted eval and generated code (companion-compute
    * pattern — one body, two call sites). */
  def compute(u: UTF8String): InternalRow = {
    val s = u.toString
    val len = s.length
    val sb = new java.lang.StringBuilder(len)
    var nRaw = 0L
    var nKept = 0L
    var prevStart = -1
    var prevEnd = -1 // [prevStart, prevEnd) = previous raw token
    var i = 0
    while (i < len) {
      if (s.charAt(i) == ' ') i += 1
      else {
        var j = i
        while (j < len && s.charAt(j) != ' ') j += 1
        nRaw += 1
        val samePrev = prevStart >= 0 && (prevEnd - prevStart) == (j - i) &&
          s.regionMatches(prevStart, s, i, j - i)
        if (!samePrev) {
          if (nKept > 0) sb.append(' ')
          sb.append(s, i, j)
          nKept += 1
        }
        prevStart = i
        prevEnd = j
        i = j
      }
    }
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(sb.toString), nRaw, nKept))
  }
}
