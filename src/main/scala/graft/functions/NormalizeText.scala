package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native text normalization — the first stage a crawl corpus runs
  * before any token-level statistic (tokenize/dedup/fingerprint all
  * assume one canonical byte form per logical character):
  *
  *  1. control characters (U+0000–U+001F, U+007F — includes \t \n \r)
  *     become spaces,
  *  2. space runs collapse to one, leading/trailing spaces drop,
  *  3. the result is Unicode-normalized to NFC (composed form), so
  *     "é" (e + combining acute) and "é" (precomposed) — visually
  *     identical, byte-distinct — hash/shingle/dedup identically.
  *
  * Steps 1–2 are one character scan; step 3 calls
  * `java.text.Normalizer` behind an `isNormalized` fast path, so ASCII
  * and already-composed text (the overwhelming majority of a real
  * corpus) never allocates a second string. The equivalent Column tree
  * (two regexp_replace + trim) cannot express NFC at all — Spark has
  * no normalization function — which is why this is a native
  * expression rather than composition (preferred extension order,
  * SURVEY §4.2).
  *
  * Parity: DuckDB expresses the same transform as
  * `nfc_normalize(trim(regexp_replace(regexp_replace(text,
  * '[\x00-\x1f\x7f]', ' ', 'g'), ' +', ' ', 'g')))` — both engines
  * implement Unicode-standard NFC, so results are byte-identical
  * (oracle-checked as q77).
  */
case class NormalizeText(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got " +
        child.dataType.catalogString)

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_normalize_text"

  override def nullSafeEval(input: Any): Any =
    NormalizeText.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NormalizeText.compute($c);")

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

object NormalizeText {

  /** Shared by interpreted eval and generated code. */
  def compute(u: UTF8String): UTF8String = {
    val s = u.toString
    val len = s.length
    val sb = new java.lang.StringBuilder(len)
    var pendingSpace = false
    var started = false
    var i = 0
    while (i < len) {
      val c = s.charAt(i)
      if (c <= ' ' || c == '\u007f') {
        pendingSpace = true
      } else {
        if (pendingSpace && started) sb.append(' ')
        sb.append(c)
        started = true
        pendingSpace = false
      }
      i += 1
    }
    val collapsed = sb.toString
    val out =
      if (Normalizer.isNormalized(collapsed, Normalizer.Form.NFC)) collapsed
      else Normalizer.normalize(collapsed, Normalizer.Form.NFC)
    UTF8String.fromString(out)
  }
}
