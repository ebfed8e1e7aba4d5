package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass doc-profile counters — the integer inputs of
  * TextOps.docProfile, the per-document feature vector a curation
  * pipeline computes for EVERY document (the hottest per-doc map in the
  * engine): returns struct<n_tokens, token_len_sum, stopword_hits,
  * en_hits, n_subtokens, alpha_chars — all long> from two scans (raw
  * string; lowered string).
  *
  * Exact parity contracts (pinned in TextOpsSpec + PropertySpec):
  *  - token semantics = TextFunctions.tokens (single-space separators,
  *    empties dropped); token lengths and alpha counts are CODE POINTS,
  *    matching Spark's length() (UTF8String.numChars), not UTF-16 units;
  *  - stopword hits match RAW tokens (stopwordRatio does not lowercase);
  *  - en-marker hits and sub-tokens work on the LOWERED string with
  *    UTF8String.toLowerCase's exact branch (locale-independent ASCII
  *    map for full-ASCII input; String.toLowerCase() otherwise), so the
  *    lowering agrees with Spark's lower() in-JVM under ANY default
  *    locale — split on runs outside [a-z0-9] exactly as the
  *    split(lower(text), "[^a-z0-9]+") tree does.
  *
  * The ratio divisions stay in the Column layer over these exact
  * integers, so q26's oracle hash is unchanged. Same
  * companion-compute upgrade as RepetitionStats/CollapseRuns.
  */
case class DocProfileStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got " +
        child.dataType.catalogString)

  override def dataType: DataType = DocProfileStats.OutType
  override def prettyName: String = "graft_doc_profile_stats"

  override def nullSafeEval(input: Any): Any =
    DocProfileStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.DocProfileStats.compute($c);")

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

object DocProfileStats {
  val OutType: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("token_len_sum", LongType, nullable = false),
    StructField("stopword_hits", LongType, nullable = false),
    StructField("en_hits", LongType, nullable = false),
    StructField("n_subtokens", LongType, nullable = false),
    StructField("alpha_chars", LongType, nullable = false)))

  private val Stopwords = TextFunctions.DefaultStopwords.toArray
  private val EnMarkers = TextFunctions.EnMarkers.toArray

  private def isListed(s: String, from: Int, until: Int,
      words: Array[String]): Boolean = {
    var w = 0
    while (w < words.length) {
      val cand = words(w)
      if (cand.length == until - from &&
        s.regionMatches(from, cand, 0, cand.length)) return true
      w += 1
    }
    false
  }

  /** Shared by interpreted eval and generated code (companion-compute
    * pattern — one body, two call sites). */
  def compute(u: UTF8String): InternalRow = {
    val s = u.toString
    val len = s.length
    // pass 1 — RAW string: whitespace tokens (single-space separator),
    // code-point token lengths, stopword hits, [A-Za-z] code points
    var alphaChars = 0L
    var i = 0
    while (i < len) {
      val c = s.charAt(i)
      if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')) alphaChars += 1
      i += 1
    }
    var nTokens = 0L
    var tokenLenSum = 0L
    var stopwordHits = 0L
    i = 0
    while (i < len) {
      if (s.charAt(i) == ' ') i += 1
      else {
        var j = i
        while (j < len && s.charAt(j) != ' ') j += 1
        nTokens += 1
        tokenLenSum += s.codePointCount(i, j)
        if (isListed(s, i, j, Stopwords)) stopwordHits += 1
        i = j
      }
    }
    // pass 2 — LOWERED string, replicating UTF8String.toLowerCase's
    // branch exactly: full-ASCII input takes a locale-INDEPENDENT
    // ASCII map (A-Z → a-z only), non-ASCII falls back to
    // String.toLowerCase(). Calling String.toLowerCase unconditionally
    // would diverge from Spark's lower() under tr/az default locales
    // (ASCII 'I' → dotless 'ı'). En-marker hits over the lowered
    // single-space tokens; sub-tokens = maximal [a-z0-9] runs
    val lo = {
      var k = 0
      var ascii = true
      while (ascii && k < len) { if (s.charAt(k) >= 0x80) ascii = false; k += 1 }
      if (ascii) {
        val b = new java.lang.StringBuilder(len)
        k = 0
        while (k < len) {
          val c = s.charAt(k)
          b.append(if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
          k += 1
        }
        b.toString
      } else s.toLowerCase
    }
    val lolen = lo.length
    var enHits = 0L
    var nSub = 0L
    i = 0
    while (i < lolen) {
      if (lo.charAt(i) == ' ') i += 1
      else {
        var j = i
        while (j < lolen && lo.charAt(j) != ' ') j += 1
        if (isListed(lo, i, j, EnMarkers)) enHits += 1
        i = j
      }
    }
    i = 0
    var inRun = false
    while (i < lolen) {
      val c = lo.charAt(i)
      val alnum = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
      if (alnum && !inRun) { nSub += 1; inRun = true }
      else if (!alnum) inRun = false
      i += 1
    }
    new GenericInternalRow(Array[Any](
      nTokens, tokenLenSum, stopwordHits, enHits, nSub, alphaChars))
  }
}
