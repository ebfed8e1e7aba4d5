package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native payment-card redaction — the PII category a regex alone
  * cannot express: a card number is a 13–19 digit sequence (optionally
  * grouped by single spaces or dashes, "4111 1111 1111 1111") whose
  * digits pass the Luhn checksum. Validating the checksum per match is
  * what separates a card from an order id or a timestamp run — plain
  * digit-run regexes redact half the numbers in a commerce crawl.
  * regexp_replace cannot make a per-match decision, so this is a
  * native expression (preferred extension order, SURVEY §4.2), one
  * generated-code character scan per row.
  *
  * Semantics: a CANDIDATE is a maximal run of digits joined by single
  * ' ' or '-' separators (a separator must be followed by a digit to
  * extend the run; double separators end it). A candidate with 13–19
  * total digits passing Luhn is replaced by "[CARD]"; every other
  * candidate — wrong length or failed checksum — is emitted verbatim.
  * Digit runs the candidate absorbs are never re-examined. Run this
  * FIRST in the scrub chain (TextOps.scrubPiiAll): the downstream
  * phone/id regexes then see card-free text, so a card's digit groups
  * can never be claimed by another category however those patterns
  * evolve — and the current patterns cannot see cards at all (grouped
  * forms never align with the 3-3-4 phone shape), which is exactly
  * the detection gap this expression closes.
  *
  * Returns struct<clean: string, n_cards: long> — the count on the
  * original text, matching scrubPii's per-category accounting.
  */
case class LuhnScrub(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got " +
        child.dataType.catalogString)

  override def dataType: DataType = LuhnScrub.OutType
  override def prettyName: String = "graft_luhn_scrub"

  override def nullSafeEval(input: Any): Any =
    LuhnScrub.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.LuhnScrub.compute($c);")

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

object LuhnScrub {
  val OutType: StructType = StructType(Seq(
    StructField("clean", StringType, nullable = false),
    StructField("n_cards", LongType, nullable = false)))

  private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'

  /** Luhn checksum over s[from, to), separators skipped. Doubling
    * applies to every second digit from the RIGHT. */
  private def luhnValid(s: String, from: Int, to: Int,
      nDigits: Int): Boolean = {
    var sum = 0
    var idxFromRight = 0
    var i = to - 1
    while (i >= from) {
      val c = s.charAt(i)
      if (isDigit(c)) {
        var d = c - '0'
        if (idxFromRight % 2 == 1) {
          d *= 2
          if (d > 9) d -= 9
        }
        sum += d
        idxFromRight += 1
      }
      i -= 1
    }
    sum % 10 == 0
  }

  /** Shared by interpreted eval and generated code. */
  def compute(u: UTF8String): InternalRow = {
    val s = u.toString
    val len = s.length
    val sb = new java.lang.StringBuilder(len)
    var nCards = 0L
    var i = 0
    while (i < len) {
      val c = s.charAt(i)
      if (!isDigit(c)) {
        sb.append(c)
        i += 1
      } else {
        // Candidate: maximal digit run with single ' '/'-' joiners.
        val start = i
        var nDigits = 0
        var j = i
        var done = false
        while (!done) {
          if (j < len && isDigit(s.charAt(j))) {
            nDigits += 1
            j += 1
          } else if (j + 1 < len &&
              (s.charAt(j) == ' ' || s.charAt(j) == '-') &&
              isDigit(s.charAt(j + 1))) {
            j += 1 // separator followed by a digit: run continues
          } else {
            done = true
          }
        }
        if (nDigits >= 13 && nDigits <= 19 &&
            luhnValid(s, start, j, nDigits)) {
          sb.append("[CARD]")
          nCards += 1
        } else {
          sb.append(s, start, j)
        }
        i = j
      }
    }
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(sb.toString), nCards))
  }
}
