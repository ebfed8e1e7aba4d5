package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE segmentation of a document against a trained merge table — the
  * corpus-tokenization hot path as ONE native expression (this is the
  * stage that touches every row of a 100 TB corpus, so it must not be
  * an interpreted HOF or a UDF).
  *
  * Children: (text STRING, rules ARRAY<STRING>) where each rule is
  * "left right" in rank order (rank = array position), the packed
  * single-row broadcast TextOps.bpeSegment builds. Semantics follow the
  * standard BPE apply loop: per whitespace word, start from UTF-16
  * code-unit symbols (matching training's base segmentation), then
  * repeatedly find the LOWEST-RANK adjacent pair present and rewrite
  * all its occurrences left-to-right, until no rule applies. Tokens
  * are emitted in document order.
  *
  * The rank map is rebuilt per row from the rules array (O(rules),
  * tiny vs the segmentation work per document); interning it per
  * broadcast would save microseconds at the cost of identity-keyed
  * caching — documented trade.
  */
case class BpeSegment(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = left.dataType == StringType &&
      (right.dataType match {
        case ArrayType(StringType, _) => true
        case _ => false
      })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (STRING, ARRAY<STRING>), got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_segment"

  override def nullSafeEval(text: Any, rules: Any): Any =
    BpeSegment.segment(text.asInstanceOf[UTF8String],
      rules.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, r) =>
      s"""
         |${ev.value} = graft.functions.BpeSegment.segment($t, $r);
       """.stripMargin)

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): BpeSegment =
    copy(left = newLeft, right = newRight)
}

object BpeSegment {
  /** Static worker shared by interpreted eval and generated code. */
  def segment(text: UTF8String, rules: ArrayData): ArrayData = {
    val nRules = rules.numElements()
    val ranks = new java.util.HashMap[String, Integer](nRules * 2)
    var i = 0
    while (i < nRules) {
      // rule = "left right"; symbols never contain whitespace (words
      // are whitespace-split before symbolization), so the FIRST space
      // is the separator and the key can be the rule string itself
      ranks.put(rules.getUTF8String(i).toString, Integer.valueOf(i))
      i += 1
    }
    val words = text.toString.split("\\s+")
    val out = new java.util.ArrayList[UTF8String]()
    var w = 0
    while (w < words.length) {
      val word = words(w)
      if (word.nonEmpty) {
        var syms = new java.util.ArrayList[String](word.length)
        var c = 0
        while (c < word.length) { // UTF-16 code units, as in training
          syms.add(String.valueOf(word.charAt(c)))
          c += 1
        }
        var done = false
        while (!done && syms.size > 1) {
          // lowest-rank adjacent pair present
          var bestRank = Int.MaxValue
          var j = 0
          while (j < syms.size - 1) {
            val r = ranks.get(syms.get(j) + " " + syms.get(j + 1))
            if (r != null && r.intValue() < bestRank) bestRank = r.intValue()
            j += 1
          }
          if (bestRank == Int.MaxValue) done = true
          else {
            val rule = rules.getUTF8String(bestRank).toString
            val sep = rule.indexOf(' ')
            val l = rule.substring(0, sep)
            val r = rule.substring(sep + 1)
            val merged = new java.util.ArrayList[String](syms.size)
            var k = 0
            while (k < syms.size) {
              if (k < syms.size - 1 && syms.get(k) == l &&
                  syms.get(k + 1) == r) {
                merged.add(l + r) // left-to-right, non-overlapping
                k += 2
              } else {
                merged.add(syms.get(k))
                k += 1
              }
            }
            syms = merged
          }
        }
        var s = 0
        while (s < syms.size) {
          out.add(UTF8String.fromString(syms.get(s)))
          s += 1
        }
      }
      w += 1
    }
    new GenericArrayData(out.toArray)
  }
}
