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
  * standard BPE apply loop: per whitespace word, start from Unicode
  * code-POINT symbols (matching training's base segmentation — neither
  * path ever splits inside a surrogate pair), then
  * repeatedly find the LOWEST-RANK adjacent pair present and rewrite
  * all its occurrences left-to-right, until no rule applies. Tokens
  * are emitted in document order.
  *
  * When the rules child is FOLDABLE (the TextOps.bpeSegment path packs
  * the merge table as a literal), the rank map is built ONCE per
  * expression instance and shared across every row of the task — a
  * real tokenizer carries ~50k merges, and an O(rules) per-row rebuild
  * on the corpus-touching path would swamp the segmentation itself.
  * A non-foldable rules column (arbitrary SQL callers) falls back to
  * the per-row build, which stays correct for per-row rule sets. An
  * identity-keyed cache for that path would be unsound: an
  * UnsafeArrayData can keep its identity while a reused row buffer
  * repoints its bytes.
  */
case class BpeSegment(left: Expression, right: Expression)
    extends BinaryExpression {

  /** Rank map prebuilt once when the rules are plan-time constant;
    * null otherwise (per-row fallback). Lazy: first touch happens
    * task-side after deserialization, so each task builds it at most
    * once. */
  @transient private lazy val staticRanks: java.util.HashMap[String, Integer] =
    if (right.foldable) {
      val v = right.eval(null)
      if (v == null) null
      else BpeSegment.buildRanks(v.asInstanceOf[ArrayData])
    } else null

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
      rules.asInstanceOf[ArrayData], staticRanks)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, r) => {
      val ranks =
        if (right.foldable && staticRanks != null)
          ctx.addReferenceObj("bpeRanks", staticRanks,
            "java.util.HashMap<String, Integer>")
        else "null"
      s"""
         |${ev.value} = graft.functions.BpeSegment.segment($t, $r, $ranks);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): BpeSegment =
    copy(left = newLeft, right = newRight)
}

object BpeSegment {
  /** rule = "left right"; symbols never contain whitespace (words are
    * whitespace-split before symbolization), so the FIRST space is the
    * separator and the key can be the rule string itself. */
  private[functions] def buildRanks(
      rules: ArrayData): java.util.HashMap[String, Integer] = {
    val nRules = rules.numElements()
    val ranks = new java.util.HashMap[String, Integer](nRules * 2)
    var i = 0
    while (i < nRules) {
      // a null rule entry (nullable SQL arrays) is simply inert: it
      // never enters the rank map, so no pair can select its rank and
      // the later rules.getUTF8String(bestRank) only ever reads ranks
      // that came from the map
      val r = rules.getUTF8String(i)
      if (r != null) ranks.put(r.toString, Integer.valueOf(i))
      i += 1
    }
    ranks
  }

  /** Static worker shared by interpreted eval and generated code.
    * `prebuilt` is the plan-time-constant rank map (null → build from
    * `rules` per row; `rules` must always be passed since merged-rule
    * text is looked up by rank either way). */
  def segment(text: UTF8String, rules: ArrayData,
      prebuilt: java.util.HashMap[String, Integer]): ArrayData = {
    val ranks = if (prebuilt != null) prebuilt else buildRanks(rules)
    val words = text.toString.split("\\s+")
    val out = new java.util.ArrayList[UTF8String]()
    var w = 0
    while (w < words.length) {
      val word = words(w)
      if (word.nonEmpty) {
        var syms = new java.util.ArrayList[String](word.length)
        var c = 0
        while (c < word.length) {
          // one symbol per Unicode CODE POINT, as in training (both
          // bpeTrain's driver-side symbolizer and the bpeBaseSymbols
          // regex split never cut inside a surrogate pair); code-unit
          // splitting here would make supplementary-plane merge rules
          // learned at training time unmatchable at apply time
          val n = Character.charCount(word.codePointAt(c))
          syms.add(word.substring(c, c + n))
          c += n
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
