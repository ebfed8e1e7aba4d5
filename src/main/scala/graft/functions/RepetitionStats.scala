package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass repetition counters (the Gopher repetition-filter
  * inputs of TextOps.repetitionProfile): returns
  * struct<n_bigrams, max_bigram_count, n_trigrams, n_distinct_trigrams,
  * max_run — all long> from one scan of the raw text.
  *
  * Token semantics are EXACTLY TextFunctions.tokens (maximal runs
  * between single-space characters, empties dropped). The equivalent
  * Column tree materializes the token array, two n-gram arrays, a
  * distinct copy, and a sorted copy, then folds them with interpreted
  * higher-order functions — five intermediate arrays and
  * O(len log len) work per row. Here: one span scan, one hash map
  * (bigram multiplicities), one hash set (distinct trigrams); counts
  * are exact integers, so the downstream fraction divisions are
  * bit-identical to the portable tree (equivalence pinned in
  * TextOpsSpec). Same preferred-extension-order upgrade as
  * CollapseRuns/RollingHash (SURVEY §4.2).
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got " +
        child.dataType.catalogString)

  override def dataType: DataType = RepetitionStats.OutType
  override def prettyName: String = "graft_repetition_stats"

  override def nullSafeEval(input: Any): Any =
    RepetitionStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RepetitionStats.compute($c);")

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

object RepetitionStats {
  val OutType: StructType = StructType(Seq(
    StructField("n_bigrams", LongType, nullable = false),
    StructField("max_bigram_count", LongType, nullable = false),
    StructField("n_trigrams", LongType, nullable = false),
    StructField("n_distinct_trigrams", LongType, nullable = false),
    StructField("max_run", LongType, nullable = false)))

  /** Shared by interpreted eval and generated code (companion-compute
    * pattern — one body, two call sites). */
  def compute(u: UTF8String): InternalRow = {
    val s = u.toString
    val len = s.length
    // token spans: starts[t] until ends[t)
    var starts = new Array[Int](16)
    var ends = new Array[Int](16)
    var n = 0
    var i = 0
    while (i < len) {
      if (s.charAt(i) == ' ') i += 1
      else {
        var j = i
        while (j < len && s.charAt(j) != ' ') j += 1
        if (n == starts.length) {
          starts = java.util.Arrays.copyOf(starts, n * 2)
          ends = java.util.Arrays.copyOf(ends, n * 2)
        }
        starts(n) = i; ends(n) = j; n += 1
        i = j
      }
    }
    def tokEq(a: Int, b: Int): Boolean =
      (ends(a) - starts(a)) == (ends(b) - starts(b)) &&
        s.regionMatches(starts(a), s, starts(b), ends(b) - starts(b))
    // longest run of consecutive identical tokens
    var maxRun = 0L
    var run = 0L
    var t = 0
    while (t < n) {
      if (t > 0 && tokEq(t - 1, t)) run += 1 else run = 1
      if (run > maxRun) maxRun = run
      t += 1
    }
    // bigram multiplicities + distinct trigrams (space-joined, the same
    // strings the portable n-gram tree builds)
    val bigrams = new java.util.HashMap[String, java.lang.Long]()
    var maxBigram = 0L
    val trigrams = new java.util.HashSet[String]()
    t = 0
    while (t + 1 < n) {
      val bg = new java.lang.StringBuilder(
        (ends(t) - starts(t)) + (ends(t + 1) - starts(t + 1)) + 1)
      bg.append(s, starts(t), ends(t)).append(' ')
        .append(s, starts(t + 1), ends(t + 1))
      val key = bg.toString
      val prev = bigrams.get(key)
      val c = (if (prev == null) 0L else prev.longValue) + 1L
      bigrams.put(key, java.lang.Long.valueOf(c))
      if (c > maxBigram) maxBigram = c
      if (t + 2 < n) {
        bg.append(' ').append(s, starts(t + 2), ends(t + 2))
        trigrams.add(bg.toString)
      }
      t += 1
    }
    val nBigrams = math.max(n - 1, 0).toLong
    val nTrigrams = math.max(n - 2, 0).toLong
    new GenericInternalRow(Array[Any](
      nBigrams, maxBigram, nTrigrams, trigrams.size.toLong, maxRun))
  }
}
