package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native intra-document repeated n-gram RUN removal (the Gopher-rule
  * transform behind the q62 repetition PROFILE): a token at original
  * position p is dropped iff it lies inside an n-block whose end e
  * satisfies t[e−o] == t[e−o−n] for every o in [0,n) — i.e. the block
  * is an aligned repeat of the block immediately before it. "a b a b
  * a b" → "a b"; "a b a" is untouched (no aligned bigram repeat);
  * n = 1 degenerates to CollapseRuns' single-token run collapse.
  *
  * The rule is defined on ORIGINAL positions (stateless, one pass), so
  * it is exactly expressible as three fixed-frame window functions over
  * (doc, position) — which is what the DuckDB oracle runs — while this
  * expression evaluates it map-side with ZERO shuffle: at 100 TB the
  * windowed form pays a full corpus shuffle on doc_id; this form pays
  * nothing. Returns struct<clean: string, n_raw: long, n_removed:
  * long>. Token semantics are TextFunctions.tokens (single-space
  * separators, empties dropped). */
case class CollapseNgramRuns(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a STRING argument, got " +
          left.dataType.catalogString)
    else if (!right.foldable || right.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName n must be a " +
        "foldable INT")
    else {
      val nv = right.eval(null)
      if (nv == null || nv.asInstanceOf[Number].intValue() < 1 ||
          nv.asInstanceOf[Number].intValue() > 16)
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName n must be in [1,16], got $nv")
      else TypeCheckResult.TypeCheckSuccess
    }

  override def dataType: DataType = CollapseNgramRuns.OutType
  override def prettyName: String = "graft_collapse_ngram_runs"

  override def nullSafeEval(l: Any, r: Any): Any =
    CollapseNgramRuns.compute(l.asInstanceOf[UTF8String],
      r.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, n) =>
      s"${ev.value} = graft.functions.CollapseNgramRuns.compute($c, $n);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression) =
    copy(left = newLeft, right = newRight)
}

object CollapseNgramRuns {
  val OutType: StructType = StructType(Seq(
    StructField("clean", StringType, nullable = false),
    StructField("n_raw", LongType, nullable = false),
    StructField("n_removed", LongType, nullable = false)))

  /** Shared by interpreted eval and generated code. One character scan
    * to find token boundaries, then O(m·n) boundary-index work — no
    * substring allocation (equality via regionMatches on the backing
    * string). */
  def compute(u: UTF8String, n: Int): InternalRow = {
    val s = u.toString
    val len = s.length
    // token boundaries
    var m = 0
    var i = 0
    var starts = new Array[Int](math.max(8, len / 4))
    var ends = new Array[Int](starts.length)
    while (i < len) {
      if (s.charAt(i) == ' ') i += 1
      else {
        var j = i
        while (j < len && s.charAt(j) != ' ') j += 1
        if (m == starts.length) {
          starts = java.util.Arrays.copyOf(starts, m * 2)
          ends = java.util.Arrays.copyOf(ends, m * 2)
        }
        starts(m) = i; ends(m) = j; m += 1
        i = j
      }
    }
    def tokEq(a: Int, b: Int): Boolean =
      (ends(a) - starts(a)) == (ends(b) - starts(b)) &&
        s.regionMatches(starts(a), s, starts(b), ends(a) - starts(a))
    // flag(p) = t[p]==t[p-n]; run counter of consecutive flags gives
    // red_end(p) = (cnt >= n); red_end at e removes positions e-n+1..e
    val removed = new Array[Boolean](m)
    var cnt = 0
    var p = 0
    while (p < m) {
      if (p >= n && tokEq(p, p - n)) cnt += 1 else cnt = 0
      if (cnt >= n) {
        var q = p - n + 1
        while (q <= p) { removed(q) = true; q += 1 }
      }
      p += 1
    }
    val sb = new java.lang.StringBuilder(len)
    var nRemoved = 0L
    var kept = 0L
    p = 0
    while (p < m) {
      if (removed(p)) nRemoved += 1
      else {
        if (kept > 0) sb.append(' ')
        sb.append(s, starts(p), ends(p))
        kept += 1
      }
      p += 1
    }
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(sb.toString), m.toLong, nRemoved))
  }
}
