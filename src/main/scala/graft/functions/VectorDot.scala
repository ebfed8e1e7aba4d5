package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product over two Array[Float] embedding columns, promoted
  * to double, accumulated strictly left-to-right (bit-identical to the
  * portable zip_with/aggregate form in VectorFunctions AND to DuckDB's
  * list_reduce — float×float widened to double is exact, so the only
  * rounding is in the running sum, which all three evaluate in the same
  * order).
  *
  * Why native: Spark's higher-order functions are CodegenFallback —
  * every pair evaluation allocates closures and boxed arrays. In an
  * all-pairs similarity join that is THE hot loop (O(n²·dim) products);
  * this expression compiles to a tight `acc += a[i]*b[i]` loop inside
  * whole-stage codegen. Measured ~20× over the HOF tree at sf0.1.
  *
  * Assumes non-null array elements (embedding vectors); extra elements of
  * the longer vector are ignored.
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  private def ok(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<FLOAT> arguments, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_vector_dot"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): VectorDot = copy(left = newLeft, right = newRight)
}

/** Index of the nearest centroid by cosine — the IVF assignment hot loop
  * as ONE native expression instead of a higher-order fold (HOFs are
  * CodegenFallback: the previous aggregate() lambda rebuilt
  * when/coalesce/struct trees per centroid per row; this compiles to a
  * two-level float loop shared by interpreted eval and codegen).
  *
  * Children: (embedding ARRAY<FLOAT>, embNorm DOUBLE,
  * centroidVecs ARRAY<ARRAY<FLOAT>>, centroidNorms ARRAY<DOUBLE>) —
  * the centroid arrays come from the broadcast packed codebook, sorted
  * ascending by centroid id. Semantics replicate the fold exactly:
  * similarity = dot/(embNorm·cnorm), zero-denominator (zero vector)
  * mapped to -2.0 (below any real cosine), strict > argmax so ties keep
  * the FIRST (smallest-id) centroid. Returns -1 for an empty codebook
  * (callers map -1 to a null bucket). */
case class NearestCentroidIdx(first: Expression, second: Expression,
    third: Expression, fourth: Expression)
  extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def isFloatArr(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    val ok = isFloatArr(first.dataType) &&
      second.dataType == DoubleType &&
      (third.dataType match {
        case ArrayType(e, _) => isFloatArr(e)
        case _ => false
      }) &&
      (fourth.dataType match {
        case ArrayType(DoubleType, _) => true
        case _ => false
      })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (ARRAY<FLOAT>, DOUBLE, ARRAY<ARRAY<FLOAT>>, " +
        s"ARRAY<DOUBLE>), got ${first.dataType.catalogString}, " +
        s"${second.dataType.catalogString}, " +
        s"${third.dataType.catalogString}, " +
        s"${fourth.dataType.catalogString}")
  }

  override def dataType: DataType =
    org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "graft_nearest_centroid"

  override def nullSafeEval(e: Any, en: Any, cv: Any, cn: Any): Any =
    NearestCentroidIdx.compute(e.asInstanceOf[ArrayData],
      en.asInstanceOf[Double], cv.asInstanceOf[ArrayData],
      cn.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (e, en, cv, cn) =>
      s"""
         |${ev.value} = graft.functions.NearestCentroidIdx.compute(
         |  $e, $en, $cv, $cn);
       """.stripMargin)

  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression, q: Expression): NearestCentroidIdx =
    copy(first = f, second = s, third = t, fourth = q)
}

object NearestCentroidIdx {
  /** Static worker shared by interpreted eval and generated code. */
  def compute(vec: ArrayData, en: Double, cvecs: ArrayData,
      cnorms: ArrayData): Int = {
    val k = math.min(cvecs.numElements(), cnorms.numElements())
    var best = -1
    var bestSim = -3.0
    var i = 0
    while (i < k) {
      val c = cvecs.getArray(i)
      val n = math.min(vec.numElements(), c.numElements())
      var acc = 0.0
      var j = 0
      while (j < n) {
        acc += vec.getFloat(j).toDouble * c.getFloat(j).toDouble
        j += 1
      }
      val denom = en * cnorms.getDouble(i)
      val sim = if (denom == 0.0) -2.0 else acc / denom
      if (sim > bestSim) { best = i; bestSim = sim }
      i += 1
    }
    best
  }
}

/** Top-`probes` centroid indices by cosine — the multi-assignment
  * generalization of NearestCentroidIdx for cluster-bucketed dedup
  * (SemDeDup): each corpus vector joins its `probes` nearest cells so
  * boundary pairs still meet, and the selection runs as ONE native
  * two-level loop per row inside whole-stage codegen (an array_sort
  * over a transform'd struct array would be CodegenFallback — an
  * interpreted per-row sort of the whole codebook on the
  * corpus-touching path).
  *
  * Children: (vec ARRAY<FLOAT>, vecNorm DOUBLE,
  * centroidVecs ARRAY<ARRAY<FLOAT>>, centroidNorms ARRAY<DOUBLE>,
  * probes INT — plan-time literal). Returns ARRAY<INT> of centroid
  * ARRAY POSITIONS in descending-similarity order, ties to the
  * smaller position (exactly NearestCentroidIdx's strict-> rule, so
  * element 0 always equals its argmax). Zero-norm degenerate
  * similarities follow NearestCentroidIdx's convention. */
case class TopCentroidIdxs(first: Expression, second: Expression,
    third: Expression, fourth: Expression, fifth: Expression)
  extends org.apache.spark.sql.catalyst.expressions.QuinaryExpression {

  override def children: Seq[Expression] =
    Seq(first, second, third, fourth, fifth)

  override def checkInputDataTypes(): TypeCheckResult = {
    def isFloatArr(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    val ok = isFloatArr(first.dataType) &&
      second.dataType == DoubleType &&
      (third.dataType match {
        case ArrayType(e, _) => isFloatArr(e)
        case _ => false
      }) &&
      (fourth.dataType match {
        case ArrayType(DoubleType, _) => true
        case _ => false
      }) &&
      fifth.dataType == org.apache.spark.sql.types.IntegerType
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (ARRAY<FLOAT>, DOUBLE, ARRAY<ARRAY<FLOAT>>, " +
        s"ARRAY<DOUBLE>, INT), got ${children.map(_.dataType.catalogString)
          .mkString(", ")}")
  }

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "graft_top_centroids"

  override def nullSafeEval(e: Any, en: Any, cv: Any, cn: Any,
      p: Any): Any =
    TopCentroidIdxs.compute(e.asInstanceOf[ArrayData],
      en.asInstanceOf[Double], cv.asInstanceOf[ArrayData],
      cn.asInstanceOf[ArrayData], p.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (e, en, cv, cn, p) =>
      s"""
         |${ev.value} = graft.functions.TopCentroidIdxs.compute(
         |  $e, $en, $cv, $cn, $p);
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopCentroidIdxs =
    copy(first = newChildren(0), second = newChildren(1),
      third = newChildren(2), fourth = newChildren(3),
      fifth = newChildren(4))
}

object TopCentroidIdxs {
  /** Static worker shared by interpreted eval and generated code:
    * bounded insertion selection — probes is tiny, so the inner shift
    * is a handful of moves, never a sort of the codebook. */
  def compute(vec: ArrayData, en: Double, cvecs: ArrayData,
      cnorms: ArrayData, probes: Int): ArrayData = {
    val k = math.min(cvecs.numElements(), cnorms.numElements())
    val p = math.max(0, math.min(probes, k))
    if (p == 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[Any])
    val idxs = new Array[Int](p)
    val sims = new Array[Double](p)
    var filled = 0
    var i = 0
    while (i < k) {
      val c = cvecs.getArray(i)
      val n = math.min(vec.numElements(), c.numElements())
      var acc = 0.0
      var j = 0
      while (j < n) {
        acc += vec.getFloat(j).toDouble * c.getFloat(j).toDouble
        j += 1
      }
      val denom = en * cnorms.getDouble(i)
      val sim = if (denom == 0.0) -2.0 else acc / denom
      // insertion point: strictly-greater keeps earlier positions
      // first on ties (NearestCentroidIdx's rule)
      var pos = filled
      while (pos > 0 && sims(pos - 1) < sim) pos -= 1
      if (pos < p) {
        var m = math.min(filled, p - 1)
        while (m > pos) { sims(m) = sims(m - 1); idxs(m) = idxs(m - 1); m -= 1 }
        sims(pos) = sim
        idxs(pos) = i
        if (filled < p) filled += 1
      }
      i += 1
    }
    val out = new Array[Any](filled)
    var o = 0
    while (o < filled) { out(o) = idxs(o); o += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}
