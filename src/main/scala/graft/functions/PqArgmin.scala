package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Shared worker for the product-quantization argmin hot loop.
  *
  * Semantics replicate the portable HOF tree it replaced
  * (`array_min(transform(cents, (c, i) => struct(l2sq(sv, c), i))).i`)
  * exactly on well-formed codebooks:
  *  - distance = Σ (svⱼ − cⱼ)², floats promoted to double, accumulated
  *    strictly left-to-right — the same rounding order as the
  *    zip_with/aggregate fold;
  *  - comparison via java.lang.Double.compare, so NaN sorts above every
  *    real distance (Spark's double ordering) and ties keep the FIRST
  *    (smallest-position) centroid, matching the lexicographic
  *    struct<d,i> min;
  *  - POSITION in the packed array is the code (shrinkage-proof — see
  *    VectorOps.packPq).
  *
  * Precondition (guaranteed by VectorOps' packed-codebook layout): every
  * centroid of a subspace has exactly subDim elements. The portable tree
  * nulls the whole distance on a length mismatch via zip_with padding;
  * this worker scores over min(length) instead — both are unreachable
  * from the public API.
  */
object PqArgmin {
  /** Argmin code for vec[off ..< off+len) against a packed centroid
    * list; -1 for an empty list (callers never pack an empty subspace —
    * same contract as NearestCentroidIdx's empty codebook). */
  def compute(vec: ArrayData, off: Int, len: Int, cents: ArrayData): Int = {
    val k = cents.numElements()
    var best = -1
    var bestD = 0.0
    var i = 0
    while (i < k) {
      val c = cents.getArray(i)
      val n = math.min(math.max(vec.numElements() - off, 0),
        math.min(len, c.numElements()))
      var acc = 0.0
      var j = 0
      while (j < n) {
        val d = vec.getFloat(off + j).toDouble - c.getFloat(j).toDouble
        acc += d * d
        j += 1
      }
      if (best == -1 || java.lang.Double.compare(acc, bestD) < 0) {
        best = i; bestD = acc
      }
      i += 1
    }
    best
  }

  /** All m codes of one vector in a single two-level pass: code s =
    * argmin over codebook subspace s of the s-th subvector slice
    * (subDim = floor(dim / m), m = codebook size — the same slicing the
    * portable `transform(sequence(0, m−1), s => argmin(slice(...)))`
    * tree produced when the codebook was packed with the same m). */
  def computeCodes(vec: ArrayData, cb: ArrayData): ArrayData = {
    val m = cb.numElements()
    val out = new Array[Int](m)
    if (m > 0) {
      val subDim = vec.numElements() / m
      var s = 0
      while (s < m) {
        out(s) = compute(vec, s * subDim, subDim, cb.getArray(s))
        s += 1
      }
    }
    new GenericArrayData(out)
  }

  private[functions] def isFloatArr(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
}

/** Nearest-centroid CODE (array position) for one PQ subvector — the
  * Lloyd-assignment hot loop of pqTrain as one native expression instead
  * of a CodegenFallback fold re-evaluated k times per row.
  *
  * Children: (subvector ARRAY<FLOAT>, centroids ARRAY<ARRAY<FLOAT>>).
  * Returns INT; -1 for an empty centroid list.
  */
case class PqSubArgmin(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = PqArgmin.isFloatArr(left.dataType) &&
      (right.dataType match {
        case ArrayType(e, _) => PqArgmin.isFloatArr(e)
        case _ => false
      })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (ARRAY<FLOAT>, ARRAY<ARRAY<FLOAT>>), got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_pq_sub_argmin"

  override def nullSafeEval(sv: Any, cents: Any): Any = {
    val v = sv.asInstanceOf[ArrayData]
    PqArgmin.compute(v, 0, v.numElements(), cents.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sv, cents) =>
      s"""
         |${ev.value} = graft.functions.PqArgmin.compute(
         |  $sv, 0, $sv.numElements(), $cents);
       """.stripMargin)

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PqSubArgmin =
    copy(left = newLeft, right = newRight)
}

/** All m PQ codes of a vector against the packed codebook in ONE native
  * two-level loop — the pqEncode hot path (the index build that touches
  * every row of a 100 TB corpus). Replaces an interpreted
  * transform(sequence)/slice/argmin tree that re-evaluated m×k short
  * folds per row with per-element closure dispatch.
  *
  * Children: (embedding ARRAY<FLOAT>,
  * codebook ARRAY<ARRAY<ARRAY<FLOAT>>> — the broadcast packed `_cb`,
  * subspaces ascending, codes ascending within each). Returns
  * ARRAY<INT> of length m = size(codebook); element s is -1 only for an
  * empty subspace list (unreachable from VectorOps.packPq output).
  */
case class PqArgminCodes(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = PqArgmin.isFloatArr(left.dataType) &&
      (right.dataType match {
        case ArrayType(ArrayType(e, _), _) => PqArgmin.isFloatArr(e)
        case _ => false
      })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (ARRAY<FLOAT>, ARRAY<ARRAY<ARRAY<FLOAT>>>), " +
        s"got ${left.dataType.catalogString} / " +
        right.dataType.catalogString)
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_codes"

  override def nullSafeEval(vec: Any, cb: Any): Any =
    PqArgmin.computeCodes(vec.asInstanceOf[ArrayData],
      cb.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (vec, cb) =>
      s"""
         |${ev.value} = graft.functions.PqArgmin.computeCodes($vec, $cb);
       """.stripMargin)

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PqArgminCodes =
    copy(left = newLeft, right = newRight)
}
