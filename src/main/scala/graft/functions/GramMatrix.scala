package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Second-moment buffer: row count, per-dimension sums, and the upper
  * triangle of Σ x xᵀ (row-major, d·(d+1)/2 entries). */
private[functions] final class GramBuffer(
    var d: Int, var n: Long, var sums: Array[Double],
    var gram: Array[Double])

/** Mergeable second-moment (Gram matrix) aggregate over an
  * Array[Float] embedding column — the ONE-PASS sufficient statistic
  * for PCA/whitening: covariance = G/n − μμᵀ falls out of (n, Σx, Σxxᵀ)
  * with no second data pass and no centering shuffle.
  *
  * Why a custom TypedImperativeAggregate: the compositional alternative
  * (posexplode to (i, xᵢ) + a vec_id self-join to (i, j, xᵢxⱼ) + a d²
  * groupBy) shuffles d·n exploded rows and joins them against
  * themselves — at 100 TB that is a corpus-sized shuffle for what is
  * mathematically a per-partition fold. This aggregate's partial state
  * is EXACTLY d(d+1)/2 + d + 1 doubles per partition (d=64 → ~17 KB)
  * regardless of input size; update is the O(d²) outer-product
  * accumulation, merge is elementwise add.
  *
  * The dimension is taken from the FIRST non-null vector; subsequent
  * vectors must match it (ragged input raises, same contract as
  * VectorDot). Output: struct<n: bigint, sums: array<double>,
  * gram: array<double>> (gram = upper triangle, row-major). */
case class GramMatrix(
    vecExpr: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GramBuffer] {

  override def children: Seq[Expression] = Seq(vecExpr)

  override def checkInputDataTypes(): TypeCheckResult =
    vecExpr.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects ARRAY<FLOAT|DOUBLE>, got " +
          other.catalogString)
    }

  @transient private lazy val isFloat =
    vecExpr.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def dataType: DataType = new StructType()
    .add("n", LongType, nullable = false)
    .add("sums", ArrayType(DoubleType, containsNull = false),
      nullable = false)
    .add("gram", ArrayType(DoubleType, containsNull = false),
      nullable = false)

  override def nullable: Boolean = false
  override def prettyName: String = "graft_gram_matrix"

  override def createAggregationBuffer(): GramBuffer =
    new GramBuffer(-1, 0L, Array.empty, Array.empty)

  private def ensureDim(buf: GramBuffer, d: Int): Unit = {
    if (buf.d == -1) {
      buf.d = d
      buf.sums = new Array[Double](d)
      buf.gram = new Array[Double](d * (d + 1) / 2)
    } else require(buf.d == d,
      s"$prettyName: ragged input — saw dimensions ${buf.d} and $d")
  }

  override def update(buf: GramBuffer, input: InternalRow): GramBuffer = {
    val v = vecExpr.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val d = arr.numElements()
      ensureDim(buf, d)
      val x = new Array[Double](d)
      var i = 0
      while (i < d) {
        x(i) = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        i += 1
      }
      buf.n += 1
      var k = 0
      i = 0
      while (i < d) {
        buf.sums(i) += x(i)
        var j = i
        while (j < d) { buf.gram(k) += x(i) * x(j); k += 1; j += 1 }
        i += 1
      }
    }
    buf
  }

  override def merge(buf: GramBuffer, other: GramBuffer): GramBuffer = {
    if (other.d != -1) {
      ensureDim(buf, other.d)
      buf.n += other.n
      var i = 0
      while (i < buf.sums.length) { buf.sums(i) += other.sums(i); i += 1 }
      i = 0
      while (i < buf.gram.length) { buf.gram(i) += other.gram(i); i += 1 }
    }
    buf
  }

  override def eval(buf: GramBuffer): Any =
    InternalRow(buf.n,
      new GenericArrayData(buf.sums.map(x => x: Any)),
      new GenericArrayData(buf.gram.map(x => x: Any)))

  override def serialize(buf: GramBuffer): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.d)
    out.writeLong(buf.n)
    buf.sums.foreach(out.writeDouble)
    buf.gram.foreach(out.writeDouble)
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): GramBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val d = in.readInt()
    val n = in.readLong()
    if (d == -1) new GramBuffer(-1, n, Array.empty, Array.empty)
    else {
      val sums = Array.fill(d)(in.readDouble())
      val gram = Array.fill(d * (d + 1) / 2)(in.readDouble())
      new GramBuffer(d, n, sums, gram)
    }
  }

  override def withNewMutableAggBufferOffset(o: Int): GramMatrix =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): GramMatrix =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GramMatrix =
    copy(vecExpr = newChildren(0))
}
