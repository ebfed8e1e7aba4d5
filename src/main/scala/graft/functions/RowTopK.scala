package graft.functions

import java.util.PriorityQueue

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Generalized bounded top-k aggregate over WHOLE ROWS: keeps the k
  * elements with the SMALLEST `orderExpr` values per group (any
  * orderable type — struct keys give lexicographic multi-column
  * ordering), carrying an arbitrary `valueExpr` payload (typically
  * struct(*)). Output: array of payloads, ascending by order key —
  * element i is rank i+1 of `row_number() OVER (ORDER BY orderKey)`.
  *
  * This is BoundedTopK's shape freed from its (double score, long id)
  * signature so plan rewrites can target it: the rank-k-per-group
  * window pattern shuffles every row and sorts each partition; this
  * aggregate ships at most k rows per group per map task (see
  * plans.RankToTopK). Determinism matches the window form: rows tying
  * on the FULL order key rank arbitrarily in both.
  *
  * k is capped (MaxK) — a partial-aggregation top-k only makes sense
  * for small k; beyond that the window/sort plan is the right one.
  */
case class RowTopK(
    orderExpr: Expression, valueExpr: Expression, kExpr: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[PriorityQueue[(Any, Any)]] {

  override def children: Seq[Expression] = Seq(orderExpr, valueExpr, kExpr)

  override def checkInputDataTypes(): TypeCheckResult =
    if (!RowTypeUtilsHolder.isOrderable(orderExpr.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName order key type " +
          s"${orderExpr.dataType.catalogString} is not orderable")
    else if (!kExpr.foldable || kExpr.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName k must be a foldable INT")
    else {
      val kv = kExpr.eval(null)
      if (kv == null || kv.asInstanceOf[Number].intValue() <= 0 ||
        kv.asInstanceOf[Number].intValue() > RowTopK.MaxK)
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName k must be in [1, ${RowTopK.MaxK}], got $kv")
      else TypeCheckResult.TypeCheckSuccess
    }

  @transient private lazy val k: Int =
    kExpr.eval(null).asInstanceOf[Number].intValue()

  @transient private lazy val keyOrdering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(orderExpr.dataType)

  /** Max-heap on the key: head = current WORST (largest) kept key, the
    * one a better candidate evicts. */
  @transient private lazy val worstFirst:
      java.util.Comparator[(Any, Any)] =
    (a: (Any, Any), b: (Any, Any)) => keyOrdering.compare(b._1, a._1)

  override def dataType: DataType =
    ArrayType(valueExpr.dataType, containsNull = valueExpr.nullable)

  override def nullable: Boolean = false
  override def prettyName: String = "graft_row_top_k"

  override def createAggregationBuffer(): PriorityQueue[(Any, Any)] =
    new PriorityQueue[(Any, Any)](math.max(1, k), worstFirst)

  override def update(buf: PriorityQueue[(Any, Any)],
      input: InternalRow): PriorityQueue[(Any, Any)] = {
    val key = orderExpr.eval(input)
    // null order key never ranks (row_number over null-filtered input);
    // the VALUE may be null if declared nullable
    if (key != null) {
      // admission test BEFORE materializing the payload: once the heap
      // is warm almost every row loses, and evaluating + deep-copying a
      // whole-row struct per losing row is exactly the cost this
      // aggregate exists to avoid. Only admitted rows copy (buffers
      // outlive any reused backing row).
      val admit = buf.size < k ||
        keyOrdering.compare(key, buf.peek()._1) < 0
      if (admit)
        add(buf, (InternalRow.copyValue(key),
          InternalRow.copyValue(valueExpr.eval(input))))
    }
    buf
  }

  override def merge(buf: PriorityQueue[(Any, Any)],
      other: PriorityQueue[(Any, Any)]): PriorityQueue[(Any, Any)] = {
    other.forEach(e => add(buf, e): Unit)
    buf
  }

  private def add(buf: PriorityQueue[(Any, Any)], e: (Any, Any)): Unit = {
    if (buf.size < k) buf.add(e)
    else if (worstFirst.compare(e, buf.peek()) > 0) {
      buf.poll()
      buf.add(e)
    }
  }

  override def eval(buf: PriorityQueue[(Any, Any)]): Any = {
    val arr = buf.toArray(new Array[(Any, Any)](buf.size))
    java.util.Arrays.sort(arr,
      (a: (Any, Any), b: (Any, Any)) => keyOrdering.compare(a._1, b._1))
    new GenericArrayData(arr.map(_._2))
  }

  /** (key, value) pairs round-trip through an UnsafeProjection of a
    * two-field struct — type-generic, no per-type serializer code. */
  @transient private lazy val serSchema =
    StructType(Seq(
      StructField("k", orderExpr.dataType, nullable = false),
      StructField("v", valueExpr.dataType, nullable = true)))
  @transient private lazy val serProj = UnsafeProjection.create(serSchema)

  override def serialize(buf: PriorityQueue[(Any, Any)]): Array[Byte] = {
    val bytes = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bytes)
    out.writeInt(buf.size)
    buf.forEach { e =>
      val row = serProj(InternalRow(e._1, e._2))
      val b = row.getBytes
      out.writeInt(b.length)
      out.write(b)
    }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): PriorityQueue[(Any, Any)] = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    (0 until n).foreach { _ =>
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      val row = new UnsafeRow(2)
      row.pointTo(b, len)
      add(buf, (InternalRow.copyValue(row.get(0, orderExpr.dataType)),
        InternalRow.copyValue(row.get(1, valueExpr.dataType))))
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): RowTopK =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): RowTopK =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): RowTopK =
    copy(orderExpr = newChildren(0), valueExpr = newChildren(1),
      kExpr = newChildren(2))
}

object RowTopK {
  /** Rewrites only target small-k patterns; a big k belongs to the
    * window/sort plan (the heap and the per-group array stop paying for
    * themselves). */
  val MaxK = 1024
}

/** Orderability check shared with the rewrite rule (RowOrdering.isOrderable
  * lives in catalyst; routed through one place so the rule and the
  * aggregate can't disagree). */
private[graft] object RowTypeUtilsHolder {
  def isOrderable(dt: DataType): Boolean =
    org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(dt)
}
