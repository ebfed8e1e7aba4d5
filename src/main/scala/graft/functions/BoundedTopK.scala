package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.util.{Comparator, PriorityQueue}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Scored element carried through the bounded-heap aggregation. */
private[functions] case class ScoredId(score: Double, id: Long)

/** Bounded top-k aggregate: keeps the k highest-scoring (score, id)
  * pairs per group in a size-k min-heap; ties broken toward the smaller
  * id (identical ordering to `row_number() OVER (ORDER BY score DESC,
  * id)`). Output: array<struct<score double, id bigint>> sorted best-
  * first.
  *
  * Why a custom TypedImperativeAggregate: the window-function top-k
  * shuffles EVERY scored row to the group's reducer before ranking —
  * O(N·Q) rows over the wire for an ANN scan. With partial aggregation,
  * each map task sends at most k rows per group: the shuffle shrinks
  * from the data size to k × partitions × groups, which is the only
  * shape that survives a 100 TB scan. */
case class BoundedTopK(
    scoreExpr: Expression, idExpr: Expression, kExpr: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[PriorityQueue[ScoredId]] {

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr, kExpr)

  override def checkInputDataTypes(): TypeCheckResult =
    if (scoreExpr.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName score must be DOUBLE, got " +
          scoreExpr.dataType.catalogString)
    else if (idExpr.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName id must be BIGINT, got " +
          idExpr.dataType.catalogString)
    else if (!kExpr.foldable || kExpr.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName k must be a foldable INT")
    else {
      val kv = kExpr.eval(null)
      if (kv == null || kv.asInstanceOf[Number].intValue() <= 0)
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName k must be a positive literal, got $kv")
      else TypeCheckResult.TypeCheckSuccess
    }

  @transient private lazy val k: Int =
    kExpr.eval(null).asInstanceOf[Number].intValue()

  override def dataType: DataType = ArrayType(
    new StructType().add("score", DoubleType, nullable = false)
      .add("id", LongType, nullable = false),
    containsNull = false)

  override def nullable: Boolean = false
  override def prettyName: String = "graft_top_k"

  private def worstFirst: Comparator[ScoredId] = BoundedTopK.WorstFirst

  override def createAggregationBuffer(): PriorityQueue[ScoredId] =
    new PriorityQueue[ScoredId](math.max(1, k), worstFirst)

  override def update(buf: PriorityQueue[ScoredId],
      input: InternalRow): PriorityQueue[ScoredId] = {
    val s = scoreExpr.eval(input)
    val id = idExpr.eval(input)
    // null score OR null id → the row simply doesn't rank (matches
    // row_number over a null-filtered input; never fabricate id 0)
    if (s != null && id != null)
      add(buf, ScoredId(s.asInstanceOf[Double], id.asInstanceOf[Long]))
    buf
  }

  override def merge(buf: PriorityQueue[ScoredId],
      other: PriorityQueue[ScoredId]): PriorityQueue[ScoredId] = {
    other.forEach(e => add(buf, e): Unit)
    buf
  }

  private def add(buf: PriorityQueue[ScoredId], e: ScoredId): Unit = {
    if (buf.size < k) buf.add(e)
    else if (worstFirst.compare(e, buf.peek()) > 0) {
      buf.poll()
      buf.add(e)
    }
  }

  override def eval(buf: PriorityQueue[ScoredId]): Any = {
    val arr = buf.toArray(new Array[ScoredId](buf.size))
    java.util.Arrays.sort(arr, worstFirst.reversed()) // best first
    new GenericArrayData(arr.map(e => InternalRow(e.score, e.id)))
  }

  override def serialize(buf: PriorityQueue[ScoredId]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    buf.forEach { e => out.writeDouble(e.score); out.writeLong(e.id) }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): PriorityQueue[ScoredId] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    (0 until n).foreach { _ =>
      add(buf, ScoredId(in.readDouble(), in.readLong()))
    }
    buf
  }

  // (companion holds the comparator so the expression stays serializable)
  override def withNewMutableAggBufferOffset(o: Int): BoundedTopK =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BoundedTopK =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedTopK =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1),
      kExpr = newChildren(2))
}

object BoundedTopK {
  /** Min-heap order: head = current WORST of the kept k (lowest score;
    * among equal scores the LARGEST id, which loses the row_number tie). */
  object WorstFirst extends Comparator[ScoredId] with Serializable {
    override def compare(a: ScoredId, b: ScoredId): Int =
      if (a.score != b.score) java.lang.Double.compare(a.score, b.score)
      else java.lang.Long.compare(b.id, a.id)
  }
}
