package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequency-summary buffer: at most `k` counters plus the
  * total item count. */
private[functions] final class MgBuffer(
    var n: Long, val counters: mutable.HashMap[String, Long])

/** Mergeable Misra-Gries heavy-hitter SKETCH aggregate. Output:
  * struct<n: bigint, candidates: array<string>> where `candidates` is
  * guaranteed to contain EVERY item whose true frequency exceeds n/k
  * (the classic MG bound; merging two summaries preserves it — Agarwal
  * et al., "Mergeable Summaries", PODS'12). The candidate set may also
  * contain false positives and depends on merge order, so it is a
  * CANDIDATE GENERATOR, not an answer: TextOps.heavyHitterTokens runs an
  * exact counting pass over the ≤k candidates to produce a deterministic,
  * oracle-exact result (the same sketch-then-verify shape as LSH dedup).
  *
  * Why this beats groupBy for the first pass at 100 TB: an exact
  * token-frequency groupBy shuffles every distinct token from every
  * partition; the MG partial state is ≤k counters per partition
  * REGARDLESS of input size — the shuffle is k × partitions rows, and
  * the merged driver-side state is ≤k counters.
  *
  * update: standard MG — increment a present counter; insert if room;
  * otherwise decrement ALL counters by 1 and drop zeros (amortized O(1)
  * per item: each batch of k decrements is paid for by k increments).
  * merge: sum counters keywise, then if more than k survive, subtract
  * the (k+1)-th largest value from all and drop non-positives. */
case class MisraGries(
    itemExpr: Expression, kExpr: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgBuffer] {

  override def children: Seq[Expression] = Seq(itemExpr, kExpr)

  override def checkInputDataTypes(): TypeCheckResult =
    if (itemExpr.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName item must be STRING, got " +
          itemExpr.dataType.catalogString)
    else if (!kExpr.foldable || kExpr.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName k must be a foldable INT")
    else {
      val kv = kExpr.eval(null)
      if (kv == null || kv.asInstanceOf[Number].intValue() <= 0)
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName k must be a positive literal, got $kv")
      else TypeCheckResult.TypeCheckSuccess
    }

  @transient private lazy val k: Int =
    kExpr.eval(null).asInstanceOf[Number].intValue()

  override def dataType: DataType = new StructType()
    .add("n", LongType, nullable = false)
    .add("candidates", ArrayType(StringType, containsNull = false),
      nullable = false)

  override def nullable: Boolean = false
  override def prettyName: String = "graft_misra_gries"

  override def createAggregationBuffer(): MgBuffer =
    new MgBuffer(0L, mutable.HashMap.empty)

  override def update(buf: MgBuffer, input: InternalRow): MgBuffer = {
    val v = itemExpr.eval(input)
    if (v != null) {
      // copy out of Spark's reused UTF8String buffer before keying on it
      val item = v.asInstanceOf[UTF8String].toString
      buf.n += 1
      buf.counters.get(item) match {
        case Some(c) => buf.counters.update(item, c + 1)
        case None if buf.counters.size < k => buf.counters.update(item, 1L)
        case None =>
          val dead = mutable.ArrayBuffer.empty[String]
          buf.counters.mapValuesInPlace((_, c) => c - 1)
          buf.counters.foreach { case (key, c) => if (c == 0) dead += key }
          dead.foreach(buf.counters.remove)
      }
    }
    buf
  }

  override def merge(buf: MgBuffer, other: MgBuffer): MgBuffer = {
    buf.n += other.n
    other.counters.foreach { case (key, c) =>
      buf.counters.update(key, buf.counters.getOrElse(key, 0L) + c)
    }
    if (buf.counters.size > k) {
      // subtract the (k+1)-th largest count from everything; ≥ k+1
      // counters hit zero or below, so ≤ k survive and the n/k error
      // bound still holds after the merge
      val cut = buf.counters.values.toArray.sortBy(-_).apply(k)
      val dead = mutable.ArrayBuffer.empty[String]
      buf.counters.mapValuesInPlace((_, c) => c - cut)
      buf.counters.foreach { case (key, c) => if (c <= 0) dead += key }
      dead.foreach(buf.counters.remove)
    }
    buf
  }

  override def eval(buf: MgBuffer): Any = {
    val sorted = buf.counters.keysIterator.toArray.sorted
    InternalRow(buf.n,
      new GenericArrayData(sorted.map(UTF8String.fromString(_): Any)))
  }

  override def serialize(buf: MgBuffer): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeLong(buf.n)
    out.writeInt(buf.counters.size)
    buf.counters.foreach { case (key, c) =>
      val b = key.getBytes(StandardCharsets.UTF_8)
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MgBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    buf.n = in.readLong()
    val size = in.readInt()
    (0 until size).foreach { _ =>
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.counters.update(new String(b, StandardCharsets.UTF_8),
        in.readLong())
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): MisraGries =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGries =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGries =
    copy(itemExpr = newChildren(0), kExpr = newChildren(1))
}
