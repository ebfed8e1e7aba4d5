package graft.functions

import java.util.zip.Deflater

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd DEFLATE-compressed size of a string's UTF-8 bytes
  * (zlib level 6, raw stream). compressed/raw is the classic
  * model-free redundancy signal quality pipelines threshold on
  * (Gopher/MassiveText filter docs that compress "too well" — they are
  * boilerplate — and docs that barely compress — they are
  * high-entropy noise); DEFLATE sees LONG-RANGE repetition inside its
  * 32 KiB window that the fixed-n repetition counters (L22,
  * RepetitionStats) structurally cannot.
  *
  * The hot loop is the JVM's zlib (native code); codegen keeps the
  * expression inside the WholeStageCodegen span and the per-thread
  * Deflater is reused across rows (reset, not reallocated — Deflater
  * allocation is a JNI round-trip). Compressed byte counts are a
  * zlib-implementation property, not SQL-expressible — consumers are
  * rows-only entries with ScalaTest-pinned behavior (x28).
  */
case class DeflateSize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got " +
        child.dataType.catalogString)

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_deflate_size"

  override def nullSafeEval(input: Any): Any =
    DeflateSize.deflatedSize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.DeflateSize.deflatedSize($c);")

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

object DeflateSize {
  private val deflaters = new ThreadLocal[Deflater] {
    override def initialValue(): Deflater =
      new Deflater(Deflater.DEFAULT_COMPRESSION, /* nowrap = */ true)
  }
  private val scratch = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](8192)
  }

  /** Total DEFLATE output bytes for the UTF-8 bytes of `s`. */
  def deflatedSize(s: UTF8String): Long = {
    val in = s.getBytes
    val d = deflaters.get()
    d.reset()
    d.setInput(in)
    d.finish()
    val buf = scratch.get()
    var total = 0L
    while (!d.finished()) {
      total += d.deflate(buf)
    }
    total
  }
}
