package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, FloatType, IntegerType, LongType, ShortType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native sketch expressions for near-dup dedup (MinHash signatures,
  * SimHash). Both consume a precomputed ARRAY<BIGINT> of element hashes
  * (shingle / token hashes) and run the per-row O(k·n) inner loops as
  * tight generated Java — the HOF expression-tree forms of these are
  * CodegenFallback and ~50× slower at sf0.1 (they re-evaluate the hash
  * array per seed and allocate per lambda call).
  */

/** MinHash signature: for each universal-hash seed pair (a_i, b_i),
  * min over the input hashes of (a_i·h + b_i) mod p, p = 2³¹−1.
  * Seed arrays arrive as foldable literal children (keeps the expression
  * registry-compatible); input hashes must already be reduced below p so
  * a_i·h stays under 2⁶² (no overflow).
  * Empty input → empty signature (callers filter empty shingle sets —
  * two empty signatures would otherwise band-collide).
  */
case class MinHashSig(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(first, second, third).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (!ok) TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires three ARRAY<BIGINT> arguments")
    else if (!second.foldable || !third.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName seed arrays must be foldable literals")
    else if (aSeeds.length != bSeeds.length || aSeeds.isEmpty)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName seed arrays must be non-empty and equal-length " +
          s"(got ${aSeeds.length} and ${bSeeds.length})")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  private val P = MinHashSig.P

  @transient private lazy val aSeeds =
    second.eval(null).asInstanceOf[ArrayData].toLongArray()
  @transient private lazy val bSeeds =
    third.eval(null).asInstanceOf[ArrayData].toLongArray()

  override def nullSafeEval(h: Any, a2: Any, a3: Any): Any = {
    val hs = h.asInstanceOf[ArrayData]
    val k = aSeeds.length
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var j = 0
    val n = hs.numElements()
    if (n == 0) return new GenericArrayData(new Array[Long](0))
    while (j < n) {
      val hv = hs.getLong(j)
      var i = 0
      while (i < k) {
        val v = java.lang.Math.floorMod(aSeeds(i) * hv + bSeeds(i), P)
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", aSeeds, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bSeeds, "long[]")
    nullSafeCodeGen(ctx, ev, (h, _, _) => {
      val sig = ctx.freshName("sig")
      val n = ctx.freshName("n")
      val k = ctx.freshName("k")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val hv = ctx.freshName("hv")
      val v = ctx.freshName("v")
      s"""
         |int $n = $h.numElements();
         |int $k = $aRef.length;
         |long[] $sig = $n == 0 ? new long[0] : new long[$k];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |for (int $j = 0; $j < $n; $j++) {
         |  long $hv = $h.getLong($j);
         |  for (int $i = 0; $i < $k; $i++) {
         |    long $v = java.lang.Math.floorMod(
         |      $aRef[$i] * $hv + $bRef[$i], ${P}L);
         |    if ($v < $sig[$i]) $sig[$i] = $v;
         |  }
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression): MinHashSig =
    copy(first = f, second = s, third = t)
}

object MinHashSig {
  /** Mersenne prime 2^31−1: the universal-hash modulus. Input hashes
    * must be reduced below it so a·h + b stays under 2^62 — callers
    * (NearDup) share THIS constant to keep the no-overflow contract. */
  val P = 2147483647L
}

/** Distinct word n-gram shingle hashes in one pass: tokenize on single
  * spaces (empties dropped — same contract as TextFunctions.tokens),
  * slide an n-token window, hash each joined shingle with the SAME
  * xxhash64 (seed 42) Spark's xxhash64() uses, de-duplicate on the raw
  * 64-bit hash keeping first-occurrence order, and reduce mod `mod` on
  * output. Value-equal to
  * `transform(shingles(text,n), s -> pmod(xxhash64(s), mod))` (dedup
  * happens BEFORE the mod on both sides, so even post-mod collisions
  * agree; the only divergence is a raw 64-bit xxhash collision between
  * distinct shingles, ~d²/2⁶⁴) minus the interpreted HOF chain
  * (split → sequence → slice → array_join → array_distinct →
  * transform), which dominated the near-dup bench.
  * n and mod must be foldable literals. Codegen delegates to the static
  * compute() — the loop is all driver-written Scala, no per-lambda
  * allocation. */
case class ShingleHashes(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a STRING first argument")
    else if (!second.foldable || !third.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName n/mod arguments must be foldable literals")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"

  @transient private lazy val n =
    second.eval(null).asInstanceOf[Number].intValue()
  @transient private lazy val mod =
    third.eval(null).asInstanceOf[Number].longValue()

  override def nullSafeEval(t: Any, a2: Any, a3: Any): Any =
    ShingleHashes.compute(t.asInstanceOf[UTF8String], n, mod)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val nRef = ctx.addReferenceObj("shingleN", Integer.valueOf(n), "Integer")
    val mRef = ctx.addReferenceObj("shingleMod", java.lang.Long.valueOf(mod),
      "Long")
    nullSafeCodeGen(ctx, ev, (t, _, _) =>
      s"""
         |${ev.value} = graft.functions.ShingleHashes.compute(
         |  $t, $nRef.intValue(), $mRef.longValue());
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression): ShingleHashes =
    copy(first = f, second = s, third = t)
}

object ShingleHashes {
  /** Static worker shared by interpreted eval and generated code. */
  def compute(text: UTF8String, n: Int, mod: Long): ArrayData = {
    val tokens = new java.util.ArrayList[String]()
    val s = text.toString
    var start = 0
    val len = s.length
    var i = 0
    while (i <= len) {
      if (i == len || s.charAt(i) == ' ') {
        if (i > start) tokens.add(s.substring(start, i))
        start = i + 1
      }
      i += 1
    }
    val t = tokens.size()
    if (t < n) return new GenericArrayData(new Array[Long](0))
    // De-duplicate on the RAW 64-bit hash (a faithful stand-in for the
    // shingle string at ~2⁻⁶⁴ collision odds), then mod on OUTPUT — the
    // same order as the HOF tree, which distincts shingle STRINGS before
    // hashing. Deduping after the mod would also merge distinct shingles
    // that merely collide mod `mod` (~d²/2³² per doc at mod=2³¹−1),
    // silently diverging from the tree at corpus scale.
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val out = new java.util.ArrayList[java.lang.Long]()
    val sb = new java.lang.StringBuilder()
    var w = 0
    while (w <= t - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(tokens.get(w + j))
        j += 1
      }
      val u = UTF8String.fromString(sb.toString)
      val h = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes(), 42L)
      if (seen.add(h)) out.add(java.lang.Math.floorMod(h, mod))
      w += 1
    }
    val arr = new Array[Long](out.size())
    var k = 0
    while (k < arr.length) { arr(k) = out.get(k); k += 1 }
    new GenericArrayData(arr)
  }
}

/** Random-hyperplane LSH band values in ONE pass: for an Array[Float]
  * embedding, computes all bands×rowsPerBand sign bits (sign of the dot
  * with fixed Gaussian hyperplanes) and returns one packed-bits INT per
  * band — element b = Σ_r (dot(vec, plane_{b·rows+r}) >= 0 ? 1<<r : 0).
  *
  * The plane matrix is derived DETERMINISTICALLY from (seed, #planes,
  * dim) with dim read from the input row itself — so the operator needs
  * no width parameter and plan construction launches no probing job; the
  * same seed yields identical planes on every executor. Dot products use
  * VectorDot's exact arithmetic (float widened to double, left-to-right
  * accumulation), so bit values match the previous per-plane
  * `VectorDot(vec, typedlit(plane))` formulation bit-for-bit — but the
  * embedding array is traversed once per plane from a flat cached
  * matrix instead of once per separately-planned literal-array dot
  * (~bands×rows expression-tree evaluations collapsed into one).
  *
  * bands/rowsPerBand/seed must be foldable literals. Empty input →
  * all-sign-positive bits (dot = 0 ≥ 0); callers' exact verification
  * rejects any degenerate collisions. */
case class HyperplaneBits(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (!(first.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })) TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an ARRAY<FLOAT> first argument, got " +
        first.dataType.catalogString)
    else if (!second.foldable || !third.foldable || !fourth.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName bands/rowsPerBand/seed must be foldable literals")
    else if (!Seq(second, third, fourth).forall(_.dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    })) TypeCheckResult.TypeCheckFailure(
      s"$prettyName bands/rowsPerBand/seed must be integral literals")
    else if (Seq(second, third, fourth).exists(_.eval(null) == null))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName bands/rowsPerBand/seed must be non-null")
    else if (bands <= 0 || rowsPerBand <= 0 || rowsPerBand > 30)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs bands > 0 and 0 < rowsPerBand <= 30")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_hyperplane_bits"

  @transient private lazy val bands =
    second.eval(null).asInstanceOf[Number].intValue()
  @transient private lazy val rowsPerBand =
    third.eval(null).asInstanceOf[Number].intValue()
  @transient private lazy val seed =
    fourth.eval(null).asInstanceOf[Number].longValue()

  override def nullSafeEval(v: Any, a2: Any, a3: Any, a4: Any): Any =
    HyperplaneBits.compute(v.asInstanceOf[ArrayData], bands, rowsPerBand,
      seed)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val bRef = ctx.addReferenceObj("hpBands", Integer.valueOf(bands),
      "Integer")
    val rRef = ctx.addReferenceObj("hpRows", Integer.valueOf(rowsPerBand),
      "Integer")
    val sRef = ctx.addReferenceObj("hpSeed", java.lang.Long.valueOf(seed),
      "Long")
    nullSafeCodeGen(ctx, ev, (v, _, _, _) =>
      s"""
         |${ev.value} = graft.functions.HyperplaneBits.compute(
         |  $v, $bRef.intValue(), $rRef.intValue(), $sRef.longValue());
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression, q: Expression): HyperplaneBits =
    copy(first = f, second = s, third = t, fourth = q)
}

object HyperplaneBits {
  /** Plane matrices cached per (seed, planeCount, dim) — flat row-major
    * float[planeCount·dim], generated exactly like the previous plan-time
    * literals: scala.util.Random(seed), planes drawn sequentially, each
    * as dim consecutive nextGaussian floats. Deterministic on every
    * executor; the map stays tiny (one entry per distinct config). */
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Long, Int, Int),
      Array[Float]]()

  private def planes(seed: Long, planeCount: Int, dim: Int): Array[Float] =
    planeCache.computeIfAbsent((seed, planeCount, dim), { key =>
      val rnd = new scala.util.Random(key._1)
      Array.fill(key._2 * key._3)(rnd.nextGaussian().toFloat)
    })

  /** Static worker shared by interpreted eval and generated code. */
  def compute(vec: ArrayData, bands: Int, rowsPerBand: Int,
      seed: Long): ArrayData = {
    val d = vec.numElements()
    val m = planes(seed, bands * rowsPerBand, d)
    val out = new Array[Int](bands)
    var p = 0
    var b = 0
    while (b < bands) {
      var bits = 0
      var r = 0
      while (r < rowsPerBand) {
        var acc = 0.0
        val base = p * d
        var i = 0
        while (i < d) {
          acc += vec.getFloat(i).toDouble * m(base + i).toDouble
          i += 1
        }
        if (acc >= 0.0) bits |= 1 << r
        p += 1
        r += 1
      }
      out(b) = bits
      b += 1
    }
    new GenericArrayData(out)
  }
}

/** 63-bit SimHash over token hashes: bit b of the result is set when
  * strictly more than half the input hashes have bit b set (the sign bit
  * is unused, so the sketch is always a non-negative long under ANSI
  * arithmetic). Empty input → 0. */
case class SimHash63(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an ARRAY<BIGINT> argument, got " +
          t.catalogString)
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash63"

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val counts = new Array[Int](63)
    var j = 0
    while (j < n) {
      val h = hs.getLong(j)
      var b = 0
      while (b < 63) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      j += 1
    }
    var sim = 0L
    var b = 0
    while (b < 63) {
      if (counts(b) > 0) sim |= 1L << b
      b += 1
    }
    sim
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, h => {
      val counts = ctx.freshName("counts")
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val b = ctx.freshName("b")
      val hv = ctx.freshName("hv")
      val sim = ctx.freshName("sim")
      s"""
         |int $n = $h.numElements();
         |int[] $counts = new int[63];
         |for (int $j = 0; $j < $n; $j++) {
         |  long $hv = $h.getLong($j);
         |  for (int $b = 0; $b < 63; $b++) {
         |    if ((($hv >>> $b) & 1L) == 1L) $counts[$b]++; else $counts[$b]--;
         |  }
         |}
         |long $sim = 0L;
         |for (int $b = 0; $b < 63; $b++) {
         |  if ($counts[$b] > 0) $sim |= 1L << $b;
         |}
         |${ev.value} = $sim;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}
