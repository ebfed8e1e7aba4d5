package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale-curve corpus generator: replicate a documents table k× with a
  * per-copy alphabet SUBSTITUTION (translate over [a-z][A-Z][0-9]), so
  * that
  *
  *  - within each copy, token identity — and therefore every
  *    shingle/Jaccard/cluster relation the dedup family mines — is
  *    exactly preserved (the planted near-dup structure replicates
  *    with the copy);
  *  - across copies, every token containing a letter OR digit differs
  *    (lower/upper case rotate by the copy index — 26 distinct maps —
  *    and digits apply one of 26 precomputed pairwise-distinct
  *    permutations, so even all-digit or all-uppercase tokens are
  *    never byte-identical across copies), so no cross-copy candidate
  *    pairs exist and the TRUE pair/cluster output grows LINEARLY in
  *    k — which is what makes the k× wall-time curve interpretable
  *    (superlinear output would confound the measurement of the
  *    plan's own scaling). ScaleGenSpec asserts the
  *    zero-cross-copy-pair property directly.
  *
  * Both the 1× and k× outputs are written as multi-file parquet
  * (repartition 32) — the harness fixtures are single-row-group files
  * whose scans cannot parallelize, and a fair scan-parallel baseline
  * needs the same layout at both scale points.
  *
  * Usage: runMain graft.tools.ScaleGen <srcSfDir> <outDir> <k>
  */
object ScaleGen {
  private val Lower  = "abcdefghijklmnopqrstuvwxyz"
  private val Upper  = Lower.toUpperCase
  private val Digits = "0123456789"

  /** 26 pairwise-distinct digit permutations, index 0 = identity —
    * rotation alone cycles with period 10, which would make all-digit
    * tokens byte-identical between copies i and i+10. Deterministic
    * (fixed seed), distinct by construction (LinkedHashSet). */
  private val DigitPerms: Vector[String] = {
    val rnd = new scala.util.Random(42)
    val seen = scala.collection.mutable.LinkedHashSet[String](Digits)
    while (seen.size < 26)
      seen += rnd.shuffle(Digits.toVector).mkString
    seen.toVector
  }

  private val FromAlphabet = Lower + Upper + Digits

  private[tools] def toAlphabet(i: Int): String = {
    val rotL = Lower.drop(i) + Lower.take(i)
    rotL + rotL.toUpperCase + DigitPerms(i)
  }

  val IdStride = 10000000L

  /** The k× replicated documents frame (pure plan — shared by the CLI
    * below and ScaleGenSpec's cross-copy-pair assertion). */
  private[graft] def replicateDocs(docs: DataFrame, k: Int): DataFrame = {
    require(k >= 1 && k <= Lower.length, s"k must be in [1, 26], got $k")
    (0 until k).map { i =>
      docs.select(
        (col("doc_id") + lit(i * IdStride)).as("doc_id"),
        (if (i == 0) col("text")
         else translate(col("text"), FromAlphabet, toAlphabet(i)))
          .as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionAll _)
  }

  /** The k× replicated embeddings frame: each copy applies a fixed
    * per-copy ORTHOGONAL transform (dimension permutation + sign
    * flips, seeded by the copy index) — norms and every within-copy
    * cosine are preserved EXACTLY (the planted near-dup structure
    * replicates), while cross-copy directions decorrelate, so true
    * pair output again grows linearly in k. */
  private[graft] def replicateEmbeddings(emb: DataFrame, k: Int)
      : DataFrame = {
    require(k >= 1 && k <= Lower.length, s"k must be in [1, 26], got $k")
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    (0 until k).map { i =>
      if (i == 0)
        emb.select(col("vec_id"), col("embedding"), col("label"))
      else {
        val rnd = new scala.util.Random(1000 + i)
        val perm = rnd.shuffle((0 until dim).toVector)
        val sign = Vector.fill(dim)(if (rnd.nextBoolean()) 1f else -1f)
        val transformed = array(perm.indices.map(j =>
          element_at(col("embedding"), perm(j) + 1) * lit(sign(j))): _*)
        emb.select(
          (col("vec_id") + lit(i * IdStride)).as("vec_id"),
          transformed.cast("array<float>").as("embedding"),
          col("label"))
      }
    }.reduce(_ unionAll _)
  }

  /** One fixed 24-token boilerplate block — long enough that its
    * interior 3-grams are shared shingles across every planted doc. */
  val Boilerplate: String =
    (1 to 24).map(i => s"graftboiler$i").mkString(" ")

  /** Planted-SKEW mode: prepend the shared boilerplate block to `frac`
    * of the documents (by doc_id mod 100 — deterministic, survives
    * replication because replicateDocs shifts ids by a multiple of
    * 100). This makes every interior boilerplate shingle occur in
    * ~frac·N documents — the hot-key pathology for the inverted-index
    * dedup family: uncapped pair generation over one such shingle is
    * C(frac·N, 2) candidates on a single reducer key. On short
    * documents (spec fixtures) the block also dominates the minhash
    * signature, concentrating planted docs into one hot (band, bh)
    * bucket per band — the LSH-side pathology. The skew GUARDS
    * (jaccardPairs' maxShingleFreq, lshCandidates' maxBandFreq) must
    * keep candidate output bounded on this input; NearDupSpec pins
    * exactly that.
    *
    * Note: the boilerplate is NOT alphabet-rotated, so in a skewed k×
    * run the planted shingles DO span copies — deliberately: that is
    * the worst case the guards must absorb, and it means the skewed
    * corpus is a stress input, not a scale-curve input (the linearity
    * premise above applies only to the unskewed mode). */
  private[graft] def plantSkew(docs: DataFrame,
      frac: Double = 0.3): DataFrame =
    docs.withColumn("text",
      when(pmod(col("doc_id"), lit(100L)) < lit((frac * 100).toLong),
        concat(lit(Boilerplate + " "), col("text")))
        .otherwise(col("text")))

  /** Planted VECTOR skew — the embedding-side twin of plantSkew:
    * replace `frac` of the vectors (vec_id mod 100, deterministic,
    * replication-stable) with near-identical directions (a shared
    * all-ones base plus a small multiple of the row's own embedding,
    * so planted-planted cosines sit near 1 while planted-normal
    * cosines stay unremarkable). Every planted vector then lands in
    * ONE dominant SemDeDup k-means cell and one hot hyperplane-LSH
    * (band, bits) bucket per band — the |cell|²/|bucket|² candidate
    * pathology the maxCellFreq/maxBandFreq guards must bound
    * (VectorOpsSpec pins exactly that). A stress input, not a
    * scale-curve input. */
  private[graft] def plantVectorSkew(emb: DataFrame,
      frac: Double = 0.3): DataFrame =
    emb.withColumn("embedding",
      when(pmod(col("vec_id"), lit(100L)) < lit((frac * 100).toLong),
        expr("transform(embedding, x -> cast(1.0d + 0.05d * x AS float))"))
        .otherwise(col("embedding")))

  /** k× replication of a relational fact table: the named KEY columns
    * shift by copy·IdStride (so copies stay disjoint and join keys
    * stay consistent when parent and child replicate with the same
    * stride), every other column replicates verbatim. Dimension
    * tables (nation, region) are NOT replicated — at scale the facts
    * grow and the dimensions do not, which is exactly the shape the
    * bounded-aggregate claims (q134/q137: fixed category grids over
    * growing counts) need the curve to exercise. */
  private[graft] def replicateKeyed(df: DataFrame, keys: Seq[String],
      k: Int): DataFrame = {
    require(k >= 1 && k <= Lower.length, s"k must be in [1, 26], got $k")
    (0 until k).map { i =>
      df.select(df.columns.toSeq.map { c =>
        if (keys.contains(c)) (col(c) + lit(i * IdStride)).as(c)
        else col(c)
      }: _*)
    }.reduce(_ unionAll _)
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: ScaleGen <srcSfDir> <outDir> <k> [skew]")
    val Array(src, out, kStr) = args.take(3)
    val k = kStr.toInt
    val skew = args.length > 3 && args(3) == "skew"
    val spark = graft.GraftSession.local()

    val docs = spark.read.parquet(s"$src/documents.parquet")
    val rep = replicateDocs(docs, k)
    (if (skew) plantSkew(rep) else rep)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    println(s"wrote ${k}x${if (skew) " skewed" else ""} corpus " +
      s"to $out/documents.parquet")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    replicateEmbeddings(emb, k)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    println(s"wrote ${k}x embeddings to $out/embeddings.parquet")

    // relational slice for the statistical-audit curve (q134/q137/...):
    // facts replicate with consistent key shifts, dimensions pass
    // through 1× (fixed category grids over growing counts)
    replicateKeyed(spark.read.parquet(s"$src/orders.parquet"),
      Seq("o_orderkey", "o_custkey"), k)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/orders.parquet")
    replicateKeyed(spark.read.parquet(s"$src/customer.parquet"),
      Seq("c_custkey"), k)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/customer.parquet")
    spark.read.parquet(s"$src/nation.parquet")
      .write.mode("overwrite").parquet(s"$out/nation.parquet")
    // lineitem shifts ONLY its order FK (same stride as orders, so the
    // parent/child relation replicates consistently); part keys stay
    // unshifted — parts are a dimension, and the per-part statistics
    // (q156/q157) should see k× the lineitems per part, not k× parts
    replicateKeyed(spark.read.parquet(s"$src/lineitem.parquet"),
      Seq("l_orderkey"), k)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")
    spark.read.parquet(s"$src/part.parquet")
      .write.mode("overwrite").parquet(s"$out/part.parquet")
    // supplier/region pass through 1x like nation/part: dimensions
    // (the trade-flow/market-share star queries read them)
    spark.read.parquet(s"$src/supplier.parquet")
      .write.mode("overwrite").parquet(s"$out/supplier.parquet")
    spark.read.parquet(s"$src/region.parquet")
      .write.mode("overwrite").parquet(s"$out/region.parquet")
    // events shift both ids: each copy is a disjoint user population
    // replaying the same per-user timelines, so session/window output
    // grows linearly and timestamps (the window semantics) replicate
    replicateKeyed(spark.read.parquet(s"$src/events.parquet"),
      Seq("event_id", "user_id"), k)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/events.parquet")
    println(s"wrote ${k}x orders/customer/lineitem/events " +
      s"(+1x nation/part) to $out")
    spark.stop()
  }
}
