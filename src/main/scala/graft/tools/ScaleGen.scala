package graft.tools

import org.apache.spark.sql.functions._

/** Scale-curve corpus generator: replicate a documents table k× with a
  * per-copy alphabet ROTATION (translate over [a-z]), so that
  *
  *  - within each copy, token identity — and therefore every
  *    shingle/Jaccard/cluster relation the dedup family mines — is
  *    exactly preserved (the planted near-dup structure replicates
  *    with the copy);
  *  - across copies, every alphabetic token differs, so no cross-copy
  *    candidate pairs exist and the TRUE pair/cluster output grows
  *    LINEARLY in k — which is what makes the k× wall-time curve
  *    interpretable (superlinear output would confound the
  *    measurement of the plan's own scaling).
  *
  * Both the 1× and k× outputs are written as multi-file parquet
  * (repartition 32) — the harness fixtures are single-row-group files
  * whose scans cannot parallelize, and a fair scan-parallel baseline
  * needs the same layout at both scale points.
  *
  * Usage: runMain graft.tools.ScaleGen <srcSfDir> <outDir> <k>
  */
object ScaleGen {
  private val Alpha = "abcdefghijklmnopqrstuvwxyz"

  def main(args: Array[String]): Unit = {
    val Array(src, out, kStr) = args
    val k = kStr.toInt
    require(k >= 1 && k <= Alpha.length, s"k must be in [1, 26], got $k")
    val spark = graft.GraftSession.local()
    val idStride = 10000000L

    val docs = spark.read.parquet(s"$src/documents.parquet")
    val docCopies = (0 until k).map { i =>
      val rot = Alpha.drop(i) + Alpha.take(i)
      docs.select(
        (col("doc_id") + lit(i * idStride)).as("doc_id"),
        (if (i == 0) col("text")
         else translate(col("text"), Alpha, rot)).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }
    docCopies.reduce(_ unionAll _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    println(s"wrote ${k}x corpus to $out/documents.parquet")

    // Embeddings: each copy applies a fixed per-copy ORTHOGONAL
    // transform (dimension permutation + sign flips, seeded by the
    // copy index) — norms and every within-copy cosine are preserved
    // EXACTLY (the planted near-dup structure replicates), while
    // cross-copy directions decorrelate, so true pair output again
    // grows linearly in k.
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val embCopies = (0 until k).map { i =>
      if (i == 0)
        emb.select(col("vec_id"), col("embedding"), col("label"))
      else {
        val rnd = new scala.util.Random(1000 + i)
        val perm = rnd.shuffle((0 until dim).toVector)
        val sign = Vector.fill(dim)(if (rnd.nextBoolean()) 1f else -1f)
        val transformed = array(perm.indices.map(j =>
          element_at(col("embedding"), perm(j) + 1) * lit(sign(j))): _*)
        emb.select(
          (col("vec_id") + lit(i * idStride)).as("vec_id"),
          transformed.cast("array<float>").as("embedding"),
          col("label"))
      }
    }
    embCopies.reduce(_ unionAll _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    println(s"wrote ${k}x embeddings to $out/embeddings.parquet")
    spark.stop()
  }
}
