package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Similarity search over Array[Float] embedding columns.
  *
  * Three tiers, by scale:
  *  1. annBruteForce — exact top-k for a small query set. The query
  *     vectors are BROADCAST; every data partition scores its own rows
  *     (map-side, codegen'd zip_with/aggregate), and only the per-query
  *     candidate rows shuffle for the final rank. Exact and 100 TB-sane
  *     as long as |queries| is small.
  *  2. cosineSimilarityJoin — exact all-pairs >= threshold. Quadratic by
  *     definition; it is the CORRECTNESS baseline the approximate paths
  *     are judged against, not the scale path.
  *  3. annIvf — inverted-file (IVF) search: vectors are bucketed by
  *     nearest coarse centroid at build time; a query probes only the
  *     nprobe nearest buckets. At 100 TB the centroids come from sampled
  *     k-means and the bucket assignment is a partition key — search cost
  *     drops by |buckets|/nprobe with recall controlled by nprobe.
  */
object VectorOps {

  private def cos(a: Column, b: Column): Column = VectorFunctions.cosine(a, b)

  /** Exact cosine top-k neighbors for each query id. The tiny query side
    * is broadcast (nested-loop, map-side scoring); ranking shuffles only
    * by q_id. Excludes self-matches. */
  def annBruteForce(emb: DataFrame, queryIds: Seq[Long], k: Int): DataFrame = {
    val queries = emb
      .filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("n_id"))
    emb.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        cos(col("q_emb"), col("embedding")).as("cosine"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .orderBy(col("q_id"), col("rank"))
  }

  /** Exact all-pairs cosine similarity join at a threshold (the
    * embedding-space near-dup detector). Quadratic baseline — see class
    * doc; LSH/IVF bucketing is the scale path. */
  def cosineSimilarityJoin(emb: DataFrame, threshold: Double): DataFrame = {
    val a = emb.select(col("vec_id").as("a_id"), col("embedding").as("e_a"))
    val b = emb.select(col("vec_id").as("b_id"), col("embedding").as("e_b"))
    a.crossJoin(b)
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        cos(col("e_a"), col("e_b")).as("cosine"))
      .filter(col("cosine") >= threshold)
      .orderBy(col("a_id"), col("b_id"))
  }

  /** Coarse centroids per `label` (stand-in for a sampled k-means
    * codebook): mean vector per label, computed by position explode +
    * group — one shuffle of n_vectors * dim rows, then tiny. */
  def labelCentroids(emb: DataFrame): DataFrame =
    emb.select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"))
      .agg(avg(col("v")).as("c"))
      .groupBy(col("label"))
      .agg(array_sort(collect_list(struct(col("pos"), col("c"))))
        .as("_pairs"))
      .select(col("label").as("centroid_id"),
        transform(col("_pairs"), p => p.getField("c").cast("float"))
          .as("centroid"))

  /** IVF index: each vector assigned to its nearest centroid (by cosine).
    * Centroids are broadcast; assignment is map-side argmax. */
  def ivfAssign(emb: DataFrame, centroids: DataFrame): DataFrame = {
    val scored = emb.crossJoin(broadcast(centroids))
      .select(col("vec_id"), col("embedding"), col("centroid_id"),
        cos(col("embedding"), col("centroid")).as("_sim"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("_sim").desc, col("centroid_id"))
    scored.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col("vec_id"), col("embedding"),
        col("centroid_id").as("bucket"))
  }

  /** IVF top-k search: each query probes its nprobe nearest buckets and
    * scores only the vectors inside them. Exact within the probed subset
    * (self-consistency is tested against annBruteForce restricted to the
    * same candidate set); recall vs. full brute force is the usual IVF
    * trade governed by nprobe. */
  def annIvf(emb: DataFrame, queryIds: Seq[Long], k: Int,
      nprobe: Int = 2): DataFrame = {
    val centroids = labelCentroids(emb)
    val indexed = ivfAssign(emb, centroids)
    val queries = emb
      .filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    // per-query probe list: nprobe nearest centroids
    val wq = Window.partitionBy(col("q_id"))
      .orderBy(col("_sim").desc, col("centroid_id"))
    val probes = queries.crossJoin(broadcast(centroids))
      .select(col("q_id"), col("q_emb"), col("centroid_id"),
        cos(col("q_emb"), col("centroid")).as("_sim"))
      .withColumn("_rn", row_number().over(wq))
      .filter(col("_rn") <= nprobe)
      .select(col("q_id"), col("q_emb"), col("centroid_id").as("bucket"))
    // score only vectors in probed buckets
    val wr = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("n_id"))
    indexed.join(broadcast(probes), "bucket")
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        cos(col("q_emb"), col("embedding")).as("cosine"))
      .withColumn("rank", row_number().over(wr).cast("long"))
      .filter(col("rank") <= k)
      .orderBy(col("q_id"), col("rank"))
  }
}
