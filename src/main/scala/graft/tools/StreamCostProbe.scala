package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Throwaway decomposition probe for the streaming composites: time
  * the fixed Structured-Streaming machinery (query start/stop with a
  * NO-OP foreachBatch) against the batch-body compute (novelVectors +
  * writes) that x23/x26 pay per drop — so the "attack the streaming
  * fixed cost" decision is made on a measured split, not a guess.
  *
  * Usage: runMain graft.tools.StreamCostProbe <sfDir>
  */
object StreamCostProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    import graft.streaming.StreamingDedup
    val emb = graft.sources.Tables.load(spark, sfDir, "embeddings")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    // warm the session
    emb.count(); emb.count()
    val base = java.nio.file.Files.createTempDirectory("graft_probe").toString
    val landing = base + "/landing"
    t("land_write")(emb.filter(col("vec_id") % 2 === 0)
      .write.mode("append").parquet(landing))
    // 1. pure machinery: AvailableNow pass with a no-op body
    (1 to 3).foreach { i =>
      val q = t(s"noop_stream_pass_$i")(spark.readStream.schema(emb.schema)
        .parquet(landing).writeStream
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", base + s"/ckpt$i")
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          val _ = b.isEmpty; ()
        }.start())
      t(s"noop_stream_await_$i")(q.awaitTermination())
    }
    // 2. batch body compute, run directly (no stream): localCheckpoint
    //    + in-batch dedup + band table + writes — what processBatch does
    val batch0 = emb.filter(col("vec_id") % 2 === 0)
    (1 to 3).foreach { i =>
      val pinned = t(s"pin_$i")(batch0.localCheckpoint())
      val canon = t(s"dedup_self_$i") {
        val c = graft.operators.VectorOps.dedupEmbeddings(pinned, 0.45,
          pairs = Some(graft.operators.VectorOps.cosineLshJoin(pinned,
            0.45, 12, 3)))
        c.localCheckpoint()
      }
      t(s"write_corpus_$i")(canon.write.mode("overwrite")
        .parquet(StreamingDedup.subdir(base + s"/corpus$i", 0L)))
      t(s"write_bands_$i")(graft.operators.VectorOps
        .hyperplaneBandTable(canon, 12, 3)
        .write.mode("overwrite")
        .parquet(StreamingDedup.subdir(base + s"/bands$i", 0L)))
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    // 3. CC alone on the in-batch pair graph, with round count
    (1 to 3).foreach { i =>
      val pinned = batch0.localCheckpoint()
      val pairs = graft.operators.VectorOps.cosineLshJoin(pinned,
        0.45, 12, 3).localCheckpoint()
      val n = pairs.count()
      val t0 = System.nanoTime()
      val (cl, rounds) = graft.operators.NearDup
        .duplicateClustersWithRounds(pairs
          .withColumnRenamed("a_id", "x").withColumnRenamed("new_id", "x")
          .select(col(pairs.columns(0)).as("a_id"),
            col(pairs.columns(1)).as("b_id")))
      cl.write.format("noop").mode("overwrite").save()
      println(f"PROBE cc_only_$i%-26s ${(System.nanoTime() - t0) / 1e9}%7.3f s" +
        f"  pairs=$n rounds=$rounds")
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
