package graft.tools

/** Shuffle-byte probe: run named SparkEntry queries against a table
  * dir and print each one's TOTAL shuffle write/read bytes and records
  * (summed over all stages via a SparkListener) — the direct
  * measurement behind narrow-shuffle claims like x45's "the hashed
  * count table ships ~10× fewer bytes than q211's string one". Local
  * wall-clock barely moves on a warm-page corpus; shuffle bytes are
  * the thing that scales with the network at 100 TB, so THIS is the
  * number a shuffle-twin must demonstrate.
  *
  * Usage: runMain graft.tools.ShuffleProbe <sfDir> <q1,q2,...>
  * Prints one line per query:
  *   name shuffleWriteBytes shuffleWriteRecords shuffleReadBytes wallSec
  */
object ShuffleProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: ShuffleProbe <sfDir> <queryPrefix,queryPrefix,...>")
    val sfDir = args(0)
    val prefixes = args(1).split(',').map(_.trim).filter(_.nonEmpty)
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val names = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => prefixes.exists(n.startsWith) }
    require(names.nonEmpty, s"no queries match ${args(1)}")
    names.foreach { case (name, fn) =>
      val wBytes = new java.util.concurrent.atomic.AtomicLong()
      val wRecs = new java.util.concurrent.atomic.AtomicLong()
      val rBytes = new java.util.concurrent.atomic.AtomicLong()
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit = {
          val m = sc.stageInfo.taskMetrics
          if (m != null) {
            wBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
            wRecs.addAndGet(m.shuffleWriteMetrics.recordsWritten)
            rBytes.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          }
          ()
        }
      }
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        Thread.sleep(1000) // async listener bus drain
      } finally spark.sparkContext.removeSparkListener(listener)
      val sec = (System.nanoTime() - t0) / 1e9
      // sweep persisted frames so queries don't contaminate each other
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      println(f"SHUFFLE $name%-30s writeBytes=${wBytes.get}%12d " +
        f"writeRecords=${wRecs.get}%10d readBytes=${rBytes.get}%12d " +
        f"wall=$sec%7.2fs")
    }
    spark.stop()
  }
}
