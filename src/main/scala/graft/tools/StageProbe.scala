package graft.tools

import java.util.concurrent.ConcurrentLinkedQueue

/** Per-stage wall/parallelism probe: run named SparkEntry queries and
  * print every completed stage's task count and summed executor run
  * time — the direct measurement behind "this stage runs on ONE core
  * while 31 idle" claims (the harness fixtures are single-row-group
  * parquet, so scan-rooted stages cannot parallelize; this probe shows
  * which entries that serializes and for how long).
  *
  * Usage: runMain graft.tools.StageProbe <sfDir> <q1,q2,...>
  * Prints one line per stage:
  *   STAGE <query> id=N tasks=T runMs=SUM name=...
  * and one SUMMARY line per query with wall seconds and the share of
  * total executor run time spent in 1-task stages.
  *
  * Completeness: the async listener bus is drained with a bounded
  * poll — wait until the stage queue has been stable for 500 ms, up
  * to 30 s — before the queue is read (the r17 form slept a fixed
  * 1 s, which could drop late stage-completed events on a loaded
  * machine and understate oneTaskShare — ADVICE r17; the same advice
  * flagged a dead "max single-task time" tuple field that was never
  * populated, now removed).
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: StageProbe <sfDir> <queryPrefix,queryPrefix,...>")
    val sfDir = args(0)
    val prefixes = args(1).split(',').map(_.trim).filter(_.nonEmpty)
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val names = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => prefixes.exists(n.startsWith) }
    require(names.nonEmpty, s"no queries match ${args(1)}")
    names.foreach { case (name, fn) =>
      val stages =
        new ConcurrentLinkedQueue[(Int, Int, Long, String)]()
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit = {
          val si = sc.stageInfo
          val m = si.taskMetrics
          if (m != null)
            stages.add((si.stageId, si.numTasks, m.executorRunTime,
              si.name.takeWhile(_ != '\n').take(60)))
          ()
        }
      }
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        // drain the async listener bus (SparkContext.listenerBus is
        // private[spark], so poll): the census is complete once the
        // queue has been stable for 500 ms, capped at 30 s
        val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
        var stableSince = System.nanoTime()
        var lastSize = stages.size()
        while (System.nanoTime() < deadline &&
            (System.nanoTime() - stableSince) < 500L * 1000 * 1000) {
          Thread.sleep(50)
          val s = stages.size()
          if (s != lastSize) { lastSize = s; stableSince = System.nanoTime() }
        }
      } finally spark.sparkContext.removeSparkListener(listener)
      val sec = (System.nanoTime() - t0) / 1e9
      import scala.jdk.CollectionConverters._
      val ss = stages.asScala.toSeq.sortBy(-_._3)
      ss.take(12).foreach { case (id, n, run, nm) =>
        println(f"STAGE $name%-28s id=$id%4d tasks=$n%4d " +
          f"runMs=$run%8d name=$nm")
      }
      val tot = ss.map(_._3).sum.max(1L)
      val serial = ss.filter(_._2 == 1).map(_._3).sum
      println(f"SUMMARY $name%-28s wall=$sec%7.2fs stages=${ss.size}%3d " +
        f"execMs=$tot%8d oneTaskShare=${serial.toDouble / tot}%5.2f")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
