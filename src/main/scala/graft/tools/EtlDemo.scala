package graft.tools

import graft.GraftSession
import graft.etl.EtlJob
import graft.sources.UsaJobsClient.PageRequest

/** Usage example / smoke driver for the USAJOBS parity pipeline: runs the
  * full ETL twice against a fixture transport (insert pass, then update
  * pass), prints the run summaries, job_statistics and the merged table.
  *
  *   sbt "runMain graft.tools.EtlDemo /path/to/page.json /tmp/target"
  */
object EtlDemo {
  def main(args: Array[String]): Unit = {
    val Array(fixturePath, target) = args.take(2)
    val spark = GraftSession.local()
    val payload = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(fixturePath)))
    val empty =
      """{"SearchResult":{"SearchResultCount":0,"SearchResultCountAll":0,"SearchResultItems":[]}}"""
    val transport = (r: PageRequest) => if (r.page == 1) payload else empty

    val run1 = EtlJob.run(spark, transport, EtlJob.Config(targetPath = target))
    println(s"RUN1 $run1")
    val run2 = EtlJob.run(spark, transport, EtlJob.Config(targetPath = target))
    println(s"RUN2 $run2")

    println("STATISTICS:")
    EtlJob.statistics(spark, target).show(truncate = false)
    println("MERGED TABLE:")
    spark.read.parquet(target).orderBy("position_title").show(truncate = false)
    spark.stop()
  }
}
