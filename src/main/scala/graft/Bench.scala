package graft
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // noop sink: executes the FULL delivered plan (count() would let
    // Catalyst prune final sorts and projections out of the measurement).
    def exec(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // Warm the JVM/codegen once so measured times reflect steady state.
    SparkEntry.queries.get("q01_pricing_summary")
      .foreach(fn => try exec(fn(spark, sfDir)) catch { case _: Throwable => () })
    // Each query runs `iters` times and reports the MEDIAN: identical-code
    // rounds r3/r4 showed single-iteration times wobbling up to 3.9× —
    // a one-shot harness cannot detect a real 2× regression. A failed
    // query is recorded as NEGATIVE seconds (never as a fast success)
    // and still counts toward the total.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (0 until iters).map { _ =>
        val t0 = System.nanoTime()
        val ok = try { exec(fn(spark, sfDir)); true }
          catch { case _: Throwable => false }
        val sec = (System.nanoTime() - t0) / 1e9
        // isolate iterations/queries: several operators persist
        // intermediate frames (LSH candidate/shingle tables); dropping
        // them keeps each measurement independent of run order
        spark.catalog.clearCache()
        if (ok) sec else -sec
      }
      val failed = times.exists(_ < 0)
      val sorted = times.map(math.abs).sorted
      val median = sorted(sorted.length / 2)
      name -> (if (failed) -median else median)
    }
    // Fixed 3-decimal formatting: full-precision doubles made the JSON
    // line long enough that the driver's stdout tail-capture truncated
    // q01–q15 out of two consecutive rounds' grading artifacts.
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2.abs).sum else 0.0
    val json = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","iters":$iters,"queries":$qs,"sf":"$sfDir"}"""
    println(json)
    // belt-and-braces: also persist beside stdout so a truncated capture
    // can never lose the round's perf record again
    val out = java.nio.file.Paths.get("target/bench.json")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.writeString(out, json + "\n")
    spark.stop()
  }
}
