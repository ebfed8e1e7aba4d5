package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional third arg: comma-separated name-prefix filter for local
    // iteration (the driver always calls with exactly two args)
    val (sfDir, outDir, only) = args match {
      case Array(a, b)    => (a, b, None)
      // drop empty prefixes ("q62,,q63" / a lone ","): startsWith("")
      // is always true and would silently select every query. A prefix
      // arg with NO non-empty entries (",") is a hard error — Some(Nil)
      // would match nothing and the run would silently write an empty
      // verify dir.
      case Array(a, b, p) =>
        val prefixes = p.split(',').toSeq.filter(_.nonEmpty)
        if (prefixes.isEmpty) sys.error(
          s"prefix filter '$p' contains no usable prefixes — " +
            "omit the argument to run every query")
        (a, b, Some(prefixes))
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.exists(name.startsWith)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // sweep per query (Bench's discipline): operators persist
      // intermediates and pin localCheckpoint micro-batches; across
      // 200 queries the accumulated entries otherwise squeeze the
      // executor heap mid-run
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
