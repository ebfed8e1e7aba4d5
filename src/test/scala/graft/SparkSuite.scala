package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local SparkSession across all suites (lazy, getOrCreate). */
trait SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("4").getOrCreate()
  def sqlc: SparkSession = { spark.sparkContext.setLogLevel("WARN"); spark }
}
