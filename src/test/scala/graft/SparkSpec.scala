package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** One session shared across all suites (Test / fork := true → one JVM). */
object SharedSpark {
  lazy val spark: SparkSession = GraftSession.local(8)
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SharedSpark.spark
  /** Small SF for specs; the driver's DuckDB gate runs sf0.01. */
  val sf: String = "/root/testdata/sf0.001"
  val sf01: String = "/root/testdata/sf0.01"

  def physicalPlan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString()
}
