package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM-wide session — suites
  * run in the same forked JVM, getOrCreate dedups).
  */
trait SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[4]")
  def sf001 = "/root/testdata/sf0.001"
  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString
}
