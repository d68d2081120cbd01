package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs — same confs as the engine's
  * entry points ([[GraftSession]]).
  */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = GraftSession.builder("4")
    .appName("graft-test")
    .getOrCreate()

  /** Smallest driver-generated dataset — correctness-scale inputs. */
  val sfDir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = {
    // shared across suites in one JVM; stopped by the JVM exiting
    super.afterAll()
  }
}
