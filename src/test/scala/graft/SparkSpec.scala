package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs (mirrors the reference's
  * `local[2]` pytest fixtures, tests/unit/test_scd_type2.py:23-37).
  */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = graft.core.Session.local(
    cores = 2, appName = s"graft-test-${getClass.getSimpleName}")

  override def afterAll(): Unit = {
    // One session is shared across suites in a JVM; don't stop it here or
    // later suites inherit a dead context.
    super.afterAll()
  }
}
