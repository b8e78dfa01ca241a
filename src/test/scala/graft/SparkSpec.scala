package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local SparkSession for all specs. One session per suite keeps
  * `sbt test` fast; configs mirror the Verify/Bench harness. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.scheduler.mode", "FAIR")
    .appName(getClass.getSimpleName)
    .getOrCreate()

  /** Smallest scale factor — specs assert semantics, not performance. */
  val sfDir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = {
    // Session is shared across suites in one JVM; don't stop it here.
    super.afterAll()
  }
}
