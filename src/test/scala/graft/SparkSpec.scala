package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local SparkSession for all specs. One session per suite keeps
  * `sbt test` fast; configs mirror the Verify/Bench harness. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.scheduler.mode", "FAIR")
      .appName(getClass.getSimpleName)
      .getOrCreate()
    // same post-hoc registration the Verify/Bench harness performs —
    // native functions, the optimizer rule, and the as-of join strategy
    // are part of the engine, so every spec session carries them
    graft.core.GraftExtensions.register(s)
    s
  }

  /** Smallest scale factor — specs assert semantics, not performance. */
  val sfDir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = {
    // Session is shared across suites in one JVM; don't stop it here.
    super.afterAll()
  }
}
