package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local SparkSession fixture for operator specs. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
  val sfDir = "/root/testdata/sf0.001"

  // Operator-internal persisted relations (Caches.sharedCache) are released
  // per-suite so the shared session never accumulates pinned corpora across
  // the ~30 suites of a full `sbt test` run.
  override protected def afterAll(): Unit = {
    Caches.release()
    super.afterAll()
  }
}

object SparkSpec {
  lazy val session: SparkSession = {
    // every spec runs with the increment operators' insert-only
    // precondition assertions armed (operators.Checks) — contract
    // violations fail tests loudly, production pays nothing
    System.setProperty("graft.spark.debug.checks", "true")
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "/tmp/graft-test-warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
