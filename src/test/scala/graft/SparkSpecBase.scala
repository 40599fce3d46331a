package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local session for all specs: small parallelism, UTC, AQE on
  * (the prod default). One session per suite keeps sbt test wall-clock
  * bounded.
  */
trait SparkSpecBase extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName(getClass.getSimpleName)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // serving conf for the index probes' In-pushdown (see Bench)
    .config("spark.sql.parquet.pushdown.inFilterThreshold", "1024")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def sf(dir: String): String = s"/root/testdata/$dir"

  override def afterAll(): Unit = {
    // deliberately do NOT stop the shared session: sbt forks one JVM for
    // the whole test run and suites share it.
    super.afterAll()
  }
}
