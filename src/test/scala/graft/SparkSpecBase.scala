package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all specs (one JVM, reused session). */
trait SparkSpecBase extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpecBase.session
  val sfDir = "/root/testdata/sf0.001"

  /** DuckDB available to the host python3? Driver-side tooling — never a
    * library dependency — so foreign-engine round-trip tests skip cleanly
    * where absent. ONE probe per JVM, shared by every suite (the
    * detection condition must not drift between them). */
  protected lazy val duckdbAvailable: Boolean = SparkSpecBase.duckdb

  override def afterAll(): Unit = {} // shared session — never stop it
}

object SparkSpecBase {
  lazy val duckdb: Boolean =
    scala.util.Try(scala.sys.process.Process(
      Seq("python3", "-c", "import duckdb")).! == 0).getOrElse(false)

  lazy val session: SparkSession = {
    val s = GraftSession.configure(
      SparkSession.builder().master("local[4]").appName("graft-test"),
      shufflePartitions = 4
    ).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
