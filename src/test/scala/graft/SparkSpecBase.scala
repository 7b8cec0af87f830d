package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all specs (one JVM, reused session). */
trait SparkSpecBase extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpecBase.session
  val sfDir = "/root/testdata/sf0.001"
  override def afterAll(): Unit = {} // shared session — never stop it
}

object SparkSpecBase {
  lazy val session: SparkSession = {
    val s = GraftSession.configure(
      SparkSession.builder().master("local[4]").appName("graft-test"),
      shufflePartitions = 4
    ).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
