package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM-wide session). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

abstract class SparkSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = TestSpark.spark

  /** Operators legitimately persist shared sub-plans for the span of a
    * flow; with one JVM-wide session across ~90 suites, anything a suite
    * leaves cached accumulates for the whole 45-minute run and can
    * starve late suites (the r16 mid-suite executor death). Each suite
    * therefore drops the session cache on exit — the same hygiene the
    * bench applies between queries. */
  override protected def afterAll(): Unit = {
    try spark.catalog.clearCache()
    finally super.afterAll()
  }

  def resource(name: String): String =
    getClass.getClassLoader.getResource(name).getPath
}
