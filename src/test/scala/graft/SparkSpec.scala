package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Base for specs needing a SparkSession — one shared local session per
  * JVM (GraftSession.getOrCreate semantics), small core count to keep
  * test latency down.
  */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.build("4")
}
