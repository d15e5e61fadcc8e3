package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs — one per suite (lazy). */
trait SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession =
    GraftSession.builder("graft-test", cores = "4").master("local[4]").getOrCreate()

  val sf: String = "/root/testdata/sf0.001"
}
