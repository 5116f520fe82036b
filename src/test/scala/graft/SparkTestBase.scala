package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session per suite (spark_guide.md ScalaTest
  * pattern); UTC + fixed shuffle partitions for determinism. */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestBase.session
}

object SparkTestBase {
  lazy val session: SparkSession =
    GraftSession.build(master = "local[4]", shufflePartitions = 4,
      appName = "graft-test")
}
