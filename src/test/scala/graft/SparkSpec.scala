package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM, one context — suite
  * startup cost is paid once). Checkpoint root set so stateful streaming
  * queries in tests need no per-query config.
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = GraftSession
      .builder("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config(
        "spark.sql.streaming.checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-ckpt").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
}
