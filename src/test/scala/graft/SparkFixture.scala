package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test JVM (forked by sbt). */
object SparkFixture {
  lazy val spark: SparkSession = GraftSession.create("local[4]", shufflePartitions = 8)
  val sf0001 = "/root/testdata/sf0.001"
}
