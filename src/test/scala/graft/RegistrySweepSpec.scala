package graft

import org.scalatest.funsuite.AnyFunSuite

/** The full-registry execution sweep (every query runs on sf0.001),
  * SLICED 4 ways so the suite's single biggest wall-clock block (~6.5
  * min of 21.5 when it lived in QueriesSpec) spreads across the
  * parallel forked test groups (build.sbt `Test / testGrouping`) — the
  * round-19 driver run hit its timeout mid-suite and failed a test on
  * JVM shutdown, so total suite wall is itself a correctness surface.
  *
  * Slices are disjoint by construction (index mod 4), which also keeps
  * the lake-rig queries' FIXED tmp fixture dirs (graft_q###_*) free of
  * cross-JVM collisions: a query name runs in exactly one slice, and
  * no other suite runs lake-rig queries.
  */
abstract class RegistrySweepBase(slice: Int, of: Int) extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = SparkFixture.sf0001

  test(s"registry queries execute (slice $slice of $of)") {
    SparkEntry.registry.sortBy(_.name).zipWithIndex
      .filter(_._2 % of == slice)
      .foreach { case (q, _) =>
        val df = q.run(spark, dir)
        assert(df.columns.nonEmpty, q.name)
        df.count() // forces execution
      }
  }
}

class RegistrySweepASpec extends RegistrySweepBase(0, 4)
class RegistrySweepBSpec extends RegistrySweepBase(1, 4)
class RegistrySweepCSpec extends RegistrySweepBase(2, 4)
class RegistrySweepDSpec extends RegistrySweepBase(3, 4)
