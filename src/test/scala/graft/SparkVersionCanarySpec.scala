package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Version canary: the golden plans under golden_plans/ and the NTZ
 * expectations in StreamingSpec are pinned to a specific Spark version
 * (the unmanaged jars at /opt/spark/jars). When the image bumps Spark,
 * this suite fails FIRST with the exact regen steps, so downstream
 * failures (PlanSnapshotSpec drift, watermark/NTZ analysis errors) read
 * as "Spark moved", not "we regressed".
 */
class SparkVersionCanarySpec extends AnyFunSuite {

  /** The version golden_plans/ snapshots and NTZ handling were built
    * against. Update in the SAME commit as a golden-plan regen. */
  val expected = "4.1.2"

  test("Spark version matches the one golden plans + NTZ expectations were built against") {
    assert(org.apache.spark.SPARK_VERSION === expected,
      s"\nSpark moved: jars report ${org.apache.spark.SPARK_VERSION}, goldens were built against $expected." +
        "\nRegen steps:" +
        "\n  1. sbt 'runMain graft.RegenPlans <drifted queries>' (or full Verify; see golden_plans/README.md)" +
        "\n  2. re-run StreamingSpec — if the NTZ case fails, revisit EventStreams.watermarked" +
        "\n  3. bump SparkVersionCanarySpec.expected in the same commit")
  }
}
