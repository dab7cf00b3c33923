package graft

import java.nio.file.{Files, Paths}

/** One-off maintenance main: regenerate golden_plans/<name>.txt snapshots
  * under the production planning conf (same knobs PlanSnapshotSpec compares
  * under). Usage: runMain graft.RegenPlans q13_range_join q29_sessionize */
object RegenPlans {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("graft-regen-plans")
    for (name <- args) {
      val q = graft.queries.Queries.all.find(_.name == name)
        .getOrElse(sys.error(s"unknown query $name"))
      val s = q.build(spark, "/root/testdata/sf0.01").queryExecution
        .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      Files.writeString(Paths.get(s"golden_plans/$name.txt"), s)
      println(s"wrote golden_plans/$name.txt")
    }
    spark.stop()
  }
}
