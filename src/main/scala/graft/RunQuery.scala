package graft

import graft.queries.Queries

/** Dev utility: run one named registered query against a scale-factor dir
  * and print its row count + wall time. Usage:
  *   runMain graft.RunQuery <queryName> [sfDir]
  * Materializes through the noop sink like Bench so Catalyst can't skip
  * projected columns.
  */
object RunQuery {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: RunQuery <name> [sfDir]"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.get("graft-runquery")
    spark.sparkContext.setLogLevel("WARN")
    val q = Queries.all.find(_.name == name)
      .getOrElse(sys.error(s"no such query: $name (have ${Queries.all.map(_.name).mkString(", ")})"))
    val t0 = System.nanoTime()
    val df = q.build(spark, sfDir)
    df.write.mode("overwrite").format("noop").save()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"[runquery] $name at $sfDir: ${df.count()} rows in $secs%.2f s")
    spark.stop()
  }
}
