package graft

import graft.queries.Queries

/** Run a single registered query against an SF dir and time it — the
  * one-query complement to [[Bench]] (which runs the whole suite) for
  * iterating on an operator without paying for the rest.
  *
  * Usage: runMain graft.RunQuery <sfDir> <queryName> [repeats]
  *
  * `repeats` > 1 reruns the query in the same session and prints every
  * timing — run 1 is the cold number (session warmup, codegen, parquet
  * footers), later runs are the steady-state cost the bench suite sees.
  */
object RunQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val repeats = if (args.length > 2) args(2).toInt else 1
    val spark = GraftSession.get("graft-runquery")
    val q = Queries.all.find(_.name == name).getOrElse(
      sys.error(s"no query $name — known: ${Queries.all.map(_.name).mkString(", ")}"))
    for (i <- 1 to repeats) {
      val t0 = System.nanoTime()
      q.build(spark, sfDir).write.mode("overwrite").format("noop").save()
      println(f"RUNQUERY_OK $name run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
  }
}
