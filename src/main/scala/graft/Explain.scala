package graft

import graft.queries.Queries
import org.apache.spark.sql.SparkSession

/** Plan inspector: `graft.Explain <sfDir> [queryName ...]` prints the
  * formatted physical plan of each named query (all when none named). */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.drop(1).toSet
    val spark = GraftSession.builder("graft-explain")
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- Queries.all if names.isEmpty || names(q.name)) {
      println(s"\n========== ${q.name} ==========")
      q.build(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
