package graft

import graft.pipeline.Hive2Es
import graft.pipeline.Hive2Es.GraftConfig
import org.apache.spark.sql.SparkSession

/**
 * CLI entry point (reference `ArgsParser.scala:31-128` surface, minus the
 * ES/ZK deployment flags that the bundle sink replaces).
 *
 * Usage:
 *   graft.Main --input <table-or-path> --out <dir> --index <name>
 *     [--num-shards N] [--where SQL] [--id COL] [--routing COL]
 *     [--partition-multiples N] [--repartition true|false]
 *     [--format json|parquet] [--mode generic|infer] [--json-source]
 */
object Main {
  def parse(args: Array[String]): (GraftConfig, String) = {
    var m = Map[String, String]("mode" -> "infer")
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--json-source" => m += ("json-source" -> "true"); i += 1
        case flag if flag.startsWith("--") && i + 1 < args.length =>
          m += (flag.drop(2) -> args(i + 1)); i += 2
        case other => throw new IllegalArgumentException(s"unexpected argument: $other")
      }
    }
    def req(k: String): String =
      m.getOrElse(k, throw new IllegalArgumentException(s"missing required --$k"))
    val cfg = GraftConfig(
      input = req("input"),
      outDir = req("out"),
      indexName = req("index"),
      numShards = m.getOrElse("num-shards", "3").toInt,
      where = m.getOrElse("where", "1 = 1"),
      id = m.getOrElse("id", null),
      routing = m.getOrElse("routing", null),
      partitionMultiples = m.getOrElse("partition-multiples", "10").toInt,
      repartition = m.getOrElse("repartition", "false").toBoolean,
      jsonSource = m.contains("json-source"),
      format = m.getOrElse("format", "json"))
    (cfg, m("mode"))
  }

  def main(args: Array[String]): Unit = {
    val (cfg, mode) = parse(args)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft-hive2es")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val result = mode match {
        case "generic" => Hive2Es.runGeneric(spark, cfg)
        case "infer"   => Hive2Es.runInferred(spark, cfg)
        case other     => throw new IllegalArgumentException(s"unknown --mode $other")
      }
      println(s"bundle written: ${result.outDir}")
      println(s"totalDocs=${result.totalDocs} shards=${result.numShards}")
      result.shardCounts.toSeq.sorted.foreach { case (s, n) => println(s"  shard $s: $n docs") }
    } finally spark.stop()
  }
}
