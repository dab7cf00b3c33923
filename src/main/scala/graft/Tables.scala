package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/**
 * Test-table loader. The `events` table carries parquet TIMESTAMP(NANOS),
 * which Spark only reads as a long (spark.sql.legacy.parquet.nanosAsLong);
 * values in the suite are microsecond-aligned (verified), so converting
 * ns -> us -> TimestampType is lossless and agrees exactly with DuckDB's
 * TIMESTAMP_NS -> TIMESTAMP cast.
 */
object Tables {
  val NanosConf = "spark.sql.legacy.parquet.nanosAsLong"

  val all: Seq[String] = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every suite table as a temp view for SQL-by-name use. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(t => load(spark, sfDir, t).createOrReplaceTempView(t))

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    df.schema.find(f => f.name == "ts" && f.dataType == LongType) match {
      // `div` = integral division; `/` would go through double and lose
      // precision above 2^53 (post-1970 ns timestamps), shifting ~2% of
      // microsecond-aligned values down 1us
      case Some(_) => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case None    => df
    }
  }
}
