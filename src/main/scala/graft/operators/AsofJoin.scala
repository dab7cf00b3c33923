package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Scalable left as-of join: for each probe row, attach the latest reference
 * row with `reference.ts <= probe.ts` for the same key.
 *
 * Implemented as union + window (`last(_, ignoreNulls)` carried forward over
 * a rows-unbounded-preceding frame) rather than an inequality join: one hash
 * exchange on the key and a per-partition sort — O(n log n) and
 * skew-tolerant — where a theta join would explode to O(probe x reference)
 * pairs per key at 100 TB. Reference rows sort before probe rows at equal
 * timestamps, so the match is inclusive (ts_ref == ts_probe matches).
 *
 * The capability category is SURVEY.md §2.11 "range / as-of joins" (absent
 * from the reference engine; declared surface via Spark built-ins).
 */
object AsofJoin {

  /**
   * @param probe     left side; all its columns are kept
   * @param reference right side; `pickCols` are attached with prefix `asof_`
   * @param keyCol    equality key present on both sides
   * @param tsCol     ordering column present on both sides
   */
  def leftAsOf(probe: DataFrame, reference: DataFrame,
               keyCol: String, tsCol: String, pickCols: Seq[String]): DataFrame = {
    val refStruct = struct(pickCols.map(c => reference(c)): _*)
    val probeCols = probe.columns.toIndexedSeq

    val pTagged = probe
      .withColumn("_side", lit(1))
      .withColumn("_ref", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          reference.select(pickCols.map(c => reference(c)): _*).schema.fields)))
    val rTagged = reference
      .select((Seq(col(keyCol), col(tsCol)) :+ refStruct.as("_ref")): _*)
      .withColumn("_side", lit(0))

    // align schemas for unionByName
    val pAligned = pTagged.select(
      (probeCols.map(col) :+ col("_side") :+ col("_ref")): _*)
    val rAligned = {
      val missing = probeCols.filterNot(c => c == keyCol || c == tsCol)
      missing.foldLeft(rTagged) { (df, c) =>
        df.withColumn(c, lit(null).cast(probe.schema(c).dataType))
      }.select((probeCols.map(col) :+ col("_side") :+ col("_ref")): _*)
    }

    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    pAligned.unionByName(rAligned)
      .withColumn("_asof", last(col("_ref"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select((probeCols.map(col) ++
        pickCols.map(c => col(s"_asof.$c").as(s"asof_$c"))): _*)
  }
}
