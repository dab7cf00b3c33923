package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Corpus mixing: cap each source's contribution to a training corpus at a
 * cost budget (chars, tokens, bytes — any per-doc cost column), keeping
 * documents in a DETERMINISTIC order so reruns select the same subset.
 * This is the "mixture weights" step of a pretraining-data build: without
 * it one over-crawled source dominates the token distribution.
 *
 * Shape: one running-sum window per source partition + a filter — a single
 * hash exchange on the source key; no collect, no join. Skewed sources are
 * exactly the ones the cap truncates, so the window partition size is
 * bounded by budget/min-cost in the output (the scan-side rows still flow
 * through the window — pre-filter with a cheap upper bound if a source is
 * pathologically large).
 */
object Mixing {

  /** Docs ordered by `orderCol` within each source, kept while the running
    * `cost` total stays within `budget`. Adds `_cum` with the running total
    * (callers drop it or keep it for reporting). */
  def capPerSource(docs: DataFrame, sourceCol: String, orderCol: String,
                   cost: Column, budget: Long): DataFrame = {
    val w = Window.partitionBy(sourceCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.withColumn("_cum", sum(cost.cast("long")).over(w))
      .filter(col("_cum") <= budget)
  }
}
