package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Disclosure control for published corpus statistics — the
  * minimum-cell-size (k-anonymity-style) release rule every public
  * dataset card / stats dashboard applies before numbers leave the
  * pipeline: a detail cell backed by fewer than k units can identify
  * its members (the reference publishes per-collection and per-user
  * rollups; at small cells those ARE the user), so small cells are
  * SUPPRESSED from the detail rows and pooled into one aggregate row
  * that preserves the published totals.
  *
  * Scale shape: one map-side-combined groupBy to cell grain, then the
  * k-split — the pooled row is a cell-count-sized aggregate, never
  * corpus-sized. Deterministic: counts and sums are exact integers;
  * the split is a pure integer comparison.
  */
object Privacy {

  /** Release `units` rolled up to `groupCols` cells, suppressing cells
    * with fewer than `k` units into one pooled `__suppressed` row
    * (omitted when nothing is suppressed). Output: groupCols,
    * n_groups (1 per published cell; pooled-cell count on the
    * suppressed row), n_docs, n_tokens (sum of `unitWeight`).
    */
  def kAnonRelease(units: DataFrame, groupCols: Seq[String],
                   unitWeight: Column, k: Long): DataFrame = {
    require(groupCols.nonEmpty && k >= 1, "need group columns and k >= 1")
    val cells = units.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_docs"), sum(unitWeight).as("n_tokens"))
    val pub = cells.where(col("n_docs") >= k)
      .select(groupCols.map(col) ++ Seq(lit(1L).as("n_groups"),
        col("n_docs"), col("n_tokens")): _*)
    val sup = cells.where(col("n_docs") < k)
      .agg(count(lit(1)).as("n_groups"),
        coalesce(sum(col("n_docs")), lit(0L)).as("n_docs"),
        coalesce(sum(col("n_tokens")), lit(0L)).as("n_tokens"))
      .where(col("n_groups") > 0)
      .select(groupCols.map(_ => lit("__suppressed")) ++ Seq(col("n_groups"),
        col("n_docs"), col("n_tokens")): _*)
      .toDF(groupCols ++ Seq("n_groups", "n_docs", "n_tokens"): _*)
    pub.unionByName(sup)
  }
}
