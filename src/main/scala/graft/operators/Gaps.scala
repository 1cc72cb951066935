package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Activity-calendar gap detection — the reference's
  * `check_table_for_date_gaps` (etl_utls.py:340), distributed: no driver
  * loop, the calendar is generated per key with `sequence()` and missing
  * days found with an anti-join.
  */
object Gaps {

  /** Per-key activity summary: active days vs calendar span. */
  def activitySummary(df: DataFrame, keyCol: String, tsCol: String): DataFrame =
    df.groupBy(col(keyCol))
      .agg(
        min(to_date(col(tsCol))).as("first_day"),
        max(to_date(col(tsCol))).as("last_day"),
        countDistinct(to_date(col(tsCol))).as("n_days_active"))
      .withColumn("n_days_span", datediff(col("last_day"), col("first_day")) + 1)
      .withColumn("n_days_missing", col("n_days_span") - col("n_days_active"))

  /** The explicit missing dates per key (exploded calendar anti-join). */
  def missingDates(df: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val span = df.groupBy(col(keyCol))
      .agg(min(to_date(col(tsCol))).as("d0"), max(to_date(col(tsCol))).as("d1"))
    val calendar = span.select(col(keyCol),
      explode(sequence(col("d0"), col("d1"))).as("day"))
    val active = df.select(col(keyCol), to_date(col(tsCol)).as("day")).distinct()
    calendar.join(active, Seq(keyCol, "day"), "left_anti")
  }
}
