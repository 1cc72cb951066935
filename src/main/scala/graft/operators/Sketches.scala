package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sketch-based approximate aggregations: the bounded-memory scale paths
  * for the exact per-group aggregates used by the oracle-checked queries.
  *
  * At 100 TB the exact forms have unbounded per-group state: an exact
  * `countDistinct` holds every distinct value per group in the aggregation
  * hash map, and an exact percentile ([[Rankings.percentileDisc]], q06)
  * sorts every group's rows. The sketches below replace that with
  * fixed-size per-group state (an HLL++ register array / a quantile
  * summary), mergeable across partitions, at a documented accuracy cost —
  * the same exact-is-the-oracle / approximate-is-the-scale-path pairing as
  * brute-force vs IVF ANN (q24/q41).
  */
object Sketches {

  /** Per-key approximate distinct count (HyperLogLog++). `rsd` is the
    * target relative standard deviation (Spark default 0.05); state per
    * group is a fixed register array regardless of cardinality.
    */
  def approxDistinct(df: DataFrame, keys: Seq[String], valueCol: String,
                     rsd: Double = 0.05): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(approx_count_distinct(col(valueCol), rsd).as("approx_distinct"))

  /** Per-key approximate percentile (Greenwald–Khanna variant behind
    * `percentile_approx`). `accuracy` trades memory for error: the rank
    * error is at most 1/accuracy of the group size. Returns a real data
    * value (like percentile_disc), so downstream join semantics match the
    * exact operator.
    */
  def approxPercentile(df: DataFrame, keys: Seq[String], valueCol: String,
                       pct: Double, outCol: String,
                       accuracy: Int = 10000): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(percentile_approx(col(valueCol), lit(pct), lit(accuracy)).as(outCol))
}
