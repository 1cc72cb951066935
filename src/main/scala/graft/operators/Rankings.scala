package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank / percentile / top-k building blocks for the worth-ranking and
  * floor-price surfaces (update_etl.py:537 address_collection_total_worth,
  * :454 nft_contract_floor_price, :838 circle_insider).
  */
object Rankings {

  /** Exact discrete percentile per group: smallest value v in the group with
    * cume_dist(v) >= fraction — exactly `percentile_disc(fraction) WITHIN
    * GROUP (ORDER BY valueCol)` semantics (portable to any engine).
    * One shuffle on the group keys; sort within partitions.
    */
  def percentileDisc(df: DataFrame, groupCols: Seq[String], valueCol: String,
                     fraction: Double, outName: String): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col(valueCol))
    df.withColumn("__cd", cume_dist().over(w))
      .where(col("__cd") >= fraction)
      .groupBy(groupCols.map(col): _*)
      .agg(min(col(valueCol)).as(outName))
  }

  /** Top-k rows under a total order (callers must include a unique tiebreak
    * column in `order` for determinism at the boundary).
    */
  def topK(df: DataFrame, order: Seq[Column], k: Int): DataFrame = {
    // global row_number over a single partition is fine for small k outputs;
    // Spark plans orderBy+limit as TakeOrderedAndProject (no full sort).
    df.orderBy(order: _*).limit(k)
      .withColumn("rank", row_number().over(Window.orderBy(order: _*)))
  }

  /** Top-k rows PER GROUP — the reference's `row_number() over (partition
    * by collection_id order by feed_importance_score desc) <= 3` feed-score
    * shape (update_etl.py:1182-1199). Adds `rnk` (1-based within group).
    *
    * Scale: the rank-filter-over-window pattern is recognized by Spark's
    * InferWindowGroupLimit rule, which inserts a partial WindowGroupLimit
    * BEFORE the shuffle — each map task keeps only its local top-k per
    * group, so the shuffle carries O(groups × k) rows, not the full input.
    * `order` must include a unique tiebreak for deterministic boundaries.
    */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], order: Seq[Column],
                   k: Int): DataFrame =
    df.withColumn("rnk",
        row_number().over(
          Window.partitionBy(groupCols.map(col): _*).orderBy(order: _*)).cast("int"))
      .where(col("rnk") <= k)
}
