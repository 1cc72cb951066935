package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import graft.functions.Portable
import org.apache.spark.sql.functions._

/** As-of matching: pair each "buy"-side row with the earliest later
  * "sell"-side row of the same key — the reference's trade-ROI join
  * (`row_number() over (partition by buy… order by sell.date) = 1`,
  * update_etl.py:710).
  *
  * Instead of the reference's O(buys × sells) range self-join, events of
  * both sides are interleaved in one window ordered by time, and each buy
  * reads the next sell timestamp from a following-rows frame — one shuffle
  * on the key, no quadratic blowup; this is the formulation that survives
  * 100 TB (the window state per key is O(1) here).
  */
object AsOf {

  /** `events` must contain keyCol, tsCol, idCol, sideCol, valueCol.
    * Returns one row per buy that has a later sell:
    * (key, buy_event_id, buy_ts, buy_value, sell_event_id, sell_ts,
    *  sell_value, gain).
    */
  def matchNext(events: DataFrame, keyCol: String, tsCol: String, idCol: String,
                sideCol: String, buySide: String, sellSide: String,
                valueCol: String): DataFrame = {
    val seq = events.where(col(sideCol).isin(buySide, sellSide))
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
      .rowsBetween(1, Window.unboundedFollowing)
    val withNext = seq.withColumn("__next_sell_ts",
      min(when(col(sideCol) === sellSide, col(tsCol))).over(w))
    val buys = withNext.where(col(sideCol) === buySide && col("__next_sell_ts").isNotNull)
      .select(col(keyCol), col(idCol).as("buy_event_id"), col(tsCol).as("buy_ts"),
        col(valueCol).as("buy_value"), col("__next_sell_ts"))
    val sells = seq.where(col(sideCol) === sellSide)
      .select(col(keyCol).as("__sk"), col(idCol).as("sell_event_id"),
        col(tsCol).as("sell_ts"), col(valueCol).as("sell_value"))
    // several sells can share the matched timestamp: keep min sell id.
    val matched = buys.join(sells,
      buys(keyCol) === sells("__sk") && col("__next_sell_ts") === col("sell_ts"))
    Dedup.oneByKey(matched, Seq("buy_event_id"), Seq(col("sell_event_id").asc))
      .select(col(keyCol), col("buy_event_id"), col("buy_ts"), col("buy_value"),
        col("sell_event_id"), col("sell_ts"), col("sell_value"),
        Portable.q4(col("sell_value") - col("buy_value")).as("gain"))
  }

  /** Reference-parity variant of [[matchNext]] — the trade-ROI join as the
    * reference actually writes it (update_etl.py:710): the sell bound is
    * INCLUSIVE (`sell.date >= buy.date`, expressed here as a RANGE frame
    * ordered by ts alone, so an equal-timestamp sell matches regardless of
    * row order) and the join is LEFT OUTER — buys with no later sell are
    * kept, their gain computed against `fallback` (the reference coalesces
    * with the collection's current floor price; callers supply the
    * current-price frame as (key, fallback_value)).
    *
    * Output adds `matched`; sell columns are null for unmatched buys, and
    * gain is null when both the sell and the fallback are missing.
    */
  def matchNextLeft(events: DataFrame, keyCol: String, tsCol: String, idCol: String,
                    sideCol: String, buySide: String, sellSide: String,
                    valueCol: String, fallback: DataFrame,
                    fallbackKeyCol: String, fallbackValCol: String): DataFrame = {
    val seq = events.where(col(sideCol).isin(buySide, sellSide))
    // RANGE frame: peers (equal ts) are inside the frame, giving >= bounds
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
      .rangeBetween(Window.currentRow, Window.unboundedFollowing)
    val withNext = seq.withColumn("__next_sell_ts",
      min(when(col(sideCol) === sellSide, col(tsCol))).over(w))
    val buys = withNext.where(col(sideCol) === buySide)
      .select(col(keyCol), col(idCol).as("buy_event_id"), col(tsCol).as("buy_ts"),
        col(valueCol).as("buy_value"), col("__next_sell_ts"))
    val sells = seq.where(col(sideCol) === sellSide)
      .select(col(keyCol).as("__sk"), col(idCol).as("sell_event_id"),
        col(tsCol).as("sell_ts"), col(valueCol).as("sell_value"))
    val matched = buys.join(sells,
      buys(keyCol) === sells("__sk") && col("__next_sell_ts") === col("sell_ts"), "left")
    val fb = fallback.select(col(fallbackKeyCol).as("__fk"),
      col(fallbackValCol).as("__fallback_value"))
    Dedup.oneByKey(matched, Seq("buy_event_id"), Seq(col("sell_event_id").asc_nulls_last))
      .join(fb, col(keyCol) === col("__fk"), "left")
      .select(col(keyCol), col("buy_event_id"), col("buy_ts"), col("buy_value"),
        col("sell_event_id"), col("sell_ts"), col("sell_value"),
        Portable.q4(coalesce(col("sell_value"), col("__fallback_value")) - col("buy_value")).as("gain"),
        col("sell_event_id").isNotNull.as("matched"))
  }

  /** Native-operator form of [[matchNext]]: plans through the custom
    * AsOfJoin LogicalPlan/SparkStrategy/SparkPlan (one shuffle+sort per
    * side, streaming two-pointer merge, O(1) state per key) instead of
    * window + join + dedup. Matching position is lexicographic on
    * (ts, event id) — identical to [[matchNext]]'s following-rows window
    * semantics, including sells sharing the buy's exact timestamp.
    * Null keys/timestamps are excluded, matching SQL join semantics.
    */
  def matchNextNative(events: DataFrame, keyCol: String, tsCol: String, idCol: String,
                      sideCol: String, buySide: String, sellSide: String,
                      valueCol: String): DataFrame = {
    import org.apache.spark.sql.graft.asof.AsOfJoinApi
    val nonNull = col(keyCol).isNotNull && col(tsCol).isNotNull && col(idCol).isNotNull
    val buys = events.where(col(sideCol) === buySide && nonNull)
      .select(col(keyCol), col(idCol).as("buy_event_id"), col(tsCol).as("buy_ts"),
        col(valueCol).as("buy_value"))
    val sells = events.where(col(sideCol) === sellSide && nonNull)
      .select(col(keyCol).as("__sk"), col(idCol).as("sell_event_id"),
        col(tsCol).as("sell_ts"), col(valueCol).as("sell_value"))
    AsOfJoinApi.asOfJoin(buys, sells, keyCol, "__sk", "buy_ts", "sell_ts",
        "buy_event_id", "sell_event_id")
      .select(col(keyCol), col("buy_event_id"), col("buy_ts"), col("buy_value"),
        col("sell_event_id"), col("sell_ts"), col("sell_value"),
        Portable.q4(col("sell_value") - col("buy_value")).as("gain"))
  }
}
