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
