package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import graft.functions.Portable
import org.apache.spark.sql.functions._

/** Gap-based sessionization: a new session starts when the gap since the
  * previous event of the same user exceeds `gapSeconds`. Single shuffle on
  * the user key; two window passes share the same sort order so Catalyst
  * plans one sort.
  */
object Sessionize {

  def sessions(events: DataFrame, userCol: String, tsCol: String, idCol: String,
               valueCol: String, gapSeconds: Long): DataFrame = {
    val byUser = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val flagged = events
      .withColumn("__prev_ts", lag(col(tsCol), 1).over(byUser))
      .withColumn("__new_session",
        when(col("__prev_ts").isNull ||
          col(tsCol) > col("__prev_ts") + expr(s"INTERVAL $gapSeconds SECONDS"), 1)
          .otherwise(0))
      .withColumn("session_seq",
        sum(col("__new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged.groupBy(col(userCol), col("session_seq"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        Portable.q4(sum(col(valueCol))).as("total_value"))
  }
}
