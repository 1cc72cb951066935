package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis: for each user, the earliest time they reached
  * each stage, where stage k counts only if it happens strictly AFTER the
  * user's stage k-1 time (the product-analytics "view → click → purchase"
  * question; the reference asks the same first-this-then-that shape of its
  * buy/sell legs, update_etl.py:635).
  */
object Funnel {

  /** One row per user with a `ts_<stage>` column per funnel stage: the
    * earliest event of that type strictly after the user's previous-stage
    * timestamp (null = never reached, and later stages of that user are
    * null too).
    *
    * Plan shape: one hash shuffle on the user, then one Window pass PER
    * STAGE over the SAME partitioning — consecutive Window operators with
    * an identical partition spec reuse the exchange, so stage count adds
    * map-side passes, never shuffles. Per-key window state is O(1) (a
    * running min). The final one-row-per-user collapse is a groupBy on
    * the already-partitioned key.
    */
  def stageTimes(events: DataFrame, userCol: String, tsCol: String,
                 typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "at least one funnel stage")
    val w = Window.partitionBy(col(userCol))
    val withStages = stages.zipWithIndex.foldLeft(events) { case (df, (stage, i)) =>
      val cond =
        if (i == 0) col(typeCol) === stage
        else col(typeCol) === stage && col(tsCol) > col(s"ts_${stages(i - 1)}")
      df.withColumn(s"ts_$stage", min(when(cond, col(tsCol))).over(w))
    }
    withStages.groupBy(col(userCol))
      .agg(first(col(s"ts_${stages.head}")).as(s"ts_${stages.head}"),
        stages.tail.map(st => first(col(s"ts_$st")).as(s"ts_$st")): _*)
  }
}
