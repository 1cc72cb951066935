package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation building blocks for hot keys at cluster scale.
  *
  * AQE's skew-join handling covers sort-merge joins at runtime; these
  * helpers cover the two cases it doesn't: aggregations over a hot key,
  * and broadcast-side replication for skewed map-side joins.
  */
object Skew {

  /** Two-phase (salted) aggregation: sum/count per key where a handful of
    * keys dominate. Phase 1 aggregates on (key, salt) — spreading a hot
    * key over `numSalts` reducers — phase 2 merges the partials. Both
    * phases are hash aggregations with map-side combine; the hot key's
    * row volume is split `numSalts` ways before it ever shuffles.
    */
  def saltedSum(df: DataFrame, keyCols: Seq[String], valueCol: String,
                numSalts: Int): DataFrame = {
    val keys = keyCols.map(col)
    // salt from the row position, NOT the value: a hot key whose rows all
    // carry one value (e.g. millions of value=0 events) must still spread
    df.withColumn("__salt", pmod(monotonically_increasing_id(), lit(numSalts.toLong)))
      .groupBy(keys :+ col("__salt"): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(keys: _*)
      .agg(sum(col("__psum")).as(s"sum_$valueCol"), sum(col("__pcnt")).as("n_rows"))
  }

  /** Replicated broadcast join against a skewed fact: the dimension side
    * is exploded `numSalts` times with a salt column and the fact picks a
    * deterministic salt, so a sort-merge shuffle join on a hot key spreads
    * over `numSalts` partitions. Use when the dim is too big for a plain
    * broadcast but the fact key distribution is pathological.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
                 numSalts: Int): DataFrame = {
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(numSalts - 1))))
    val saltedFact = fact.withColumn("__salt",
      pmod(crc32(monotonically_increasing_id().cast("string")), lit(numSalts)).cast("int"))
    saltedFact.join(saltedDim,
      saltedFact(factKey) === saltedDim(dimKey) && saltedFact("__salt") === saltedDim("__salt"))
      .drop("__salt")
  }

  /** Fact keys whose row count reaches `threshold` — the heavy hitters a
    * frequency-aware salt should target. One hash aggregation with
    * map-side combine (a hot key reaches the shuffle as one partial row
    * per map task); the output is bounded by n_rows/threshold keys, so it
    * is broadcastable by construction for any meaningful threshold.
    */
  def hotKeys(fact: DataFrame, factKey: String, threshold: Long): DataFrame =
    fact.groupBy(col(factKey).as("__hot_key"))
      .agg(count(lit(1)).as("__n"))
      .where(col("__n") >= threshold)
      .select(col("__hot_key"))

  /** Dim replicated ONLY for hot keys: a hot dim row appears once per
    * salt, a cold dim row exactly once (salt 0). Replication volume is
    * `cold + numSalts × hot` rows instead of [[saltedJoin]]'s
    * `numSalts × all` — the 100 TB-polite form when hot keys are a tiny
    * fraction of the key space (they always are; that's what skew means).
    */
  def replicateDimForHotKeys(dim: DataFrame, dimKey: String, hot: DataFrame,
                             numSalts: Int): DataFrame =
    dim.join(broadcast(hot), dim(dimKey) === hot("__hot_key"), "left")
      .withColumn("__salt", explode(
        when(col("__hot_key").isNotNull, sequence(lit(0), lit(numSalts - 1)))
          .otherwise(array(lit(0)))))
      .drop("__hot_key")

  /** Frequency-aware salted join: like [[saltedJoin]], but only keys whose
    * fact-side frequency reaches `hotThreshold` are salted — cold keys
    * join plainly on salt 0, so the dim shuffle volume scales with the
    * number of HOT keys, not the whole dim. Costs one extra map-side
    * aggregate over the fact to find the hot set (broadcast to both
    * sides). Row set is IDENTICAL to the plain join: every fact row still
    * meets every matching dim row exactly once, whichever path its key
    * takes.
    */
  def saltedJoinHot(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
                    numSalts: Int, hotThreshold: Long): DataFrame = {
    val hot = hotKeys(fact, factKey, hotThreshold)
    val saltedDim = replicateDimForHotKeys(dim, dimKey, hot, numSalts)
    val saltedFact = fact
      .join(broadcast(hot), fact(factKey) === hot("__hot_key"), "left")
      .withColumn("__salt",
        when(col("__hot_key").isNotNull,
          pmod(crc32(monotonically_increasing_id().cast("string")), lit(numSalts)).cast("int"))
          .otherwise(lit(0)))
      .drop("__hot_key")
    saltedFact.join(saltedDim,
      saltedFact(factKey) === saltedDim(dimKey) && saltedFact("__salt") === saltedDim("__salt"))
      .drop("__salt")
  }
}
