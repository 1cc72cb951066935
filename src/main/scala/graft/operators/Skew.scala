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
}
