package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed deduplication via window row_number — the reference's
  * `row_number() over (partition by … order by …) = 1` pattern
  * (update_etl.py:129 update_contracts, :433 first_acquisition,
  * :497 nft_ownership).
  *
  * Scale notes: a single hash shuffle on the partition keys; partial
  * ordering happens inside each shuffle partition. Callers MUST pass a
  * total order (include a unique id as tiebreak) for deterministic output.
  */
object Dedup {

  /** Keep exactly one row per key, the first under `order`. */
  def oneByKey(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w)).where(col("__rn") === 1).drop("__rn")
  }

  /** Latest row per key by (ts desc, id desc). */
  def latestByKey(df: DataFrame, keys: Seq[String], tsCol: String, idCol: String): DataFrame =
    oneByKey(df, keys, Seq(col(tsCol).desc, col(idCol).desc))

  /** First row per key by (ts asc, id asc). */
  def firstByKey(df: DataFrame, keys: Seq[String], tsCol: String, idCol: String): DataFrame =
    oneByKey(df, keys, Seq(col(tsCol).asc, col(idCol).asc))

  /** Exact content dedup: one surviving row (min id) per hash of `textCol`,
    * with the duplicate count. Hash-groupBy: one shuffle, map-side partial
    * aggregation, no window sort — the cheapest dedup at 100 TB.
    */
  def exactByContent(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))

  /** Exact dedup after word-set canonicalization (sorted distinct words):
    * catches reorder/repeat edits that raw-byte hashing misses while still
    * being a single hash-groupBy — the standard cheap normalization step
    * before MinHash in a training-data dedup cascade.
    */
  def exactByCanonicalWords(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(concat_ws(" ",
        array_sort(array_distinct(split(col(textCol), " "))))).as("text_hash"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))
}
