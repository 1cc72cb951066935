package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked fuzzy matching (entity resolution): candidate pairs form only
  * inside a blocking key, then survive an edit-distance bound — the
  * standard dedup-by-name shape (the reference normalizes and matches
  * usernames across sources, update_etl.py:1279-1283; this is the
  * approximate variant for when exact normalization is not enough).
  */
object Fuzzy {

  /** All (id_a < id_b) pairs within a block whose strings are within
    * `maxDist` Levenshtein edits. Output: block, id_a, id_b, str_a,
    * str_b, distance.
    *
    * Scale contract: the self-join is bounded by the largest block
    * (never the corpus square) — same contract as
    * [[Similarity.nearDupWithin]]; pick blocks accordingly (a constant
    * block is O(n²)). Spark's `levenshtein` with a threshold argument
    * early-exits once the running distance exceeds the bound, so the
    * per-pair cost is O(maxDist × len), not O(len²).
    */
  def blockedLevenshtein(df: DataFrame, idCol: String, strCol: String,
                         blockCol: String, maxDist: Int): DataFrame = {
    // Repartition on the block with an EXPLICIT partition count: the
    // per-pair edit-distance loop runs where the join runs, and a small
    // dim table arrives as one input split, so the whole O(block²)
    // compare would grind on a single task. The count must be explicit —
    // this exchange is compute-bound, not size-bound, and AQE's
    // size-based coalescing would fold a few-MB shuffle right back to one
    // partition (measured: 18.8 s single-task → sub-second spread at
    // sf0.1 on local[32]).
    val spark = df.sparkSession
    val parts = spark.conf.get("spark.sql.shuffle.partitions", "200").toInt
    val e = df.select(col(blockCol).as("block"), col(idCol).as("id"),
      col(strCol).as("str")).repartition(parts, col("block"))
    // The distance bound lives IN the join condition, after the id order
    // check: non-equi conjuncts evaluate left to right, so `id <` prunes
    // half the bucket before any levenshtein runs. Single conjunct on
    // purpose — the thresholded levenshtein returns -1 past the bound, so
    // ">= 0" alone is the full predicate and the distance is computed
    // once per surviving candidate (plus once in the projection for the
    // survivors only).
    e.as("a").join(e.as("b"),
        col("a.block") === col("b.block") && col("a.id") < col("b.id") &&
          levenshtein(col("a.str"), col("b.str"), maxDist) >= 0)
      .select(col("a.block").as("block"),
        col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.str").as("str_a"), col("b.str").as("str_b"),
        levenshtein(col("a.str"), col("b.str"), maxDist).as("distance"))
  }
}
