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
    val e = df.select(col(blockCol).as("block"), col(idCol).as("id"),
      col(strCol).as("str"))
    e.as("a").join(e.as("b"),
        col("a.block") === col("b.block") && col("a.id") < col("b.id"))
      .select(col("a.block").as("block"),
        col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.str").as("str_a"), col("b.str").as("str_b"),
        levenshtein(col("a.str"), col("b.str"), maxDist).as("distance"))
      // threshold form returns -1 when the bound is exceeded
      .where(col("distance") >= 0 && col("distance") <= maxDist)
  }
}
