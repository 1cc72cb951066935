package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.BloomExprs
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter scan pruning — the "don't ship what can't match" primitive
  * for semi-joins whose key set is too big to broadcast as an exact hash
  * set but whose MEMBERSHIP test compresses to a few MB of bits.
  *
  * The reference deletes flagged rows with SQL `IN (SELECT ...)` scans
  * (adhoc queries/exclude_payment_tokens.sql); q51/q69 cover the exact
  * semi/anti-join forms. At 100 TB the semi-join itself is the cost: the
  * FULL fact table shuffles on the join key before any row is dropped.
  * This operator puts a fixed-size bloom filter IN FRONT of that shuffle:
  *
  *   1. one aggregate over the key set builds a serialized bloom sketch
  *      (fixed `numBits` regardless of key count — mergeable, so the
  *      build is a map-side-combined single-row aggregate);
  *   2. the fact scan keeps only rows the sketch might contain — a
  *      codegen'd per-row probe, evaluated AT the scan, so false-positive
  *      fraction `fpp` of the non-matching volume is all that reaches
  *      the exchange;
  *   3. the exact semi-join runs on the survivors for precision (bloom
  *      false positives die here; false negatives cannot exist).
  *
  * This is exactly Spark's own runtime-filter rewrite
  * (`InjectRuntimeFilter`), made explicit so it applies to key sets that
  * never appear as a join build side (precomputed lists, cross-session
  * state) and so the sketch can be persisted/reused across queries. The
  * collected sketch is bounded by construction (`numBits/8` bytes, like
  * the broadcast k×dim centroid table, SURVEY §4) — never O(data).
  */
object Pruning {

  /** Serialized bloom filter over xxhash64(keyCol) of `keys`. */
  def buildBloom(keys: DataFrame, keyCol: String,
                 expectedItems: Long, fpp: Double = 0.01): Array[Byte] = {
    require(expectedItems > 0, "expectedItems must be positive")
    val numBits = BloomFilter.optimalNumOfBits(expectedItems, fpp)
    keys.select(
        BloomExprs.bloomAgg(xxhash64(col(keyCol)), expectedItems, numBits)
          .as("bf"))
      .head().getAs[Array[Byte]](0)
  }

  /** The bloom PRE-filter alone: a superset of the exact semi-join (false
    * positives possible, false negatives impossible). Exposed separately
    * so callers (and the q105 gate) can observe the pruned volume.
    */
  def bloomPrefilter(fact: DataFrame, factKey: String,
                     bloom: Array[Byte]): DataFrame =
    fact.where(BloomExprs.mightContain(bloom, xxhash64(col(factKey))))

  /** Exact semi-join with the bloom probe pushed in front of the shuffle:
    * result ≡ `fact LEFT SEMI JOIN keys`, shuffle volume ≈ matches +
    * fpp × non-matches.
    */
  def bloomPrunedSemiJoin(fact: DataFrame, factKey: String,
                          keys: DataFrame, keyCol: String,
                          expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val pruned = bloomPrefilter(fact, factKey,
      buildBloom(keys, keyCol, expectedItems, fpp))
    pruned.join(keys.select(col(keyCol)).distinct(),
      pruned(factKey) === col(keyCol), "left_semi")
  }
}
