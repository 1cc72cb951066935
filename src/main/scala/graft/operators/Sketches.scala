package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sketch-based approximate aggregations: the bounded-memory scale paths
  * for the exact per-group aggregates used by the oracle-checked queries.
  *
  * At 100 TB the exact forms have unbounded per-group state: an exact
  * `countDistinct` holds every distinct value per group in the aggregation
  * hash map, and an exact percentile ([[Rankings.percentileDisc]], q06)
  * sorts every group's rows. The sketches below replace that with
  * fixed-size per-group state (an HLL++ register array / a quantile
  * summary / a depth×width counter matrix), mergeable across partitions,
  * at a documented accuracy cost — the same exact-is-the-oracle /
  * approximate-is-the-scale-path pairing as brute-force vs IVF ANN
  * (q24/q41).
  */
object Sketches {

  /** Per-key approximate distinct count (HyperLogLog++). `rsd` is the
    * target relative standard deviation (Spark default 0.05); state per
    * group is a fixed register array regardless of cardinality.
    */
  def approxDistinct(df: DataFrame, keys: Seq[String], valueCol: String,
                     rsd: Double = 0.05): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(approx_count_distinct(col(valueCol), rsd).as("approx_distinct"))

  /** Per-key approximate percentile (Greenwald–Khanna variant behind
    * `percentile_approx`). `accuracy` trades memory for error: the rank
    * error is at most 1/accuracy of the group size. Returns a real data
    * value (like percentile_disc), so downstream join semantics match the
    * exact operator.
    */
  def approxPercentile(df: DataFrame, keys: Seq[String], valueCol: String,
                       pct: Double, outCol: String,
                       accuracy: Int = 10000): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(percentile_approx(col(valueCol), lit(pct), lit(accuracy)).as(outCol))

  /** Approximate heavy hitters via a count-min sketch — the scale path
    * for q56's exact vocabulary top-k: the exact form's aggregation
    * state is O(vocabulary) (every distinct term in the hash map), while
    * a CMS is a fixed depth×width counter matrix.
    *
    * Expressed ENTIRELY as DataFrame aggregations — no UDF, no
    * driver-built sketch object (r08: the previous form broadcast a
    * serialized `spark.stat.countMinSketch` and read it back through a
    * Scala udf, the one non-codegen hole in the library):
    *
    *  1. the counter matrix is `df` exploded to its `depth` hash rows
    *     and counted by (row, bucket) — a map-side-combined groupBy over
    *     a key space capped at depth×width cells, each partial a long;
    *  2. `candidates` (vocabulary-sized, NEVER the corpus: terms from a
    *     small uniform sample, or yesterday's top-k) recompute their
    *     cells and read estimates back through a broadcast equi-join on
    *     the matrix, taking the min over the `depth` rows.
    *
    * Hash family: Kirsch–Mitzenmacher double hashing (the
    * [[Similarity]] minhash construction) off two xxhash64 seeds —
    * bucketᵢ = (h1 + i·h2) mod width, pmod'd non-negative, with the
    * stride forced NONZERO (h2 = 1 + pmod(·, width−1) ∈ [1, width−1]):
    * a zero stride would collapse a term's `depth` rows onto one bucket
    * and void the depth-independence behind the eps/confidence bound —
    * standard KM implementations force a nonzero (often odd) stride for
    * exactly this reason. Estimates
    * never undercount and overcount by at most `eps`·total with
    * probability ≥ `confidence` (width = ⌈e/eps⌉, depth =
    * ⌈ln(1/(1−confidence))⌉ — the standard CMS sizing), so the true
    * top-k is a subset of the returned top-(k + slack) for modest slack.
    * Fully deterministic: exact long counts, min, fixed seeds.
    */
  def cmsTopK(df: DataFrame, termCol: String, candidates: DataFrame,
              k: Int, eps: Double = 0.0001, confidence: Double = 0.99,
              seed: Int = 42): DataFrame = {
    require(k >= 1 && eps > 0 && eps < 1 && confidence > 0 && confidence < 1,
      "need k>=1, 0<eps<1, 0<confidence<1")
    val width = math.ceil(math.E / eps).toLong
    val depth = math.max(1, math.ceil(math.log(1.0 / (1.0 - confidence))).toInt)
    // (h1 + i·h2) mod w computed as (h1 mod w + i·h2') mod w with
    // h2' = 1 + (h2 mod (w−1)) ∈ [1, w−1] — the stride can never be 0,
    // so a term's depth rows land on depth DISTINCT hash functions; and
    // every intermediate stays < (depth+2)·width, so ANSI mode never
    // sees a long overflow (width ≥ 3 whenever eps < 1)
    def cells(frame: DataFrame) = frame
      .select(col(termCol), explode(sequence(lit(0), lit(depth - 1))).as("__i"))
      .withColumn("__b", pmod(pmod(xxhash64(col(termCol), lit(seed)), lit(width)) +
        col("__i") * (lit(1L) + pmod(xxhash64(col(termCol), lit(seed + 1)), lit(width - 1))),
        lit(width)))
    val matrix = cells(df.select(col(termCol)))
      .groupBy(col("__i"), col("__b")).agg(count(lit(1)).as("__cnt"))
    cells(candidates.select(col(termCol)).distinct())
      .join(broadcast(matrix), Seq("__i", "__b"), "left")
      // a candidate absent from df hits empty cells: estimate 0, not null
      .groupBy(col(termCol))
      .agg(min(coalesce(col("__cnt"), lit(0L))).as("est_count"))
      .orderBy(col("est_count").desc, col(termCol).asc)
      .limit(k)
  }
}
