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
  * summary), mergeable across partitions, at a documented accuracy cost —
  * the same exact-is-the-oracle / approximate-is-the-scale-path pairing as
  * brute-force vs IVF ANN (q24/q41).
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

  /** Approximate heavy hitters via count-min sketch — the scale path for
    * q56's exact vocabulary top-k: the exact form's aggregation state is
    * O(vocabulary) (every distinct term in the hash map), while a CMS is
    * a fixed depth×width counter matrix mergeable across partitions.
    *
    * Two passes: (1) build ONE sketch per partition and merge (state is
    * the matrix, not the terms); (2) re-scan only the `candidates` frame
    * (typically: terms seen in a small uniform sample, or yesterday's
    * top-k) and read their estimated counts from the broadcast sketch.
    * Estimates overcount with probability <= `confidence` by at most
    * `eps × total`, never undercount — so the true top-k is a subset of
    * the returned top-(k + slack) for modest slack.
    */
  def cmsTopK(df: DataFrame, termCol: String, candidates: DataFrame,
              k: Int, eps: Double = 0.0001, confidence: Double = 0.99,
              seed: Int = 42): DataFrame = {
    val sketch = df.stat.countMinSketch(col(termCol), eps, confidence, seed)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      sketch.writeTo(bos)
      bos.toByteArray
    }
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(bytes)
    // @transient lazy: the sketch deserializes ONCE per executor (on first
    // use after the closure ships), not once per row
    val estimateFn = new (String => Long) with Serializable {
      @transient private lazy val cms =
        org.apache.spark.util.sketch.CountMinSketch
          .readFrom(new java.io.ByteArrayInputStream(bc.value))
      def apply(term: String): Long = cms.estimateCount(term)
    }
    val estimate = udf(estimateFn)
    candidates.select(col(termCol))
      .distinct()
      .withColumn("est_count", estimate(col(termCol)))
      .orderBy(col("est_count").desc, col(termCol).asc)
      .limit(k)
  }
}
