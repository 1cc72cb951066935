package graft.operators

import graft.functions.Portable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination for training corpora: flag training documents
  * that share word n-grams with an evaluation/benchmark set, so eval data
  * can be scrubbed from the training mix before a run. This is the
  * standard n-gram-overlap decontamination used by LLM data pipelines
  * (the GPT-3/PaLM-style "13-gram overlap" check, here parameterized by n).
  */
object Decontaminate {

  /** Per training doc: how many of its distinct word n-grams appear
    * anywhere in the eval corpus.
    *
    * Output: doc_id, n_ngrams (distinct n-grams in the doc),
    * n_shared (of those, how many occur in ANY eval doc),
    * contamination_ratio = n_shared / n_ngrams (6-dp floor-quantized),
    * flagged (ratio >= minRatio). Docs with fewer than n words have no
    * n-grams and are absent from the output (nothing to test).
    *
    * Plan shape: both sides reduce to (id, 64-bit n-gram hash) rows; the
    * eval side collapses to its DISTINCT hash set before the join, so the
    * join input is O(|eval vocabulary|), not O(|eval| × ngrams), and the
    * probe is a left-semi hash join on an 8-byte key. No hint on the eval
    * side: a benchmark suite is usually broadcast-sized and AQE will pick
    * that, but nothing breaks when the "eval" side is itself a corpus.
    * Training docs never pair with each other — cost is linear in
    * training n-grams, never quadratic.
    */
  def ngramOverlap(train: DataFrame, eval: DataFrame, idCol: String,
                   textCol: String, n: Int, minRatio: Double): DataFrame = {
    val evalSh = Similarity.shingleSets(eval, idCol, textCol, n)
      .select(xxhash64(col("shingle")).as("sh64")).distinct()
    val trainSh = Similarity.shingleSets(train, idCol, textCol, n)
      .select(col("id"), xxhash64(col("shingle")).as("sh64"))
    val sizes = trainSh.groupBy(col("id")).agg(count(lit(1)).as("n_ngrams"))
    val shared = trainSh.join(evalSh, Seq("sh64"), "left_semi")
      .groupBy(col("id")).agg(count(lit(1)).as("n_shared"))
    sizes.join(shared, Seq("id"), "left")
      .na.fill(0L, Seq("n_shared"))
      .select(col("id").as(idCol), col("n_ngrams"), col("n_shared"),
        Portable.q6(col("n_shared") * lit(1.0) / col("n_ngrams")).as("contamination_ratio"))
      .withColumn("flagged", col("contamination_ratio") >= minRatio)
  }
}
