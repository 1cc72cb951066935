package graft.operators

import graft.functions.Portable
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection with importance resampling (Xie et al.
  * 2023) — "pick the slice of the raw corpus that looks most like the
  * target domain" using cheap n-gram LMs instead of a learned
  * classifier: train one bigram model on the whole corpus and one on
  * the target-domain subset, weight every document by its per-token
  * likelihood RATIO between them, and resample by weight. Where q124's
  * classifier needs labels and q65/q121's mixes need source tags, DSIR
  * needs only an exemplar subset of the distribution you want more of.
  *
  * Scale shape (100 TB): both models come from the same single corpus
  * bigram pass ([[LanguageModel.trainBigram]] — vocabulary-sized
  * outputs); scoring is two broadcast-model joins over the corpus
  * bigrams; selection is [[Sampling.weightedTopK]]'s A-ES top-k, which
  * plans as TakeOrderedAndProject (per-task local k, never a global
  * sort). Nothing pairwise, no driver state beyond scalars.
  *
  * Determinism (SURVEY §5): both cross-entropies carry the q6 fold
  * contract; the weight is exp of their (identical-IEEE) difference,
  * quantized to q6 and floored at 1e-6 (A-ES needs strictly positive
  * weights); the md5-coin A-ES key then replays exactly as in q108.
  * Weight = exp(ce_base − ce_target) is the geometric-mean per-bigram
  * likelihood ratio — length-normalized so long documents are not
  * structurally favored, the same normalization both cross-entropies
  * already use.
  */
object Dsir {

  /** Select the `k` documents most target-like by importance weight.
    * Output: (idCol, n_bigrams, ce_base, ce_target, weight,
    * sample_rank). Documents with fewer than two tokens carry no LM
    * evidence and are excluded (the [[LanguageModel]] contract).
    */
  def importanceSelect(docs: DataFrame, idCol: String, textCol: String,
                       targetPred: Column, k: Int, alpha: Double = 0.5,
                       salt: String = "dsir"): DataFrame = {
    val baseModel = LanguageModel.trainBigram(docs, textCol)
    val tgtModel = LanguageModel.trainBigram(docs.where(targetPred), textCol)
    val ceBase = LanguageModel.crossEntropyUnder(baseModel, docs, idCol, textCol, alpha)
      .select(col(idCol), col("n_bigrams"), col("cross_entropy").as("ce_base"))
    val ceTgt = LanguageModel.crossEntropyUnder(tgtModel, docs, idCol, textCol, alpha)
      .select(col(idCol), col("cross_entropy").as("ce_target"))
    val weighted = ceBase.join(ceTgt, Seq(idCol))
      .withColumn("weight",
        greatest(Portable.q6(exp(col("ce_base") - col("ce_target"))), lit(1e-6)))
    Sampling.weightedTopK(weighted, idCol, col("weight"), k, salt)
  }
}
