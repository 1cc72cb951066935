package graft.operators

import graft.functions.Portable
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus distribution-drift monitoring — "has this source (or this
  * snapshot) drifted away from the corpus it feeds?" as a per-group
  * Jensen–Shannon divergence between each group's unigram distribution
  * and the corpus-wide one. This is the pipeline-health complement of
  * the q66/q110 dataset-card rollups: those report volumes, this
  * reports DISTRIBUTION — a scraper that started emitting boilerplate,
  * a source whose language mix flipped, a bad decode release, all
  * surface as a JS spike long before volume metrics move. JS (not KL)
  * because it is symmetric, finite even when a group misses words, and
  * bounded by ln 2 — comparable across groups and across days.
  *
  * Scale shape (100 TB): two map-side-combined token aggregations
  * (corpus counts, per-group counts) — both linear scans; the scoring
  * grid is groups × vocabulary, never corpus-sized, built from the
  * vocabulary frame joined to group counts. At web vocabulary scale the
  * grid is capped by scoring only the top-V corpus words (via
  * [[Sketches.cmsTopK]] or an exact top-V) — the JS mass of the tail is
  * negligible by construction; the fixture vocabulary is small enough
  * to score exactly.
  *
  * Determinism (SURVEY §5): counts are exact integers; probabilities
  * and the per-word terms are fixed double expressions (`ln` on
  * identical IEEE inputs — the q111 precedent); the per-group sum folds
  * in WORD order; the final divergence quantizes to q6.
  */
object Drift {

  /** Per-group JS divergence of the `groupCol` unigram distribution vs
    * the whole corpus. Output: (groupCol, n_tokens, n_words_absent —
    * corpus words the group never uses, the coverage signal —
    * js_divergence).
    */
  def jsDivergence(docs: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(groupCol), explode(split(col(textCol), " ")).as("__word"))
    val corpus = toks.groupBy(col("__word")).agg(count(lit(1)).as("__c"))
    val total = toks.agg(count(lit(1)).as("__n"))
    val gcnt = toks.groupBy(col(groupCol), col("__word")).agg(count(lit(1)).as("__s"))
    val gtot = toks.groupBy(col(groupCol)).agg(count(lit(1)).as("__m"))

    // groups × vocabulary grid with explicit zeros for absent words
    val grid = gtot.crossJoin(corpus).crossJoin(broadcast(total))
      .join(gcnt, Seq(groupCol, "__word"), "left")
      .withColumn("__s", coalesce(col("__s"), lit(0L)))

    val p = col("__s").cast("double") / col("__m") // group prob (0 when absent)
    val q = col("__c").cast("double") / col("__n") // corpus prob (> 0 always)
    val m = (p + q) / lit(2.0)
    val term = when(col("__s") > 0, p * log(p / m)).otherwise(lit(0.0)) +
      q * log(q / m)

    grid.select(col(groupCol), col("__m"), col("__s"),
        struct(col("__word"), term.as("t")).as("__wt"))
      .groupBy(col(groupCol))
      .agg(max(col("__m")).as("n_tokens"),
        sum(when(col("__s") === 0, 1).otherwise(0)).cast("int").as("n_words_absent"),
        // word-ordered fold: float addition associates identically
        Portable.q6(lit(0.5) * aggregate(
          array_sort(collect_list(col("__wt"))), lit(0.0),
          (acc: Column, x: Column) => acc + x.getField("t"))).as("js_divergence"))
  }
}
