package graft.operators

import graft.functions.{Portable, TextFns}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** C4-style line-structured document cleaning — the "keep the lines that
  * look like prose, then keep the documents that still have enough of
  * them" pass (Raffel et al. 2020 §2.2) every web-scale training corpus
  * runs before dedup/quality scoring. The reference cleans at the VALUE
  * level (username normalization, update_etl.py:361 clean_username
  * analog at q17); this operator is the document-structure complement:
  * filter INSIDE each document, then filter the document by what
  * survived.
  *
  * The two rule families mirror C4's:
  *   - line-level: a line is kept iff it has at least `minWordsPerLine`
  *     words AND contains at least one stopword (C4 keeps lines that end
  *     in terminal punctuation and have >= 5 words; the stopword test is
  *     its "looks like natural language" proxy — C4.5's langdetect /
  *     "bad word" rules are the same shape with other word lists).
  *   - document-level: a document is kept iff at least `minKeptLines`
  *     lines survive (C4: >= 3 sentences), and its cleaned text is the
  *     surviving lines REJOINED IN ORDER — cleaning reshapes documents,
  *     it doesn't just flag them.
  *
  * Scale shape (100 TB): the whole operator is ONE codegen'd projection +
  * filter — split, chunk, per-line filter, ordered rejoin are all array
  * expressions over the row; no explode, no shuffle, no per-line rows
  * ever materialize. Pushdown-friendly: only (id, text) is read.
  *
  * Determinism: every rule is exact (integer word counts, set membership,
  * order-preserving rejoin), so the DuckDB oracle replays the kept set
  * and the cleaned text byte-for-byte.
  */
object Cleaning {

  /** Clean `docs` under C4-style line rules. The corpus stores each
    * document as one whitespace token stream (no hard line breaks), so
    * lines are synthesized as fixed windows of `lineLen` words first —
    * the q85 doc-chunking move; a corpus with real newlines would split
    * on those instead (`split(text, "\n")`) and the rule surface is
    * unchanged.
    *
    * Output (kept documents only): idCol, n_lines, n_kept, kept_frac
    * (q6), clean_text (kept lines joined with " | ").
    */
  def c4LineClean(docs: DataFrame, idCol: String, textCol: String,
                  lineLen: Int, minWordsPerLine: Int, stopwords: Seq[String],
                  minKeptLines: Int): DataFrame = {
    require(lineLen >= 1 && minWordsPerLine >= 1 && minKeptLines >= 1,
      "lineLen, minWordsPerLine, minKeptLines must all be >= 1")
    require(stopwords.nonEmpty, "stopwords must be non-empty")
    val stops = array(stopwords.map(lit): _*)
    val lines = transform(
      sequence(lit(0), ((size(col("__w")) - 1) / lineLen).cast("int")),
      (i: Column) => slice(col("__w"), i * lineLen + 1, lit(lineLen)))
    val keptLine = (lw: Column) =>
      size(lw) >= minWordsPerLine && arrays_overlap(lw, stops)
    docs.select(col(idCol), TextFns.words(col(textCol)).as("__w"))
      .withColumn("__lines", lines)
      .withColumn("__kept", filter(col("__lines"), keptLine))
      .select(col(idCol),
        size(col("__lines")).cast("int").as("n_lines"),
        size(col("__kept")).cast("int").as("n_kept"),
        Portable.q6(size(col("__kept")).cast("double") / size(col("__lines")))
          .as("kept_frac"),
        array_join(transform(col("__kept"), (lw: Column) => array_join(lw, " ")),
          " | ").as("clean_text"))
      .where(col("n_kept") >= minKeptLines)
  }
}
