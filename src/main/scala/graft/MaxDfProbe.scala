package graft

import graft.functions.TextFns
import graft.operators.Retrieval
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale evidence for the maxDfFrac DROP side (r08 verdict item 1): on
  * the stopword-dense sf1 fixture (where the GenData remap makes "a" and
  * "the" corpus-wide, df frac ≈ 0.77, and q104's gated 0.9 config KEEPS
  * their postings), time the identical q104 BM25 pipeline under the
  * gated cap (0.9) and a production cap (0.5) and measure the postings
  * volume each config feeds the join. The claim under test (SURVEY §6):
  * a production 0.3–0.5 cap drops the corpus-wide words and restores
  * the postings cost to ~its pre-remap scale.
  *
  * Output: one JSON line per config with wall seconds (min of reps),
  * kept terms, dropped terms, and matched-postings rows (the join
  * output the cap exists to bound).
  */
object MaxDfProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("maxdfprobe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/repo/tmp/sf1")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)

    def f(d: Double): String = "%.4f".formatLocal(java.util.Locale.ROOT, d)
    def loadAvg(): Double =
      try java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/loadavg"))
        .split("\\s+")(0).toDouble
      catch { case _: Throwable => -1.0 }

    // ONE probe-frame definition shared by the timed pipeline and the
    // volume census below: if the q104/q135 probe shape ever changes,
    // both must move together or the census measures a different query
    // set than the wall time it is printed next to
    def probesOf(docs: org.apache.spark.sql.DataFrame) =
      docs.where(col("doc_id") % 25 === 0)
        .select(col("doc_id").as("query_id"),
          explode(array_distinct(slice(TextFns.words(col("text")), 1, 4)))
            .as("term"))

    def pipeline(cap: Double) = {
      val docs = Tables(spark, dir).documentsSpread
      Retrieval.bm25TopK(docs, "doc_id", "text", probesOf(docs), "query_id",
        "term", k = 10, k1 = 1.2, b = 0.75, maxDfFrac = cap)
    }

    // df census once: how many terms each cap keeps/drops, and the
    // matched-postings join volume each config implies (probe terms ×
    // postings restricted to kept terms)
    def census(cap: Double): (Long, Long, Long) = {
      val docs = Tables(spark, dir).documentsSpread
      // postings + df mirror Retrieval.bm25TopK's internals
      // (Retrieval.scala: tokenize → per-(doc, term) tf → per-term df →
      // df cap BEFORE the probe join) — keep in lockstep with that file
      val toks = docs.select(col("doc_id"),
        explode(TextFns.words(col("text"))).as("term"))
      val postings = toks.groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf"))
      val nDocs = docs.count()
      val df = postings.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val kept = df.where(col("df") <= lit(cap) * lit(nDocs))
      // the REAL probe⋈postings volume, with per-term probe multiplicity:
      // a corpus-wide term probed by k queries contributes k × postings
      // rows to the scoring join, so the census must count (query,
      // posting) PAIRS — a distinct-terms semi-join would understate the
      // kept-stopwords config by roughly the probe count, which is
      // precisely the cost the cap claim is judged on
      val matched = postings
        .join(kept.select("term"), Seq("term"), "left_semi")
        .join(probesOf(docs), Seq("term"))
        .count()
      (kept.count(), df.count() - kept.count(), matched)
    }

    // warm-up (JIT, page cache) before any timed rep
    pipeline(0.9).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()

    Seq(0.9, 0.5).foreach { cap =>
      val (keptTerms, droppedTerms, matchedPostings) = census(cap)
      val load = loadAvg()
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        pipeline(cap).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache(); System.gc()
        dt
      }
      // degenerate flag (r09 verdict item 5): on a fixture whose whole
      // vocabulary is stopword-dense at this SF (the driver's sf0.1
      // fixture under cap 0.5 keeps 1 of 31 terms and matches 0
      // postings), the config probes NOTHING — mark the row so the
      // artifact cannot be misread as a real drop-side measurement.
      // Either symptom suffices: a near-empty kept vocabulary, or a
      // scoring join that matched nothing (possible even with several
      // kept terms, if no probe term survives the cut)
      val degenerate = keptTerms <= 1 || matchedPostings == 0
      println(s"""{"probe":"maxdf","sf_dir":"$dir","max_df_frac":$cap,""" +
        s""""sec":${f(times.min)},"reps":[${times.map(f).mkString(",")}],""" +
        s""""kept_terms":$keptTerms,"dropped_terms":$droppedTerms,""" +
        s""""matched_postings":$matchedPostings,"degenerate":$degenerate,""" +
        s""""load":${f(load)}}""")
    }
    spark.stop()
  }
}
