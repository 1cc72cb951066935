package graft.operators

import org.apache.spark.sql.functions._

class RetrievalSpec extends graft.SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "spark shuffles data across the cluster"),
    (2L, "spark broadcasts small tables"),
    (3L, "the cluster schedules tasks"),
    (4L, "data skew breaks the shuffle"),
    (5L, "the the the the the the")
  ).toDF("doc_id", "text")

  test("bm25: exact-term query ranks the matching doc first") {
    val q = Seq((100L, "broadcasts"), (100L, "spark")).toDF("query_id", "term")
    val hits = Retrieval.bm25TopK(docs, "doc_id", "text", q, "query_id", "term",
        k = 3, maxDfFrac = 1.0)
      .orderBy($"rank").collect()
    // doc 2 matches both terms, doc 1 only "spark"
    assert(hits.head.getAs[Long]("doc_id") == 2L)
    assert(hits.head.getAs[Long]("n_terms") == 2L)
    assert(hits(1).getAs[Long]("doc_id") == 1L)
    assert(hits.forall(_.getAs[Double]("score") > 0.0))
  }

  test("bm25: k bounds each query's hits, rank is contiguous from 1") {
    val q = Seq((1L, "the"), (2L, "spark"), (2L, "the"))
      .toDF("query_id", "term")
    val out = Retrieval.bm25TopK(docs, "doc_id", "text", q, "query_id", "term",
      k = 2, maxDfFrac = 1.0)
    val byQ = out.collect().groupBy(_.getAs[Long]("query_id"))
    assert(byQ.values.forall(_.length <= 2))
    byQ.values.foreach { rows =>
      assert(rows.map(_.getAs[Int]("rank")).sorted.sameElements(1 to rows.length))
    }
  }

  test("bm25: maxDfFrac drops stopword-grade terms before the join") {
    // "the" appears in 4 of 5 docs (df frac 0.8): a 0.5 cap must remove it
    val q = Seq((9L, "the"), (9L, "skew")).toDF("query_id", "term")
    val out = Retrieval.bm25TopK(docs, "doc_id", "text", q, "query_id", "term",
      k = 5, maxDfFrac = 0.5).collect()
    // only "skew" survives -> only doc 4 matches, with one matched term
    assert(out.map(_.getAs[Long]("doc_id")).toSet == Set(4L))
    assert(out.head.getAs[Long]("n_terms") == 1L)
  }

  test("bm25: higher-idf term dominates a common term at equal tf") {
    // query for a rare term and a common term; the doc holding the rare
    // term must outrank docs holding only the common one
    val q = Seq((7L, "skew"), (7L, "cluster")).toDF("query_id", "term")
    val out = Retrieval.bm25TopK(docs, "doc_id", "text", q, "query_id", "term",
        k = 5, maxDfFrac = 1.0)
      .orderBy($"rank").collect()
    assert(out.head.getAs[Long]("doc_id") == 4L) // "skew" holder wins
  }

  test("bm25: deterministic under re-partitioning (exact-integer-grid score sum)") {
    val q = Seq((1L, "spark"), (1L, "cluster"), (1L, "data"))
      .toDF("query_id", "term")
    val a = Retrieval.bm25TopK(docs, "doc_id", "text", q, "query_id", "term",
      k = 5, maxDfFrac = 1.0).collect().toSet
    val b = Retrieval.bm25TopK(docs.repartition(7), "doc_id", "text",
      q.repartition(3), "query_id", "term", k = 5, maxDfFrac = 1.0)
      .collect().toSet
    assert(a == b)
  }

  test("hardNegatives drops positives, ranks by retriever rank with id ties, " +
    "caps per query, and treats NaN cosines as positives") {
    val scored = Seq(
      (1L, 10L, 1, 0.5),        // positive (>= 0.2): dropped
      (1L, 11L, 2, 0.1),        // neg rank 1
      (1L, 12L, 3, -0.3),       // neg rank 2
      (1L, 13L, 4, 0.19),       // neg rank 3 (just under the threshold)
      (1L, 14L, 5, -0.9),       // capped out at negPerQuery = 3
      (2L, 20L, 1, Double.NaN), // NaN never passes < τ: dropped, not ranked
      (2L, 19L, 2, 0.05),       // rank tie with 21 → lower doc id first
      (2L, 21L, 2, 0.0)
    ).toDF("query_id", "doc_id", "bm25_rank", "cosine")
    val out = Retrieval.hardNegatives(scored, "query_id", "doc_id",
        "bm25_rank", posThreshold = 0.2, negPerQuery = 3)
      .select("query_id", "doc_id", "neg_rank")
      .as[(Long, Long, Int)].collect().toSeq.sorted
    assert(out == Seq((1L, 11L, 1), (1L, 12L, 2), (1L, 13L, 3),
      (2L, 19L, 1), (2L, 21L, 2)))
  }

  test("bm25: the score aggregate map-side combines (partial_sum, no collect_list buffer)") {
    // the r09 grid-sum rewrite's plan contract (the q109/q126 pin): the
    // shuffle carries one long partial per (partition, query, doc), not
    // one matched-term struct per posting
    val q = Seq((1L, "spark")).toDF("query_id", "term")
    val plan = Retrieval.bm25TopK(docs, "doc_id", "text", q, "query_id",
      "term", k = 5, maxDfFrac = 1.0).queryExecution.executedPlan.toString
    assert(plan.contains("partial_sum"), s"no map-side partial sum in:\n$plan")
    assert(!plan.contains("collect_list"), s"collect_list buffer survived:\n$plan")
  }
}
