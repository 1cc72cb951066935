package graft.operators

import org.apache.spark.sql.functions._

class SemDedupSpec extends graft.SparkSpec {
  import spark.implicits._

  // Two tight clusters on orthogonal axes plus a lone outlier. Within
  // cluster A, vectors 1/2/3 are near-identical (cosine ~1); in cluster
  // B, 10/11 are near-identical and 12 is oblique (cosine < bar).
  private def vec(parts: (Int, Double)*) = {
    val a = Array.fill(8)(0.001f)
    parts.foreach { case (i, x) => a(i) = x.toFloat }
    a
  }
  private val emb = Seq(
    (1L, vec(0 -> 1.0)), (2L, vec(0 -> 0.99, 1 -> 0.01)),
    (3L, vec(0 -> 1.01, 1 -> -0.01)),
    (10L, vec(4 -> 1.0)), (11L, vec(4 -> 0.98, 5 -> 0.02)),
    (12L, vec(4 -> 0.4, 5 -> 0.9)),
    (20L, vec(7 -> -1.0))
  ).toDF("vec_id", "embedding")

  test("semDedup keeps the lowest id of each within-cluster dup group") {
    val out = Similarity.semDedup(emb, "vec_id", "embedding",
        k = 3, iters = 2, minCosine = 0.9)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Boolean]("kept")).toMap
    assert(out.size == 7, "every vector must get a verdict")
    assert(out(1L), "group representative (lowest id) is kept")
    assert(!out(2L) && !out(3L), "higher-id near-identicals drop")
    assert(out(10L) && !out(11L), "second cluster dedups independently")
    assert(out(12L), "oblique member below the bar survives")
    assert(out(20L), "singleton cluster survives")
  }

  test("cluster scoping: near-dups split across clusters are NOT compared") {
    // two identical vectors forced into different clusters via k = n:
    // every vector seeds its own cluster, so nothing shares a cluster
    // and nothing can drop — the documented recall trade of scoping.
    val out = Similarity.semDedup(emb, "vec_id", "embedding",
      k = 7, iters = 1, minCosine = 0.9)
    assert(out.where(!col("kept")).count() == 0L)
  }

  test("semDedupWith reuses pre-trained centroids") {
    val cents = Similarity.kMeansCentroids(emb, "vec_id", "embedding", k = 3, iters = 2)
    val a = Similarity.semDedup(emb, "vec_id", "embedding", 3, 2, 0.9)
      .orderBy("vec_id").collect().toSeq
    val b = Similarity.semDedupWith(emb, "vec_id", "embedding", cents, 0.9)
      .orderBy("vec_id").collect().toSeq
    assert(a == b)
  }
}
