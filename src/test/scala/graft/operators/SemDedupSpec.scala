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

  test("semDedupSRP drops a subset of the exact within-cluster drops, with genuine pruning (q143 contract)") {
    // recall < 1 by construction, precision = 1: every srp-conditioned
    // drop must also be an exact within-cluster drop (a same-bucket pair
    // is a same-cluster pair), every verdict stays total, and on the
    // real fixture the sub-bucketing must actually prune — otherwise the
    // scale path is vacuous there
    val e = graft.sources.Tables(spark, "/root/testdata/sf0.001").embeddings
    val cents = Similarity.kMeansCentroids(e, "vec_id", "embedding", k = 16, iters = 3)
    val exact = Similarity.semDedupWith(e, "vec_id", "embedding", cents, 0.35)
    val srp = Similarity.semDedupSRP(e, "vec_id", "embedding", cents, 0.35, srpBits = 4)
    val exactDropped = exact.where(!col("kept"))
      .select("vec_id").as[Long].collect().toSet
    val srpDropped = srp.where(!col("kept"))
      .select("vec_id").as[Long].collect().toSet
    assert(srpDropped.subsetOf(exactDropped),
      s"SRP invented drops: ${(srpDropped -- exactDropped).take(3)}")
    assert(srpDropped.size < exactDropped.size,
      s"sub-bucketing pruned nothing (srp=${srpDropped.size}, exact=${exactDropped.size})")
    assert(srp.count() == e.count(), "every vector must get a verdict")
    // and the cluster assignment surface is the shared one — ids map to
    // the same centroid under both forms
    val ea = exact.select("vec_id", "centroid_id").as[(Long, Long)].collect().toSet
    val sa = srp.select("vec_id", "centroid_id").as[(Long, Long)].collect().toSet
    assert(ea == sa, "srp form drifted the centroid assignment")
  }

  test("semDedupSRP rejects empty vectors up front (total-output contract)") {
    // an empty vector has no cosine; Spark would pass its NaN through
    // `>= minCosine` while the oracle's term expansion omits it — and
    // the output must stay total, so filtering is not an option either:
    // the contract is a require, surfaced before any job runs
    val cents = Similarity.kMeansCentroids(emb, "vec_id", "embedding", k = 2, iters = 1)
    val withEmpty = emb.union(Seq((99L, Array.empty[Float])).toDF("vec_id", "embedding"))
    val ex = intercept[IllegalArgumentException] {
      Similarity.semDedupSRP(withEmpty, "vec_id", "embedding", cents, 0.35, 4)
    }
    assert(ex.getMessage.contains("non-empty vectors"))
  }
}
