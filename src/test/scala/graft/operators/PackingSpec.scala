package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("shardAssign is a deterministic permutation: dense positions, layout-invariant") {
    val docs = (1L to 500L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val out = Packing.shardAssign(docs, "doc_id", nShards = 4).cache()
    try {
      // every doc exactly once
      assert(out.select("doc_id").as[Long].collect().sorted.toSeq == (1L to 500L))
      // positions are dense 0..n-1 inside every shard
      val perShard = out.groupBy("shard")
        .agg(count(lit(1)).as("n"), min("pos").as("lo"), max("pos").as("hi"))
        .as[(Int, Long, Int, Int)].collect()
      assert(perShard.length == 4)
      perShard.foreach { case (_, n, lo, hi) => assert(lo == 0 && hi == n - 1) }
      // the layout is a pure function of the data, not the partitioning
      val re = Packing.shardAssign(docs.repartition(7), "doc_id", nShards = 4)
      assert(re.select("doc_id", "shard", "pos").except(
        out.select("doc_id", "shard", "pos")).isEmpty)
    } finally out.unpersist()
  }

  test("packSequences telescopes the token stream and cuts on the budget") {
    val docs = (1L to 200L).map(i => (i, (i % 7) * 3)).toDF("doc_id", "n_tokens")
    val packed = Packing.packSequences(
      Packing.shardAssign(docs, "doc_id", nShards = 2), "n_tokens", budget = 10L)
      .select("shard", "pos", "n_tokens", "start_tok", "seq_id", "n_seqs_spanned")
      .as[(Int, Int, Long, Long, Long, Long)].collect()
      .groupBy(_._1).values
    packed.foreach { shard =>
      val ordered = shard.sortBy(_._2)
      // stream offsets telescope: each doc starts where the previous ended
      ordered.foldLeft(0L) { case (expected, (_, _, n, start, seq, span)) =>
        assert(start == expected, s"gap in the token stream at offset $start")
        assert(seq == start / 10, "seq_id is not the budget cut of start_tok")
        val expectSpan = if (n == 0) 1L else (start + n - 1) / 10 - start / 10 + 1
        assert(span == expectSpan, s"span $span != $expectSpan for n=$n at $start")
        expected + n
      }
    }
  }

  test("packSequences: zero-token docs occupy one sequence and shift nothing") {
    val docs = Seq((1L, 5L), (2L, 0L), (3L, 7L)).toDF("doc_id", "n_tokens")
    val sharded = Packing.shardAssign(docs, "doc_id", nShards = 1)
    val rows = Packing.packSequences(sharded, "n_tokens", budget = 8L)
      .select("doc_id", "n_tokens", "start_tok", "n_seqs_spanned")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.map(_._2).sum == 12L)
    rows.filter(_._2 == 0).foreach { case (_, _, _, span) => assert(span == 1L) }
  }
}
