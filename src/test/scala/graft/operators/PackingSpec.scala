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

  test("packSequences cuts are bit-exact past 2^53 (integer div, not double)") {
    // stream offset 2^53 + 1 is NOT representable as a double: the old
    // `(start_tok / budget).cast("long")` rounded it to 2^53 first, and
    // with budget 3 that misplaces the cut by one sequence (2^53 ≡ 2,
    // 2^53+1 ≡ 0 mod 3). Integer `div` must agree with BigInt arithmetic.
    val big = (1L << 53) + 1L
    val sharded = Seq((0, 0, big), (0, 1, 10L), (0, 2, 0L))
      .toDF("shard", "pos", "n_tokens")
    val rows = Packing.packSequences(sharded, "n_tokens", budget = 3L)
      .select("pos", "n_tokens", "start_tok", "seq_id", "n_seqs_spanned")
      .as[(Int, Long, Long, Long, Long)].collect().sortBy(_._1)
    rows.foreach { case (_, n, start, seq, span) =>
      val exactSeq = (BigInt(start) / 3).toLong
      assert(seq == exactSeq, s"seq_id $seq != exact $exactSeq at offset $start")
      val exactSpan =
        if (n == 0) 1L else ((BigInt(start) + n - 1) / 3 - BigInt(start) / 3 + 1).toLong
      assert(span == exactSpan, s"span $span != exact $exactSpan")
    }
    assert(rows.map(_._3).toSeq == Seq(0L, big, big + 10L))
  }

  test("packWrite materializes full sequences: budget tokens everywhere but the tail") {
    val docs = (1L to 300L).map(i => (i, (i % 11) * 2)).toDF("doc_id", "n_tokens")
    val sharded = Packing.shardAssign(docs, "doc_id", nShards = 3)
    val packed = Packing.packSequences(sharded, "n_tokens", budget = 16L)
    val seqs = Packing.packWrite(packed, "doc_id", "n_tokens", budget = 16L)
      .select("shard", "seq_id", "n_slices", "seq_tokens")
      .as[(Int, Long, Long, Long)].collect()
    // per shard: seq_ids are dense 0..max, every sequence carries exactly
    // the budget except the single tail, and totals telescope to the shard
    val tokensByShard = packed.groupBy("shard").agg(sum("n_tokens").as("t"))
      .as[(Int, Long)].collect().toMap
    seqs.groupBy(_._1).foreach { case (shard, rows) =>
      val ids = rows.map(_._2).sorted
      assert(ids.toSeq == (0L until ids.length))
      val tail = rows.maxBy(_._2)
      rows.filterNot(_ == tail).foreach { case (_, sid, _, tok) =>
        assert(tok == 16L, s"non-tail sequence $sid in shard $shard has $tok tokens")
      }
      assert(rows.map(_._4).sum == tokensByShard(shard))
    }
  }

  test("packWrite slices concatenate back to each doc") {
    val docs = (1L to 120L).map(i => (i, i % 37)).toDF("doc_id", "n_tokens")
    val sharded = Packing.shardAssign(docs, "doc_id", nShards = 2)
    val packed = Packing.packSequences(sharded, "n_tokens", budget = 10L)
    // re-derive the slice explode exactly as packWrite does, but keep the
    // per-doc view: slice lengths must sum to n_tokens, offsets must be
    // contiguous from 0
    val slices = packed
      .select(col("doc_id"), col("n_tokens"), col("start_tok"),
        col("seq_id").as("__seq0"),
        explode(sequence(lit(0L), col("n_seqs_spanned") - 1)).as("__s"))
      .withColumn("seq", col("__seq0") + col("__s"))
      .withColumn("frm", greatest(col("start_tok"), col("seq") * 10))
      .withColumn("til", least(col("start_tok") + col("n_tokens"), (col("seq") + 1) * 10))
      .select(col("doc_id"), col("n_tokens"),
        (col("frm") - col("start_tok")).as("off"), (col("til") - col("frm")).as("len"))
      .as[(Long, Long, Long, Long)].collect()
    slices.groupBy(_._1).foreach { case (doc, rows) =>
      val n = rows.head._2
      assert(rows.map(_._4).sum == n, s"doc $doc slices don't sum to $n")
      val ordered = rows.sortBy(_._3)
      ordered.foldLeft(0L) { case (expected, (_, _, off, len)) =>
        assert(off == expected, s"doc $doc slice gap at offset $off")
        off + len
      }
    }
  }

  test("chunkDocs covers every token; overlap is width minus stride; tails short") {
    val docs = Seq(
      (1L, (1 to 100).map(i => s"t$i").mkString(" ")), // 100 words
      (2L, "a b c"),                                   // shorter than one window
      (3L, (1 to 64).map(i => s"u$i").mkString(" "))   // exactly one window
    ).toDF("doc_id", "text")
    val rows = Packing.chunkDocs(docs, "doc_id", "text", width = 64, stride = 32)
      .select($"doc_id", $"chunk_idx", $"first_tok", $"n_tokens", $"chunk_text")
      .as[(Long, Int, Long, Long, String)].collect()
    val byDoc = rows.groupBy(_._1)
    // doc 1: chunks at 0, 32, 64 (wait: nc = ceil(36/32)+1 = 3) → tails
    val d1 = byDoc(1L).sortBy(_._2)
    assert(d1.map(r => (r._3, r._4)).toSeq == Seq((0L, 64L), (32L, 64L), (64L, 36L)))
    // every chunk's text is exactly its token slice
    d1.foreach { case (_, _, first, n, text) =>
      val expect = (first + 1 to first + n).map(i => s"t$i").mkString(" ")
      assert(text == expect)
    }
    // chunk starts advance by stride → consecutive chunks overlap 64-32 tokens
    assert(byDoc(2L).map(r => (r._2, r._3, r._4)).toSeq == Seq((0, 0L, 3L)))
    assert(byDoc(3L).map(r => (r._2, r._3, r._4)).toSeq == Seq((0, 0L, 64L)))
    // full coverage: last chunk reaches the end of each doc
    byDoc.foreach { case (_, cs) =>
      val last = cs.maxBy(_._2)
      val total = cs.head._1 match { case 1L => 100L; case 2L => 3L; case _ => 64L }
      assert(last._3 + last._4 == total)
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
