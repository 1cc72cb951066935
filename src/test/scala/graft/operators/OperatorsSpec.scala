package graft.operators

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("latestByKey keeps the newest row per key with id tiebreak") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), 10L, "a"),
      (1L, ts("2024-01-02 00:00:00"), 11L, "b"),
      (1L, ts("2024-01-02 00:00:00"), 12L, "c"), // same ts, higher id wins
      (2L, ts("2024-01-01 00:00:00"), 13L, "d")
    ).toDF("k", "ts", "id", "v")
    val out = Dedup.latestByKey(df, Seq("k"), "ts", "id")
      .select("k", "v").as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "c", 2L -> "d"))
  }

  test("firstByKey keeps the oldest row per key") {
    val df = Seq(
      (1L, ts("2024-01-03 00:00:00"), 1L, "late"),
      (1L, ts("2024-01-01 00:00:00"), 2L, "early")
    ).toDF("k", "ts", "id", "v")
    assert(Dedup.firstByKey(df, Seq("k"), "ts", "id")
      .select("v").as[String].collect().toSeq == Seq("early"))
  }

  test("exactByCanonicalWords groups word-set-identical docs") {
    val df = Seq(
      (1L, "b a c"), (2L, "a b c"), (3L, "a a b c"), // same word set
      (4L, "a b d")
    ).toDF("doc_id", "text")
    val out = Dedup.exactByCanonicalWords(df, "doc_id", "text")
      .select("doc_id", "n_copies").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 3L, 4L -> 1L)) // min-id winner, 3 copies
  }
}

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  test("matchNext pairs each buy with the earliest strictly-later sell") {
    def ts(s: String) = Timestamp.valueOf(s)
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "buy", 100.0),
      (1L, ts("2024-01-01 11:00:00"), 2L, "sell", 150.0),
      (1L, ts("2024-01-01 12:00:00"), 3L, "buy", 90.0),
      (1L, ts("2024-01-01 13:00:00"), 4L, "sell", 95.0),
      (2L, ts("2024-01-01 10:00:00"), 5L, "buy", 50.0) // no later sell → dropped
    ).toDF("user_id", "ts", "event_id", "side", "value")
    val out = AsOf.matchNext(df, "user_id", "ts", "event_id", "side", "buy", "sell", "value")
      .select("buy_event_id", "sell_event_id", "gain")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 2L, 50.0), (3L, 4L, 5.0)))
  }
}

class MergeSpec extends SparkSpec {
  import spark.implicits._

  test("coalesceMerge updates matched, inserts missing, keeps unmatched") {
    val target = Seq((1L, "alice", 10.0), (2L, "bob", 20.0)).toDF("id0", "name", "bal")
    val source = Seq((2L, 99.0), (3L, 30.0)).toDF("uid", "newbal")
    val out = Merge.coalesceMerge(target, source, "id0", "uid", Map("bal" -> "newbal"))
      .select("id", "name", "bal", "is_new", "updated")
      .as[(Long, Option[String], Double, Boolean, Boolean)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, Some("alice"), 10.0, false, false),
      (2L, Some("bob"), 99.0, false, true),
      (3L, None, 30.0, true, true)))
  }

  test("insertMissing appends only unseen keys") {
    val target = Seq((1L, "a")).toDF("k", "v")
    val source = Seq((1L, "dup"), (2L, "new")).toDF("k", "v")
    val out = Merge.insertMissing(target, source, "k")
      .as[(Long, String)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, "a"), (2L, "new")))
  }
}

class GapsSpec extends SparkSpec {
  import spark.implicits._

  test("missingDates finds calendar holes per key") {
    def ts(s: String) = Timestamp.valueOf(s)
    val df = Seq(
      (1L, ts("2024-01-01 05:00:00")), (1L, ts("2024-01-03 05:00:00")),
      (2L, ts("2024-01-01 05:00:00"))
    ).toDF("k", "ts")
    val out = Gaps.missingDates(df, "k", "ts")
      .select(col("k"), col("day").cast("string")).as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "2024-01-02")))
  }
}

class RankingsSpec extends SparkSpec {
  import spark.implicits._

  test("percentileDisc returns smallest value with cume_dist >= fraction") {
    val df = (1 to 10).map(i => ("g", i.toDouble)).toDF("g", "v")
    // cume_dist(2.0) = 0.2 >= 0.2 → percentile_disc(0.2) = 2.0
    val out = Rankings.percentileDisc(df, Seq("g"), "v", 0.2, "p")
      .select("p").as[Double].collect()
    assert(out.toSeq == Seq(2.0))
  }

  test("topK returns k rows ranked under the total order") {
    val df = Seq(("a", 3.0), ("b", 1.0), ("c", 2.0)).toDF("id0", "score")
    val out = Rankings.topK(df, Seq(col("score").desc, col("id0").asc), 2)
      .select("id0", "rank").as[(String, Int)].collect().toSeq
    assert(out == Seq(("a", 1), ("c", 2)))
  }
}

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  test("sessions split on gaps larger than the threshold") {
    def ts(s: String) = Timestamp.valueOf(s)
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, 1.0),
      (1L, ts("2024-01-01 10:10:00"), 2L, 2.0), // same session (gap 600s)
      (1L, ts("2024-01-01 12:00:00"), 3L, 3.0)  // new session
    ).toDF("user_id", "ts", "event_id", "value")
    val out = Sessionize.sessions(df, "user_id", "ts", "event_id", "value", 1800)
      .select("session_seq", "n_events", "total_value")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 2L, 3.0), (2L, 1L, 3.0)))
  }
}

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("jaccardPairs computes set overlap via co-occurrence") {
    val sets = Seq(("x", 1L), ("x", 2L), ("x", 3L), ("y", 2L), ("y", 3L), ("y", 4L),
      ("z", 9L)).toDF("k", "m")
    val out = Similarity.jaccardPairs(sets, "k", "m")
      .select("key_a", "key_b", "intersection", "jaccard")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(out == Seq(("x", "y", 2L, 0.5))) // |x∩y|=2, |x∪y|=4; z disjoint → absent
  }

  test("minHashNearDups surfaces the planted near-dup with jaccard ~1") {
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, base), (2L, base + " extra"), (3L, (100 to 140).map(i => s"v$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Similarity.minHashNearDups(docs, "doc_id", "text", 3, 12, 3)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSeq
    assert(out.map(p => (p._1, p._2)) == Seq((1L, 2L)))
    assert(out.head._3 > 0.9)
  }

  test("simHash of identical docs is identical, near docs differ in few bits") {
    val docs = Seq((1L, "a b c d e f"), (2L, "a b c d e f"), (3L, "a b c d e g"))
      .toDF("doc_id", "text")
    val sig = Similarity.simHash(docs, "doc_id", "text", 16)
      .select("id", "simhash").as[(Long, Long)].collect().toMap
    assert(sig(1L) == sig(2L))
    assert(java.lang.Long.bitCount(sig(1L) ^ sig(3L)) <= 6)
  }

  test("simHash 16-bit matches a pure-Scala reference construction") {
    // guards the bit_or assembly refactor: OR of distinct powers of two
    // must equal the original SUM form for nBits <= 32
    def md5Hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def ref(text: String): Long = {
      val whs = text.split(" ").distinct.toSeq.map(w => java.lang.Long.parseLong(md5Hex(w).take(4), 16))
      (0 until 16).map { b =>
        val s = whs.map(wh => if (((wh >> b) & 1L) == 1L) 1 else -1).sum
        if (s > 0) 1L << b else 0L
      }.sum
    }
    val texts = Seq("a b c d e f", "the quick brown fox", "x", "dup dup dup word")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val sig = Similarity.simHash(docs, "doc_id", "text", 16)
      .select("id", "simhash").as[(Long, Long)].collect().toMap
    texts.zipWithIndex.foreach { case (t, i) => assert(sig(i.toLong) == ref(t), s"doc $i") }
  }

  test("simHash 64-bit exercises high bits safely and preserves near-dup structure") {
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val docs = Seq((1L, base), (2L, base), (3L, base + " changed"),
      (4L, (200 to 260).map(i => s"other$i").mkString(" "))).toDF("doc_id", "text")
    val sig = Similarity.simHash(docs, "doc_id", "text", 64)
      .select("id", "simhash").as[(Long, Long)].collect().toMap
    assert(sig(1L) == sig(2L))
    assert(java.lang.Long.bitCount(sig(1L) ^ sig(3L)) <= 8)
    assert(java.lang.Long.bitCount(sig(1L) ^ sig(4L)) > 8)
    // sign-bit determinism: a single-word doc's 64-bit signature is exactly
    // xxhash64(word) (each bit's lone contribution is +1 iff the hash bit is
    // set), including words whose hash is negative (bit 63 set) — the case
    // the old sum-based assembly corrupted.
    val words = (1 to 40).map(i => s"w$i")
    val hashes = words.map(w => w -> Seq(w).toDF("x")
      .select(xxhash64(col("x"))).as[Long].head()).toMap
    assert(hashes.values.exists(_ < 0L), "test needs at least one negative hash")
    val single = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val ssig = Similarity.simHash(single, "doc_id", "text", 64)
      .select("id", "simhash").as[(Long, Long)].collect().toMap
    words.zipWithIndex.foreach { case (w, i) => assert(ssig(i.toLong) == hashes(w), s"word $w") }
  }

  test("simHashNearDups64 finds planted near-dups, excludes distant docs") {
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val docs = Seq((1L, base), (2L, base + " changed"),
      (3L, (200 to 260).map(i => s"other$i").mkString(" "))).toDF("doc_id", "text")
    val out = Similarity.simHashNearDups64(docs, "doc_id", "text", maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSeq
    val ham = Similarity.simHash(docs, "doc_id", "text", 64)
      .select("id", "simhash").as[(Long, Long)].collect().toMap
    val within = java.lang.Long.bitCount(ham(1L) ^ ham(2L)) <= 3
    assert(out.contains((1L, 2L)) == within) // blocking is exact: pair iff hamming <= 3
    assert(!out.exists(p => p._2 == 3L || p._1 == 3L))
  }

  test("cosineTopK ranks neighbors by cosine with id tiebreak") {
    val e = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)), (3L, Array(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.cosineTopK(e.where(col("vec_id") === 1), e, "vec_id", "embedding", 2)
      .select("neighbor_id", "rank").as[(Long, Int)].collect().sortBy(_._2)
    assert(out.toSeq == Seq((2L, 1), (3L, 2)))
  }

  test("nearDupSRP only pairs vectors sharing the SRP bucket") {
    val e = Seq(
      (1L, Array(1.0f, 0.01f), "b"), (2L, Array(1.0f, 0.02f), "b"),
      (3L, Array(-1.0f, -0.01f), "b")
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.nearDupSRP(e, "vec_id", "embedding", "label", 0.9, 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L))) // 3 is antipodal → different bucket
  }
}

class MultimodalSpec extends SparkSpec {

  test("decodeStub yields deterministic typed features partition-wise") {
    import spark.implicits._
    val docs = Seq((1L, "hello world"), (2L, "x")).toDF("doc_id", "text").repartition(2)
    val out = Multimodal.decodeStub(spark, Multimodal.withPayload(docs, "doc_id", "text"))
      .collect().sortBy(_.doc_id)
    assert(out.map(_.n_bytes).toSeq == Seq(11L, 1L))
    assert(out.forall(f => f.width >= 0 && f.width < 1280 && f.height >= 0 && f.height < 720))
    // deterministic: same content → same hash-derived features
    val again = Multimodal.decodeStub(spark, Multimodal.withPayload(docs, "doc_id", "text"))
      .collect().sortBy(_.doc_id)
    assert(out.toSeq == again.toSeq)
  }

  test("frameSamplePlan emits every stride-th frame") {
    import spark.implicits._
    val f = Seq((1L, 10L)).toDF("doc_id", "n_frames")
    val out = Multimodal.frameSamplePlan(f, 4).select("sampled_frames")
      .as[Seq[Long]].collect().head
    assert(out == Seq(0L, 4L, 8L))
  }
}

class IvfSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions.col

  test("ivfTopK finds in-cluster neighbors through centroid probing") {
    // two tight clusters around (1,0) and (0,1); ids interleaved so the
    // seed centroids (lowest ids) land one in each cluster
    val vecs = Seq(
      (0L, Array(1.0f, 0.00f)), (1L, Array(0.00f, 1.0f)),
      (2L, Array(1.0f, 0.05f)), (3L, Array(0.05f, 1.0f)),
      (4L, Array(1.0f, 0.10f)), (5L, Array(0.10f, 1.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.ivfTopK(vecs.where(col("vec_id") === 0), vecs,
      "vec_id", "embedding", k = 2, numCentroids = 2, nProbe = 1)
      .select("neighbor_id", "rank").as[(Long, Int)].collect().sortBy(_._2)
    // probing only cluster-0's list: neighbors are 2 and 4, never 1/3/5
    assert(out.toSeq == Seq((2L, 1), (4L, 2)))
  }

  test("ivfTopK with full probing matches brute-force cosineTopK") {
    val vecs = (0L to 19L).map(i =>
      (i, Array((math.cos(i * 0.3)).toFloat, (math.sin(i * 0.3)).toFloat))).toDF("vec_id", "embedding")
    val q = vecs.where(col("vec_id") < 3)
    val ivf = Similarity.ivfTopK(q, vecs, "vec_id", "embedding", 3, 4, 4)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect().toSet
    val brute = Similarity.cosineTopK(q, vecs, "vec_id", "embedding", 3)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(ivf == brute) // nProbe = numCentroids → exact
  }
}

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  test("dedupByIdWithinWatermark drops re-deliveries of the same id") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    val input = MemoryStream[(java.sql.Timestamp, Long)]
    val df = input.toDF().toDF("ts", "event_id")
    val q = graft.streaming.StreamOps.dedupByIdWithinWatermark(df, "ts", "event_id", "1 hour")
      .writeStream.format("memory").queryName("dedup").outputMode(OutputMode.Append).start()
    try {
      def t(s: String) = java.sql.Timestamp.valueOf(s)
      input.addData((t("2024-01-01 10:00:00"), 1L), (t("2024-01-01 10:00:01"), 2L))
      q.processAllAvailable()
      input.addData((t("2024-01-01 10:00:00"), 1L)) // duplicate delivery
      q.processAllAvailable()
      assert(spark.table("dedup").count() == 2)
    } finally q.stop()
  }
}

class AsOfNativeSpec extends SparkSpec {
  import spark.implicits._

  test("matchNextNative equals composed matchNext on the real events table") {
    val ev = graft.sources.Tables(spark, "/root/testdata/sf0.001").events
    val cols = Seq("user_id", "buy_event_id", "sell_event_id", "gain")
    val composed = AsOf.matchNext(ev, "user_id", "ts", "event_id",
      "event_type", "purchase", "view", "value")
      .select(cols.head, cols.tail: _*).collect().map(_.toSeq).toSet
    val native = AsOf.matchNextNative(ev, "user_id", "ts", "event_id",
      "event_type", "purchase", "view", "value")
      .select(cols.head, cols.tail: _*).collect().map(_.toSeq).toSet
    assert(native == composed)
    assert(native.nonEmpty)
  }

  test("matchNextNative basic semantics incl. multi-buy -> one sell") {
    def ts(s: String) = Timestamp.valueOf(s)
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "buy", 10.0),
      (1L, ts("2024-01-01 10:30:00"), 2L, "buy", 20.0),
      (1L, ts("2024-01-01 11:00:00"), 3L, "sell", 50.0), // matches both buys
      (2L, ts("2024-01-01 09:00:00"), 4L, "sell", 1.0),  // before any buy
      (2L, ts("2024-01-01 10:00:00"), 5L, "buy", 2.0)    // no later sell
    ).toDF("user_id", "ts", "event_id", "side", "value")
    val out = AsOf.matchNextNative(df, "user_id", "ts", "event_id", "side", "buy", "sell", "value")
      .select("buy_event_id", "sell_event_id").as[(Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 3L), (2L, 3L)))
  }
}
