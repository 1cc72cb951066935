package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("intervalLookup resolves the dim row valid at each fact timestamp") {
    // user 1: tier changes at 2024-01-10 (closed interval then open);
    // user 2: single open interval; user 3: no dim rows at all
    val dim = Seq(
      (1L, "low", ts("2024-01-01 00:00:00"), Some(ts("2024-01-10 00:00:00"))),
      (1L, "high", ts("2024-01-10 00:00:00"), None),
      (2L, "mid", ts("2024-01-05 00:00:00"), None)
    ).toDF("user_id", "tier", "started_at", "ended_at")
    val facts = Seq(
      (100L, 1L, ts("2024-01-03 12:00:00")), // inside closed interval
      (101L, 1L, ts("2024-01-10 00:00:00")), // boundary: start of next (half-open)
      (102L, 1L, ts("2023-12-25 00:00:00")), // before first interval
      (103L, 2L, ts("2024-02-01 00:00:00")), // open interval
      (104L, 3L, ts("2024-01-15 00:00:00"))  // key absent from dim
    ).toDF("event_id", "user_id", "ts")
    val out = Temporal.intervalLookup(facts, dim, "user_id", "ts",
        "started_at", "ended_at")
      .select($"event_id", $"tier").as[(Long, Option[String])].collect().toMap
    assert(out == Map(
      100L -> Some("low"), 101L -> Some("high"), 102L -> None,
      103L -> Some("mid"), 104L -> None))
    // disjoint intervals → exactly one output row per fact row
    assert(out.size == 5)
  }
}

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("stageTimes requires each stage strictly after the previous one") {
    val ev = Seq(
      // user 1: full ordered funnel
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 11:00:00"), "click"),
      (1L, ts("2024-01-01 12:00:00"), "purchase"),
      // user 2: purchase BEFORE click → stage 3 not reached
      (2L, ts("2024-01-01 10:00:00"), "view"),
      (2L, ts("2024-01-01 10:30:00"), "purchase"),
      (2L, ts("2024-01-01 11:00:00"), "click"),
      // user 3: click but never viewed → no stages at all
      (3L, ts("2024-01-01 10:00:00"), "click"),
      // user 4: equal timestamps do NOT satisfy the strict order
      (4L, ts("2024-01-01 10:00:00"), "view"),
      (4L, ts("2024-01-01 10:00:00"), "click")
    ).toDF("user_id", "ts", "event_type")
    val out = Funnel.stageTimes(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .select($"user_id", $"ts_view".isNotNull, $"ts_click".isNotNull,
        $"ts_purchase".isNotNull)
      .as[(Long, Boolean, Boolean, Boolean)].collect().toSet
    assert(out == Set(
      (1L, true, true, true),
      (2L, true, true, false),
      (3L, false, false, false),
      (4L, true, false, false)))
  }
}

class FuzzySpec extends SparkSpec {
  import spark.implicits._

  test("blockedLevenshtein pairs only inside the block, bounded by maxDist") {
    val df = Seq(
      (1L, "alpha", "x"), (2L, "alphb", "x"),   // distance 1, same block
      (3L, "alpha", "y"),                        // identical to 1 but other block
      (4L, "zzzzz", "x")                         // distance 4 from alpha
    ).toDF("id", "name", "grp")
    val out = Fuzzy.blockedLevenshtein(df, "id", "name", "grp", maxDist = 2)
      .select($"id_a", $"id_b", $"distance").as[(Long, Long, Int)].collect().toSet
    assert(out == Set((1L, 2L, 1)))
  }

  test("blockedLevenshtein: len-diff == maxDist pairs kept, > maxDist out, exactly once (r14)") {
    // lengths 5 vs 7 with maxDist=2: len-diff == maxDist exactly — any
    // length-based pre-filter (the r14 band experiment was measured and
    // rejected, see Fuzzy.scala) must keep this pair. Pins exactly-once
    // emission and that a len-diff-3 pair stays out.
    val df = Seq(
      (1L, "aaaaa", "x"), (2L, "aaaaaxy", "x"),   // lens 5,7 — dist 2, bands 1,2
      (3L, "aaaaaxyz", "x"),                       // len 8 — dist 3 from id 1
      (4L, "aaaaa", "x")                           // dup of 1: dist 0, same band
    ).toDF("id", "name", "grp")
    val out = Fuzzy.blockedLevenshtein(df, "id", "name", "grp", maxDist = 2)
      .select($"id_a", $"id_b", $"distance").as[(Long, Long, Int)].collect().toSeq
    assert(out.size == out.toSet.size, s"duplicated pair rows: $out")
    assert(out.toSet == Set((1L, 2L, 2), (1L, 4L, 0), (2L, 3L, 1), (2L, 4L, 2)))
  }

  test("symDeleteLevenshtein finds insert/delete/substitute pairs and dup groups") {
    val df = Seq(
      (1L, "alpha", "x"), (2L, "alphb", "x"),   // substitution, distance 1
      (3L, "alpha", "x"),                        // exact duplicate of 1
      (4L, "alphaZ", "x"), (5L, "alph", "x"),    // insertion / deletion vs alpha
      (6L, "alpha", "y"),                        // other block
      (7L, "zzzzz", "x"),                        // far from everything
      (8L, "ab", "x"), (9L, "", "x")             // short strings, distance 2
    ).toDF("id", "name", "grp")
    val fast = Fuzzy.symDeleteLevenshtein(df, "id", "name", "grp", maxDist = 2)
      .select($"id_a", $"id_b", $"distance").as[(Long, Long, Int)].collect().toSet
    val brute = Fuzzy.blockedLevenshtein(df, "id", "name", "grp", maxDist = 2)
      .select($"id_a", $"id_b", $"distance").as[(Long, Long, Int)].collect().toSet
    assert(fast == brute)
    assert(fast.contains((1L, 3L, 0)) && fast.contains((1L, 2L, 1)) &&
      fast.contains((8L, 9L, 2)))
  }

  test("symDeleteLevenshtein drops null strings/blocks exactly like the square") {
    val df = Seq(
      (1L, Some("alpha"), Some("x")), (2L, Some("alpha"), Some("x")),
      (3L, None, Some("x")), (4L, None, Some("x")),        // null strings
      (5L, Some("alpha"), None), (6L, Some("alpha"), None) // null blocks
    ).toDF("id", "name", "grp")
    val fast = Fuzzy.symDeleteLevenshtein(df, "id", "name", "grp", maxDist = 2)
      .select($"id_a", $"id_b", $"distance").as[(Long, Long, Int)].collect().toSet
    val brute = Fuzzy.blockedLevenshtein(df, "id", "name", "grp", maxDist = 2)
      .select($"id_a", $"id_b", $"distance").as[(Long, Long, Int)].collect().toSet
    assert(fast == brute && fast == Set((1L, 2L, 0)))
  }

  test("adaptiveLevenshtein picks either path without changing the pair set") {
    val df = (1L to 40L).map(i => (i, s"name${i % 7}", "b")).toDF("id", "name", "grp")
    val cols = Seq($"id_a", $"id_b", $"distance")
    val viaSquare = Fuzzy.adaptiveLevenshtein(df, "id", "name", "grp", 2,
      squareMaxBlock = 1000L).select(cols: _*).as[(Long, Long, Int)].collect().toSet
    val viaSymDel = Fuzzy.adaptiveLevenshtein(df, "id", "name", "grp", 2,
      squareMaxBlock = 0L).select(cols: _*).as[(Long, Long, Int)].collect().toSet
    assert(viaSquare == viaSymDel && viaSquare.nonEmpty)
  }

  test("property: the dispatch boundary itself is invisible in the output") {
    // Generative guard on the dispatcher's comparison (maxBlock <=
    // squareMaxBlock → square): for random string sets, run the SAME
    // call with the threshold one below, exactly at, and one above the
    // measured largest block — the dispatcher flips paths across that
    // range, and every variant must equal the brute-force square. A
    // refactor inverting the comparison (or measuring the wrong side)
    // changes which engine runs at the boundary; this fails only if the
    // two engines ever disagree, which is the property that matters.
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = for {
      n <- Gen.choose(2, 24)
      strs <- Gen.listOfN(n, Gen.listOfN(4, Gen.oneOf("a", "b", "c")).map(_.mkString))
      blocks <- Gen.listOfN(n, Gen.oneOf("x", "y"))
    } yield strs.zip(blocks).zipWithIndex.map { case ((s0, b), i) => (i.toLong, s0, b) }
    (1 to 8).foreach { seed =>
      val rows = gen(Gen.Parameters.default, Seed(seed.toLong)).getOrElse(Nil)
      val df = rows.toDF("id", "name", "grp")
      val maxBlock = rows.groupBy(_._3).values.map(_.size).max.toLong
      val cols = Seq($"id_a", $"id_b", $"distance")
      val brute = Fuzzy.blockedLevenshtein(df, "id", "name", "grp", maxDist = 2)
        .select(cols: _*).as[(Long, Long, Int)].collect().toSet
      Seq(maxBlock - 1, maxBlock, maxBlock + 1).foreach { threshold =>
        val out = Fuzzy.adaptiveLevenshtein(df, "id", "name", "grp", maxDist = 2,
          squareMaxBlock = threshold).select(cols: _*).as[(Long, Long, Int)].collect().toSet
        assert(out == brute, s"seed=$seed threshold=$threshold maxBlock=$maxBlock")
      }
    }
  }
}

class MultimodalChunkSpec extends SparkSpec {
  import spark.implicits._

  test("explodeFrames slices exact fixed-size frames with a short tail") {
    val df = Multimodal.withPayload(
      Seq((1L, "abcdefgh"), (2L, "xy"), (3L, "")).toDF("doc_id", "text"),
      "doc_id", "text")
    val out = Multimodal.explodeFrames(df, frameBytes = 3)
      .select($"doc_id", $"frame_idx", $"frame".cast("string"))
      .as[(Long, Int, String)].collect().toSet
    assert(out == Set(
      (1L, 0, "abc"), (1L, 1, "def"), (1L, 2, "gh"),
      (2L, 0, "xy"))) // doc 3 (empty payload) emits no frames
  }

  test("slidingWindows overlap by width - hop") {
    val df = Multimodal.withPayload(
      Seq((1L, "abcdef")).toDF("doc_id", "text"), "doc_id", "text")
    val out = Multimodal.slidingWindows(df, width = 4, hop = 2)
      .select($"window_idx", $"window".cast("string"))
      .as[(Int, String)].collect().toSet
    assert(out == Set((0, "abcd"), (1, "cdef"), (2, "ef")))
  }
}

class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  test("ngramOverlap counts distinct shared trigrams against the eval set") {
    val eval = Seq((900L, "alpha beta gamma delta")).toDF("doc_id", "text")
    // doc 1: trigrams {alpha beta gamma, beta gamma delta} — both shared;
    // doc 2: one of three trigrams shared; doc 3: nothing shared;
    // doc 4: under 3 words → no trigrams → absent from the output
    val train = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "x alpha beta gamma y"),
      (3L, "one two three four"),
      (4L, "too short")
    ).toDF("doc_id", "text")
    val out = Decontaminate.ngramOverlap(train, eval, "doc_id", "text",
        n = 3, minRatio = 0.5)
      .select($"doc_id", $"n_ngrams", $"n_shared", $"flagged")
      .as[(Long, Long, Long, Boolean)].collect().toSet
    assert(out == Set(
      (1L, 2L, 2L, true),   // ratio 1.0
      (2L, 3L, 1L, false),  // ratio 0.333
      (3L, 2L, 0L, false)))
  }
}
