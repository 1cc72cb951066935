package graft.operators

import java.sql.Timestamp

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Generative invariants over random event sets — the cases fixed
  * fixtures miss (repeated keys, bursts, empty sides, ordering edges).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  // (user, secondsOffset, side, value); the tiny offset range forces
  // frequent equal-timestamp collisions (including buy/sell ties within
  // a user), which the tie-aware native as-of join must resolve exactly
  // like the following-rows window of the composed form.
  private val eventsGen: Gen[List[(Long, Int, String, Double)]] = for {
    n <- Gen.choose(0, 40)
    users <- Gen.listOfN(n, Gen.choose(1L, 4L))
    offsets <- Gen.listOfN(n, Gen.choose(0, 15))
    sides <- Gen.listOfN(n, Gen.oneOf("buy", "sell"))
    values <- Gen.listOfN(n, Gen.choose(1, 500).map(_.toDouble))
  } yield users.lazyZip(offsets).lazyZip(sides).lazyZip(values).toList

  private def toDf(events: List[(Long, Int, String, Double)]) =
    events.zipWithIndex.map { case ((u, off, side, v), i) =>
      (u, new Timestamp(1700000000000L + off * 1000L), i.toLong, side, v)
    }.toDF("user_id", "ts", "event_id", "side", "value")

  // deterministic Gen sampling (scalatestplus bridge not available offline)
  private def samples(n: Int): Seq[List[(Long, Int, String, Double)]] =
    (1 to n).map(i => eventsGen(Gen.Parameters.default, Seed(i.toLong)).getOrElse(Nil))

  test("property: native as-of join = composed window form on random event sets") {
    samples(15).foreach { events =>
      val df = toDf(events)
      val cols = Seq("user_id", "buy_event_id", "sell_event_id", "gain")
      val composed = AsOf.matchNext(df, "user_id", "ts", "event_id", "side", "buy", "sell", "value")
        .select(cols.head, cols.tail: _*).collect().map(_.toSeq).toSet
      val native = AsOf.matchNextNative(df, "user_id", "ts", "event_id", "side", "buy", "sell", "value")
        .select(cols.head, cols.tail: _*).collect().map(_.toSeq).toSet
      assert(native == composed)
    }
  }

  test("property: sessions partition the events exactly") {
    samples(10).foreach { events =>
      val df = toDf(events)
      val sessions = Sessionize.sessions(df, "user_id", "ts", "event_id", "value", 600)
        .select("n_events", "total_value").as[(Long, Double)].collect()
      assert(sessions.map(_._1).sum == events.length) // every event in exactly one session
      val totV = events.map(_._4).sum
      assert(math.abs(sessions.map(_._2).sum - totV) < 1e-6)
    }
  }

  test("property: saltedSum = plain rollup on random values") {
    samples(10).filter(_.nonEmpty).foreach { events =>
      {
        val df = toDf(events)
        val salted = Skew.saltedSum(df, Seq("side"), "value", 8)
          .select("side", "n_rows").as[(String, Long)].collect().toMap
        val plain = df.groupBy("side").count().as[(String, Long)].collect().toMap
        assert(salted == plain)
      }
    }
  }

  test("property: connectedComponents = sequential union-find on random graphs") {
    val edgeGen: Gen[List[(Long, Long)]] = for {
      n <- Gen.choose(0, 40)
      as <- Gen.listOfN(n, Gen.choose(1L, 25L))
      bs <- Gen.listOfN(n, Gen.choose(1L, 25L))
    } yield as.zip(bs).filter { case (a, b) => a != b }
    (1 to 12).map(i => edgeGen(Gen.Parameters.default, Seed(100L + i)).getOrElse(Nil))
      .foreach { edges =>
        // reference: plain driver-side union-find with path compression
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
        // normalize: component id = min node of the set, as the operator promises
        val byRoot = nodes.groupBy(find)
        val expected = byRoot.values.flatMap(g => g.map(_ -> g.min)).toMap
        val got = Dedup.connectedComponents(edges.toDF("a", "b"), "a", "b")
          .as[(Long, Long)].collect().toMap
        assert(got == expected, s"edges=$edges")
      }
  }
}
