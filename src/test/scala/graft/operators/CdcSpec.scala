package graft.operators

import java.sql.Timestamp

class CdcSpec extends graft.SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("applyChangeLog: upsert, insert, passthrough, and tombstone paths") {
    val snapshot = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("id", "worth")
    val log = Seq(
      // key 1: updated twice, latest wins
      (1L, 11.0, "U", ts("2024-01-01 10:00:00"), 100L),
      (1L, 12.0, "U", ts("2024-01-01 11:00:00"), 101L),
      // key 2: updated then tombstoned
      (2L, 21.0, "U", ts("2024-01-01 10:00:00"), 102L),
      (2L, 0.0, "D", ts("2024-01-01 11:00:00"), 103L),
      // key 4: log-only insert
      (4L, 40.0, "U", ts("2024-01-01 10:00:00"), 104L),
      // key 5: log-only, terminally tombstoned -> never appears
      (5L, 50.0, "U", ts("2024-01-01 10:00:00"), 105L),
      (5L, 0.0, "D", ts("2024-01-01 10:30:00"), 106L)
    ).toDF("id", "worth", "op", "ts", "event_id")
    val out = Merge.applyChangeLog(snapshot, log, "id", "ts", "event_id", "op")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("worth")).toMap
    assert(out == Map(1L -> 12.0, 3L -> 30.0, 4L -> 40.0))
  }

  test("applyChangeLog: a tombstone overridden by a later upsert resurrects the key") {
    val snapshot = Seq((1L, 10.0)).toDF("id", "worth")
    val log = Seq(
      (1L, 0.0, "D", ts("2024-01-01 10:00:00"), 1L),
      (1L, 99.0, "U", ts("2024-01-01 11:00:00"), 2L)
    ).toDF("id", "worth", "op", "ts", "event_id")
    val out = Merge.applyChangeLog(snapshot, log, "id", "ts", "event_id", "op")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("worth")).toMap
    assert(out == Map(1L -> 99.0))
  }

  test("applyChangeLog: same-timestamp ties break on the sequence column") {
    val snapshot = Seq((1L, 10.0)).toDF("id", "worth")
    val t0 = ts("2024-01-01 10:00:00")
    val log = Seq((1L, 1.0, "U", t0, 1L), (1L, 2.0, "U", t0, 2L))
      .toDF("id", "worth", "op", "ts", "event_id")
    val out = Merge.applyChangeLog(snapshot, log, "id", "ts", "event_id", "op")
      .collect().map(r => r.getAs[Double]("worth"))
    assert(out.toSeq == Seq(2.0))
  }
}
