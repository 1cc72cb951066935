package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Pins the LATE-DATA drop rule q87's oracle encodes: a watermarked
  * windowed aggregation drops an out-of-order row iff its WINDOW END is
  * <= the current watermark — NOT iff its event time is behind the
  * watermark. A row landing inside the watermark's own (still-open) hour
  * window is accepted even though its timestamp is "late". Spark keys the
  * late-row predicate on the aggregation's event-time column, which after
  * window() is the window struct, so the comparison is against window.end
  * (observed empirically; this spec fails if an upgrade changes the rule,
  * which would silently shift q87's oracle).
  */
class LateDataRuleSpec extends SparkSpec {
  import spark.implicits._

  test("windowed agg drops a late row iff its window end <= watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val out = StreamOps.windowedRollup(
      input.toDF().toDF("ts", "event_type", "value"),
      "ts", "event_type", "value", "1 hour", "10 seconds")
    val dir = java.nio.file.Files.createTempDirectory("graft-laterule").toString
    val q = out.writeStream
      .option("checkpointLocation", s"$dir/ckpt")
      .outputMode(OutputMode.Append)
      .format("parquet").option("path", s"$dir/rollup")
      .start()
    // instants, not Timestamp.valueOf: valueOf parses in the JVM default
    // zone while the assertions render in the session's UTC — the spec
    // must not depend on a UTC-defaulted host
    def t(h: Int, m: Int) =
      Timestamp.from(java.time.Instant.parse(f"2024-01-01T$h%02d:$m%02d:00Z"))
    try {
      // batch 1: events at 01:10 and 03:50 → watermark after batch = 03:49:50
      input.addData((t(1, 10), "a", 1.0), (t(3, 50), "a", 1.0))
      q.processAllAvailable()
      // batch 2, both rows out of order vs watermark 03:49:50:
      //  (02:10) window [02:00,03:00): end <= wm AND ts < wm → dropped either way
      //  (03:10) window [03:00,04:00): end >  wm BUT ts < wm → the
      //          discriminating row: kept under the window-end rule
      input.addData((t(2, 10), "b", 1.0), (t(3, 10), "b", 1.0))
      q.processAllAvailable()
      // two sentinel advances flush every real window
      input.addData((Timestamp.from(java.time.Instant.parse("2024-01-02T12:00:00Z")), "s", 0.0))
      q.processAllAvailable()
      input.addData((Timestamp.from(java.time.Instant.parse("2024-01-02T13:00:00Z")), "s", 0.0))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.read.parquet(s"$dir/rollup")
      .where($"event_type" =!= "s")
      .select($"window_start".cast("string"), $"event_type", $"n_events")
      .as[(String, String, Long)].collect().toSet
    assert(rows == Set(
      ("2024-01-01 01:00:00", "a", 1L),
      ("2024-01-01 03:00:00", "a", 1L),
      ("2024-01-01 03:00:00", "b", 1L))) // 02:10 dropped, 03:10 accepted
  }
}
