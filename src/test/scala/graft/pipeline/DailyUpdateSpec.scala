package graft.pipeline

import java.nio.file.Files

import graft.SparkSpec

class DailyUpdateSpec extends SparkSpec {

  test("full daily chain runs end-to-end and is idempotent") {
    val out = Files.createTempDirectory("graft-daily").toString
    val counts = DailyUpdate.run(spark, "/root/testdata/sf0.001", out)
    val expectNonEmpty = DailyUpdate.stages.map(_._1).toSet
    expectNonEmpty.foreach { t =>
      assert(counts.getOrElse(t, 0L) > 0L, s"table $t should be non-empty")
    }
    // second run: incremental fact load sees no new rows; derived tables
    // overwrite in place; counts identical
    val counts2 = DailyUpdate.run(spark, "/root/testdata/sf0.001", out)
    assert(counts2 == counts)
  }

  test("backfillDates recomputes only missing partitions, never present ones") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val target = Files.createTempDirectory("graft-backfill").toString + "/t"
    def frame(v: String) = Seq(
      ("2024-01-01", 1L), ("2024-01-02", 2L), ("2024-01-03", 3L), ("2024-01-05", 5L)
    ).toDF("ds", "x").select(to_date($"ds").as("d"), $"x", lit(v).as("tag"))
    // seed the target with days 1 and 2 tagged "orig"
    graft.sources.Formats.writePartitioned(
      frame("orig").where($"d" < "2024-01-03"), target, Seq("d"))
    // backfill from a source tagged "fill": must add days 3 and 5 only
    val filled = DailyUpdate.backfillDates(spark, frame("fill"), "d", target)
    assert(filled.map(_.toString) == Seq("2024-01-03", "2024-01-05"))
    val byDay = spark.read.parquet(target).select($"d".cast("string"), $"tag")
      .as[(String, String)].collect().toMap
    assert(byDay == Map("2024-01-01" -> "orig", "2024-01-02" -> "orig",
      "2024-01-03" -> "fill", "2024-01-05" -> "fill"))
    // idempotent: nothing missing on re-run
    assert(DailyUpdate.backfillDates(spark, frame("again"), "d", target).isEmpty)
  }
}
