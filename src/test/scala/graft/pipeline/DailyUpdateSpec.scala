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
}
