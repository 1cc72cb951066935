package graft.operators

import graft.SparkSpec
import graft.queries.GateQueries

class GateQueriesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q67: every sketch estimate lands inside its documented bound") {
    val rows = GateQueries.queries("q67_sketch_accuracy")(spark, sf)
      .collect()
    // 5 event types + 20 sources + 10 top words
    assert(rows.length == 35, s"expected 35 audit rows, got ${rows.length}")
    val out = rows.map(r => (r.getString(0), r.getString(1), r.getBoolean(3)))
    assert(out.forall(_._3), s"bound violations: ${out.filterNot(_._3).mkString(", ")}")
    assert(out.map(_._1).distinct.sorted.toSeq ==
      Seq("cms_topk", "gk_percentile", "hll_distinct"))
  }

  test("q68: imageio recovers the encoded dimensions and format from raw bytes") {
    val rows = GateQueries.queries("q68_image_decode")(spark, sf).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val (id, fmt, w, h, ok) =
        (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3), r.getBoolean(4))
      assert(ok, s"doc $id fell back to the stub")
      assert(fmt == (if (id % 2 == 0) "png" else "bmp"), s"doc $id format $fmt")
      assert(w == 8 + (id % 64).toInt && h == 4 + (id % 32).toInt,
        s"doc $id decoded ${w}x$h")
    }
  }

  test("decodeImages quarantines unreadable payloads instead of failing") {
    import spark.implicits._
    val junk = Seq((1L, Array[Byte](1, 2, 3, 4))).toDF("doc_id", "payload")
    val out = Multimodal.decodeImages(spark, junk).collect()
    assert(out.length == 1 && !out.head.decoded && out.head.format == "unknown")
  }
}
