package graft.operators

import org.apache.spark.sql.functions._

class ReconcileSpec extends graft.SparkSpec {
  import spark.implicits._

  private def rk = concat_ws("|", col("id"), col("v"))
  private val left = Seq(
    ("p1", 1L, "a"), ("p1", 2L, "b"),
    ("p2", 3L, "c"), ("p2", 4L, "d"),
    ("p3", 5L, "e")
  ).toDF("p", "id", "v")

  test("identical tables match on every partition") {
    val out = Reconcile.diff(left, left.repartition(5), "p", rk)
    assert(out.collect().forall(_.getAs[String]("status") == "match"))
    assert(out.count() == 3)
  }

  test("row edits, drops, and extra partitions classify correctly") {
    val right = left
      .where(!(col("p") === "p3"))                       // p3 gone
      .withColumn("v", when($"id" === 2L, lit("B")).otherwise($"v")) // p1 edited
      .unionByName(Seq(("p9", 9L, "z")).toDF("p", "id", "v")) // p9 added
    val st = Reconcile.diff(left, right, "p", rk).collect()
      .map(r => r.getAs[String]("p") -> r.getAs[String]("status")).toMap
    assert(st == Map("p1" -> "differ", "p2" -> "match",
      "p3" -> "missing_right", "p9" -> "missing_left"))
  }

  test("checksums are order-independent but duplicate-sensitive") {
    val a = Seq(("p", 1L, "x"), ("p", 2L, "y")).toDF("p", "id", "v")
    val b = Seq(("p", 2L, "y"), ("p", 1L, "x")).toDF("p", "id", "v")
    assert(Reconcile.diff(a, b, "p", rk).head().getAs[String]("status") == "match")
    // a duplicated row pair cancels in xor but not in count/sum
    val dup = Seq(("p", 1L, "x"), ("p", 1L, "x"), ("p", 2L, "y"))
      .toDF("p", "id", "v")
    assert(Reconcile.diff(a, dup, "p", rk).head().getAs[String]("status") == "differ")
  }

  test("checksum pass aggregates map-side: one shuffle, partition-sized output") {
    val cs = Reconcile.partitionChecksums(left.repartition(4), "p", rk)
    val plan = cs.queryExecution.executedPlan.toString
    assert(plan.contains("partial_count") || plan.contains("Partial"),
      plan.take(1500))
    assert(cs.count() == 3)
  }
}
