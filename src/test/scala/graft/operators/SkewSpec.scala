package graft.operators

import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedSum equals plain groupBy-sum") {
    val df = (1 to 1000).map(i => (if (i % 10 == 0) "cold" + i else "hot", i.toDouble))
      .toDF("k", "v")
    val out = Skew.saltedSum(df, Seq("k"), "v", 8)
      .select("k", "sum_v", "n_rows").as[(String, Double, Long)].collect()
      .filter(_._1 == "hot").head
    val expected = (1 to 1000).filter(_ % 10 != 0).map(_.toDouble).sum
    assert(out == (("hot", expected, 900L)))
  }

  test("saltedJoin produces the same rows as a plain join") {
    val fact = (1 to 200).map(i => (if (i % 2 == 0) 1L else 2L, i)).toDF("fk", "payload")
    val dim = Seq((1L, "even"), (2L, "odd")).toDF("dk", "name")
    val plain = fact.join(dim, fact("fk") === dim("dk"))
      .select("payload", "name").as[(Int, String)].collect().sortBy(_._1)
    val salted = Skew.saltedJoin(fact, dim, "fk", "dk", 4)
      .select("payload", "name").as[(Int, String)].collect().sortBy(_._1)
    assert(salted.toSeq == plain.toSeq)
  }

  test("saltedJoinHot equals the plain join across hot and cold paths") {
    // key 1 is hot (600 rows), keys 2..11 are cold (~40 rows each); a
    // threshold of 100 splits them, so both salt paths carry real rows.
    val fact = (1 to 1000)
      .map(i => (if (i <= 600) 1L else 2L + i % 10, i)).toDF("fk", "payload")
    val dim = (1L to 12L).map(k => (k, s"name$k")).toDF("dk", "name")
    val plain = fact.join(dim, fact("fk") === dim("dk"))
      .select("payload", "name").as[(Int, String)].collect().sortBy(_._1)
    val salted = Skew.saltedJoinHot(fact, dim, "fk", "dk", numSalts = 4, hotThreshold = 100)
      .select("payload", "name").as[(Int, String)].collect().sortBy(_._1)
    assert(salted.toSeq == plain.toSeq)
  }

  test("saltedJoinHot materializes the hot-key aggregate once (exchange reuse)") {
    // the hot set is broadcast to BOTH sides; the two builds are textually
    // identical plans, so the exchange must be built once and reused — at
    // 100 TB a second build would scan the whole fact twice
    val fact = (1 to 1000)
      .map(i => (if (i <= 600) 1L else 2L + i % 10, i)).toDF("fk", "payload")
    val dim = (1L to 12L).map(k => (k, s"name$k")).toDF("dk", "name")
    val out = Skew.saltedJoinHot(fact, dim, "fk", "dk", numSalts = 4, hotThreshold = 100)
    out.collect() // execute THIS plan (count() would plan a new query) so AQE finalizes
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange"),
      s"hot-key broadcast built twice (no ReusedExchange):\n$plan")
  }

  test("replicateDimForHotKeys replicates proportionally to hot keys, not the dim") {
    val fact = (1 to 1000)
      .map(i => (if (i <= 600) 1L else 2L + i % 10, i)).toDF("fk", "payload")
    val dim = (1L to 12L).map(k => (k, s"name$k")).toDF("dk", "name")
    val hot = Skew.hotKeys(fact, "fk", 100)
    assert(hot.as[Long].collect().toSeq == Seq(1L)) // only the 600-row key
    val replicated = Skew.replicateDimForHotKeys(dim, "dk", hot, numSalts = 4)
    // 11 cold dim rows once + 1 hot dim row × 4 salts = 15, vs the
    // uniform saltedJoin's 12 × 4 = 48
    assert(replicated.count() == 15L)
    val perKey = replicated.groupBy("dk").count()
      .as[(Long, Long)].collect().toMap
    assert(perKey(1L) == 4L && (2L to 12L).forall(perKey(_) == 1L))
  }
}
