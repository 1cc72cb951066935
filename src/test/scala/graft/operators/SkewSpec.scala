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
}
