package graft.operators

import org.apache.spark.sql.functions._

class TokenBudgetSpec extends graft.SparkSpec {
  import spark.implicits._

  // group a supplies 100 tokens, b supplies 20
  private val toks = (
    (1L to 10L).map(i => (i, "a", 10L)) ++
      (11L to 14L).map(i => (i, "b", 5L))
  ).toDF("id", "grp", "n_tokens")

  test("rates solve from supply; short groups cap at 1.0 and surface shortfall") {
    // budget 60 at 50/50: a wants 30 of 100 -> rate 0.3; b wants 30 of 20 -> capped
    val out = Sampling.tokenBudgetPlan(toks, "id", "grp", "n_tokens",
        Map("a" -> 0.5, "b" -> 0.5), budgetTokens = 60L, salt = "t")
      .collect().map(r => r.getAs[String]("grp") -> r).toMap
    assert(out("a").getAs[Double]("rate") == 0.3)
    assert(out("b").getAs[Double]("rate") == 1.0)
    // capped group takes everything it has — the shortfall is visible
    assert(out("b").getAs[Long]("picked_tokens") == 20L)
    assert(out("b").getAs[Double]("want_tokens") == 30.0)
    assert(out("a").getAs[Long]("avail_tokens") == 100L)
  }

  test("picked set is the md5-coin subset of the solved rate") {
    val out = Sampling.tokenBudgetPlan(toks, "id", "grp", "n_tokens",
        Map("a" -> 0.5, "b" -> 0.5), budgetTokens = 60L, salt = "t")
      .collect().map(r => r.getAs[String]("grp") -> r.getAs[Long]("picked_docs")).toMap
    val expectA = (1L to 10L).count { i =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$i#t".getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) / 4294967296.0 < 0.3
    }
    assert(out("a") == expectA.toLong)
    assert(out("b") == 4L, "rate-1.0 group keeps every doc")
  }

  test("groups absent from the targets plan to rate 0 but stay listed") {
    val out = Sampling.tokenBudgetPlan(toks, "id", "grp", "n_tokens",
        Map("a" -> 1.0), budgetTokens = 50L, salt = "t")
      .collect().map(r => r.getAs[String]("grp") -> r).toMap
    assert(out("b").getAs[Double]("rate") == 0.0)
    assert(out("b").getAs[Long]("picked_docs") == 0L)
    assert(out.contains("b"))
  }
}
