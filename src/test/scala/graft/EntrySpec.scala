package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract invariants on the driver surface itself — a registration slip
  * here silently weakens the external gate (a query without an oracle is
  * only rows-checked; an oracle without a query is dead SQL), so the
  * suite fails before the driver ever sees it.
  */
class EntrySpec extends AnyFunSuite {

  test("every query has an oracle and every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle SQL: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"orphan oracle SQL: ${(o -- q).toSeq.sorted}")
  }

  test("query names follow the qNN_snake convention with unique numbers") {
    val names = SparkEntry.queries.keySet.toSeq
    val pat = "^q(\\d+)_[a-z0-9_]+$".r
    val nums = names.map {
      case pat(n) => n.toInt
      case other => fail(s"malformed query name: $other")
    }
    assert(nums.distinct.size == nums.size,
      s"duplicate query numbers: ${nums.groupBy(identity).filter(_._2.size > 1).keys}")
    // contiguous numbering from 1 — a gap means a row the SURVEY table
    // and the driver gate disagree about
    assert(nums.sorted == (1 to nums.max),
      s"non-contiguous query numbers: ${(1 to nums.max).diff(nums.sorted)} missing")
  }

  test("oracle SQL never references the absolute testdata paths") {
    // oracles run against DuckDB views the driver creates per sf dir; a
    // hardcoded path would silently pin one scale factor
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(!sql.contains("/root/testdata") && !sql.contains("/root/repo"),
        s"$name oracle hardcodes a data path")
    }
  }
}
