package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable quantization.
  *
  * `round(x, n)` is NOT portable across engines: given the same double,
  * JVM BigDecimal half-up and C++ `round(x*10^n)/10^n` disagree on
  * half-boundary values (observed on real data: 144/60k rows of a
  * `round(price/count, 4)` differed by 1e-4 between Spark and DuckDB).
  *
  * `floor(x * 10^n + 0.5) / 10^n` is pure IEEE-754 arithmetic — identical
  * bit-for-bit in every engine given the same input double. All floating
  * outputs of the query surface are quantized with this; the DuckDB oracle
  * uses the literal same formula.
  */
object Portable {
  def quant(c: Column, digits: Int): Column = {
    val s = math.pow(10, digits)
    floor(c * lit(s) + lit(0.5)) / lit(s)
  }

  /** 4 decimals: sums / money-like outputs. */
  def q4(c: Column): Column = quant(c, 4)

  /** 6 decimals: ratios / scores / similarities. */
  def q6(c: Column): Column = quant(c, 6)

  /** The SQL spelling for oracle queries. */
  def sql(expr: String, digits: Int): String = {
    val s = "1" + ("0" * digits)
    s"floor(($expr) * $s.0 + 0.5) / $s.0"
  }
}
