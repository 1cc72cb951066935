package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ArrayMath

/** Dense-vector math over `array<float>` / `array<double>` columns using
  * codegen'd higher-order functions (no UDFs): the hot path of the ANN /
  * embedding-dedup operators stays inside whole-stage codegen.
  */
object VectorFns {

  /** Cast to array<double> so accumulation happens in double precision. */
  def asDouble(v: Column): Column = v.cast("array<double>")

  /** Fused native loop (codegen'd Catalyst expression) — the hot path.
    * Same left-to-right summation order as the portable HOF fold, so
    * results are bit-identical to [[dotHof]] / the DuckDB oracle.
    */
  def dot(a: Column, b: Column): Column = ArrayMath.dotNative(a, b)

  /** Portable higher-order-function formulation (kept as the reference
    * spelling of the semantics; ~5x slower than [[dot]]).
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm2(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; computed as dot/(|a|*|b|) in double, matching the
    * DuckDB `list_cosine_similarity` formula.
    */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm2(a) * norm2(b))

  /** Sign-random-projection bucket: `nBits`-bit signature from deterministic
    * ±1 projection vectors (seeded by md5, portable + reproducible). Groups
    * near-identical vectors into the same bucket so near-dup search joins
    * within buckets instead of an unbounded cross join — the 100 TB path.
    */
  def srpBucket(v: Column, nBits: Int, seed: String): Column = {
    val bits = (0 until nBits).map { b =>
      // deterministic sign pattern for bit b: sign(md5(seed:b:i) odd/even)
      val signs = transform(sequence(lit(0), size(v) - 1), i =>
        when(HashFns.md5Long(concat_ws(":", lit(seed), lit(b), i.cast("string")), 1) % 2 === 0, lit(1.0))
          .otherwise(lit(-1.0)))
      val proj = aggregate(zip_with(v, signs, (x, s) => x * s), lit(0.0), (acc, x) => acc + x)
      when(proj > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a + b)
  }
}
