// Lives in the org.apache.spark.sql namespace for the same reason as
// HashExprs: the Column<->Expression bridge is private[sql].
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.classic.ExpressionUtils

/** Column-level bridges to Spark's runtime-filter bloom expressions —
  * the same machinery `InjectRuntimeFilter` uses when it prunes a shuffle
  * join's probe side, exposed so `graft.operators.Pruning` can build the
  * filter from an EXPLICIT key set (a dim-table slice, a flagged-id list)
  * instead of waiting for the optimizer to find an eligible join.
  *
  * Both sides operate on xxhash64 of the key (the aggregate puts longs,
  * the probe tests longs), and both are codegen'd: `mightContain`
  * deserializes the sketch once per operator, then evaluates one
  * Murmur-style probe per row inside whole-stage codegen — no UDF.
  */
object BloomExprs {

  /** Aggregate column building a serialized bloom filter (binary) over the
    * LONG child values. `expectedItems`/`numBits` size the sketch (see
    * `org.apache.spark.util.sketch.BloomFilter.optimalNumOfBits`).
    */
  def bloomAgg(hashedKey: Column, expectedItems: Long, numBits: Long): Column =
    ExpressionUtils.column(
      new BloomFilterAggregate(ExpressionUtils.expression(hashedKey),
        Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** Predicate: might the serialized bloom filter contain this LONG key?
    * False positives at the configured fpp; never false negatives.
    */
  def mightContain(bloomBytes: Array[Byte], hashedKey: Column): Column =
    ExpressionUtils.column(
      BloomFilterMightContain(Literal(bloomBytes),
        ExpressionUtils.expression(hashedKey)))
}
