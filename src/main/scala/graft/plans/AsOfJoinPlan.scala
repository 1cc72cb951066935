// In the org.apache.spark.sql namespace for the private[sql] bridge
// (Dataset.ofRows) used by the public entry point in graft.operators.AsOf.
package org.apache.spark.sql.graft.asof

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.classic.Dataset
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Logical as-of join: for each left ("buy") row, attach the first right
  * ("sell") row of the same key with ts strictly greater, under the
  * (ts, tiebreak) order; left rows with no later right row are dropped.
  *
  * The reference computes this with a range self-join + `row_number()=1`
  * dedup (update_etl.py:710); the composed Spark form (operators.AsOf
  * .matchNext) needs a window pass plus a join plus a dedup. This node
  * plans to [[AsOfJoinExec]]: ONE hash shuffle + sort per side and a
  * streaming two-pointer merge per partition — O(1) state per key, no
  * intermediate blowup, the formulation that survives 100 TB.
  */
case class AsOfJoin(left: LogicalPlan, right: LogicalPlan,
                    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
                    leftTs: Attribute, rightTs: Attribute,
                    leftTie: Attribute, rightTie: Attribute) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(newLeft: LogicalPlan,
                                                 newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lts, rts, ltie, rtie) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts, ltie, rtie) :: Nil
    case _ => Nil
  }
}

/** Physical as-of join. Children are hash-clustered on the key and sorted
  * by (key, ts, tie) — EnsureRequirements inserts the exchanges/sorts —
  * then each co-partition is merged with two forward-only pointers:
  * discard right rows at or before the current left (ts, tie) position
  * (later left rows sort after it, so they can never need them), peek the
  * first remaining same-key right row as the match.
  *
  * "After" is lexicographic on (ts, tie) with a shared tie domain (e.g. a
  * global event id), exactly the `ROWS BETWEEN 1 FOLLOWING ...` window
  * semantics of the composed form — including equal-timestamp ties.
  *
  * Precondition: key/ts/tie are non-null (filter upstream); ts and tie
  * must be long-backed types (timestamp/long/int-widened).
  */
case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKeys: Seq[Expression], rightKeys: Seq[Expression],
                        leftTs: Expression, rightTs: Expression,
                        leftTie: Expression, rightTie: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output
  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys ++ Seq(leftTs, leftTie)).map(SortOrder(_, Ascending)),
    (rightKeys ++ Seq(rightTs, rightTie)).map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTs = leftTs
    val rTs = rightTs
    val lTie = leftTie
    val rTie = rightTie
    val out = output
    left.execute().zipPartitions(right.execute()) { (li, ri) =>
      val lKeyProj = UnsafeProjection.create(lKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rOut)
      val lPosProj = UnsafeProjection.create(Seq(lTs, lTie), lOut)
      val rPosProj = UnsafeProjection.create(Seq(rTs, rTie), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeys.map(_.dataType))
      val resultProj = UnsafeProjection.create(out, out)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        // the right head is copied: the underlying UnsafeRow is reused by
        // the child iterator on next()
        private var rHead: UnsafeRow = _
        private var rHeadKey: UnsafeRow = _
        private var rHeadTs: Long = _
        private var rHeadTie: Long = _
        // first (= min-tie) right row of the (key, ts) run rHead belongs
        // to: the window form matches the min-tie sell AT the matched
        // timestamp, which can sort before the buy when ts are tied
        private var runFirst: UnsafeRow = _
        private var runKey: UnsafeRow = _
        private var runTs: Long = 0L
        private def advanceRight(): Unit =
          if (ri.hasNext) {
            val r = ri.next().asInstanceOf[UnsafeRow]
            rHead = r.copy()
            rHeadKey = rKeyProj(rHead).copy()
            val pos = rPosProj(rHead)
            rHeadTs = pos.getLong(0)
            rHeadTie = pos.getLong(1)
            if (runKey == null || keyOrd.compare(runKey, rHeadKey) != 0 || runTs != rHeadTs) {
              runFirst = rHead
              runKey = rHeadKey
              runTs = rHeadTs
            }
          } else { rHead = null; rHeadKey = null }
        advanceRight()

        // Computed LAZILY (only when the consumer asks): the projection
        // buffer backing the returned row is reused, so the next row must
        // not be materialized until the previous one has been consumed.
        private var nextRow: InternalRow = _
        private var ready = false

        private def findNext(): Unit = {
          nextRow = null
          while (nextRow == null && li.hasNext && rHead != null) {
            val l = li.next()
            val lKey = lKeyProj(l)
            val lPos = lPosProj(l)
            val lT = lPos.getLong(0)
            val lTieV = lPos.getLong(1)
            // drop right rows this and all later left rows can never match:
            // smaller key, or same key at or before this (ts, tie) position
            while (rHead != null && {
              val c = keyOrd.compare(rHeadKey, lKey)
              c < 0 || (c == 0 &&
                (rHeadTs < lT || (rHeadTs == lT && rHeadTie <= lTieV)))
            }) advanceRight()
            if (rHead != null && keyOrd.compare(rHeadKey, lKey) == 0) {
              // rHead is the first same-key right row positioned after
              // (lT, lTie); the match is the min-tie row of rHead's
              // (key, ts) run — the window form's min-id-at-matched-ts
              nextRow = resultProj(joined(l, runFirst))
            } // else: left row has no later right row -> dropped (inner)
          }
        }

        override def hasNext: Boolean = {
          if (!ready) { findNext(); ready = true }
          nextRow != null
        }
        override def next(): InternalRow = {
          if (!ready) findNext()
          ready = false
          nextRow
        }
      }
    }
  }

  override protected def withNewChildrenInternal(newLeft: SparkPlan,
                                                 newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinApi {
  /** Build a DataFrame over the custom node (registers the strategy on
    * first use — `experimental.extraStrategies` is public API).
    */
  def asOfJoin(buys: DataFrame, sells: DataFrame, key: String, sellKey: String,
               buyTs: String, sellTs: String, buyTie: String, sellTie: String): DataFrame = {
    val spark = buys.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    val l = buys.queryExecution.analyzed
    val r = sells.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not in ${p.output.map(_.name)}"))
    Dataset.ofRows(spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      AsOfJoin(l, r,
        Seq(attr(l, key)), Seq(attr(r, sellKey)),
        attr(l, buyTs), attr(r, sellTs), attr(l, buyTie), attr(r, sellTie)))
  }
}
