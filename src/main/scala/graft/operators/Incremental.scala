package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental-load building blocks — the reference's terminal-timestamp
  * pulls (`get_terminal_ts`, etl_utls.py:328: resume from max loaded ts)
  * and its current-day delete+reload idiom.
  *
  * At scale the "delete+reload" is a dynamic partition overwrite (see
  * `sources.Formats.writePartitioned`); these helpers produce the frames
  * to write. The terminal timestamp is a single max() aggregate — Spark
  * reduces it map-side, so the scan is the only cost, and on a
  * date-partitioned table the scan prunes to the newest partitions.
  */
object Incremental {

  /** The resume point: max timestamp already loaded (None on empty). */
  def terminalTs(existing: DataFrame, tsCol: String): Option[java.sql.Timestamp] =
    // bounded: 1-row max-timestamp scalar
    existing.agg(max(col(tsCol))).collect().headOption
      .flatMap(r => Option(r.get(0)).map(_.asInstanceOf[java.sql.Timestamp]))

  /** Rows of `incoming` strictly after the terminal ts of `existing` —
    * the incremental delta to append. Pushdown-friendly: the ts predicate
    * reaches the incoming scan (partition pruning on date-partitioned
    * layouts).
    */
  def deltaSince(existing: DataFrame, incoming: DataFrame, tsCol: String): DataFrame =
    terminalTs(existing, tsCol) match {
      case Some(t) => incoming.where(col(tsCol) > lit(t))
      case None    => incoming
    }

  /** Current-period replace: drop `existing` rows in the period and take
    * `incoming`'s — the delete+reload idiom as a declarative union (write
    * it back with dynamic partition overwrite to touch only the period).
    */
  def replacePeriod(existing: DataFrame, incoming: DataFrame, periodPredicate: Column): DataFrame = {
    // null-safe: rows where the predicate is NULL are outside the period —
    // a bare `!p` filter would silently drop them from the existing side
    val inPeriod = coalesce(periodPredicate, lit(false))
    existing.where(!inPeriod).unionByName(incoming.where(inPeriod))
  }
}
