package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-time (temporal) lookups against SCD2 validity-interval tables —
  * the read side of [[Merge.scd2Merge]]'s write side. The reference keeps
  * `collection_to_circle_mapping` as `started_at`/`ended_at` intervals
  * (/root/reference/update_etl.py:1094-1124) and every consumer query asks
  * "what was the mapping AT this row's timestamp"; this operator is that
  * question as a single distributed join.
  */
object Temporal {

  /** Enrich each fact row with the dimension attributes valid at the fact's
    * timestamp: `dim` holds SCD2 rows (key, attrs…, startCol, endCol) with
    * half-open validity `[start, end)` and `end IS NULL` = still open.
    *
    * Plan shape: an EQUI-join on the key with the interval predicate as a
    * join filter — because SCD2 intervals are disjoint per key and few
    * (one row per attribute change), the per-key match set is tiny and the
    * hash join never degenerates into the range-join cross product a
    * `ts BETWEEN x AND y`-only condition would plan (BroadcastNestedLoop).
    * That is the shape that survives a 100 TB fact side: facts shuffle
    * once on the key (or broadcast the dim when it fits), every other
    * predicate evaluates inside the matched bucket.
    *
    * LEFT join: facts whose timestamp precedes the key's first interval
    * (or whose key is absent) survive with null dimension attributes.
    * At most one dim row can match per fact (disjoint intervals), so the
    * output has exactly one row per fact row.
    */
  def intervalLookup(facts: DataFrame, dim: DataFrame, keyCol: String,
                     tsCol: String, startCol: String, endCol: String): DataFrame = {
    val d = dim.withColumnRenamed(keyCol, "__dk")
    facts.join(d,
      facts(keyCol) === d("__dk") &&
        facts(tsCol) >= d(startCol) &&
        (d(endCol).isNull || facts(tsCol) < d(endCol)),
      "left")
      .drop("__dk")
  }
}
