package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SCD1 upsert / coalesce-merge — the reference's staging-table upsert
  * (etl_utls.py:141 upsert_postgres, :157 update_postgres) and the
  * metadata coalesce-merge (update_etl.py:1322
  * batch_load_address_metadata_from_address_metadata_opensea).
  *
  * Expressed as a single full-outer shuffle join (or broadcast when the
  * source delta is small — the common incremental case), not row-at-a-time
  * driver updates.
  */
object Merge {

  /** Full-outer merge of `source` into `target` on `key`.
    * For each column in `updateCols`, source wins when non-null (coalesce);
    * target columns not in `updateCols` pass through; rows present only in
    * source are inserted. Adds `is_new` (insert) and `updated` flags.
    */
  def coalesceMerge(target: DataFrame, source: DataFrame, targetKey: String,
                    sourceKey: String, updateCols: Map[String, String]): DataFrame = {
    val t = target.alias("t")
    val s = source.alias("s")
    val joined = t.join(s, col(s"t.$targetKey") === col(s"s.$sourceKey"), "full_outer")
    val id = coalesce(col(s"t.$targetKey"), col(s"s.$sourceKey")).as("id")
    val passThrough = target.columns.filterNot(c => c == targetKey || updateCols.contains(c))
      .map(c => col(s"t.$c").as(c))
    val merged = updateCols.toSeq.sortBy(_._1).map { case (tc, sc) =>
      coalesce(col(s"s.$sc"), col(s"t.$tc")).as(tc)
    }
    joined.select(
      (id +: passThrough) ++ merged :+
        col(s"t.$targetKey").isNull.as("is_new") :+
        col(s"s.$sourceKey").isNotNull.as("updated"): _*)
  }

  /** Insert-missing (anti-join append): reference `insert … left join …
    * where t.id is null` idiom (update_etl.py:441, :519).
    */
  def insertMissing(target: DataFrame, source: DataFrame, key: String): DataFrame =
    target.unionByName(
      source.join(target.select(col(key)), Seq(key), "left_anti"),
      allowMissingColumns = false)
}
