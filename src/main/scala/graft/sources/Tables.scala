package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Typed access to the benchmark tables (one parquet per table under an
  * sf directory). At production scale these are partitioned tables; the
  * loader keeps the scan declarative so partition pruning / predicate
  * pushdown / column pruning all reach the file source.
  */
final case class Tables(spark: SparkSession, dir: String) {
  def table(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame = table("region")
  def nation: DataFrame = table("nation")
  def customer: DataFrame = table("customer")
  def supplier: DataFrame = table("supplier")
  def part: DataFrame = table("part")
  def orders: DataFrame = table("orders")
  def lineitem: DataFrame = table("lineitem")
  /** events.parquet stores TIMESTAMP(NANOS), which Spark's parquet reader
    * rejects by default: read nanos as long and truncate to microseconds —
    * the exact conversion other µs-native engines (DuckDB) apply.
    */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table("events").withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents: DataFrame = table("documents")
  def embeddings: DataFrame = table("embeddings")
}

object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")
}
