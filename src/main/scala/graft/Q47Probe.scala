package graft

import graft.functions.TextFns
import graft.operators.{Dedup, Sampling, Similarity}
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stage-level timing for the q47 corpus pipeline (companion to
  * [[Q21Probe]]): isolates the quality gate, exact dedup, near-dup edge
  * generation, connected components, and sampling so optimization effort
  * lands on the measured hot stage.
  */
object Q47Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("q47probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      // driver fixtures carry naive µs timestamps: read as TIMESTAMP, not NTZ
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $name%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    // warm-up full query once (JIT + page cache)
    SparkEntry.queries("q47_corpus_pipeline")(spark, dir)
      .write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()

    val docs = Tables(spark, dir).documentsSpread
    val gated = docs.withColumn("quality_score",
        TextFns.qualityFeatures(col("text"), col("n_chars")).getField("quality_score"))
      .where(col("quality_score") >= 0.5)
    val keepExact = time("quality+exact-dedup") {
      val k = gated
        .groupBy(Dedup.canonicalWordsHash(col("text")).as("__canon"))
        .agg(min_by(
          struct(col("doc_id"), col("source"), col("quality_score"), col("text")),
          col("doc_id")).as("__r"))
        .select(col("__r.doc_id").as("doc_id"), col("__r.source").as("source"),
          col("__r.quality_score").as("quality_score"), col("__r.text").as("text"))
        .cache()
      k.count(); k
    }
    val edges = time("minhash-edges") {
      val e = Similarity.minHashNearDups(keepExact, "doc_id", "text", 3, 12, 3)
        .where(col("jaccard") >= 0.5).cache()
      e.count(); e
    }
    val comp = time("connected-components") {
      val c = Dedup.connectedComponents(edges, "id_a", "id_b")
        .withColumnRenamed("node", "doc_id")
      c.count(); c
    }
    time("survivor-join+sample") {
      val keepNear = keepExact.join(comp, Seq("doc_id"), "left")
        .where(col("component").isNull || col("component") === col("doc_id"))
      Sampling.hashSample(keepNear, "doc_id", 0.8, "corpus")
        .select(col("doc_id"), col("source"), col("quality_score"))
        .write.format("noop").mode("overwrite").save()
    }
    time("full-query-again") {
      SparkEntry.queries("q47_corpus_pipeline")(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
