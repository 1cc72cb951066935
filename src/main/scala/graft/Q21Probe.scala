package graft

import graft.operators.Similarity
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing for the q21 minhash pipeline at a given SF dir
  * (companion to [[ScaleProbe]]): isolates shingling, signature, LSH and
  * verify costs so optimization effort lands on the measured hot stage.
  */
object Q21Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("q21probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      // driver fixtures carry naive µs timestamps: read as TIMESTAMP, not NTZ
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = Tables(spark, dir).documents

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $name%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    // warm-up full pipeline once (JIT + page cache)
    Similarity.minHashNearDups(docs, "doc_id", "text", 3, 12, 3)
      .write.format("noop").mode("overwrite").save()

    val sh = time("shingles+cache") {
      val s = Similarity.shingleSets(docs, "doc_id", "text", 3).cache()
      s.count(); s
    }
    val sig = time("signatures") {
      val s = Similarity.minHashSignatures(sh, 12); s.write.format("noop").mode("overwrite").save(); s
    }
    val cands = time("lsh-candidates+cache") {
      val c = Similarity.lshCandidates(Similarity.minHashSignatures(sh, 12), 3).cache()
      c.count(); c
    }
    time("full-pipeline-again") {
      Similarity.minHashNearDups(docs, "doc_id", "text", 3, 12, 3)
        .write.format("noop").mode("overwrite").save()
    }
    println("shingle rows: " + sh.count() + ", cands: " + cands.count())
    spark.stop()
  }
}
