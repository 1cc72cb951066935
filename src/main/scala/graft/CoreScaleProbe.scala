package graft

import org.apache.spark.sql.SparkSession

/** Probe-only main (r14, verdict item 4): per-query core-scaling at a
  * data size where compute, not stage latency, dominates. Same session
  * shape as Bench (master local[$SPARK_GRAFT_CPUS], shuffle width =
  * cpus, warm pass at sf0.001) but a configurable rep count
  * (SPARK_GRAFT_PROBE_REPS, default 2, min reported) — at sf10 the rows
  * run minutes each, so Bench's min-of-3 would triple a long
  * measurement for noise that amortizes anyway. Not part of the driver
  * contract.
  */
object CoreScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/tmp/sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPS", "2").toInt
    val mpb = sys.env.getOrElse("SPARK_GRAFT_MAX_PARTITION_BYTES", "134217728")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // §6 input split size: the generated sf10 fixtures are single
      // ~74 MB parquet files, so the default 128 MB split serializes the
      // CPU-heavy map stages (tokenize/encode) onto 1-2 tasks at any
      // core count; the probe exposes the knob to measure the unlock
      .config("spark.sql.files.maxPartitionBytes", mpb)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ui.retainedExecutions", "16")
      .config("spark.ui.retainedJobs", "100")
      .config("spark.ui.retainedStages", "200")
      .config("spark.ui.retainedTasks", "10000")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def run(name: String, dir: String): Unit =
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q104_bm25_search", "q109_pagerank", "q143_semdedup_srp", "q147_ivf_adc")
    names.foreach { n => run(n, "/root/testdata/sf0.001"); spark.catalog.clearCache() }
    val out = names.map { name =>
      System.err.println(s"[corescale] start $name cpus=$cpus")
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        run(name, sfDir)
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache(); System.gc()
        System.err.println(f"[corescale] $name rep: $dt%.2f s")
        dt
      }
      f""""$name":{"min":${ts.min}%.3f,"reps":[${ts.map(t => f"$t%.3f").mkString(",")}]}"""
    }
    spark.stop()
    println(s"""{"probe":"corescale","cpus":$cpus,"sf":"$sfDir","queries":{${out.mkString(",")}}}""")
  }
}
