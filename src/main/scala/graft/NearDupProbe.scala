package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Probe-only main (r14): per-JOB wall times and counts for the
  * foreachBatch near-dup gates (q74/q100) — the two slowest gates after
  * r13. The sink submits several batch jobs per micro-batch (store
  * reads, the candidate/verify pipeline, three partitioned store
  * writes); this prints each job's duration and description so the
  * before/after of a sink change is attributable job by job, not just a
  * gate total. Measurement aid only — not part of the driver contract.
  */
object ProbeNearDup {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
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
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val nJobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val jobSec = new java.util.concurrent.atomic.DoubleAdder()
    val verbose = sys.env.get("SPARK_GRAFT_PROBE_VERBOSE").contains("1")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        starts.put(js.jobId, (System.nanoTime(),
          Option(js.properties.getProperty("spark.job.description")).getOrElse("-")))
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        Option(starts.remove(je.jobId)).foreach { case (t0, desc) =>
          val dt = (System.nanoTime() - t0) / 1e9
          nJobs.incrementAndGet(); jobSec.add(dt)
          if (verbose) System.err.println(f"[job] ${je.jobId}%4d ${dt}%7.3f s  $desc")
        }
    })
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q74_stream_neardup", "q100_neardup_recovery")
    def run(name: String, dir: String): Unit =
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
    // one warm pass (classloading/codegen), then min-of-3 timed reps
    names.foreach { n => run(n, "/root/testdata/sf0.001"); spark.catalog.clearCache() }
    names.foreach { name =>
      val reps = (1 to 3).map { i =>
        nJobs.set(0); jobSec.reset()
        val t0 = System.nanoTime()
        run(name, sfDir)
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache(); System.gc()
        System.err.println(f"[probe] $name rep$i: ${dt}%.3f s  jobs=${nJobs.get()} jobSec=${jobSec.sum()}%.3f")
        dt
      }
      println(f"""{"probe":"$name","min_sec":${reps.min}%.4f,"reps":[${reps.map(r => f"$r%.4f").mkString(",")}]}""")
    }
    spark.stop()
  }
}
