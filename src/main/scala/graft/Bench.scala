package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: one JSON line with per-query wall seconds at the SF dir
  * from SPARK_GRAFT_SF_DIR.
  *
  * Methodology: queries run in sorted name order; a single un-timed
  * warm-up pass at sf0.001 first absorbs one-time JVM/codegen/JIT cost so
  * the timed numbers measure engine throughput, not classloading; the
  * cache is cleared after every query so none borrows another's work;
  * each query is timed three times and the min reported (a major GC pause
  * lands on an arbitrary query otherwise — observed 8s outliers), with an
  * explicit gc between queries to keep the pause out of the timings.
  *
  * Load accounting (round-5 lesson): the round-4 bench artifact reported
  * 2-3.5x "regressions" on untouched queries because the machine was
  * under external load during the run — min-of-N defends against GC
  * pauses, not against sustained contention. The JSON therefore also
  * carries per-query rep times and /proc/loadavg samples (`load_start`,
  * `load_end`, per-query `reps`/`load`), so a polluted run is
  * self-evident from the artifact alone: loadavg far above the bench's
  * own parallelism, or rep times spread far beyond their min, mean the
  * numbers measure the machine, not the code.
  */
object Bench {

  /** 1-minute loadavg, -1 if unreadable (non-Linux). */
  private def loadAvg(): Double =
    try java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/loadavg"))
      .split("\\s+")(0).toDouble
    catch { case _: Throwable => -1.0 }
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // bucketed-table gates (q88) saveAsTable; keep the warehouse out of
      // the repo and isolated per run
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Materialize through the noop sink, not count(): count() lets
    // ColumnPruning delete projection-only work (md5/regex/scoring columns
    // that no downstream op reads), so q16/q17/q25-q28 measured scan+count
    // instead of the query. The noop sink consumes every output column.
    def run(name: String, dir: String): Unit =
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
    // optional args restrict the run to named queries (iteration aid);
    // the driver invokes with no args = full suite. Unknown names abort:
    // a typo must not report a green no-op bench.
    val unknown = args.filterNot(SparkEntry.queries.keySet)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val names =
      if (args.nonEmpty) SparkEntry.queries.keys.toSeq.filter(args.contains).sorted
      else SparkEntry.queries.keys.toSeq.sorted
    val warmDir = "/root/testdata/sf0.001"
    names.foreach { name =>
      try { run(name, warmDir) } catch { case _: Throwable => () }
      spark.catalog.clearCache()
    }
    val failed = scala.collection.mutable.ListBuffer.empty[String]
    val loadStart = loadAvg()
    val t0Wall = System.nanoTime()
    val results = names.map { name =>
      // stderr marker so engine warnings in the surrounding log (GC, large
      // task binaries, skew) can be attributed to a query after the fact
      System.err.println(s"[bench] start $name")
      val load = loadAvg()
      val reps = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        try { run(name, sfDir) } catch {
          case e: Throwable =>
            // a swallowed failure must not read as a near-zero "win"
            if (!failed.contains(name)) {
              failed += name
              System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            }
        }
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        System.gc()
        dt
      }
      (name, reps.min, reps, load)
    }
    def f(d: Double): String = "%.4f".formatLocal(java.util.Locale.ROOT, d)
    val qs = results.map { case (k, v, _, _) => "\"" + k + "\":" + f(v) }
      .mkString("{", ",", "}")
    val repsJson = results.map { case (k, _, reps, load) =>
      "\"" + k + "\":{\"reps\":[" + reps.map(f).mkString(",") +
        "],\"load\":" + f(load) + "}"
    }.mkString("{", ",", "}")
    val errs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    val wall = (System.nanoTime() - t0Wall) / 1e9
    println(s"""{"metric":"total","value":${f(total)},"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir","load_start":${f(loadStart)},"load_end":${f(loadAvg())},"wall_sec":${f(wall)},"detail":$repsJson}""")
    spark.stop()
  }
}
