package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: one JSON line with per-query wall seconds at the SF dir
  * from SPARK_GRAFT_SF_DIR.
  *
  * Methodology: queries run in sorted name order; a single un-timed
  * warm-up pass at sf0.001 first absorbs one-time JVM/codegen/JIT cost so
  * the timed numbers measure engine throughput, not classloading; the
  * cache is cleared after every query so none borrows another's work;
  * each query is timed twice and the min reported (a major GC pause lands
  * on an arbitrary query otherwise — observed 8s outliers), with an
  * explicit gc between queries to keep the pause out of the timings.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
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
    val results = names.map { name =>
      // stderr marker so engine warnings in the surrounding log (GC, large
      // task binaries, skew) can be attributed to a query after the fact
      System.err.println(s"[bench] start $name")
      val reps = (1 to 2).map { _ =>
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
      name -> reps.min
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val errs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
