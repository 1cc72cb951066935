package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // optional extra args restrict the dump to named queries (iteration
    // aid; the driver always invokes with exactly two args = full dump)
    val only = args.drop(2).toSet
    require(only.forall(SparkEntry.queries.keySet),
      s"unknown queries: ${only.filterNot(SparkEntry.queries.keySet).mkString(", ")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // driver fixtures carry naive µs timestamps: read as TIMESTAMP, not NTZ
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      // cap driver status-store retention across the 152-query session —
      // same rationale and values as Bench (guide §5; UI disabled,
      // nothing reads the retained plan strings / job metrics)
      .config("spark.sql.ui.retainedExecutions", "16")
      .config("spark.ui.retainedJobs", "100")
      .config("spark.ui.retainedStages", "200")
      .config("spark.ui.retainedTasks", "10000")
      // bucketed-table gates (q88) saveAsTable; keep the warehouse out of
      // the repo and isolated per run (two concurrent sbt sessions must
      // not share ./spark-warehouse)
      .config("spark.sql.warehouse.dir",
        Files.createTempDirectory("graft-warehouse").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      // repartition(1), NOT coalesce(1): coalesce folds the ENTIRE plan
      // into the single output task (no exchange), so a compute-heavy
      // query runs on one core — at sf1 q60's 450M-pair levenshtein took
      // >10 min single-threaded. repartition adds one tiny exchange and
      // keeps the computation at the session's parallelism; only the
      // parquet encode is single-task (the driver compare wants one file).
      try fn(spark, sfDir).repartition(1).write.mode("overwrite")
        .parquet(s"$outDir/$name.parquet")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // operators that persist() internally (e.g. symDeleteLevenshtein's
      // pre-grouping) would otherwise accumulate cached frames across the
      // whole 85+-query session; Bench already clears per query
      spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // Defensive keying: the round-1 driver looked up oracles by OUTPUT
    // FILENAME ("qNN_name.parquet") while we keyed by bare query name, so
    // zero comparisons ran. Emit every entry under BOTH key forms, plus a
    // per-output "<name>.parquet.sql" sidecar holding the raw SQL, so any
    // of the three lookup conventions resolves.
    val entries = SparkEntry.oracleSql.toSeq.flatMap { case (k, v) =>
      Seq(k -> v, s"$k.parquet" -> v)
    }
    val json = entries
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    SparkEntry.oracleSql.foreach { case (k, v) =>
      Files.writeString(Paths.get(s"$outDir/$k.parquet.sql"), v)
    }
    spark.stop()
  }
}
