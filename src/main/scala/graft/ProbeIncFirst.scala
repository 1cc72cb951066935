package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe main for the q144 claim "day-2 first_acquisition cost is
  * delta-sized": builds the q144 two-day fixture at SPARK_GRAFT_SF_DIR,
  * runs day 1 (full rebuild — it seeds the state), then times day 2 BOTH
  * ways in one JVM — (a) as shipped (incremental insert over the raw
  * delta), (b) with the state deleted first (forced full rebuild, the
  * pre-r12 behavior). Everything else in the two day-2 runs is identical
  * (gap check, fact terminal read, empty fact append), so the wall delta
  * is the stage's. Alternates b,a,b,a per rep so machine drift cannot
  * masquerade as the effect; prints ONE JSON line with per-rep times,
  * min summary, and the delta/total row asymmetry that drives it.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.ProbeIncFirst"
  * (artifact: evidence/PERFPROBE_incfirst_rNN.json via shell redirect)
  */
object ProbeIncFirst {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import java.nio.file.{Files => JFiles}

    val ev = graft.sources.Tables(spark, sfDir).events
    // the q144 split: one µs below the latest first-touch
    // bounded: 1-row max-of-min-ts scalar
    val lastFirst = ev.groupBy(col("user_id"), col("event_type"))
      .agg(min(col("ts")).as("f")).agg(max(col("f"))).collect()(0).getTimestamp(0)
    val lfUs = lastFirst.getTime / 1000 * 1000000L + lastFirst.getNanos / 1000
    val splitUs = lfUs - 1L
    val split = new java.sql.Timestamp(splitUs / 1000000L * 1000L)
    split.setNanos(((splitUs % 1000000L) * 1000L).toInt)
    val root = JFiles.createTempDirectory("graft-incprobe")
    ev.where(col("ts") <= lit(split)).write.parquet(s"$root/day1/events.parquet")
    ev.write.parquet(s"$root/day2/events.parquet")
    val out = s"$root/out"
    val stage = graft.pipeline.DailyUpdate.stages.filter(_._1 == "first_acquisition")
    val r1 = graft.pipeline.DailyUpdate.run(spark, s"$root/day1", out, stage)

    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val statePath = new org.apache.hadoop.fs.Path(s"$out/first_acquisition")
    // keep a pristine copy of day-1 state to restore between variants
    val seed = new org.apache.hadoop.fs.Path(s"$out/first_acquisition.seed")
    require(org.apache.hadoop.fs.FileUtil.copy(fs, statePath, fs, seed, false, true,
      spark.sparkContext.hadoopConfiguration), "state snapshot copy failed")
    def restoreState(): Unit = {
      fs.delete(statePath, true)
      fs.delete(new org.apache.hadoop.fs.Path(s"$out/first_acquisition.old"), true)
      require(org.apache.hadoop.fs.FileUtil.copy(fs, seed, fs, statePath, false, true,
        spark.sparkContext.hadoopConfiguration), "state restore failed")
    }
    // fact table must also reset per rep: day-2 appends the fact delta,
    // and a stale appended delta would empty the NEXT rep's delta cut
    val factSeed = new org.apache.hadoop.fs.Path(s"$out/fact_events_clean.seed")
    val factPath = new org.apache.hadoop.fs.Path(s"$out/fact_events_clean")
    require(org.apache.hadoop.fs.FileUtil.copy(fs, factPath, fs, factSeed, false, true,
      spark.sparkContext.hadoopConfiguration), "fact snapshot copy failed")
    def restoreFacts(): Unit = {
      fs.delete(factPath, true)
      require(org.apache.hadoop.fs.FileUtil.copy(fs, factSeed, fs, factPath, false, true,
        spark.sparkContext.hadoopConfiguration), "fact restore failed")
    }

    def timeDay2(incremental: Boolean): Double = {
      restoreFacts(); restoreState()
      if (!incremental) fs.delete(statePath, true) // prior=None → rebuild
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime()
      graft.pipeline.DailyUpdate.run(spark, s"$root/day2", out, stage)
      (System.nanoTime() - t0) / 1e9
    }
    // warm both paths once, then alternate rebuild/incremental 3x each
    timeDay2(incremental = false); timeDay2(incremental = true)
    val reps = (1 to 3).flatMap { _ =>
      Seq("rebuild" -> timeDay2(incremental = false),
        "incremental" -> timeDay2(incremental = true))
    }

    // STAGE-ONLY timings: the whole-run numbers above are dominated by
    // the per-day fixed orchestration (gap check, fact terminal read,
    // fact append — identical in both variants), so they bound the
    // regression risk but cannot resolve the stage asymmetry. Here the
    // two stage plans run bare (write to a scratch dir), same alternation.
    restoreFacts(); restoreState()
    val day2Ev = graft.sources.Tables(spark, s"$root/day2").events
    val prevTerminal = graft.operators.Incremental.terminalTs(
      spark.read.parquet(s"$out/fact_events_clean"), "ts")
    def firsts(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Dedup.firstByKey(df, Seq("user_id", "event_type"), "ts", "event_id")
        .select(col("user_id"), col("event_type"),
          col("event_id").as("first_event_id"), col("ts").as("first_ts"))
    def timeStage(incremental: Boolean): Double = {
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime()
      val plan =
        if (incremental)
          graft.operators.Incremental.firstTouchInsert(
            spark.read.parquet(s"$out/first_acquisition"),
            firsts(graft.operators.Incremental.deltaAfter(day2Ev, "ts", prevTerminal)),
            Seq("user_id", "event_type"))
        else firsts(day2Ev)
      plan.write.mode("overwrite").parquet(s"$root/scratch")
      (System.nanoTime() - t0) / 1e9
    }
    timeStage(incremental = false); timeStage(incremental = true)
    val stageReps = (1 to 3).flatMap { _ =>
      Seq("rebuild" -> timeStage(incremental = false),
        "incremental" -> timeStage(incremental = true))
    }

    val totalRows = ev.count()
    val deltaRows = ev.where(col("ts") > lit(split)).count()
    spark.stop()
    def f(d: Double) = "%.4f".formatLocal(java.util.Locale.ROOT, d)
    val inc = reps.collect { case ("incremental", t) => t }
    val reb = reps.collect { case ("rebuild", t) => t }
    val sInc = stageReps.collect { case ("incremental", t) => t }
    val sReb = stageReps.collect { case ("rebuild", t) => t }
    println(s"""{"probe":"incfirst_day2","sf":"$sfDir","day1_state_rows":${r1("first_acquisition")},"total_event_rows":$totalRows,"delta_event_rows":$deltaRows,"rebuild_day2_sec":${f(reb.min)},"incremental_day2_sec":${f(inc.min)},"stage_rebuild_sec":${f(sReb.min)},"stage_incremental_sec":${f(sInc.min)},"rebuild_reps":[${reb.map(f).mkString(",")}],"incremental_reps":[${inc.map(f).mkString(",")}],"stage_rebuild_reps":[${sReb.map(f).mkString(",")}],"stage_incremental_reps":[${sInc.map(f).mkString(",")}]}""")
  }
}
