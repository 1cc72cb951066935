package graft

import graft.operators.{Classifier, Sampling}
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage attribution for q124's sf1 repricing (r08 verdict item 3): the
  * 5.8 → 13.2 s doubling after the stopword-preserving fixture remap
  * was ATTRIBUTED to "two corpus-wide hot words skew the feature
  * buckets" without a measurement. This probe times the classifier's
  * stages separately at a given SF dir so the doubling lands on a
  * measured stage:
  *
  *  - feature-build: explode to tokens, hash to buckets, groupBy
  *    (doc, bucket), plus the bias-row union logisticTrain folds into
  *    its persisted feature frame — one corpus pass, the only
  *    token-volume stage;
  *  - margin-pass: one per-doc grid-sum margin (the r10 form) over the
  *    PERSISTED features, including the labels join logisticTrain's
  *    margins() pays (the scoring sub-stage, run with zero weights);
  *  - iteration: logisticTrain's actual per-iteration unit — ONE action
  *    whose plan is the margin fold FEEDING the feature⋈residual join +
  *    per-bucket integer sum + 33-row collect (the loop never
  *    materializes the margin separately, so the honest per-iteration
  *    number includes the fold; margin-pass above is its sub-component,
  *    NOT a disjoint stage to sum with this one);
  *  - full-train: logisticTrain end to end (3 iterations + final
  *    scoring), the gated q124 body. Sanity identity: full ≈
  *    feature-build + iters × iteration + final margin pass.
  *
  * It also prints the bucket census (rows and token mass per feature
  * bucket, max/mean ratio): if the hot-word attribution were right,
  * the skew would show here AND the gradient/margin stages would carry
  * the growth; if the stages instead scale with token volume, the
  * repricing is explode cost, not skew.
  */
object Q124Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("q124probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/repo/tmp/sf1")
    val nBuckets = 32; val salt = "clf124"

    def f(d: Double): String = "%.4f".formatLocal(java.util.Locale.ROOT, d)
    // keepCache = true for the per-iteration stages: they must read the
    // PERSISTED feature frame (exactly what logisticTrain's loop pays,
    // Classifier.scala persists feat across iterations) — clearing the
    // cache here would silently re-time the feature build inside every
    // stage and conflate exactly the stages this probe exists to separate
    def timed(keepCache: Boolean = false)(body: => Unit): Double = {
      val t0 = System.nanoTime(); body
      val dt = (System.nanoTime() - t0) / 1e9
      if (!keepCache) spark.catalog.clearCache()
      System.gc(); dt
    }

    val docs = Tables(spark, dir).documents
    val label = array_contains(split(col("text"), " "), "vector")
    def base = docs.select(col("doc_id").as("__id"), label.cast("int").as("__y"),
      split(col("text"), " ").as("__w"))
    def labels = base.select(col("__id"), col("__y"))
    // replica of logisticTrain's persisted feature frame INCLUDING the
    // bias-row union (ADVICE r09: the probe's earlier defs omitted it,
    // so the stage timings slightly understated the loop's real plan)
    def feat = base.select(col("__id"), explode(col("__w")).as("__tok"))
      .select(col("__id"), Classifier.bucketOf(col("__tok"), nBuckets, salt).as("__b"))
      .groupBy(col("__id"), col("__b")).agg(count(lit(1)).as("__cnt"))
      .unionByName(labels.select(col("__id"), lit(-1).as("__b"), lit(1L).as("__cnt")))

    // warm-up: full pipeline once (JIT + page cache)
    Classifier.logisticTrain(docs, "doc_id", "text", label,
      nBuckets, iters = 1, lr = 0.5, salt = salt)
      .scored.write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()

    val tFeat = timed() { feat.write.format("noop").mode("overwrite").save() }

    // the per-iteration stages read the persisted features and labels,
    // exactly as logisticTrain's loop does — materialize the caches
    // OUTSIDE the timed blocks so tMargin/tIter measure per-iteration
    // cost alone
    val featC = feat.cache()
    featC.write.format("noop").mode("overwrite").save()
    val labelsC = labels.cache()
    labelsC.write.format("noop").mode("overwrite").save()

    // one margin pass at zero weights: the per-iteration scoring stage,
    // grid-sum form + labels join, mirroring Classifier.margins (r10) —
    // INCLUDING the per-row element_at lookup into the weight literal
    // (a lit(0.0) shortcut would skip the array indexing cost the real
    // loop pays on every feature row)
    val zeroW = Seq.fill(nBuckets + 1)(0.0)
    def margin = featC
      .select(col("__id"),
        floor((element_at(typedLit(zeroW), col("__b") + 2) * col("__cnt"))
            * lit(1000000.0) + lit(0.5))
          .cast("long").as("__qt"))
      .groupBy(col("__id"))
      .agg(sum(col("__qt")).as("__qz"))
      .join(labelsC, Seq("__id"))
      .withColumn("__p", graft.functions.Portable.q6(
        lit(1.0) / (lit(1.0) +
          exp(-(col("__qz").cast("double") / lit(1000000.0))))))
    val tMargin = timed(keepCache = true) {
      margin.write.format("noop").mode("overwrite").save()
    }

    // one full training iteration, exactly as logisticTrain's loop pays
    // it: a single action = margin sum → residual → feature⋈residual
    // join → per-bucket integer sum → bounded collect (the loop derives
    // the residual from an unmaterialized margins() def over the
    // persisted features, so the margin stage is part of the iteration's
    // plan)
    val tIter = timed(keepCache = true) {
      val resid = margin.select(col("__id"),
        floor((col("__p") - col("__y")) * lit(1000000.0) + lit(0.5))
          .cast("long").as("__e"))
      featC.join(resid, Seq("__id"))
        .groupBy(col("__b")).agg(sum(col("__e") * col("__cnt")).as("__g"))
        // bounded: one row per feature bucket (+ bias) — the gradient frame
        .collect()
    }

    // bucket census: is the hot-word mass actually skewing buckets?
    // (still on the cached frame, then release it before full-train;
    // the synthetic bias bucket −1 is excluded — the census is about
    // FEATURE skew, and bias rows are one constant row per doc)
    val census = featC.where(col("__b") =!= -1).groupBy(col("__b"))
      .agg(count(lit(1)).as("rows"), sum(col("__cnt")).as("tokens"))
      // bounded: one row per feature bucket
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    featC.unpersist()
    labelsC.unpersist()
    spark.catalog.clearCache()

    val tFull = timed() {
      Classifier.logisticTrain(docs, "doc_id", "text", label,
        nBuckets, iters = 3, lr = 0.5, salt = salt)
        .scored.write.format("noop").mode("overwrite").save()
    }
    val tokens = census.map(_._3)
    val maxMean = tokens.max.toDouble / (tokens.sum.toDouble / tokens.length)
    val nTokens = tokens.sum

    println(s"""{"probe":"q124","sf_dir":"$dir","feature_build_sec":${f(tFeat)},""" +
      s""""margin_fold_sec":${f(tMargin)},"iteration_sec":${f(tIter)},""" +
      s""""full_train_sec":${f(tFull)},"n_tokens":$nTokens,""" +
      s""""bucket_token_max_over_mean":${f(maxMean)},""" +
      s""""bucket_tokens":[${tokens.sorted.reverse.take(5).mkString(",")}]}""")
    spark.stop()
  }
}
