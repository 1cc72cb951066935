package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Probe-only main (r14): A/B of the length-banded blockedLevenshtein
  * against the r13 block-square form, in ONE JVM (equal warmth), on
  * (a) q60's real data — where every c_name is exactly 18 chars, so the
  * band carries zero selectivity and this measures the band's overhead —
  * and (b) a varied-length synthetic entity table, where the band prunes
  * length-impossible pairs before the per-pair edit distance. Also
  * reports the PROBE-PAIR counts (join output before the levenshtein
  * conjunct) for both shapes, and asserts the outputs identical.
  */
object Q60Probe {
  /** the r13 form, verbatim (block-only equi key) */
  private def squareLevenshtein(df: DataFrame, idCol: String, strCol: String,
                                blockCol: String, maxDist: Int): DataFrame = {
    val spark = df.sparkSession
    val parts = spark.conf.get("spark.sql.shuffle.partitions", "200").toInt
    val e = df.select(col(blockCol).as("block"), col(idCol).as("id"),
      col(strCol).as("str")).repartition(parts, col("block"))
    e.as("a").join(e.as("b"),
        col("a.block") === col("b.block") && col("a.id") < col("b.id") &&
          levenshtein(col("a.str"), col("b.str"), maxDist) >= 0)
      .select(col("a.block").as("block"),
        col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.str").as("str_a"), col("b.str").as("str_b"),
        levenshtein(col("a.str"), col("b.str"), maxDist).as("distance"))
  }

  private def probePairs(df: DataFrame, strCol: String, blockCol: String,
                         banded: Boolean, maxDist: Int): Long = {
    val width = maxDist + 1
    val base = df.select(col(blockCol).as("block"), col("id"),
      (length(col(strCol)) / width).cast("int").as("__band"))
    if (!banded)
      base.as("a").join(base.as("b"),
        col("a.block") === col("b.block") && col("a.id") < col("b.id")).count()
    else {
      val ea = base.select(col("block"), col("id"),
        explode(array(col("__band") - 1, col("__band"), col("__band") + 1)).as("__vband"))
      ea.as("a").join(base.as("b"),
        col("a.block") === col("b.block") && col("a.__vband") === col("b.__band") &&
          col("a.id") < col("b.id")).count()
    }
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val real = spark.read.parquet(
      sys.env.getOrElse("SPARK_GRAFT_Q60_DATA", "/root/repo/tmp/sf1/customer.parquet"))
      .select(col("c_custkey").as("id"), col("c_name").as("str"),
        col("c_nationkey").as("block"))
    // varied-length synthetic: entity keys of length 6..40, 40k rows, 25 blocks
    val varied = spark.range(40000).select(col("id"),
        (col("id") % 25).cast("int").as("block"),
        concat(lit("entity-"), col("id"),
          substring(lit("x" * 40), lit(1), (col("id") % 28).cast("int"))).as("str"))
      .cache()
    varied.count()

    def timeIt(tag: String, f: () => DataFrame): (Long, Double) = {
      val reps = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = f().count()
        (n, (System.nanoTime() - t0) / 1e9)
      }
      val best = reps.map(_._2).min
      System.err.println(f"[q60probe] $tag rows=${reps.head._1} min=${best}%.3f reps=${reps.map(_._2).map(t => f"$t%.2f").mkString(",")}")
      (reps.head._1, best)
    }

    for ((name, df) <- Seq(("real_sf1_uniform18", real), ("varied_len_40k", varied))) {
      val pSq = probePairs(df, "str", "block", banded = false, maxDist = 2)
      val pBd = probePairs(df, "str", "block", banded = true, maxDist = 2)
      val (nOld, tOld) = timeIt(s"$name square", () =>
        squareLevenshtein(df, "id", "str", "block", 2))
      val (nNew, tNew) = timeIt(s"$name banded", () =>
        graft.operators.Fuzzy.blockedLevenshtein(df, "id", "str", "block", 2))
      require(nOld == nNew, s"$name: output rows differ: $nOld vs $nNew")
      // order-free content check
      val hOld = squareLevenshtein(df, "id", "str", "block", 2)
        .select(sum(xxhash64(col("block"), col("id_a"), col("id_b"), col("distance"))))
        .as[Long].head()
      val hNew = graft.operators.Fuzzy.blockedLevenshtein(df, "id", "str", "block", 2)
        .select(sum(xxhash64(col("block"), col("id_a"), col("id_b"), col("distance"))))
        .as[Long].head()
      require(hOld == hNew, s"$name: content hash differs")
      println(f"""{"probe":"q60_$name","probe_pairs_square":$pSq,"probe_pairs_banded":$pBd,"pair_cut_x":${pSq.toDouble / math.max(1, pBd)}%.2f,"sec_square":$tOld%.3f,"sec_banded":$tNew%.3f,"rows":$nOld,"hash_equal":true}""")
    }
    spark.stop()
  }
}
