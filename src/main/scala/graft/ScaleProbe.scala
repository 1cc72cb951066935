package graft

import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-behavior probe (not part of the driver contract): measures the
  * similarity operators' runtime and candidate volume at 1× and 10× corpus
  * to validate the blocking claims in SURVEY §4 — specifically that 16-bit
  * simhash pigeonhole buckets collapse as the corpus grows (4-bit chunks =
  * 16 buckets, so bucket size is O(n) and candidate pairs O(n²)) while
  * 64-bit signatures (16-bit chunks = 65 536 buckets) stay sparse.
  *
  * The 10× corpus replicates each document 10 times with a per-replica
  * deterministic word remap: word-frequency shape and doc lengths are
  * preserved, but replicas share no vocabulary, so replicas are NOT
  * near-dups of each other — output growth stays bounded and any runtime
  * blowup is bucket collapse, not legitimate output.
  *
  * Usage: runMain graft.ScaleProbe <sfDir>   (defaults to sf0.01)
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .appName("graft-scale-probe").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val docs10x = (0 until 10).map { i =>
      docs.select(
        (col("doc_id") + lit(i.toLong * 1000000000L)).as("doc_id"),
        array_join(transform(split(col("text"), " "),
          w => concat(lit("t"), substring(md5(concat(w, lit(s"#r$i"))), 1, 6))), " ")
          .as("text"))
    }.reduce(_ unionAll _)

    def time(label: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"$label","rows":$n,"sec":$sec%.2f}""")
    }

    /** Distinct candidate pairs sharing a pigeonhole chunk bucket — the
      * pre-verification volume that bucket selectivity must bound.
      */
    def candidates(d: DataFrame, nBits: Int): DataFrame = {
      val chunkBits = nBits / 4
      val mask = (1 << chunkBits) - 1
      val chunked = Similarity.simHash(d, "doc_id", "text", nBits)
        .select(col("id"), explode(sequence(lit(0), lit(3))).as("c"),
          expr(s"shiftright(simhash, c * $chunkBits) & $mask").as("cv"))
        .cache()
      chunked.as("a").join(chunked.as("b"),
          col("a.c") === col("b.c") && col("a.cv") === col("b.cv") &&
            col("a.id") < col("b.id"))
        .select(col("a.id"), col("b.id")).distinct()
    }

    // untimed warm-up: JIT + codegen paid before any measured run
    Similarity.simHashNearDups(docs, "doc_id", "text", 16, 3).count()
    Similarity.simHashNearDups64(docs, "doc_id", "text", 3).count()

    Seq(("1x", docs), ("10x", docs10x)).foreach { case (scale, d) =>
      val dd = d.cache(); dd.count()
      time(s"simhash16_candidates_$scale") { candidates(dd, 16) }
      time(s"simhash64_candidates_$scale") { candidates(dd, 64) }
      time(s"simhash16_neardup_$scale") {
        Similarity.simHashNearDups(dd, "doc_id", "text", nBits = 16, maxHamming = 3)
      }
      time(s"simhash64_neardup_$scale") {
        Similarity.simHashNearDups64(dd, "doc_id", "text", maxHamming = 3)
      }
      // decontamination: the eval set stays FIXED (the 1× corpus's first
      // 50 docs) while training grows 10× — per SURVEY §4 the probe join
      // is linear in training n-grams, so runtime must grow ≈ linearly
      time(s"decontaminate_$scale") {
        graft.operators.Decontaminate.ngramOverlap(
          dd, docs.limit(50), "doc_id", "text", n = 3, minRatio = 0.1)
      }
      // training-shard layout at PRODUCTION shard counts (1024, not the
      // gate's 8): shard assignment + packing + per-sequence
      // materialization must stay ~linear in the corpus — the within-shard
      // window parallelizes across shards, so more shards = more
      // parallelism, never less (SURVEY §4)
      time(s"pack_1024shards_$scale") {
        val toks = dd.select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))
        val packed = graft.operators.Packing.packSequences(
          graft.operators.Packing.shardAssign(toks, "doc_id", nShards = 1024),
          "n_tokens", budget = 1024L)
        graft.operators.Packing.packWrite(packed, "doc_id", "n_tokens", budget = 1024L)
      }
      dd.unpersist()
    }

    // frequency-aware salted join on GENUINELY skewed synthetic data: 90%
    // of fact rows hit one key, the rest spread over the key space. The
    // claim (SURVEY §4): saltedJoinHot's runtime tracks the plain join's
    // (same output row set) while spreading the hot key over numSalts
    // reducers, and scales ~linearly 1×→10× — dim replication stays
    // cold + numSalts × hot regardless of fact volume.
    def skewed(n: Long): DataFrame =
      spark.range(n).select(
        when(col("id") % 10 < 9, lit(0L)).otherwise(pmod(col("id"), lit(10000L)))
          .as("k"),
        (col("id") % 97).as("v"))
    val dim = spark.range(10000).select(col("id").as("dk"), (col("id") * 7).as("payload"))
      .cache()
    dim.count()
    Seq(("1x", 1000000L), ("10x", 10000000L)).foreach { case (scale, n) =>
      val fact = skewed(n).cache(); fact.count()
      time(s"plain_join_skew_$scale") {
        fact.join(dim, col("k") === col("dk")).select(col("k"), col("payload"))
      }
      time(s"salted_hot_join_$scale") {
        graft.operators.Skew.saltedJoinHot(fact, dim, "k", "dk",
          numSalts = 8, hotThreshold = n / 100)
          .select(col("k"), col("payload"))
      }
      fact.unpersist()
    }
    spark.stop()
  }
}
