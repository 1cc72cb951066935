package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-shard layout: deterministic corpus shuffle and sequence
  * packing — the last mile between a cleaned corpus and what a trainer
  * actually reads.
  *
  * Both operators are pure functions of (doc_id, salt): re-running them on
  * the same corpus reproduces the same shards and the same sequence
  * boundaries bit-for-bit, on any partitioning, so a resumed or re-sharded
  * training run sees the same data order (the same determinism contract as
  * [[Sampling.hashSample]]).
  */
object Packing {

  /** Assign every doc to one of `nShards` training shards and give it a
    * deterministic position inside the shard — a reproducible global
    * shuffle of the corpus. Shard membership and order both derive from
    * the md5 coin, never from input order.
    *
    * Scale: one hash shuffle on `shard`. The within-shard sort
    * parallelizes across shards, so size `nShards` >= the cluster's
    * useful parallelism at 100 TB (1024+), not the handful used in tests.
    */
  def shardAssign(df: DataFrame, idCol: String, nShards: Int,
                  salt: String = "shard"): DataFrame = {
    require(nShards >= 1, "nShards must be positive")
    // the order key is the shared md5 coin ([[Sampling.hashLong]]) —
    // DuckDB-replayable as ('0x'||substr(md5(...),1,8))::BIGINT
    val keyed = df.withColumn("__h", Sampling.hashLong(col(idCol), salt))
      .withColumn("shard", pmod(col("__h"), lit(nShards.toLong)).cast("int"))
    val w = Window.partitionBy(col("shard")).orderBy(col("__h"), col(idCol))
    keyed.withColumn("pos", row_number().over(w) - 1).drop("__h")
  }

  /** Pack the shuffled corpus into fixed `budget`-token training sequences
    * (concatenate-and-cut packing, document splitting allowed): within a
    * shard, docs concatenate in shuffle order and the token stream is cut
    * every `budget` tokens. Emits per doc its token offset in the shard
    * stream, the sequence its first token lands in, and how many
    * sequences it spans — everything a shard writer needs to materialize
    * the packed examples.
    *
    * One window (running token sum in shuffle order) over the same
    * shard-partitioning as [[shardAssign]] — no second shuffle when
    * composed. Deterministic: same corpus, same boundaries.
    */
  def packSequences(sharded: DataFrame, tokenCol: String, budget: Long): DataFrame = {
    require(budget >= 1, "budget must be positive")
    val w = Window.partitionBy(col("shard")).orderBy(col("pos"))
    sharded
      .withColumn("start_tok", sum(col(tokenCol)).over(w) - col(tokenCol))
      .withColumn("seq_id", (col("start_tok") / budget).cast("long"))
      .withColumn("n_seqs_spanned",
        when(col(tokenCol) === 0, lit(1L)).otherwise(
          ((col("start_tok") + col(tokenCol) - 1) / budget).cast("long") -
            col("seq_id") + 1L))
  }
}
