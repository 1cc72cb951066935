package graft.operators

import graft.functions.{Portable, VectorFns}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al. 2011) — the embedding-compression
  * step between curation and ANN serving: split each vector into
  * `nSub` subvectors, snap each to its nearest code in a per-subspace
  * codebook, and store only the code ids. A 64-dim float vector
  * becomes `nSub` small integers — at 100 TB of embeddings that is the
  * difference between shuffling/broadcasting vectors and shuffling
  * bytes, and asymmetric-distance ANN then scans codes, not floats.
  * q63's scalar int8 quantization shrinks each COMPONENT independently;
  * PQ shrinks whole SUBSPACES against learned/seeded prototypes, which
  * is what real ANN deployments (IVF-PQ) pair with the q41/q75 IVF
  * routing.
  *
  * Scale shape: the codebook is (nSub × nCodes) rows and broadcasts;
  * encoding is one explode to (vector, subspace) rows, a broadcast
  * join, a per-(vector, subspace) argmin, and one gather shuffle back
  * to vector grain — linear in vectors, nothing pairwise.
  *
  * Determinism (SURVEY §5): subvector distances quantize to q6 before
  * the argmin; ties break on the lower code id; the reconstruction
  * error is the exact-integer-grid sum of the chosen (already
  * q6-quantized, hence exactly grid-valued) distances — order-free
  * longs, map-side combinable (r10; the only remaining per-vector
  * buffer is the nSub-bounded code-string gather, which is a SEQUENCE
  * and cannot be a sum). The DuckDB oracle replays every distance and
  * pick. Codebooks here are SEEDED (the q41 convention —
  * lowest-id vectors are the prototypes) so the oracle can replay
  * codebook construction too; a trained codebook drops in through the
  * same frame shape via [[Similarity.kMeansCentroids]] per subspace.
  */
object Quantize {

  /** (sub, code, cent) rows from the `nCodes` lowest-id vectors — each
    * seed vector's j-th subvector is subspace j's code `id`.
    */
  def seededCodebook(emb: DataFrame, idCol: String, vecCol: String,
                     nSub: Int, nCodes: Int): DataFrame =
    subVectors(emb.where(col(idCol) < nCodes), idCol, vecCol, nSub)
      .select(col("sub"), col(idCol).cast("int").as("code"),
        col("subvec").as("cent"))

  /** (idCol, sub, subvec) rows: each vector split into `nSub` equal
    * slices (dimension must divide evenly — checked via one bounded
    * scalar aggregate, the [[Projection]] contract).
    */
  def subVectors(emb: DataFrame, idCol: String, vecCol: String,
                 nSub: Int): DataFrame = {
    require(nSub >= 1, "nSub must be >= 1")
    val d = emb.agg(max(size(col(vecCol))).as("mx"), min(size(col(vecCol))).as("mn"))
      // bounded: 1-row min/max-dimension scalar
      .collect()(0)
    val inDim = d.getAs[Int]("mx")
    require(inDim == d.getAs[Int]("mn") && inDim % nSub == 0,
      s"vectors must share one dimension divisible by $nSub (saw ${d.getAs[Int]("mn")}..$inDim)")
    val subDim = inDim / nSub
    emb.select(col(idCol), VectorFns.asDouble(col(vecCol)).as("__v"))
      .select(col(idCol), posexplode(transform(sequence(lit(0), lit(nSub - 1)),
        (j: Column) => slice(col("__v"), j * subDim + 1, lit(subDim)))))
      .select(col(idCol), col("pos").cast("int").as("sub"), col("col").as("subvec"))
  }

  /** Encode every vector against `codebook` (sub, code, cent): output
    * (idCol, codes — "_"-joined code string in subspace order,
    * recon_err — q6 exact-integer-grid sum of the chosen subspace
    * distances; each dist2 is already q6-grid-valued, so the long sum
    * is EXACT, not merely deterministic).
    */
  def pqEncode(emb: DataFrame, idCol: String, vecCol: String, nSub: Int,
               codebook: DataFrame): DataFrame = {
    val dist2 = Portable.q6(aggregate(
      zip_with(col("subvec"), col("cent"), (a: Column, b: Column) => (a - b) * (a - b)),
      lit(0.0), (acc: Column, y: Column) => acc + y))
    val w = Window.partitionBy(col(idCol), col("sub"))
      .orderBy(col("dist2").asc, col("code").asc)
    val best = subVectors(emb, idCol, vecCol, nSub)
      .join(broadcast(codebook), Seq("sub"))
      .withColumn("dist2", dist2)
      .withColumn("__rn", row_number().over(w)).where(col("__rn") === 1)
    best.groupBy(col(idCol))
      .agg(
        // the code STRING is a sequence — subspace order is its
        // semantics, so this (nSub-bounded) gather cannot be a sum
        array_sort(collect_list(struct(col("sub"), col("code")))).as("__picks"),
        // dist2 is q6-grid-valued, so the long sum is exact (class doc)
        sum(floor(col("dist2") * lit(1000000.0) + lit(0.5)).cast("long"))
          .as("__qerr"))
      .select(col(idCol),
        array_join(transform(col("__picks"),
          (x: Column) => x.getField("code").cast("string")), "_").as("codes"),
        Portable.q6(col("__qerr").cast("double") / lit(1000000.0)).as("recon_err"))
  }
}
