package graft.queries

import graft.functions.TextFns
import graft.operators.Sketches
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 surface: driver-gated audits of the approximate scale paths
  * plus the remaining reference maintenance shapes.
  *
  * The sketch operators ([[graft.operators.Sketches]]) are the documented
  * 100 TB substitutes for exact aggregations whose per-group state is
  * unbounded (exact distinct counts, exact percentiles, exact vocabulary
  * top-k). Until this round they were spec-only; q67 gives them a
  * driver-visible correctness row: each sketch runs NEXT TO its exact twin
  * and the query emits the exact value (DuckDB-reproducible) plus a
  * deterministic `within_bound` flag proving the estimate landed inside
  * the sketch's documented error envelope. The oracle replays the exact
  * values and asserts every bound held (`TRUE` literals) — a sketch
  * regression (wrong seed handling, broken merge, bound drift) flips a
  * flag and fails the hash compare.
  */
object GateQueries {

  val queries: Map[String, (org.apache.spark.sql.SparkSession, String) => DataFrame] = Map(

    "q67_sketch_accuracy" -> { (s, d) =>
      // Approx-vs-exact audit: one row per (check family, key) with the
      // exact value and a bound flag. Estimates are deterministic (HLL++
      // and GK have no randomness; the CMS seed is fixed), so the flags
      // are stable across runs and engines.
      val t = Tables(s, d)

      // HLL++ distinct counts vs exact, same single shuffle: both
      // aggregates share one groupBy so the scan and exchange are paid
      // once. Bound: |approx - exact| <= max(3·rsd·exact, 2) — three
      // standard deviations at rsd=0.05, floored for tiny cardinalities
      // where HLL++ is exact by construction (linear counting regime).
      val hll = t.events.select(col("event_type"), col("user_id"))
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("exact_value"),
          approx_count_distinct(col("user_id"), 0.05).as("approx"))
        .select(lit("hll_distinct").as("check"), col("event_type").as("key"),
          col("exact_value"),
          (abs(col("approx") - col("exact_value")) <=
            greatest(ceil(col("exact_value") * lit(0.15)), lit(2L))).as("within_bound"))

      // GK percentile vs exact percentile_disc: the approx p20 must land
      // between the exact p15 and p25 values (rank error of
      // percentile_approx is <= group_size/accuracy, far inside that
      // window). All three exact quantiles come from ONE cume_dist window
      // sharing the groupBy's source-partitioning — a single shuffle.
      val lens = t.documents.select(col("source"), length(col("text")).cast("long").as("len"))
      val w = Window.partitionBy(col("source")).orderBy(col("len"))
      val gk = lens.withColumn("__cd", cume_dist().over(w))
        .groupBy(col("source"))
        .agg(min(when(col("__cd") >= 0.2, col("len"))).as("exact_value"),
          min(when(col("__cd") >= 0.15, col("len"))).as("lo"),
          min(when(col("__cd") >= 0.25, col("len"))).as("hi"),
          percentile_approx(col("len"), lit(0.2), lit(10000)).as("approx"))
        .select(lit("gk_percentile").as("check"), col("source").as("key"),
          col("exact_value"),
          col("approx").between(col("lo"), col("hi")).as("within_bound"))

      // Count-min top-k vs exact vocabulary counts: CMS never undercounts
      // and overcounts by at most eps·N (eps=1e-4, seed fixed), so each
      // of the exact top-10 words must satisfy
      // exact <= estimate <= exact + ceil(eps · total_words).
      val words = t.documentsSpread.select(explode(TextFns.words(col("text"))).as("word"))
      val top = words.groupBy(col("word")).agg(count(lit(1)).as("exact_value"))
        .orderBy(col("exact_value").desc, col("word").asc).limit(10)
      val est = Sketches.cmsTopK(words, "word", top, 10)
      val totals = words.agg(count(lit(1)).as("__total"))
      val cms = top.join(est, "word")
        .crossJoin(broadcast(totals)) // 1-row scalar broadcast
        .select(lit("cms_topk").as("check"), col("word").as("key"),
          col("exact_value"),
          (col("est_count") >= col("exact_value") &&
            col("est_count") <= col("exact_value") + ceil(col("__total") * lit(0.0001)))
            .as("within_bound"))

      hll.unionByName(gk).unionByName(cms)
    },

    "q68_image_decode" -> { (s, d) =>
      // Real image decode, end to end: per doc, build a PNG (even ids) or
      // BMP (odd ids) payload whose dimensions are a pure function of
      // doc_id, then recover format/width/height from the BYTES with the
      // JVM's actual imageio codecs (header-only reads, partition-wise).
      // The oracle recomputes the expected metadata from doc_id arithmetic
      // — a decoder that misreads headers (or silently falls back to the
      // stub) diverges. Encode is the sandbox's fixture generator; in
      // production the payload column comes off the object store.
      import s.implicits._
      val ids = Tables(s, d).documents.select(col("doc_id")).as[Long]
      val payloads = ids.mapPartitions { rows =>
        rows.map { id =>
          val fmt = if (id % 2 == 0) "png" else "bmp"
          (id, graft.operators.Multimodal.encodeTestImage(
            id, width = 8 + (id % 64).toInt, height = 4 + (id % 32).toInt, fmt))
        }
      }.toDF("doc_id", "payload")
      graft.operators.Multimodal.decodeImages(s, payloads)
        .toDF().select(col("doc_id"), col("format"), col("width"), col("height"),
          col("decoded"))
    },

    "q69_exclude_flagged" -> { (s, d) =>
      // Category-exclusion maintenance (reference: adhoc queries/
      // exclude_payment_tokens.sql — delete facts whose key is in the
      // flagged-category dim set; the flag-discovery insert is Merge's
      // covered shape, q15/q36). Spark-first: the kept table is a LEFT
      // ANTI join against the flagged keys — one shuffle (or a broadcast
      // anti when the flag set is small, AQE's call), no destructive
      // in-place delete, so the "before" snapshot stays readable while
      // the exclusion materializes.
      val t = Tables(s, d)
      val flagged = t.part.where(col("p_type") === lit("PROMO"))
        .select(col("p_partkey"))
      t.lineitem.join(flagged, col("l_partkey") === col("p_partkey"), "left_anti")
        .select(col("l_orderkey"), col("l_partkey"), col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"))
    },

    "q70_shard_assign" -> { (s, d) =>
      // Deterministic training-shard layout: every doc gets a shard and a
      // position inside it, both pure functions of (doc_id, salt) — the
      // reproducible global shuffle a trainer reads. Re-running on the
      // same corpus reproduces the same order bit-for-bit regardless of
      // input partitioning.
      graft.operators.Packing.shardAssign(
        Tables(s, d).documents.select(col("doc_id"), col("source")),
        "doc_id", nShards = 8)
        .select(col("doc_id"), col("source"), col("shard"), col("pos"))
    },

    "q71_sequence_pack" -> { (s, d) =>
      // Sequence packing (concatenate-and-cut, splitting allowed): docs
      // concatenate in shard-shuffle order, the token stream cuts every
      // 1024 tokens; each doc reports its stream offset, first sequence,
      // and span — what a packed-example shard writer materializes.
      val docs = Tables(s, d).documents
        .select(col("doc_id"), size(TextFns.words(col("text"))).cast("long").as("n_tokens"))
      val sharded = graft.operators.Packing.shardAssign(docs, "doc_id", nShards = 8)
      graft.operators.Packing.packSequences(sharded, "n_tokens", budget = 1024L)
        .select(col("doc_id"), col("shard"), col("n_tokens"),
          col("start_tok"), col("seq_id"), col("n_seqs_spanned"))
    }
  )

  val oracles: Map[String, String] = Map(
    "q67_sketch_accuracy" ->
      """WITH hll AS (
        |  SELECT 'hll_distinct' AS "check", event_type AS key,
        |    CAST(count(DISTINCT user_id) AS BIGINT) AS exact_value, TRUE AS within_bound
        |  FROM events GROUP BY event_type),
        |gk AS (
        |  SELECT 'gk_percentile' AS "check", source AS key,
        |    CAST(percentile_disc(0.2) WITHIN GROUP (ORDER BY length(text)) AS BIGINT) AS exact_value,
        |    TRUE AS within_bound
        |  FROM documents GROUP BY source),
        |w AS (SELECT unnest(string_split(text,' ')) AS word FROM documents),
        |cms AS (
        |  SELECT 'cms_topk' AS "check", word AS key, exact_value, TRUE AS within_bound
        |  FROM (SELECT word, count(*) AS exact_value FROM w GROUP BY 1
        |        ORDER BY count(*) DESC, word LIMIT 10))
        |SELECT * FROM hll UNION ALL SELECT * FROM gk UNION ALL SELECT * FROM cms""".stripMargin,

    "q68_image_decode" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'bmp' END AS format,
        |  CAST(8 + doc_id % 64 AS INT) AS width,
        |  CAST(4 + doc_id % 32 AS INT) AS height,
        |  TRUE AS decoded
        |FROM documents""".stripMargin,

    "q69_exclude_flagged" ->
      """SELECT l_orderkey, l_partkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem l
        |WHERE NOT EXISTS (SELECT 1 FROM part p
        |  WHERE p.p_partkey = l.l_partkey AND p.p_type = 'PROMO')""".stripMargin,

    "q70_shard_assign" ->
      """WITH h AS (
        |  SELECT doc_id, source,
        |    ('0x'||substr(md5(CAST(doc_id AS VARCHAR)||'#shard'),1,8))::BIGINT AS h
        |  FROM documents)
        |SELECT doc_id, source, CAST(h % 8 AS INT) AS shard,
        |  CAST(row_number() OVER (PARTITION BY h % 8 ORDER BY h, doc_id) - 1 AS INT) AS pos
        |FROM h""".stripMargin,

    "q71_sequence_pack" ->
      """WITH d AS (
        |  SELECT doc_id, CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
        |    ('0x'||substr(md5(CAST(doc_id AS VARCHAR)||'#shard'),1,8))::BIGINT AS h
        |  FROM documents),
        |sh AS (SELECT doc_id, n_tokens, h, CAST(h % 8 AS INT) AS shard FROM d),
        |o AS (SELECT doc_id, n_tokens, shard,
        |    row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) - 1 AS pos
        |  FROM sh),
        |c AS (SELECT doc_id, shard, n_tokens,
        |    CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY pos) - n_tokens AS BIGINT)
        |      AS start_tok
        |  FROM o)
        |SELECT doc_id, shard, n_tokens, start_tok,
        |  CAST(start_tok // 1024 AS BIGINT) AS seq_id,
        |  CAST(CASE WHEN n_tokens = 0 THEN 1
        |    ELSE (start_tok + n_tokens - 1) // 1024 - start_tok // 1024 + 1 END AS BIGINT)
        |    AS n_seqs_spanned
        |FROM c""".stripMargin
  )
}
