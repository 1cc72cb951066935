package graft.queries

import graft.functions.{HashFns, Portable, TextFns}
import graft.operators.{Dedup, Multimodal, Sampling, Similarity}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** LLM-training-data pipeline surface (SURVEY.md §2, rows 20-30): dedup
  * cascade (exact → minhash/LSH → simhash → n-gram), ANN, text analysis,
  * fingerprinting, multimodal binary plumbing — all over the synthetic
  * `documents` / `embeddings` tables.
  *
  * Portability contract is the same as CoreQueries: md5-based hashing,
  * floor-quantized floats, deterministic tiebreaks everywhere.
  */
object LLMQueries {
  private type Q = (SparkSession, String) => DataFrame

  // Shared MinHash-LSH parameters (q21): word-trigram shingles, 12 hashes
  // in 4 bands of 3 — tuned so jaccard≈0.98 planted near-dups are certain
  // candidates while random pairs (j≈0.01) never band-collide.
  private val ShingleN = 3
  private val NumSeeds = 12
  private val RowsPerBand = 3

  val queries: Map[String, Q] = Map(
    "q20_dedup_exact" -> { (s, d) =>
      // documents (not documentsSpread): hash-groupBy dedup already owns a
      // shuffle on text_hash, so a scan-side doc_id repartition buys no
      // parallelism the partial agg needs at this compute weight — it just
      // adds an exchange (r03 bench: 0.32s → 0.74s). At production scale
      // the table arrives as thousands of splits anyway.
      Dedup.exactByCanonicalWords(Tables(s, d).documents, "doc_id", "text")
    },

    "q21_minhash_pairs" -> { (s, d) =>
      Similarity.minHashNearDups(Tables(s, d).documentsSpread, "doc_id", "text",
        ShingleN, NumSeeds, RowsPerBand)
    },

    "q22_simhash" -> { (s, d) =>
      // 16-bit signature for the oracle check (md5 word hash — DuckDB can
      // reproduce it); the library supports up to 64 bits (xxhash64 path).
      Similarity.simHash(Tables(s, d).documentsSpread, "doc_id", "text", 16)
        .select(col("id").as("doc_id"), col("simhash"))
    },

    "q23_ngram_jaccard" -> { (s, d) =>
      Similarity.ngramNearDups(Tables(s, d).documentsSpread, "doc_id", "text",
        blockCol = "source", n = 2, minJaccard = 0.05)
    },

    "q24_ann_cosine" -> { (s, d) =>
      val emb = Tables(s, d).embeddings
      Similarity.cosineTopK(emb.where(col("vec_id") < 10), emb, "vec_id", "embedding", 5)
    },

    "q25_lang_id" -> { (s, d) =>
      val hits = TextFns.langKeywords.toSeq.sortBy(_._1).map { case (reg, kws) =>
        reg -> TextFns.keywordHits(col("text"), kws).cast("bigint")
      }
      val Seq(hp, hs, hq) = hits.map(_._2)
      Tables(s, d).documents.select(
        col("doc_id"),
        size(TextFns.words(col("text"))).cast("bigint").as("n_words"),
        hp.as("hits_plain"), hs.as("hits_sparkish"), hq.as("hits_sqlish"),
        when(hp >= hs && hp >= hq, "plain")
          .when(hs >= hq, "sparkish").otherwise("sqlish").as("register"))
    },

    "q26_quality_score" -> { (s, d) =>
      Tables(s, d).documents
        .select(col("doc_id"),
          TextFns.qualityFeatures(col("text"), col("n_chars")).as("__q"))
        .select(col("doc_id"), col("__q.n_words"), col("__q.uniq_ratio"),
          col("__q.stop_ratio"), col("__q.avg_word_len"), col("__q.quality_score"))
    },

    "q27_token_count" -> { (s, d) =>
      Tables(s, d).documents.select(
        col("doc_id"),
        size(TextFns.words(col("text"))).cast("bigint").as("n_ws_tokens"),
        size(expr("regexp_extract_all(text, '[a-z]+|[0-9]+', 0)")).cast("bigint").as("n_re_tokens"),
        ceil(col("n_chars") / 4.0).cast("bigint").as("n_subword_est"))
    },

    "q28_fingerprint" -> { (s, d) =>
      // position-salted xor fingerprint (rolling-hash family): order-
      // sensitive (unlike the canonical-word-set hash of q20) yet still a
      // single codegen'd projection — no shuffle at all.
      val hashed = transform(TextFns.words(col("text")),
        (word, i) => HashFns.md5Long(concat(word, lit(":"), i.cast("string")), 15))
      Tables(s, d).documentsSpread.select(
        col("doc_id"),
        aggregate(hashed, lit(0L), (acc, x) => acc.bitwiseXOR(x)).as("fingerprint"))
    },

    "q29_embedding_near_dup" -> { (s, d) =>
      Similarity.nearDupWithin(Tables(s, d).embeddings, "vec_id", "embedding",
        blockCol = "label", minCosine = 0.35)
    },

    "q142_srp_near_dup" -> { (s, d) =>
      // q29's 100-TB SCALE PATH driver-gated (r11 — the same
      // wired-but-spec-only class q139 closed for drift): nearDupSRP
      // pre-buckets by a 4-bit sign-random-projection signature so the
      // pair join runs within (block, srp-bucket) cells instead of
      // q29's full within-block square — recall < 1 by construction,
      // and the oracle replays the IDENTICAL md5-seeded ±1 projections
      // with q112's ordered list_reduce fold, so what is hash-matched
      // is the scale path's own semantics, not its agreement with q29.
      // The require pins the bucketing genuinely partitions at every
      // gated dir (one occupied bucket would make this row q29 again).
      val emb = Tables(s, d).embeddings
      // bounded: 1-row max-dimension scalar (the Quantize contract);
      // null-safe read so an empty fixture fails the require below with
      // the contract message, not an NPE (ADVICE r11)
      val dim = Option(emb.agg(max(size(col("embedding")))).head().get(0))
        .map(_.asInstanceOf[Int]).getOrElse(0)
      require(dim >= 1, "q142: embeddings fixture must carry non-empty vectors")
      // bounded: 1-row distinct-count scalar (≤ 2^srpBits buckets exist)
      val nBuckets = emb.select(graft.functions.VectorFns.srpBucket(
          graft.functions.VectorFns.asDouble(col("embedding")), 4, "srp-v1", dim)
          .as("b"))
        .agg(countDistinct(col("b"))).head().getLong(0)
      require(nBuckets > 1,
        s"q142: SRP must genuinely partition the vectors, got $nBuckets bucket")
      Similarity.nearDupSRP(emb, "vec_id", "embedding",
        blockCol = "label", minCosine = 0.35, srpBits = 4)
    },

    "q30_binary_pipeline" -> { (s, d) =>
      // Opaque-binary column pipeline, all-real since round 6 (the
      // round-1 decode stub now lives only as the documented audio/video
      // plug-point; q68/q73 gate REAL image decode): per-asset byte
      // stats (size, md5 content hash), fixed-frame demux
      // (explodeFrames), and overlapping audio-style windows
      // (slidingWindows — previously spec-only). frame_bytes summing
      // back to n_bytes proves the demux is lossless; the oracle replays
      // every count from octet arithmetic.
      val withBin = Multimodal.withPayload(Tables(s, d).documents, "doc_id", "text")
      val base = withBin.select(col("doc_id"),
        length(col("payload")).cast("long").as("n_bytes"),
        md5(col("payload")).as("content_hash"))
      val frames = Multimodal.explodeFrames(withBin, frameBytes = 1024)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_frames"),
          sum(length(col("frame")).cast("long")).as("frame_bytes"))
      val wins = Multimodal.slidingWindows(withBin, width = 256, hop = 128)
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_windows"))
      base.join(frames, Seq("doc_id"), "left").join(wins, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_bytes"), col("content_hash"),
          coalesce(col("n_frames"), lit(0L)).as("n_frames"),
          coalesce(col("frame_bytes"), lit(0L)).as("frame_bytes"),
          coalesce(col("n_windows"), lit(0L)).as("n_windows"))
    },

    "q33_simhash_near_dup" -> { (s, d) =>
      // pigeonhole-blocked simhash near-dup (exact for hamming <= 3);
      // the oracle checks the same set via the brute-force pair filter.
      // 16-bit here because the oracle must reproduce the md5 word hash;
      // the production default is simHashNearDups64 (SURVEY §4).
      Similarity.simHashNearDups(Tables(s, d).documentsSpread, "doc_id", "text",
        nBits = 16, maxHamming = 3)
    },

    "q41_ivf_topk" -> { (s, d) =>
      // IVF with deterministic seed centroids (lowest-id vectors) so the
      // oracle can replay the identical assignment/probe/top-k ranking;
      // trained centroids go through ivfTopKWith(kMeansCentroids(...)).
      val emb = Tables(s, d).embeddings
      Similarity.ivfTopK(emb.where(col("vec_id") < 10), emb, "vec_id", "embedding",
        k = 5, numCentroids = 8, nProbe = 3)
    },

    "q42_dedup_clusters" -> { (s, d) =>
      // pairs → decisions: minhash near-dup pairs at jaccard >= 0.5 become
      // an undirected graph; connected components assign every doc its
      // cluster (min doc id); `keep` marks the one survivor per cluster.
      // Docs in no pair are their own singleton cluster.
      val docs = Tables(s, d).documentsSpread
      val edges = Similarity.minHashNearDups(docs, "doc_id", "text",
        ShingleN, NumSeeds, RowsPerBand).where(col("jaccard") >= 0.5)
      val comp = Dedup.connectedComponents(edges, "id_a", "id_b")
        .withColumnRenamed("node", "doc_id")
      docs.select(col("doc_id")).join(comp, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("component"), col("doc_id")).as("cluster_id"))
        .withColumn("keep", col("doc_id") === col("cluster_id"))
    },

    "q136_leakage_safe_split" -> { (s, d) =>
      // q42's cluster assignment becomes the SPLIT unit: the 80/10/10
      // train/valid/test coin is thrown per CLUSTER (md5 on the cluster
      // id — Sampling.groupSplit), so near-duplicates can never straddle
      // train and eval, the contamination a per-doc coin cannot prevent
      // (q51 DETECTS the leak post-hoc; this prevents it at split time).
      // Requires pin the safety branch live on the gated fixture: a
      // multi-doc cluster exists (comp is CC-materialized, so the probe
      // reads its checkpoint blocks, not a second minhash pass) and all
      // three splits are non-empty.
      val docs = Tables(s, d).documentsSpread
      val edges = Similarity.minHashNearDups(docs, "doc_id", "text",
        ShingleN, NumSeeds, RowsPerBand).where(col("jaccard") >= 0.5)
      val comp = Dedup.connectedComponents(edges, "id_a", "id_b")
        .withColumnRenamed("node", "doc_id")
      require(comp.limit(1).count() == 1,
        "q136 fixture must contain a multi-doc near-dup cluster")
      val assigned = docs.select(col("doc_id")).join(comp, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("component"), col("doc_id")).as("cluster_id"))
      // NOT persisted (probed r13): the splits pin re-runs only the
      // cheap docs ⋈ checkpointed-components join (comp is
      // CC-materialized), and a persist here would RETAIN comp's
      // localCheckpoint RDD through the cache entry's lineage past
      // catalog.clearCache() — the residency GraphSpec's clean-cache
      // invariant (and the per-session cache contract) forbids
      val out = Sampling.groupSplit(assigned, "cluster_id", "q136",
        trainFrac = 0.8, validFrac = 0.1)
      val splits = out.select(col("split")).distinct().count()
      require(splits == 3, s"q136 fixture must reach all three splits, got $splits")
      out
    },

    "q43_stratified_sample" -> { (s, d) =>
      // deterministic md5-coin sampling: up-weight three sources, keep all
      // of src5, 20% of the rest — membership is a pure function of
      // (doc_id, salt), identical on re-run at any partitioning.
      Sampling.stratifiedSample(Tables(s, d).documents, "source", "doc_id",
        rates = Map("src0" -> 0.5, "src1" -> 0.5, "src2" -> 0.5, "src5" -> 1.0),
        defaultRate = 0.2, salt = "q43")
        .select(col("doc_id"), col("source"))
    },

    "q44_repetition_score" -> { (s, d) =>
      // Gopher-style repetition filters: duplicate-bigram fraction and
      // most-frequent-word mass. The bigram ratio is a pure projection;
      // the top-word mass needs a (doc, word) count — two keyed shuffles,
      // never a driver loop. Flag thresholds compare the ROUNDED ratios so
      // the boolean is reproducible across engines.
      val docs = Tables(s, d).documentsSpread
      val base = docs
        .select(col("doc_id"), TextFns.words(col("text")).as("__w"))
        .select(col("doc_id"),
          size(col("__w")).cast("bigint").as("n_words"),
          greatest(size(col("__w")) - 1, lit(0)).cast("bigint").as("n_bigrams"),
          size(array_distinct(TextFns.shinglesOfWords(col("__w"), 2)))
            .cast("bigint").as("n_distinct_bigrams"))
      val topWord = docs
        .select(col("doc_id"), explode(TextFns.words(col("text"))).as("__word"))
        .groupBy(col("doc_id"), col("__word")).agg(count(lit(1)).as("__c"))
        .groupBy(col("doc_id")).agg(max(col("__c")).as("top_word_n"))
      base.join(topWord, Seq("doc_id"))
        .select(col("doc_id"), col("n_words"),
          when(col("n_bigrams") > 0,
            Portable.q6(lit(1.0) - col("n_distinct_bigrams") / col("n_bigrams")))
            .otherwise(lit(0.0)).as("dup_bigram_ratio"),
          Portable.q6(col("top_word_n") / col("n_words")).as("top_word_ratio"))
        .withColumn("flagged",
          col("dup_bigram_ratio") > 0.2 || col("top_word_ratio") > 0.1)
    },

    "q45_pii_scrub" -> { (s, d) =>
      // PII redaction over the only PII-shaped strings in the test corpus:
      // the customer profile blob (c_name carries a 9-digit run). Email and
      // phone legitimately match zero rows here — the full pattern chain is
      // behavior-checked in ScrubSpec; this query checks engine parity of
      // the regex dialect on real data. Counts are taken stepwise on the
      // progressively scrubbed string so a <PHONE> match can't also be
      // counted as <NUM>.
      val blob = concat_ws(" ", col("c_name"), col("c_mktsegment"))
      val Seq((emailRe, emailTok), (phoneRe, phoneTok), (numRe, numTok)) =
        TextFns.piiRedactions
      Tables(s, d).customer
        .select(col("c_custkey"), blob.as("__t0"))
        .select(col("c_custkey"), col("__t0"),
          regexp_replace(col("__t0"), emailRe, emailTok).as("__t1"))
        .select(col("c_custkey"), col("__t0"), col("__t1"),
          regexp_replace(col("__t1"), phoneRe, phoneTok).as("__t2"))
        .select(col("c_custkey"),
          size(regexp_extract_all(col("__t0"), lit(emailRe), lit(0))).cast("bigint").as("n_emails"),
          size(regexp_extract_all(col("__t1"), lit(phoneRe), lit(0))).cast("bigint").as("n_phones"),
          size(regexp_extract_all(col("__t2"), lit(numRe), lit(0))).cast("bigint").as("n_nums"),
          regexp_replace(col("__t2"), numRe, numTok).as("clean_text"))
    },

    "q46_incremental_neardup" -> { (s, d) =>
      // daily-ingest dedup: odd doc_ids arrive today, even ids are the
      // existing corpus whose signatures are precomputed — only pairs
      // involving an incoming doc are produced, and base text is shingled
      // only for candidate docs. Signatures are identical to the batch
      // construction, so the oracle is q21's SQL restricted to pairs with
      // an odd member.
      val docs = Tables(s, d).documentsSpread
      val base = docs.where(col("doc_id") % 2 === 0)
      val incoming = docs.where(col("doc_id") % 2 === 1)
      val baseSig = Similarity.minHashSignatures(
        Similarity.shingleSets(base, "doc_id", "text", ShingleN), NumSeeds)
      Similarity.minHashNearDupsIncremental(base, incoming, "doc_id", "text",
        ShingleN, NumSeeds, RowsPerBand, baseSignatures = Some(baseSig))
    },

    "q47_corpus_pipeline" -> { (s, d) =>
      // the end-to-end pre-training corpus clean, each stage feeding the
      // next: quality gate → exact canonical dedup → minhash near-dup
      // clustering (keep cluster minimum) → deterministic 80% sample.
      // Every stage is an operator proven alone by q26/q20/q42/q43; this
      // query proves the COMPOSITION against a single DuckDB oracle.
      val docs = Tables(s, d).documentsSpread
      val gated = docs.withColumn("quality_score",
          TextFns.qualityFeatures(col("text"), col("n_chars")).getField("quality_score"))
        .where(col("quality_score") >= 0.5)
      // exact dedup: keep the min doc_id of each canonical word set.
      // min_by over a hash aggregate, not row_number over a window: same
      // survivor (doc_id is unique), but map-side partial min_by collapses
      // duplicates before the shuffle and there is no per-partition sort.
      // Cached: consumed twice (the near-dup edge pipeline and the final
      // survivor join).
      val keepExact = gated
        .groupBy(Dedup.canonicalWordsHash(col("text")).as("__canon"))
        .agg(min_by(
          struct(col("doc_id"), col("source"), col("quality_score"), col("text")),
          col("doc_id")).as("__r"))
        .select(col("__r.doc_id").as("doc_id"), col("__r.source").as("source"),
          col("__r.quality_score").as("quality_score"), col("__r.text").as("text"))
        .cache()
      // near-dup clustering among exact survivors; keep cluster minima
      val edges = Similarity.minHashNearDups(keepExact, "doc_id", "text",
        ShingleN, NumSeeds, RowsPerBand).where(col("jaccard") >= 0.5)
      val comp = Dedup.connectedComponents(edges, "id_a", "id_b")
        .withColumnRenamed("node", "doc_id")
      val keepNear = keepExact.join(comp, Seq("doc_id"), "left")
        .where(col("component").isNull || col("component") === col("doc_id"))
      // deterministic sample of the cleaned corpus
      Sampling.hashSample(keepNear, "doc_id", 0.8, "corpus")
        .select(col("doc_id"), col("source"), col("quality_score"))
    },

    "q50_distinct_users" -> { (s, d) =>
      // exact per-key distinct counting (owner-set sizes, the collection-
      // similarity denominators): two-phase distinct aggregation on the
      // key shuffle. This is the ORACLE-CHECKED exact twin of
      // Sketches.approxDistinct — at 100 TB the HLL++ form replaces the
      // O(distinct) per-group state with a fixed register array.
      Tables(s, d).events.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_distinct_users"),
          count(lit(1)).as("n_events"))
    },

    "q111_lm_perplexity" -> { (s, d) =>
      // Statistical LM quality filter (LanguageModel.bigramCrossEntropy):
      // an add-0.5-smoothed bigram model is trained ON the corpus in one
      // map-side-combined aggregation, then every document is scored by
      // its mean negative log-likelihood under that model — the
      // CCNet-style distributional complement of q26's heuristic quality
      // ratios (wrong-language / template-spam / shuffled-token docs sit
      // in the high-entropy tail). Every intermediate is linear in
      // corpus tokens or vocabulary-sized; the per-doc sum is the
      // order-free 1e-6 integer-grid sum (map-side combinable, no array
      // buffer) and the DuckDB oracle replays it bit-for-bit.
      graft.operators.LanguageModel.bigramCrossEntropy(
        Tables(s, d).documentsSpread, "doc_id", "text",
        alpha = 0.5, tau = 8.0)
    },

    "q112_random_projection" -> { (s, d) =>
      // JL dimensionality reduction (Projection.randomProject): every
      // 64-dim embedding → 16 ±1-projected components, the "shrink the
      // vectors before the ANN fan-out" step. The sign matrix is md5-
      // derived on the DRIVER and shipped as a plan literal (executors do
      // zero hashing; the whole operator is one codegen'd projection, no
      // shuffle). Exploded output so the oracle checks each component.
      graft.operators.Projection.randomProject(
        Tables(s, d).embeddings, "vec_id", "embedding",
        outDim = 16, salt = "rp-v1")
    },

    "q116_bpe_train" -> { (s, d) =>
      // Distributed BPE tokenizer induction (Bpe.train): 5 merges
      // learned over the corpus word vocabulary, output = the final
      // segmentation of every word — so ONE wrong merge (wrong pair,
      // wrong tiebreak, wrong application order) reshapes many rows and
      // hash-mismatches. After the single corpus pass into (word, freq),
      // every iteration is vocabulary-sized; the only driver state is
      // each iteration's winning pair (1-row bounded collect). The
      // oracle replays the same 5 unrolled iterations (the q75/q109
      // construction, for tokenizers).
      val vocab = graft.operators.Bpe.wordVocab(Tables(s, d).documentsSpread, "text")
      val (rules, seg) = graft.operators.Bpe.train(vocab, nMerges = 5)
      require(rules.size == 5 && rules.map(_.rank) == (1 to 5),
        s"q116: expected 5 ranked merges, got $rules")
      seg.select(col("word"), col("freq"), col("tokens"), col("n_tokens"))
    },

    "q119_perplexity_buckets" -> { (s, d) =>
      // CCNet's head/middle/tail corpus split, composed from q111's LM
      // scores and the DISTRIBUTED global rank (Rankings.globalRank —
      // range-partitioned positions + per-partition offsets, never a
      // single-partition window; the corpus-scale path where a bare
      // `ntile(3) over (order by ...)` would funnel 100 TB through one
      // task). Terciles follow ntile's fill rule via exact integer
      // arithmetic: bucket = ((rank-1)*3) div n.
      val scored = graft.operators.LanguageModel.bigramCrossEntropy(
          Tables(s, d).documentsSpread, "doc_id", "text", alpha = 0.5, tau = 8.0)
        .select(col("doc_id"), col("cross_entropy"))
      val ranked = graft.operators.Rankings.globalRank(scored,
        Seq(col("cross_entropy").asc, col("doc_id").asc), "ce_rank")
      ranked.crossJoin(broadcast(ranked.agg(count(lit(1)).as("__n"))))
        .withColumn("bucket",
          expr("CASE ((ce_rank - 1) * 3) div __n WHEN 0 THEN 'head' " +
            "WHEN 1 THEN 'middle' ELSE 'tail' END"))
        .select(col("doc_id"), col("cross_entropy"), col("ce_rank"), col("bucket"))
    },

    "q121_token_budget_plan" -> { (s, d) =>
      // Token-budget mixture planning (Sampling.tokenBudgetPlan): fill
      // half the corpus's tokens at 30% en / 40% zh / 10% each de-es-fr.
      // zh's demand (0.4 × half ≈ 20% of tokens) exceeds its ~10%
      // supply with 2× margin at every SF, so its rate caps at 1.0 and
      // the plan surfaces the shortfall — the "source exhausted" branch
      // — while en solves a fractional rate; the require pins both
      // branches live. Budget is a bounded scalar collect (the
      // Incremental terminal-ts contract); every audit column is an
      // exact md5-coin integer.
      val toks = Tables(s, d).documents.select(col("doc_id"), col("lang"),
        size(TextFns.words(col("text"))).cast("long").as("n_tokens"))
      val total = toks.agg(sum(col("n_tokens"))).collect()(0).getLong(0)
      // persisted (r13): two actions consume it — the branch pin and the
      // returned frame; unpersisted, each re-ran the corpus tokenize +
      // per-language aggregation (bounded frame: one row per target
      // language; the contract mains clear caches per query)
      val out = Sampling.tokenBudgetPlan(toks, "doc_id", "lang", "n_tokens",
        Map("en" -> 0.3, "de" -> 0.1, "es" -> 0.1, "fr" -> 0.1, "zh" -> 0.4),
        budgetTokens = total / 2, salt = "mix121")
        .persist()
      // bounded: one row per target language (the plan frame is per-group)
      val rates = out.select(col("rate")).collect().map(_.getDouble(0))
      require(rates.exists(_ == 1.0) && rates.exists(_ < 1.0),
        s"q121: fixture must exercise both the capped and fractional branches, got ${rates.toSeq}")
      out
    }
  )

  /** The bigram-LM scoring chain shared by q111 (perplexity filter) and
    * q119 (corpus buckets): corpus-trained add-0.5 model, per-doc
    * exact-integer-grid log-prob sum (each bigram's logp quantized to
    * the 1e-6 grid as a BIGINT, summed order-free — the q104 BM25
    * construction, adopted in r10), ending at `folded(doc_id, qs,
    * n_bigrams)`.
    */
  private[queries] val LmFoldedCte: String =
    """WITH base AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
      |bgr AS (SELECT doc_id, u['w1'] AS w1, u['w2'] AS w2
      |  FROM (SELECT doc_id, unnest(list_transform(range(1, len(w)),
      |      i -> {'w1': w[i], 'w2': w[i+1]})) AS u
      |    FROM base WHERE len(w) >= 2)),
      |c2 AS (SELECT w1, w2, count(*) AS c2 FROM bgr GROUP BY 1, 2),
      |c1 AS (SELECT w1, sum(c2) AS c1 FROM c2 GROUP BY 1),
      |v AS (SELECT count(DISTINCT word) AS v
      |  FROM (SELECT unnest(w) AS word FROM base)),
      |scored AS (SELECT b.doc_id,
      |    ln((c2.c2 + 0.5) / (c1.c1 + 0.5 * v.v)) AS logp
      |  FROM bgr b JOIN c2 USING (w1, w2) JOIN c1 USING (w1), v),
      |folded AS (SELECT doc_id,
      |    CAST(sum(CAST(floor(logp * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS qs,
      |    count(*) AS n_bigrams
      |  FROM scored GROUP BY 1)""".stripMargin

  /** The srp-v1 sign-projection bucket replay over an `e(vec_id, …, v)`
    * CTE: 4 deterministic ±1 projections re-derived from md5 hex slices,
    * folded in index order via q112's list_reduce construction (the
    * ORDERED sum is the contract — a GROUP BY sum would be
    * order-unspecified); bucket bits mirror srpBucket's strict proj > 0.
    * Token-for-token shared by q142 (within-label near-dup) and q143's
    * cluster-scoped SemDeDup composition (GateQueries) so the two gates
    * replay the IDENTICAL projections; ends at `buck(vec_id, bucket)`.
    */
  private[queries] val SrpBuckCte: String =
    """bs AS (SELECT unnest(range(0, 4)) AS b),
      |ii AS (SELECT unnest(range(0, (SELECT max(len(v)) FROM e))) AS i),
      |sg AS (SELECT b, i,
      |    CASE WHEN ('0x'||substr(md5('srp-v1:'||b||':'||i), 1, 1))::BIGINT % 2 = 0
      |      THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END AS s
      |  FROM bs, ii),
      |terms AS (SELECT e.vec_id, sg.b, sg.i, e.v[sg.i + 1] * sg.s AS t
      |  FROM e CROSS JOIN sg WHERE sg.i < len(e.v)),
      |proj AS (SELECT vec_id, b,
      |    CAST(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |        list(CAST(t AS DOUBLE) ORDER BY i)), (a, x) -> a + x) AS DOUBLE) AS p
      |  FROM terms GROUP BY 1, 2),
      |buck AS (SELECT vec_id,
      |    CAST(sum(CASE WHEN p > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS bucket
      |  FROM proj GROUP BY 1)""".stripMargin

  /** The minhash→LSH→verified-jaccard→connected-components replay shared
    * by q42 (dedup decisions) and q136 (leakage-safe split): recursive
    * min-label reachability over the near-dup pair graph, ending at
    * `reach(node, lbl)` — fold with `min(lbl)` per node to get each
    * doc's cluster. Token-for-token shared so the two gates cannot
    * drift apart on the pipeline they both replay.
    */
  private[queries] val MinhashCompCte: String =
    """toks AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
      |sh AS (SELECT DISTINCT doc_id, unnest(CASE WHEN len(w) >= 3
      |        THEN list_transform(range(1, len(w)-1), i -> w[i]||' '||w[i+1]||' '||w[i+2])
      |        ELSE [] END) AS shingle FROM toks),
      |ab AS (SELECT doc_id, ('0x'||substr(md5(shingle),1,8))::BIGINT AS a,
      |        ('0x'||substr(md5(shingle),9,8))::BIGINT AS b FROM sh),
      |mh AS (SELECT doc_id, CAST(s AS INT) AS seed,
      |        min((a + s*(2*b+1)) % 4294967296) AS minh
      |       FROM ab, (SELECT unnest(range(0,12)) AS s) GROUP BY 1,2),
      |banded AS (SELECT doc_id, CAST(seed // 3 AS INT) AS band,
      |        string_agg(CAST(minh AS VARCHAR), '_' ORDER BY seed) AS band_key
      |       FROM mh GROUP BY 1,2),
      |cands AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      |       FROM banded a JOIN banded b
      |         ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
      |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
      |inter AS (SELECT c.id_a, c.id_b, count(sb.shingle) AS intersection
      |       FROM cands c
      |       JOIN sh sa ON c.id_a = sa.doc_id
      |       LEFT JOIN sh sb ON c.id_b = sb.doc_id AND sa.shingle = sb.shingle
      |       GROUP BY 1,2),
      |prs AS (SELECT i.id_a, i.id_b
      |       FROM inter i JOIN sizes za ON i.id_a = za.doc_id JOIN sizes zb ON i.id_b = zb.doc_id
      |       WHERE floor((i.intersection * 1.0 / (za.sz + zb.sz - i.intersection)) * 1000000.0 + 0.5) / 1000000.0 >= 0.5),
      |edges AS (SELECT id_a AS ea, id_b AS eb FROM prs UNION SELECT id_b, id_a FROM prs),
      |reach(node, lbl) AS (
      |  SELECT doc_id, doc_id FROM documents
      |  UNION
      |  SELECT e.eb, r.lbl FROM reach r JOIN edges e ON e.ea = r.node)""".stripMargin

  /** The 5-merge BPE training trajectory (q116), factored so q127's
    * corpus-encoding oracle replays the SAME trained segmentation: ends
    * at `s5(word, freq, tokens)`.
    */
  private[queries] val BpeChainCte: String = {
    def iter(prev: String, n: Int): String =
      s"""p$n AS (SELECT pair, sum(freq) AS cnt FROM (
         |    SELECT freq, unnest(list_transform(range(1, len(l)),
         |        i -> l[i] || ' ' || l[i+1])) AS pair
         |    FROM (SELECT freq, string_split(tokens, ' ') AS l FROM $prev))
         |  GROUP BY 1),
         |m$n AS (SELECT split_part(pair, ' ', 1) AS a, split_part(pair, ' ', 2) AS b
         |  FROM p$n ORDER BY cnt DESC, pair LIMIT 1),
         |s$n AS (SELECT word, freq,
         |    list_reduce(list_prepend('', string_split(tokens, ' ')),
         |      (acc, x) -> CASE WHEN acc = '' THEN x
         |        WHEN (acc = m.a OR ends_with(acc, ' ' || m.a)) AND x = m.b
         |          THEN left(acc, len(acc) - len(m.a)) || m.a || m.b
         |        ELSE acc || ' ' || x END) AS tokens
         |  FROM $prev, m$n m)""".stripMargin
    s"""v AS (SELECT word, count(*) AS freq FROM (
       |    SELECT unnest(string_split(text, ' ')) AS word FROM documents) GROUP BY 1),
       |s0 AS (SELECT word, freq,
       |    trim(regexp_replace(word, '(.)', '\\1 ', 'g')) || ' </w>' AS tokens FROM v),
       |${iter("s0", 1)},
       |${iter("s1", 2)},
       |${iter("s2", 3)},
       |${iter("s3", 4)},
       |${iter("s4", 5)}""".stripMargin
  }

  /** DuckDB spellings of the identical computations. Shared CTE fragments
    * inline the Spark-side constants (shingle n, seeds, bands).
    */
  val oracles: Map[String, String] = Map(
    "q20_dedup_exact" ->
      """SELECT md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS text_hash,
        |  min(doc_id) AS doc_id, count(*) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin,

    "q21_minhash_pairs" ->
      """WITH toks AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |sh AS (SELECT DISTINCT doc_id, unnest(CASE WHEN len(w) >= 3
        |        THEN list_transform(range(1, len(w)-1), i -> w[i]||' '||w[i+1]||' '||w[i+2])
        |        ELSE [] END) AS shingle FROM toks),
        |ab AS (SELECT doc_id, ('0x'||substr(md5(shingle),1,8))::BIGINT AS a,
        |        ('0x'||substr(md5(shingle),9,8))::BIGINT AS b FROM sh),
        |mh AS (SELECT doc_id, CAST(s AS INT) AS seed,
        |        min((a + s*(2*b+1)) % 4294967296) AS minh
        |       FROM ab, (SELECT unnest(range(0,12)) AS s) GROUP BY 1,2),
        |banded AS (SELECT doc_id, CAST(seed // 3 AS INT) AS band,
        |        string_agg(CAST(minh AS VARCHAR), '_' ORDER BY seed) AS band_key
        |       FROM mh GROUP BY 1,2),
        |cands AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |       FROM banded a JOIN banded b
        |         ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
        |inter AS (SELECT c.id_a, c.id_b, count(sb.shingle) AS intersection
        |       FROM cands c
        |       JOIN sh sa ON c.id_a = sa.doc_id
        |       LEFT JOIN sh sb ON c.id_b = sb.doc_id AND sa.shingle = sb.shingle
        |       GROUP BY 1,2)
        |SELECT i.id_a, i.id_b, za.sz AS size_a, zb.sz AS size_b, i.intersection,
        |  floor((i.intersection * 1.0 / (za.sz + zb.sz - i.intersection)) * 1000000.0 + 0.5) / 1000000.0 AS jaccard
        |FROM inter i JOIN sizes za ON i.id_a = za.doc_id JOIN sizes zb ON i.id_b = zb.doc_id""".stripMargin,

    "q22_simhash" ->
      """WITH wh AS (SELECT doc_id, ('0x'||substr(md5(word),1,4))::BIGINT AS wh
        |       FROM (SELECT doc_id, unnest(list_distinct(string_split(text,' '))) AS word FROM documents)),
        |bits AS (SELECT doc_id, b, sum(CASE WHEN (wh >> b) % 2 = 1 THEN 1 ELSE -1 END) AS s
        |       FROM wh, (SELECT unnest(range(0,16)) AS b) GROUP BY 1,2)
        |SELECT doc_id, CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS simhash
        |FROM bits GROUP BY 1""".stripMargin,

    "q23_ngram_jaccard" ->
      """WITH toks AS (SELECT doc_id, source, string_split(text,' ') AS w FROM documents),
        |sh AS (SELECT DISTINCT doc_id, source, unnest(CASE WHEN len(w) >= 2
        |        THEN list_transform(range(1, len(w)), i -> w[i]||' '||w[i+1])
        |        ELSE [] END) AS shingle FROM toks),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
        |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS intersection
        |       FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.source = b.source
        |         AND a.doc_id < b.doc_id GROUP BY 1,2)
        |SELECT * FROM (
        |  SELECT i.id_a, i.id_b, za.sz AS size_a, zb.sz AS size_b, i.intersection,
        |    floor((i.intersection * 1.0 / (za.sz + zb.sz - i.intersection)) * 1000000.0 + 0.5) / 1000000.0 AS jaccard
        |  FROM inter i JOIN sizes za ON i.id_a = za.doc_id JOIN sizes zb ON i.id_b = zb.doc_id)
        |WHERE jaccard >= 0.05""".stripMargin,

    "q24_ann_cosine" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 10),
        |scored AS (SELECT q.qid AS query_id, e.vec_id AS neighbor_id,
        |    floor(list_cosine_similarity(q.qv, e.embedding::DOUBLE[]) * 1000000.0 + 0.5) / 1000000.0 AS cosine
        |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.qid)
        |SELECT * FROM (
        |  SELECT query_id, neighbor_id, cosine,
        |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
        |  FROM scored) WHERE rank <= 5""".stripMargin,

    "q25_lang_id" ->
      """WITH h AS (SELECT doc_id, CAST(len(string_split(text,' ')) AS BIGINT) AS n_words,
        |  CAST(len(list_filter(string_split(text,' '), x -> x IN ('the','a','fast','slow','small','big','key','value'))) AS BIGINT) AS hits_plain,
        |  CAST(len(list_filter(string_split(text,' '), x -> x IN ('spark','stream','batch','window','vector','row','column','dup'))) AS BIGINT) AS hits_sparkish,
        |  CAST(len(list_filter(string_split(text,' '), x -> x IN ('table','join','query','filter','group','agg','sort','merge'))) AS BIGINT) AS hits_sqlish
        | FROM documents)
        |SELECT doc_id, n_words, hits_plain, hits_sparkish, hits_sqlish,
        |  CASE WHEN hits_plain >= hits_sparkish AND hits_plain >= hits_sqlish THEN 'plain'
        |       WHEN hits_sparkish >= hits_sqlish THEN 'sparkish' ELSE 'sqlish' END AS register
        |FROM h""".stripMargin,

    "q26_quality_score" ->
      """WITH f AS (SELECT doc_id,
        |  CAST(len(string_split(text,' ')) AS BIGINT) AS n_words,
        |  floor((len(list_distinct(string_split(text,' '))) / len(string_split(text,' '))) * 1000000.0 + 0.5) / 1000000.0 AS uniq_ratio,
        |  floor((len(list_filter(string_split(text,' '), x -> x IN ('the','a'))) / len(string_split(text,' '))) * 1000000.0 + 0.5) / 1000000.0 AS stop_ratio,
        |  floor(((n_chars - len(string_split(text,' ')) + 1) / len(string_split(text,' '))) * 1000000.0 + 0.5) / 1000000.0 AS avg_word_len
        | FROM documents)
        |SELECT doc_id, n_words, uniq_ratio, stop_ratio, avg_word_len,
        |  floor((uniq_ratio * 0.3 + (1.0 - stop_ratio) * 0.3 +
        |         least(n_words / 100.0, 1.0) * 0.2 + least(avg_word_len / 8.0, 1.0) * 0.2) * 1000000.0 + 0.5) / 1000000.0 AS quality_score
        |FROM f""".stripMargin,

    "q27_token_count" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text,' ')) AS BIGINT) AS n_ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS BIGINT) AS n_re_tokens,
        |  CAST(ceil(n_chars / 4.0) AS BIGINT) AS n_subword_est
        |FROM documents""".stripMargin,

    "q28_fingerprint" ->
      """WITH toks AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |pos AS (SELECT doc_id, unnest(w) AS word, unnest(range(1, len(w)+1)) AS i FROM toks)
        |SELECT doc_id,
        |  bit_xor(('0x'||substr(md5(word||':'||CAST(i-1 AS VARCHAR)),1,15))::BIGINT) AS fingerprint
        |FROM pos GROUP BY 1""".stripMargin,

    "q29_embedding_near_dup" ->
      """SELECT * FROM (
        |  SELECT a.label AS block, a.vec_id AS id_a, b.vec_id AS id_b,
        |    floor(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) * 1000000.0 + 0.5) / 1000000.0 AS cosine
        |  FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id)
        |WHERE cosine >= 0.35""".stripMargin,

    // q29's scale path: the srp-v1 projections replay via the shared
    // SrpBuckCte (token-for-token common with q143's cluster-scoped
    // composition, so the two gates cannot drift on the bucketing).
    "q142_srp_near_dup" ->
      s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
        |$SrpBuckCte
        |SELECT * FROM (
        |  SELECT ea.label AS block, ea.vec_id AS id_a, eb.vec_id AS id_b,
        |    floor(list_cosine_similarity(ea.v, eb.v) * 1000000.0 + 0.5) / 1000000.0 AS cosine
        |  FROM e ea JOIN buck ba ON ea.vec_id = ba.vec_id
        |    JOIN e eb ON ea.label = eb.label AND ea.vec_id < eb.vec_id
        |    JOIN buck bb ON eb.vec_id = bb.vec_id AND ba.bucket = bb.bucket)
        |WHERE cosine >= 0.35""".stripMargin,

    "q33_simhash_near_dup" ->
      """WITH wh AS (SELECT doc_id, ('0x'||substr(md5(word),1,4))::BIGINT AS wh
        |       FROM (SELECT doc_id, unnest(list_distinct(string_split(text,' '))) AS word FROM documents)),
        |bits AS (SELECT doc_id, b, sum(CASE WHEN (wh >> b) % 2 = 1 THEN 1 ELSE -1 END) AS s
        |       FROM wh, (SELECT unnest(range(0,16)) AS b) GROUP BY 1,2),
        |sig AS (SELECT doc_id, CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS simhash
        |       FROM bits GROUP BY 1)
        |SELECT * FROM (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
        |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id)
        |WHERE hamming <= 3""".stripMargin,

    "q30_binary_pipeline" ->
      """SELECT doc_id,
        |  CAST(octet_length(text::BLOB) AS BIGINT) AS n_bytes,
        |  md5(text) AS content_hash,
        |  CAST(CASE WHEN octet_length(text::BLOB) = 0 THEN 0
        |    ELSE (octet_length(text::BLOB) + 1023) // 1024 END AS BIGINT) AS n_frames,
        |  CAST(octet_length(text::BLOB) AS BIGINT) AS frame_bytes,
        |  CAST(CASE WHEN octet_length(text::BLOB) = 0 THEN 0
        |    ELSE (octet_length(text::BLOB) + 127) // 128 END AS BIGINT) AS n_windows
        |FROM documents""".stripMargin,

    "q41_ivf_topk" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |cents AS (SELECT vec_id AS centroid_id, v AS centv FROM e ORDER BY vec_id LIMIT 8),
        |asim AS (SELECT e.vec_id AS nid, e.v AS cv, c.centroid_id,
        |    floor(list_cosine_similarity(e.v, c.centv) * 1000000.0 + 0.5) / 1000000.0 AS sim
        |  FROM e CROSS JOIN cents c),
        |assigned AS (SELECT nid, cv, centroid_id FROM (
        |    SELECT nid, cv, centroid_id,
        |      row_number() OVER (PARTITION BY nid ORDER BY sim DESC, centroid_id) AS rn FROM asim)
        |  WHERE rn = 1),
        |qsim AS (SELECT q.vec_id AS qid, q.v AS qv, c.centroid_id,
        |    floor(list_cosine_similarity(q.v, c.centv) * 1000000.0 + 0.5) / 1000000.0 AS sim
        |  FROM e q CROSS JOIN cents c WHERE q.vec_id < 10),
        |probes AS (SELECT qid, qv, centroid_id FROM (
        |    SELECT qid, qv, centroid_id,
        |      row_number() OVER (PARTITION BY qid ORDER BY sim DESC, centroid_id) AS rn FROM qsim)
        |  WHERE rn <= 3),
        |scored AS (SELECT p.qid AS query_id, a.nid AS neighbor_id,
        |    floor(list_cosine_similarity(p.qv, a.cv) * 1000000.0 + 0.5) / 1000000.0 AS cosine
        |  FROM probes p JOIN assigned a ON p.centroid_id = a.centroid_id
        |  WHERE a.nid <> p.qid)
        |SELECT * FROM (
        |  SELECT query_id, neighbor_id, cosine,
        |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
        |  FROM scored) WHERE rank <= 5""".stripMargin,

    "q42_dedup_clusters" ->
      s"""WITH RECURSIVE $MinhashCompCte
        |SELECT node AS doc_id, min(lbl) AS cluster_id, (node = min(lbl)) AS keep
        |FROM reach GROUP BY node""".stripMargin,

    "q136_leakage_safe_split" ->
      s"""WITH RECURSIVE $MinhashCompCte,
        |clus AS (SELECT node AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY node)
        |SELECT doc_id, cluster_id,
        |  CASE WHEN coin < 0.8 THEN 'train' WHEN coin < 0.9 THEN 'valid' ELSE 'test' END AS split
        |FROM (SELECT doc_id, cluster_id,
        |    ('0x'||substr(md5(CAST(cluster_id AS VARCHAR)||'#q136'),1,8))::BIGINT / 4294967296.0 AS coin
        |  FROM clus)""".stripMargin,

    "q50_distinct_users" ->
      """SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct_users,
        |  count(*) AS n_events
        |FROM events GROUP BY 1""".stripMargin,

    "q43_stratified_sample" ->
      """SELECT doc_id, source FROM documents
        |WHERE ('0x'||substr(md5(CAST(doc_id AS VARCHAR)||'#q43'),1,8))::BIGINT / 4294967296.0 <
        |  CASE WHEN source IN ('src0','src1','src2') THEN 0.5
        |       WHEN source = 'src5' THEN 1.0 ELSE 0.2 END""".stripMargin,

    "q44_repetition_score" ->
      """WITH toks AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |base AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words,
        |    CAST(greatest(len(w)-1, 0) AS BIGINT) AS n_bigrams,
        |    CAST(CASE WHEN len(w) >= 2
        |      THEN len(list_distinct(list_transform(range(1, len(w)), i -> w[i]||' '||w[i+1])))
        |      ELSE 0 END AS BIGINT) AS n_distinct_bigrams
        |  FROM toks),
        |topw AS (SELECT doc_id, max(c) AS top_word_n FROM (
        |    SELECT doc_id, count(*) AS c FROM (SELECT doc_id, unnest(w) AS word FROM toks)
        |    GROUP BY doc_id, word) GROUP BY doc_id),
        |r AS (SELECT b.doc_id, b.n_words,
        |    CASE WHEN b.n_bigrams > 0
        |      THEN floor((1.0 - b.n_distinct_bigrams * 1.0 / b.n_bigrams) * 1000000.0 + 0.5) / 1000000.0
        |      ELSE 0.0 END AS dup_bigram_ratio,
        |    floor((t.top_word_n * 1.0 / b.n_words) * 1000000.0 + 0.5) / 1000000.0 AS top_word_ratio
        |  FROM base b JOIN topw t ON b.doc_id = t.doc_id)
        |SELECT doc_id, n_words, dup_bigram_ratio, top_word_ratio,
        |  (dup_bigram_ratio > 0.2 OR top_word_ratio > 0.1) AS flagged
        |FROM r""".stripMargin,

    "q45_pii_scrub" ->
      """WITH t0 AS (SELECT c_custkey, c_name||' '||c_mktsegment AS s FROM customer),
        |t1 AS (SELECT c_custkey, s AS s0,
        |    regexp_replace(s, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g') AS s1 FROM t0),
        |t2 AS (SELECT c_custkey, s0, s1,
        |    regexp_replace(s1, '[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS s2 FROM t1)
        |SELECT c_custkey,
        |  CAST(len(regexp_extract_all(s0, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(s1, '[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phones,
        |  CAST(len(regexp_extract_all(s2, '[0-9]{4,}')) AS BIGINT) AS n_nums,
        |  regexp_replace(s2, '[0-9]{4,}', '<NUM>', 'g') AS clean_text
        |FROM t2""".stripMargin,

    "q46_incremental_neardup" ->
      """WITH toks AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |sh AS (SELECT DISTINCT doc_id, unnest(CASE WHEN len(w) >= 3
        |        THEN list_transform(range(1, len(w)-1), i -> w[i]||' '||w[i+1]||' '||w[i+2])
        |        ELSE [] END) AS shingle FROM toks),
        |ab AS (SELECT doc_id, ('0x'||substr(md5(shingle),1,8))::BIGINT AS a,
        |        ('0x'||substr(md5(shingle),9,8))::BIGINT AS b FROM sh),
        |mh AS (SELECT doc_id, CAST(s AS INT) AS seed,
        |        min((a + s*(2*b+1)) % 4294967296) AS minh
        |       FROM ab, (SELECT unnest(range(0,12)) AS s) GROUP BY 1,2),
        |banded AS (SELECT doc_id, CAST(seed // 3 AS INT) AS band,
        |        string_agg(CAST(minh AS VARCHAR), '_' ORDER BY seed) AS band_key
        |       FROM mh GROUP BY 1,2),
        |cands AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |       FROM banded a JOIN banded b
        |         ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
        |       WHERE a.doc_id % 2 = 1 OR b.doc_id % 2 = 1),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
        |inter AS (SELECT c.id_a, c.id_b, count(sb.shingle) AS intersection
        |       FROM cands c
        |       JOIN sh sa ON c.id_a = sa.doc_id
        |       LEFT JOIN sh sb ON c.id_b = sb.doc_id AND sa.shingle = sb.shingle
        |       GROUP BY 1,2)
        |SELECT i.id_a, i.id_b, za.sz AS size_a, zb.sz AS size_b, i.intersection,
        |  floor((i.intersection * 1.0 / (za.sz + zb.sz - i.intersection)) * 1000000.0 + 0.5) / 1000000.0 AS jaccard
        |FROM inter i JOIN sizes za ON i.id_a = za.doc_id JOIN sizes zb ON i.id_b = zb.doc_id""".stripMargin,

    "q47_corpus_pipeline" ->
      """WITH RECURSIVE
        |f AS (SELECT doc_id, source, text,
        |  CAST(len(string_split(text,' ')) AS BIGINT) AS n_words,
        |  floor((len(list_distinct(string_split(text,' '))) / len(string_split(text,' '))) * 1000000.0 + 0.5) / 1000000.0 AS uniq_ratio,
        |  floor((len(list_filter(string_split(text,' '), x -> x IN ('the','a'))) / len(string_split(text,' '))) * 1000000.0 + 0.5) / 1000000.0 AS stop_ratio,
        |  floor(((n_chars - len(string_split(text,' ')) + 1) / len(string_split(text,' '))) * 1000000.0 + 0.5) / 1000000.0 AS avg_word_len
        | FROM documents),
        |g AS (SELECT doc_id, source, text,
        |  floor((uniq_ratio * 0.3 + (1.0 - stop_ratio) * 0.3 +
        |         least(n_words / 100.0, 1.0) * 0.2 + least(avg_word_len / 8.0, 1.0) * 0.2) * 1000000.0 + 0.5) / 1000000.0 AS quality_score
        | FROM f),
        |gated AS (SELECT * FROM g WHERE quality_score >= 0.5),
        |ex AS (SELECT doc_id, source, text, quality_score,
        |    row_number() OVER (PARTITION BY md5(array_to_string(list_sort(list_distinct(string_split(text,' '))), ' ')) ORDER BY doc_id) AS rn
        |  FROM gated),
        |ke AS (SELECT doc_id, source, text, quality_score FROM ex WHERE rn = 1),
        |toks AS (SELECT doc_id, string_split(text,' ') AS w FROM ke),
        |sh AS (SELECT DISTINCT doc_id, unnest(CASE WHEN len(w) >= 3
        |        THEN list_transform(range(1, len(w)-1), i -> w[i]||' '||w[i+1]||' '||w[i+2])
        |        ELSE [] END) AS shingle FROM toks),
        |ab AS (SELECT doc_id, ('0x'||substr(md5(shingle),1,8))::BIGINT AS a,
        |        ('0x'||substr(md5(shingle),9,8))::BIGINT AS b FROM sh),
        |mh AS (SELECT doc_id, CAST(s AS INT) AS seed,
        |        min((a + s*(2*b+1)) % 4294967296) AS minh
        |       FROM ab, (SELECT unnest(range(0,12)) AS s) GROUP BY 1,2),
        |banded AS (SELECT doc_id, CAST(seed // 3 AS INT) AS band,
        |        string_agg(CAST(minh AS VARCHAR), '_' ORDER BY seed) AS band_key
        |       FROM mh GROUP BY 1,2),
        |cands AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |       FROM banded a JOIN banded b
        |         ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
        |inter AS (SELECT c.id_a, c.id_b, count(sb.shingle) AS intersection
        |       FROM cands c
        |       JOIN sh sa ON c.id_a = sa.doc_id
        |       LEFT JOIN sh sb ON c.id_b = sb.doc_id AND sa.shingle = sb.shingle
        |       GROUP BY 1,2),
        |prs AS (SELECT i.id_a, i.id_b
        |       FROM inter i JOIN sizes za ON i.id_a = za.doc_id JOIN sizes zb ON i.id_b = zb.doc_id
        |       WHERE floor((i.intersection * 1.0 / (za.sz + zb.sz - i.intersection)) * 1000000.0 + 0.5) / 1000000.0 >= 0.5),
        |edges AS (SELECT id_a AS ea, id_b AS eb FROM prs UNION SELECT id_b, id_a FROM prs),
        |reach(node, lbl) AS (
        |  SELECT doc_id, doc_id FROM ke
        |  UNION
        |  SELECT e.eb, r.lbl FROM reach r JOIN edges e ON e.ea = r.node),
        |comp AS (SELECT node, min(lbl) AS cluster_id FROM reach GROUP BY node)
        |SELECT k.doc_id, k.source, k.quality_score
        |FROM ke k JOIN comp c ON k.doc_id = c.node
        |WHERE c.cluster_id = k.doc_id
        |  AND ('0x'||substr(md5(CAST(k.doc_id AS VARCHAR)||'#corpus'),1,8))::BIGINT / 4294967296.0 < 0.8""".stripMargin,

    // Bigram-LM replay: identical integer counts and vocabulary size,
    // per-bigram ln() on identical IEEE inputs (the q104 idf precedent),
    // per-bigram 1e-6 grid quantize → order-free BIGINT sum (the q104
    // construction), q6 quantization. The CTE chain is shared with
    // q119's bucket composition.
    "q111_lm_perplexity" ->
      s"""$LmFoldedCte
        |SELECT doc_id, n_bigrams,
        |  floor((-(CAST(qs AS DOUBLE) / 1000000.0) / n_bigrams)
        |    * 1000000.0 + 0.5) / 1000000.0 AS cross_entropy,
        |  (floor((-(CAST(qs AS DOUBLE) / 1000000.0) / n_bigrams)
        |    * 1000000.0 + 0.5) / 1000000.0 > 8.0) AS flagged
        |FROM folded""".stripMargin,

    // Sign-matrix replay: sign(j,i) = parity of the first md5 hex char of
    // 'rp-v1:j:i'; ±1 multiplies are exact IEEE sign flips and the
    // component sum folds in element order, so every double agrees
    // bit-for-bit before q6.
    "q112_random_projection" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |js AS (SELECT unnest(range(0, 16)) AS j),
        |ii AS (SELECT unnest(range(0, (SELECT max(len(v)) FROM e))) AS i),
        |sg AS (SELECT j, i,
        |    CASE WHEN ('0x'||substr(md5('rp-v1:'||j||':'||i), 1, 1))::INT % 2 = 0
        |      THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END AS s
        |  FROM js, ii),
        |terms AS (SELECT e.vec_id, sg.j, sg.i, e.v[sg.i + 1] * sg.s AS t
        |  FROM e CROSS JOIN sg),
        |folded AS (SELECT vec_id, j,
        |    CAST(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |        list(CAST(t AS DOUBLE) ORDER BY i)),
        |      (a, b) -> a + b) AS DOUBLE) AS comp
        |  FROM terms GROUP BY 1, 2)
        |SELECT vec_id, CAST(j AS INT) AS out_pos,
        |  floor(comp * 1000000.0 + 0.5) / 1000000.0 AS component
        |FROM folded""".stripMargin,

    // BPE trajectory replay: the same 5 unrolled merge iterations —
    // exact integer pair counts, winner tie-broken on the joined pair
    // string (≡ (a,b) tuple order: symbols carry no spaces and ' '
    // sorts below every symbol byte), greedy-leftmost application via
    // the identical left fold.
    "q116_bpe_train" ->
      s"""WITH $BpeChainCte
         |SELECT word, freq, tokens,
         |  CAST(len(string_split(tokens, ' ')) AS BIGINT) AS n_tokens
         |FROM s5""".stripMargin,

    // shared LM chain + row_number over the identical unique order +
    // ntile-fill-rule terciles via exact integer arithmetic
    "q119_perplexity_buckets" ->
      s"""$LmFoldedCte,
        |ce AS (SELECT doc_id,
        |    floor((-(CAST(qs AS DOUBLE) / 1000000.0) / n_bigrams)
        |      * 1000000.0 + 0.5) / 1000000.0 AS cross_entropy
        |  FROM folded),
        |r AS (SELECT doc_id, cross_entropy,
        |    CAST(row_number() OVER (ORDER BY cross_entropy, doc_id) AS INT) AS ce_rank,
        |    count(*) OVER () AS n
        |  FROM ce)
        |SELECT doc_id, cross_entropy, ce_rank,
        |  CASE ((ce_rank - 1) * 3) // n WHEN 0 THEN 'head'
        |    WHEN 1 THEN 'middle' ELSE 'tail' END AS bucket
        |FROM r""".stripMargin,

    // mixture-plan replay: budget = total // 2 (exact integer), fracs
    // as DOUBLE literals so frac*budget/avail is the identical IEEE
    // chain, md5 coin < unquantized rate — picked counts exact
    "q121_token_budget_plan" ->
      """WITH toks AS (SELECT doc_id, lang,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents),
        |b AS (SELECT CAST(sum(n_tokens) // 2 AS BIGINT) AS budget FROM toks),
        |tgt AS (SELECT * FROM (VALUES
        |    ('de', CAST(0.1 AS DOUBLE)), ('en', CAST(0.3 AS DOUBLE)),
        |    ('es', CAST(0.1 AS DOUBLE)), ('fr', CAST(0.1 AS DOUBLE)),
        |    ('zh', CAST(0.4 AS DOUBLE))) t(lang, frac)),
        |plan AS (SELECT a.lang, a.n_docs, a.avail_tokens,
        |    coalesce(t.frac, CAST(0.0 AS DOUBLE)) AS frac,
        |    coalesce(t.frac, CAST(0.0 AS DOUBLE)) * b.budget AS want_raw,
        |    least(CAST(1.0 AS DOUBLE),
        |      (coalesce(t.frac, CAST(0.0 AS DOUBLE)) * b.budget) / a.avail_tokens) AS rate_raw
        |  FROM (SELECT lang, count(*) AS n_docs,
        |      CAST(sum(n_tokens) AS BIGINT) AS avail_tokens
        |    FROM toks GROUP BY 1) a
        |  LEFT JOIN tgt t USING (lang), b),
        |picked AS (SELECT p.lang, count(*) AS picked_docs,
        |    CAST(sum(k.n_tokens) AS BIGINT) AS picked_tokens
        |  FROM toks k JOIN plan p USING (lang)
        |  WHERE ('0x'||substr(md5(k.doc_id||'#mix121'), 1, 8))::BIGINT / 4294967296.0
        |    < p.rate_raw
        |  GROUP BY 1)
        |SELECT p.lang, p.n_docs, p.avail_tokens,
        |  floor(p.frac * 1000000.0 + 0.5) / 1000000.0 AS target_frac,
        |  floor(p.want_raw * 10000.0 + 0.5) / 10000.0 AS want_tokens,
        |  floor(p.rate_raw * 1000000.0 + 0.5) / 1000000.0 AS rate,
        |  coalesce(pi.picked_docs, 0) AS picked_docs,
        |  coalesce(pi.picked_tokens, 0) AS picked_tokens
        |FROM plan p LEFT JOIN picked pi USING (lang)""".stripMargin
  )
}
