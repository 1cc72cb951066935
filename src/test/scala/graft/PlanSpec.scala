package graft

import graft.operators.{Sampling, Similarity}
import graft.queries.CoreQueries
import org.apache.spark.sql.functions._

/** Physical/optimized-plan contracts: the scale properties SURVEY §4
  * promises, asserted in CI so a refactor that silently regresses them
  * (a lost pushdown, a new forced broadcast, an extra shuffle) fails a
  * spec instead of an executor at 100 TB. Queries run against the tiny
  * sf0.001 parquet so plans are real FileScans, not LocalRelations.
  */
class PlanSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("q01: filter and projection push down to the parquet scan") {
    val plan = CoreQueries.queries("q01_ingest_clean")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(event_type,error)"),
      s"event_type filter not pushed:\n$plan")
    // column pruning: the unused JSON props column must not be read
    assert(!plan.contains("props"), s"props survived pruning:\n$plan")
  }

  test("q05: only the fixed-cardinality dim carries a forced broadcast hint") {
    val optimized = CoreQueries.queries("q05_enriched_lineitems")(spark, sf)
      .queryExecution.optimizedPlan.toString
    val forced = "strategy=broadcast".r.findAllIn(optimized).length
    // nation only — part/customer must stay AQE-decided (a forced hint
    // overrides size checks and OOMs when the dim grows with SF)
    assert(forced == 1, s"expected exactly 1 forced broadcast, found $forced:\n$optimized")
  }

  test("minHashSignatures aggregates all seed minima through a single shuffle") {
    val docs = Seq((1L, "a b c d e"), (2L, "c d e f g")).toDF("doc_id", "text")
    val sig = Similarity.minHashSignatures(
      Similarity.shingleSets(docs, "doc_id", "text", 3), 12)
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(sig.queryExecution.executedPlan.toString).length
    assert(exchanges == 1, s"expected 1 shuffle, found $exchanges")
  }

  test("hashSample is a pure scan-side filter: zero shuffles") {
    val out = Sampling.hashSample(
      spark.read.parquet(s"$sf/documents.parquet"), "doc_id", 0.3, "s")
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("q43 sampling reads only the projected columns") {
    val plan = graft.queries.LLMQueries.queries("q43_stratified_sample")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("text"), s"text column read by a doc_id/source query:\n$plan")
  }

  test("q53 temporal lookup plans as a hash/merge equi-join, never a nested loop") {
    // intervalLookup's contract: the key equality drives the join; the
    // interval bounds are a post-match filter. A BroadcastNestedLoopJoin
    // (what a pure ts-BETWEEN condition plans as) is the 100 TB failure.
    val plan = graft.queries.ExtendedQueries.queries("q53_tier_at_event")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"temporal lookup degenerated to a nested-loop join:\n$plan")
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      s"no equi-join in the temporal lookup plan:\n$plan")
  }

  test("q55 pivot with an explicit value list is one aggregate, one shuffle") {
    val plan = graft.queries.ExtendedQueries.queries("q55_action_pivot")(spark, sf)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 shuffle for the pivot, found $exchanges:\n$plan")
  }

  test("q51 decontamination probes the eval set with a semi join, not an inner pair join") {
    val plan = graft.queries.ExtendedQueries.queries("q51_decontaminate")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"),
      s"eval probe is not a semi join (would duplicate rows per eval match):\n$plan")
  }

  test("q69 exclusion plans as a LEFT ANTI join on the flagged key set") {
    val plan = graft.queries.GateQueries.queries("q69_exclude_flagged")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"),
      s"exclusion is not an anti join (would scan flags per fact row):\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"exclusion degenerated to a nested-loop join:\n$plan")
  }

  test("q60 fuzzy join repartitions with an EXPLICIT count (exempt from AQE coalescing)") {
    // the O(block²) levenshtein loop is compute-bound on tiny bytes; if
    // this becomes a plain repartition(col) AQE folds it back to one task
    // (SURVEY §4: measured 18.8 s single-task vs 1.4 s spread).
    // adaptiveLevenshtein picks the block square at sf0.001's tiny blocks,
    // so the square's repartition contract must still hold through the
    // dispatcher.
    val plan = graft.queries.ExtendedQueries.queries("q60_fuzzy_match")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("REPARTITION_BY_NUM"),
      s"fuzzy join lost its explicit-count repartition:\n$plan")
  }

  test("q72 packed-sequence layout pays exactly ONE shuffle end to end") {
    // shardAssign's window, packSequences' running sum, AND packWrite's
    // per-(shard, seq_id) aggregate all run on the single
    // hashpartitioning(shard) exchange: grouping keys that extend the
    // partitioning key satisfy its clustered distribution, so Catalyst
    // plans a sort aggregate in place of a second shuffle. A second
    // exchange means a stage stopped reusing the shard partitioning.
    val plan = graft.queries.GateQueries.queries("q72_pack_write")(spark, sf)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 shuffle, found $exchanges:\n$plan")
  }

  test("q08 never ranks the full user set through a single-partition window") {
    // the global worth rank is data-sized (every user flows through it);
    // Rankings.globalRank keeps it range-partitioned. The only WindowExec
    // allowed with an EMPTY partition spec is globalRank's offsets frame,
    // whose input is the per-partition (__pid, count) aggregate — bounded
    // by the shuffle partition count, never the data.
    val plan = CoreQueries.queries("q08_user_worth_rank")(spark, sf)
      .queryExecution.executedPlan
    val unpartitioned = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w
    }
    assert(unpartitioned.forall(_.output.exists(_.name == "__off")),
      s"data-sized single-partition window in q08:\n$plan")
  }

  test("q125 PQ encoding joins the codebook by broadcast, never a shuffle of the corpus side") {
    // the codebook is (nSub x nCodes) rows — broadcasting it is what
    // keeps encoding a single pass over the vectors; a hash-join plan
    // would shuffle the whole (vector, subspace) explode by `sub`
    val plan = graft.queries.CurationQueries.queries("q125_pq_codes")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"codebook join not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"PQ encoding degenerated to a pair scan:\n$plan")
  }

  test("q128 hybrid rerank broadcasts only query embeddings; candidates join by hash") {
    // the dense stage must stay O(queries x candidates): candidate
    // embeddings arrive via an equi-join, query embeddings semi-join
    // down to the probes present and broadcast — and nothing plans a
    // nested-loop pair scan
    val plan = graft.queries.CurationQueries.queries("q128_hybrid_retrieval")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"query-embedding join not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"pair scan in rerank:\n$plan")
    // the only nested-loop joins allowed are bm25's 1-row corpus-stats
    // broadcasts (the audited scalar-crossJoin pattern) — a nested loop
    // touching the embedding side means the dense stage went pairwise
    val nlj = plan.linesIterator.filter(_.contains("BroadcastNestedLoopJoin")).toSeq
    assert(nlj.forall(_.contains("n_docs")),
      s"non-scalar nested-loop join in rerank:\n${nlj.mkString("\n")}")
  }

  test("q122 line cleaning reads only (doc_id, text) and plans no exchange") {
    val plan = graft.queries.CurationQueries.queries("q122_line_clean")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"line cleaning gained a shuffle:\n$plan")
    assert(!plan.contains("n_chars"), s"unused columns survived pruning:\n$plan")
  }

  test("symDeleteLevenshtein candidates form by equi-join, never a pair scan") {
    // the whole point of the deletion-neighborhood path is that no plan
    // node ever enumerates a block square: candidates must come from a
    // hash/merge join on (block, variant) keys
    val df = (1L to 50L).map(i => (i, s"name$i", i % 3)).toDF("id", "s", "b")
    val plan = graft.operators.Fuzzy.symDeleteLevenshtein(df, "id", "s", "b", 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"deletion-neighborhood path degenerated to a pair scan:\n$plan")
  }
}
