package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan quality gates (SURVEY §4): the point is not that the
  * queries run, but that Catalyst produces the plan we'd want at 100 TB —
  * filters reach the parquet scan, scans are pruned to the referenced
  * columns, small dimensions broadcast, LSH candidate joins stay
  * equi-joins (no quadratic fallback).
  */
class PlanSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q02: filters are pushed into the parquet scan and columns pruned") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("l_shipdate"), p)
    // scan must not read the full 11-column lineitem schema
    assert(!p.contains("l_returnflag"), p)
  }

  test("q03: dimension joins broadcast") {
    val p = plan("q03_join_agg")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q13: multiway join broadcasts nation and region") {
    val p = plan("q13_multiway_join")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q16: as-of join is a single keyed window, not a theta join") {
    val p = plan("q16_asof_join")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("Window"), p)
  }

  test("d02 minhash: candidate generation is an equi-join on band keys") {
    val p = plan("d02_minhash_lsh")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("d03 simhash: banded candidates avoid all-pairs join") {
    val p = plan("d03_simhash")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("c03 contamination: benchmark set broadcasts; corpus grams never shuffle into a join") {
    val p = plan("c03_contamination")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the only SortMergeJoin-eligible relation would be corpus x benchmark
    // grams — the design computes overlap per-row against the broadcast
    // set instead
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("d04 ngram-jaccard: no grams-x-grams self-join survives in the plan") {
    val p = plan("d04_ngram_jaccard")
    assert(!p.contains("CartesianProduct"), p)
    // pair generation is per-bucket array expansion (Generate), and the
    // remaining joins are the bounded semi-join + sizes joins
    assert(p.contains("Generate"), p)
  }

  test("s07 filtered retrieval: the metadata predicate restricts the corpus pre-join") {
    val p = plan("s07_filtered_topk")
    // the % 2 predicate itself is not parquet-pushable, but it must sit
    // in a Filter directly over the scan (corpus shrinks BEFORE the
    // broadcast-scored join), with IsNotNull pushed into the scan
    assert(p.contains("PushedFilters: [IsNotNull(label)"), p)
    assert(p.contains("(label"), p) // the %2 filter survives as a Filter node
    assert(!p.contains("CartesianProduct"), p)
  }

  test("e04: pinned-schema JSON extraction, no JsonPath walk, scan pruned to two columns") {
    val p = plan("e04_json_props")
    assert(p.contains("from_json"), p)
    assert(!p.contains("get_json_object"), p)
    // partial aggregation sits directly on a scan pruned to the two
    // referenced columns — the parse happens once, map-side
    assert(p.contains("partial_count"), p)
    assert(p.contains("ReadSchema: struct<event_type:string,props:string>"), p)
  }

  test("d07 star-contraction edges: equi-join on band keys, map-side-combined hubs, no synthetic ids") {
    val docs = graft.queries.DedupQueries.docsWithMutations(spark, sf)
    val p = graft.ops.Dedup.bucketStarEdges(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    // the old bipartite form's synthetic bucket-id space must be gone
    assert(!p.contains("monotonically_increasing_id"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // hub min/count is a hash aggregate (partial -> final), not a sort
    assert(p.contains("HashAggregate"), p)
  }

  test("q34: interval join is a hash join on buckets, never a nested-loop range join") {
    val p = plan("q34_interval_join")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the interval expansion is visible as a Generate over sequence()
    assert(p.contains("Generate explode(sequence"), p)
  }

  test("q33: NOT IN over a nullable subquery plans the null-aware anti join") {
    val p = plan("q33_null_aware_anti")
    // the trailing `true` on the BroadcastHashJoin is Spark's
    // isNullAwareAntiJoin flag — without it the NOT IN would fall back
    // to a BroadcastNestedLoopJoin with the OR-isnull condition
    assert(p.contains("LeftAnti, BuildRight, true"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("d10 deterministic bloom: the bitset side broadcasts; the probe never sort-merges") {
    // the filter relation is ≤ m rows by construction — if it ever
    // stopped broadcasting, the probe would shuffle the full incoming
    // corpus by bit position, the exact cost the pre-filter exists to
    // avoid
    val p = plan("d10_bloom_exact")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q39 quantile merge: both levels aggregate map-side (partial_count/sum before the shuffle)") {
    val p = plan("q39_quantile_merge")
    // partial aggregation must appear — a merge that shipped raw rows
    // to a single reducer would not survive 100x data
    assert(p.contains("partial_count") || p.contains("partial count"), p)
    // the only cross joins are 1-row totals, which plan as broadcast
    // NLJ — a CartesianProduct anywhere means a multi-row cross join
    assert(!p.contains("CartesianProduct"), p)
  }

  test("d13 semdedup: within-cluster pairing is an equi-join on cid, never a cartesian fallback") {
    val p = plan("d13_semantic_dedup")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("c13 pareto: the bucket prefix-max relation broadcasts; no cartesian dominance check") {
    // the naive skyline is an all-pairs dominance test — the operator
    // exists to avoid it; the bucket-max side is `buckets` rows at most
    // and must broadcast onto the winners
    val p = plan("c13_pareto_frontier")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("t13 bpe encode: the trained vocab map joins the exploded corpus as an equi-join") {
    val p = plan("t13_bpe_encode")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("keyed overwrite: eviction keys are broadcast (no full shuffle of existing data)") {
    import spark.implicits._
    val existing = (1 to 1000).map(i => (s"k$i", i)).toDF("pcr_uuid_context", "v")
    val incoming = Seq(("k1", 0)).toDF("pcr_uuid_context", "v")
    val p = graft.etl.KeyedOverwrite(existing, incoming)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"), p)
  }

  test("c14 dsir: the bucket model broadcasts into the scoring join") {
    val p = plan("c14_dsir_selection")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // top-k is TakeOrdered (per-partition top-k + driver merge), never a
    // global Sort + Limit
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("g01 pagerank: every superstep is an equi-join + partial aggregation, no cartesian") {
    val p = plan("g01_user_pagerank")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // the integer contribution sum must combine map-side
    assert(p.contains("partial_sum") || p.contains("HashAggregate"), p)
  }

  test("t16 bigram LM: count joins are equi-joins; no tokens-x-tokens fallback") {
    val p = plan("t16_bigram_lm_score")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("x04 ancestor closure: every frontier extension is an equi-join, no cartesian") {
    val p = plan("x04_ancestor_closure")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("g02 triangles: wedge and closure joins are equi-joins, no cartesian") {
    val p = plan("g02_triangle_count")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("t17 NB classify: the per-class expansion is the bounded broadcast cross join, the model join stays an equi-join") {
    val p = plan("t17_nb_lang_classify")
    assert(!p.contains("CartesianProduct"), p)
    // classes relation is explicitly broadcast(lit(true)) — a bounded
    // (n-classes-sized) BroadcastNestedLoopJoin is the intended plan
    assert(p.contains("BroadcastNestedLoopJoin"), p)
  }
}
