package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression tests: the scale properties the engine is
  * designed around (SURVEY.md §4.2) must stay visible in the plan —
  * pushdown reaching the scan, broadcasts where intended, top-k without a
  * global sort, partial aggregation. A refactor that silently degrades a
  * plan (e.g. re-introduces a full shuffle before a limit) fails here
  * even though results stay correct.
  */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // planFrame: rows whose build collects to a LocalRelation declare a
  // lazy plan-view twin — the spec asserts the distributed shape the
  // collect executes, not the collected LocalTableScan
  private def plan(name: String): String =
    Queries.all(name).planFrame(spark, TestSpark.sf0001)
      .queryExecution.executedPlan.toString

  test("knn_topk: per-partition heap top-k, no shuffle, no global sort") {
    val p = plan("knn_topk")
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("Exchange"), "top-k must not shuffle the corpus")
  }

  test("jl_search_rerank: projection is row-local, both cuts are heap top-k, no corpus shuffle") {
    val p = plan("jl_search_rerank")
    // reduce-then-refine = two TakeOrderedAndProject stages (projected
    // cut, exact re-rank) with the 16-dot projection inlined in the
    // scan's projection — no Exchange, no Window, no join back
    assert("TakeOrderedAndProject".r.findAllIn(p).size === 2)
    assert(!p.contains("Exchange"), "JL prefilter must not shuffle the corpus")
    assert(!p.contains("Window"))
    assert(p.contains("dotproduct"), "native dot must carry the projection")
  }

  test("filtered_knn: metadata pre-filter is a broadcast semi-join; top-k stays a heap, vector table unshuffled") {
    val p = plan("filtered_knn")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"))
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("SortMergeJoin"))
    assert(p.contains("PushedFilters: [IsNotNull(lang)") ||
      p.contains("EqualTo(lang,en)"),
      "metadata predicate must push into the documents scan")
    // the only exchange is the broadcast of the small filtered side
    assert(!p.contains("Exchange hashpartitioning"),
      "vector table must not shuffle for the filter")
  }

  test("q_filter_pushdown: predicates reach the parquet scan, columns pruned") {
    val p = plan("q_filter_pushdown")
    assert(p.contains("PushedFilters:"))
    assert(p.contains("l_shipdate"), "shipdate predicate must be pushed")
    assert(!p.contains("l_extendedprice"),
      "unreferenced columns must not be read")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q_region_acct: both dimension joins broadcast, none sort-merge") {
    val p = plan("q_region_acct")
    assert("BroadcastHashJoin".r.findAllIn(p).size === 2)
    assert(!p.contains("SortMergeJoin"))
  }

  test("knn_join: queries side broadcast, partial top-k agg, no window") {
    val p = plan("knn_join")
    assert(p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("CartesianProduct"))
    // TopKAggregator shape: map-side partial + final aggregation, no
    // window shuffle of the whole scored corpus
    assert(!p.contains("Window"))
    assert("Aggregate".r.findAllIn(p).size >= 2)
  }

  test("q1_pricing: two-phase (partial + final) hash aggregation") {
    val p = plan("q1_pricing")
    assert("HashAggregate".r.findAllIn(p).size >= 2)
  }

  test("join strategy hints are honored (SHUFFLE_HASH)") {
    val orders = Tables.load(spark, TestSpark.sf0001, "orders")
    val lineitem = Tables.load(spark, TestSpark.sf0001, "lineitem")
    val p = lineitem.join(orders.hint("SHUFFLE_HASH"),
      lineitem("l_orderkey") === orders("o_orderkey"))
      .queryExecution.executedPlan.toString
    assert(p.contains("ShuffledHashJoin"), s"hint ignored:\n$p")
  }

  test("semi/anti joins plan as semi/anti, not inner + dedup") {
    assert(plan("q_semi").contains("Semi"))
    assert(plan("q_anti").contains("Anti"))
  }

  test("embeddings scan for knn_topk prunes the label-only queries' columns") {
    // vec_norms reads only vec_id + embedding; label must not be scanned
    val p = plan("vec_norms")
    assert(!p.contains("label"))
  }

  test("span_dedup: pruned scan, two-phase distinct agg, no cartesian") {
    val p = plan("span_dedup")
    // documents scan must not read columns beyond (doc_id, text)
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"documents scan not pruned to (doc_id, text):\n$p")
    // the duplicated-gram detection is a two-phase (partial + final)
    // count-distinct — docs meet only at gram keys, never all-pairs
    assert("HashAggregate".r.findAllIn(p).size >= 2)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
  }

  test("incr_dedup_bloom: Bloom probe routes the scan; only the sliver anti-joins") {
    val p = plan("incr_dedup_bloom")
    // both routing branches probe the plan-literal filter with the
    // codegen'd BloomFilterMightContain — once negated (direct admit),
    // once positive (confirm tier)
    assert("might_contain".r.findAllIn(p).size >= 2, s"no Bloom probe:\n$p")
    // the confirm tier is still a real anti-join, never inner + dedup
    assert(p.contains("Anti"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q_lm_bigram: model lookups are equi-joins; text never shuffles") {
    val p = plan("q_lm_bigram")
    // train + score in one plan: multiple partial+final agg pairs
    // (unigram counts, bigram counts, vocab, per-doc score)
    assert("HashAggregate".r.findAllIn(p).size >= 6)
    // no all-pairs anywhere; the only nested-loop is the 1-row vocab
    // broadcast riding into the scoring projection
    assert(!p.contains("CartesianProduct"))
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1)
    // no Exchange may carry the text column — only keys and counts
    // shuffle (text is consumed row-locally by the explode projections)
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.nonEmpty && !exchanges.exists(_.contains("text#")),
      s"document text must not shuffle:\n${exchanges.mkString("\n")}")
  }

  test("q_repetition: row-local ratio — no gram explode, no hash Exchange, no aggregate") {
    val p = plan("q_repetition")
    // the declared form computes the max-2-gram ratio as a pure
    // projection (sorted-gram-array longest-run fold). The aggregate twin
    // (repetitionStats) explodes every 2-gram into a corpus-token-sized
    // hash shuffle — that shape must never come back on this row.
    assert(!p.contains("Exchange hashpartitioning"),
      s"gram-stream hash shuffle reappeared:\n$p")
    assert(!p.contains("HashAggregate") && !p.contains("Generate"),
      s"aggregate/explode form reappeared:\n$p")
    // the only Exchange allowed is the presentation-sort range partition
    // over the 3-column result — it must not carry document text
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(!exchanges.exists(_.contains("text#")),
      s"document text must not shuffle:\n${exchanges.mkString("\n")}")
  }

  test("q_token_budget: prefix sum plans by stats — naive window at fixture scale, two-phase above") {
    // STATS-ADAPTIVE contract (r15): the declared row's input estimates
    // ≤ 64 MB at every test SF, so the SMALL-INPUT path — the plain
    // single-window form, no sampling pass, no persist, no broadcast
    // join — is the plan this row MUST produce (taking the two-phase
    // machinery here would re-introduce 8 pure-job-floor jobs). The
    // two-phase shape itself (pid-salted windows, broadcast offsets,
    // one persisted range exchange) is pinned in PrefixSumSpec with
    // `smallInputBytes = 0`, and the BIG-input trigger is pinned below
    // by widening the estimate threshold through a synthetic frame.
    val p = plan("q_token_budget")
    assert(p.contains("windowspecdefinition(lang#"),
      s"the running sum must still be a window at fixture scale:\n$p")
    assert(!p.contains("_ps_pid"),
      s"two-phase machinery on a kilobyte input is pure job floor:\n$p")
    // the adaptive cut itself: the same call over a frame whose stats
    // exceed the bound takes the salted two-phase plan
    val big = graft.operators.PrefixSum.groupedRunningSum(
      graft.Tables.load(spark, graft.TestSpark.sf0001, "documents")
        .select(org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("lang"),
          org.apache.spark.sql.functions.lit(1L).as("n")),
      "lang", "doc_id", "n", "cum", smallInputBytes = 0L)
      .queryExecution.executedPlan.toString
    assert(big.contains("_ps_pid"),
      s"forcing the bound must produce the two-phase plan:\n$big")
  }

  test("incr_heavy_hitters: sketch aggs are partial+final; lookups broadcast; text never shuffles") {
    val p = plan("incr_heavy_hitters")
    // the CMS build/merge run as typed aggregates — partial then final
    // (map-side grids, so the shuffle carries kilobytes per task×lang)
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2, s"no typed agg:\n$p")
    // the one-row-per-lang merged sketch joins by broadcast, never SMJ
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
    // document text is consumed by the row-local explode; no Exchange
    // may carry it
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.nonEmpty && !exchanges.exists(_.contains("text#")),
      s"document text must not shuffle:\n${exchanges.mkString("\n")}")
  }

  test("sq_topk: quantized candidate top-k, bounded broadcast re-rank") {
    val p = plan("sq_topk")
    // candidate stage: codes scan → score projection → heap top-r
    assert(p.contains("TakeOrderedAndProject"))
    // re-rank: the r-bounded candidate list broadcasts back to the raw
    // vectors — the corpus side must never shuffle for the join
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  test("q_temperature_mix: thresholds broadcast onto one corpus pass") {
    val p = plan("q_temperature_mix")
    // |sources| threshold rows ride in by broadcast; the corpus is
    // scanned once and never sort-merge-joined
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
    // final rollup is two-phase
    assert("HashAggregate".r.findAllIn(p).size >= 2)
  }

  test("planFrame captures the pre-collect frame of collected rows") {
    // r17 advice: rows whose build collects to a LocalRelation used to
    // fall back to build() — executing the full query and exposing only
    // a LocalTableScan to the audit. Plan-capture mode aborts at the
    // collecting tail and hands back the distributed frame instead.
    for (name <- Seq("dedup_fingerprint", "q_incremental_dedup",
        "incr_admit_fixed", "incr_gated_admit_fixed")) {
      val p = plan(name)
      assert(!p.trim.startsWith("LocalTableScan"),
        s"$name plan audit sees only the collected LocalTableScan:\n$p")
      assert(p.contains("HashAggregate") || p.contains("Join"),
        s"$name captured plan shows no distributed operator:\n$p")
    }
  }

  test("dedup_fingerprint: captured plan is the partial+final agg, no window") {
    val p = plan("dedup_fingerprint")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"exact dedup must be a two-phase hash aggregation:\n$p")
    assert(!p.contains("Window"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q_gopher_rules: the whole gate is one row-local projection") {
    val p = plan("q_gopher_rules")
    // scan → project(rules) → top-N; NO explode, NO join, NO shuffle —
    // the scan-speed claim the operator's scaladoc makes
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("Generate"), "no explode in the quality gate")
    assert(!p.contains("Exchange"), "the gate must not shuffle")
    assert(!p.contains("Join"), "the gate must not join")
  }

  test("keepBestByKey: partial+final min-struct agg, no window, no per-group sort") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.load(spark, TestSpark.sf0001, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val p = graft.operators.Dedup.keepBestByKey(
        docs, col("lang"), col("n_chars"), col("doc_id"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"),
      "argmax selection must not window-sort the corpus")
    assert("Aggregate".r.findAllIn(p).size >= 2, s"no two-phase agg:\n$p")
  }

  test("admitMediaPerceptual: payload bytes never enter an exchange") {
    import org.apache.spark.sql.functions.col
    val media = graft.operators.Multimodal.syntheticGridMedia(spark, 4, 3)
    val idx = spark.range(0).select(col("id").as("media_id"),
      col("id").as("payload_hash"), col("id").as("phash"),
          col("id").cast("int").as("cbucket"))
    val (admitted, dec) =
      graft.operators.Multimodal.admitMediaPerceptual(media, idx)
    // the rejected-id set is broadcast, so the anti-joins are
    // payload-local: every Exchange in either plan carries only ids,
    // hashes and small metadata — the multi-MB binary column stays in
    // place (the property that makes the ingestion loop viable when a
    // micro-batch is tens of GB of images)
    for ((df, label) <- Seq((admitted, "admitted"), (dec, "decoded"))) {
      val p = df.queryExecution.executedPlan.toString
      val exchanges = p.linesIterator.filter(_.contains("Exchange")).toSeq
      assert(!exchanges.exists(_.contains("payload#")),
        s"$label: payload must not shuffle:\n${exchanges.mkString("\n")}")
    }
  }
}
