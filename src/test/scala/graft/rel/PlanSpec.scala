package graft.rel

import graft.{SparkSpec, SparkEntry}

/** Plan-shape regression tests: the scale properties the engine
  * depends on (scan pushdown, column pruning, broadcast joins, partial
  * aggregation, no accidental sort-merge/cartesian blowups) asserted
  * against the actual physical plans, so a refactor that silently
  * loses one fails CI rather than a 100 TB run. */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  test("Lineage.cut: checkpoints by default, transparent under the plan-audit flag") {
    import org.apache.spark.sql.functions.col
    val df = Tables.nation(spark, sfDir).select(col("n_nationkey"))
    // default: an eager localCheckpoint — the plan collapses to a scan
    // of the materialized RDD
    val cut = Lineage.cut(df)
    assert(cut.queryExecution.analyzed.toString.contains("LogicalRDD"),
      cut.queryExecution.analyzed)
    // audit mode (set by graft.Explain): the cut is a no-op so the full
    // lineage stays visible and no jobs run at build time
    sys.props("graft.lineage.nocut") = "true"
    try {
      val uncut = Lineage.cut(df)
      assert(uncut eq df, "nocut mode must return the frame unchanged")
    } finally sys.props.remove("graft.lineage.nocut")
  }

  test("d20: blocked pair generation never shuffle-joins or cartesians the corpus") {
    // nocut so the assignment/pair lineage stays visible through the
    // contract aggregate (the Lineage.cut would otherwise collapse it
    // to a LogicalRDD scan)
    sys.props("graft.lineage.nocut") = "true"
    try {
      val p = plan("d20_ivf_blocked_neardup")
      assert(!p.contains("SortMergeJoin"), p)
      assert(!p.contains("CartesianProduct"), p)
      assert(!p.contains("BroadcastNestedLoopJoin"), p)
    } finally sys.props.remove("graft.lineage.nocut")
  }

  test("q02: filter is pushed into the parquet scan") {
    val p = plan("q02_filter_pushdown")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("GreaterThan") || p.contains("LessThan") ||
      p.contains("IsNotNull"), p)
  }

  test("q01: projection prunes the scan schema") {
    val p = plan("q01_scan_project")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    // only the selected columns reach the scan, not all 16 lineitem cols
    assert(readSchema.nonEmpty, p)
    assert(!readSchema.contains("l_comment"), readSchema)
    assert(!readSchema.contains("l_shipinstruct"), readSchema)
  }

  test("q10: dimension joins broadcast (no shuffle join)") {
    val p = plan("q10_join_broadcast")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q07: aggregation is partial+final (map-side combine)") {
    val p = plan("q07_agg_pricing_summary")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("d01: exact dedup is one hash-aggregate, no join") {
    val p = plan("d01_dedup_exact")
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("Join"), p)
  }

  test("d04: candidate verification broadcasts candidates, streams documents") {
    val p = plan("d04_minhash_lsh")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("s01: brute-force knn is a broadcast nested loop over one corpus pass") {
    val p = plan("s01_knn_brute")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("s02/s04: ANN paths never shuffle-join the corpus against itself") {
    Seq("s02_knn_lsh", "s04_knn_ivf").foreach { q =>
      val p = plan(q)
      assert(!p.contains("SortMergeJoin"), s"$q: $p")
      assert(!p.contains("CartesianProduct"), s"$q: $p")
    }
  }

  test("d09: gram-set join broadcasts the small side, never shuffle-joins the corpus") {
    val p = plan("d09_decontaminate")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("ShuffledHashJoin"), p)
  }

  test("t12: boilerplate scoring is join-free and map-side-combined before any exchange") {
    val p = plan("t12_boilerplate")
    assert(!p.contains("Join"), p)
    // a partial aggregate below the DEEPEST exchange (plan prints
    // top-down, so deepest = last): within-doc gram repeats reduce to
    // (h, doc, cnt) pairs map-side and no exchange ever carries the
    // raw instance stream
    assert(p.lastIndexOf("HashAggregate") > p.lastIndexOf("Exchange"),
      s"expected a partial HashAggregate below the deepest exchange: $p")
    // exchanges: pair aggregate, df window, per-doc rollup, presentation sort
    assert("Exchange".r.findAllIn(p).size <= 4, p)
  }

  test("t11: PII scrub is one codegen pass — no shuffle except the output sort") {
    val p = plan("t11_pii_scrub")
    // a single Exchange (the final presentation orderBy); no join, no agg
    assert("Exchange".r.findAllIn(p).size == 1, p)
    assert(!p.contains("Join"), p)
  }

  test("t13: distributed prefix sum never funnels through one partition") {
    val p = plan("t13_sequence_packing")
    // the naive formulation (global ORDER BY window) would plan an
    // Exchange SinglePartition; the two-phase prefix sum must not
    assert(!p.contains("SinglePartition"), p)
    assert(!p.contains("Window"), p)
  }

  test("t28: per-lang token cumsum is the two-phase prefix sum — no Window, no single-partition funnel") {
    val p = plan("t28_token_budget_mix")
    // window(PARTITION BY lang) would put one language's whole corpus
    // on one reducer task; the groupedPrefixSum result arrives as a
    // pre-materialized two-phase pass instead (the only remaining
    // scalar reductions fold the langs-sized budget table, never the
    // corpus)
    assert(!p.contains("Window"), p)
    // budgets arrive by broadcast — the corpus never shuffle-joins a
    // langs-sized table
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // the budget arithmetic reuses one langs-sized materialization —
    // no corpus FileScan may survive into the gate plan (both corpus
    // passes happen inside the bounded cut / two-phase prefix sum)
    assert(!p.contains("FileScan"), p)
  }

  test("q24: stratified sample selects through the native bounded top-k, not a full window sort") {
    val p = plan("q24_stratified_sample")
    // selection = TopKPerKey partial heaps + key-clustered final merge;
    // the only Window ranks the ≤ langs·k survivors AFTER the operator
    // (same shape as q41) — the corpus itself never group-sorts
    assert(p.contains("TopKPerKeyPartial") && p.contains("TopKPerKeyFinal"), p)
    val winIdx = p.indexOf("Window")
    val topkIdx = p.indexOf("TopKPerKeyFinal")
    assert(winIdx >= 0 && topkIdx > winIdx,
      s"Window must consume the TopKPerKey output (win=$winIdx topk=$topkIdx): $p")
  }

  test("q25: exact percentiles run partial+final, not a global sort") {
    val p = plan("q25_group_quantiles")
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("Window"), p)
  }

  test("q26: as-of join is one window pass — no join operator at all") {
    val p = plan("q26_asof_join")
    assert(p.contains("Window"), p)
    assert(!p.contains("Join"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q29: range join stays an equi-join on the bin, never a nested loop") {
    val p = plan("q29_range_join")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("Join"), p) // it IS a join — just on the bucket key
  }

  test("q33: bloom pre-filter keeps every join broadcast — the fact side never shuffles on the key") {
    val p = plan("q33_bloom_semi")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("ShuffledHashJoin"), p)
  }

  test("q33/d15: the bloom probe is the native might_contain — " +
    "no ScalaUDF breaking the scan's codegen span") {
    for (name <- Seq("q33_bloom_semi", "d15_bloom_incremental")) {
      val p = plan(name)
      assert(!p.contains("ScalaUDF") && !p.toLowerCase.contains("pythonudf"),
        s"$name: a UDF probe re-appeared in the scan:\n$p")
      assert(p.contains("might_contain"),
        s"$name: native bloom probe missing from the plan:\n$p")
    }
  }

  test("q31: set ops plan as aggregate + hash semi/anti join, no sort or cartesian") {
    val p = plan("q31_set_ops")
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("t15: LM model tables broadcast back — the corpus never shuffle-joins itself") {
    val p = plan("t15_lm_perplexity")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("s05: ADC scans codes only; the refine join fetches the shortlist by broadcast") {
    val p = plan("s05_knn_pq")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // the shortlist is the native bounded top-k operator, not a
    // window sort over every scored candidate
    assert(p.contains("TopKPerKeyPartial") && p.contains("TopKPerKeyFinal"), p)
  }

  test("q37: full-outer joins via shuffle-hash, not sort-merge") {
    val p = plan("q37_outer_join")
    assert(p.contains("ShuffledHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("d11: pair list broadcasts against the streamed corpus, never shuffle-joins") {
    val p = plan("d11_editdist_verify")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("ShuffledHashJoin"), p)
  }

  test("t17/t18/s07: the round-5 per-row ops never shuffle-join — one corpus pass each") {
    // t17 is a pure scan→project pipeline: the only exchange is the
    // presentation sort's range partitioning
    val p17 = plan("t17_gopher_rules")
    assert(!p17.contains("Join"), p17)
    assert(p17.linesIterator.count(_.trim.startsWith("+- Exchange")) <= 1, p17)
    // t18's corpus stats fold to a single-row broadcast; s07's query
    // set broadcasts — in both the corpus streams once, never
    // shuffle-joins itself
    Seq("t18_bm25_score", "s07_range_search").foreach { q =>
      val p = plan(q)
      assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"), s"$q: $p")
      assert(p.contains("BroadcastNestedLoopJoin"), s"$q: $p")
    }
  }

  test("d12: the anti-join runs on digests below the batch aggregate, no sort-merge") {
    val p = plan("d12_incremental_dedup")
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("LeftAnti"), p)
    // text never reaches the join: both scans project only (doc_id, text)
    // and digest immediately; the join keys are the md5 column
    assert(p.contains("md5"), p)
  }

  test("s12: ADC scans byte codes through the native top-k; refine joins broadcast") {
    val p = plan("s12_knn_sq8")
    assert(p.contains("TopKPerKey"), p)
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("d14/p13/q42: the closing ops keep sort-merge and cartesian out of their plans") {
    Seq("d14_dedup_materialize", "p13_schema_evolution",
        "q42_group_distinct_sketch").foreach { q =>
      val p = plan(q)
      assert(!p.contains("SortMergeJoin"), s"$q: $p")
      assert(!p.contains("CartesianProduct"), s"$q: $p")
    }
    // q42's sketch must partial-aggregate (register merge map-side)
    val q42 = plan("q42_group_distinct_sketch")
    assert(q42.contains("HashAggregate"), q42)
  }

  test("p22: both SCD2 window passes share one data Exchange") {
    val p = plan("p22_scd2_history")
    // one hash Exchange feeds lag, the run-collapse filter, lead AND
    // row_number (same partition+order spec); the only other Exchange
    // is the presentation orderBy's range partitioning. A third means
    // a window spec drifted and the corpus shuffles twice.
    assert("Exchange".r.findAllIn(p).size == 2, s"p22 plan shuffled extra: $p")
    assert("Window".r.findAllIn(p).size == 2, p)
    assert(p.contains("PushedFilters"), p)
  }

  test("q47: the refresh reads the STORED MV — exactly one lineitem scan (the delta)") {
    val p = plan("q47_incremental_mv")
    // building the frame writes the MV eagerly; the REFRESH plan must
    // then scan lineitem once (delta side) and read the MV parquet for
    // the base side — a second lineitem scan means the merge silently
    // recomputes the base and the MV is decorative
    assert("lineitem".r.findAllIn(p).size == 1,
      s"q47 refresh scans lineitem more than once: $p")
    assert(p.contains("q47_mv"), s"q47 refresh does not read the stored MV: $p")
  }

  test("q48: the point-in-time join is equi-keyed, never a nested loop") {
    val p = plan("q48_pit_join")
    // user_id equality must drive the join (hash or sort-merge — the
    // planner picks by size); the interval bounds ride as join filters.
    // A BroadcastNestedLoopJoin here means the equi-key was lost and
    // the plan is O(obs x history) at scale.
    assert(!p.contains("BroadcastNestedLoop"), s"q48 degraded to nested loop: $p")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"), p)
  }

  test("p14: bucketed join AND bucket-key aggregate run with zero Exchange") {
    val df = PipelineQueries.bucketedJoinAgg(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin"), p)
    // the whole registry plan — join + groupBy on the bucket key —
    // must ride the bucket distribution end-to-end: any Exchange here
    // means the pay-once-at-ingest layout stopped paying
    assert(!p.contains("Exchange"), s"p14 bucketed plan shuffled:\n$p")
  }

  test("whole-stage codegen spans exist in the executed per-row transforms") {
    // Spark's higher-order array expressions (filter/transform lambdas)
    // are interpreted and legitimately sit OUTSIDE codegen spans; the
    // guarantee asserted here is that the scan/sort pipeline around
    // them is codegen'd ("*(n)" markers in the final AQE plan).
    Seq("t01_token_stats", "t02_quality_score", "q03_project_compute").foreach { q =>
      // only execution of THIS df (not a derived count) finalizes AQE
      val df = SparkEntry.queries(q)(spark, sfDir)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("isFinalPlan=true"), s"$q: $p")
      assert(p.contains("*("), s"$q: no codegen span in $p")
    }
  }

  test("q43: the funnel shuffles user_id exactly once — no self-joins") {
    // headline claim of the mapGroups design vs the oracle's 3-way
    // self-join: one key exchange feeds the per-user O(1)-state pass;
    // the only other exchange is the final single-row aggregate's
    val p = plan("q43_funnel")
    assert(!p.contains("Join"), p)
    assert("Exchange".r.findAllIn(p).size <= 2, p)
  }

  test("q44: cohorts enrich via one user-keyed join, no nested-loop") {
    val p = plan("q44_retention_cohorts")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q44: the cell count aggregates pre-deduplicated triples, not raw events") {
    // the explicit two-phase distinct: a partial+final aggregate keyed
    // on (cohort, weeks_since, user_id) must sit below the cell count,
    // so the exchange carries distinct triples (users x active-weeks
    // bounded) instead of running countDistinct over raw events
    val p = plan("q44_retention_cohorts")
    val dedupAgg = p.linesIterator.exists(l =>
      l.contains("HashAggregate") && l.contains("user_id") &&
        l.contains("cohort") && l.contains("weeks_since"))
    assert(dedupAgg, p)
    // and no Expand / distinct-rewrite machinery left in the plan
    assert(!p.contains("Expand"), p)
  }

  test("d16: batch side broadcasts everywhere — no sort-merge, no cartesian, no corpus shuffle-join") {
    val p = plan("d16_incremental_neardup")
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("t22: scoring is a join-free narrow pass — model lives in executor memory") {
    // the fastText serving shape: after training, the scoring plan has
    // NO join and no token explode — one pass labels+scores each doc
    // against the broadcast model, and only the 4-cell confusion
    // aggregate (partial+final) shuffles
    val p = plan("t22_nb_classifier")
    assert(!p.contains("Join"), p)
    assert(!p.contains("Generate"), p) // no explode in the scoring pass
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("s15: the serve-phase index scan is statically partition-pruned on cell") {
    // the persisted-index payoff: the query job reads ONLY the probed
    // cells' partitions — the scan must carry a PartitionFilters
    // predicate on the cell column (pruned at file listing, before any
    // row is touched), not filter rows post-scan
    val p = plan("s15_ivf_persisted")
    val scanLine = p.linesIterator.find(l =>
      l.contains("PartitionFilters") && l.contains("cell")).getOrElse("")
    assert(scanLine.nonEmpty, p)
    assert(scanLine.contains("cell#") || scanLine.contains("cell IN") ||
      scanLine.contains("(cell"), scanLine)
  }

  test("p26: four curation stages read the corpus text exactly ONCE") {
    // gopher stats, the dedup digest, and the quality counts all fold
    // into one projection over one scan; the split is a per-row md5.
    // A refactor that gives any stage its own documents scan (the
    // composition bug this query exists to catch) fails here.
    val p = PipelineQueries.curationSurvivors(spark, sfDir)
      .queryExecution.executedPlan.toString
    val scans = p.linesIterator.count(l =>
      l.contains("Scan parquet") || l.contains("FileScan parquet"))
    assert(scans == 1, s"expected exactly 1 documents scan, got $scans:\n$p")
    // and the one scan prunes to the two columns the DAG consumes
    val rs = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(rs.contains("doc_id") && rs.contains("text"), rs)
    assert(!rs.contains("lang") && !rs.contains("n_chars"), rs)
    // the dedup aggregate is two-phase (min(struct) plans as a
    // SortAggregate — partial before the exchange, final after), and
    // the digest exchange is the ONLY shuffle: the split/quality
    // stages are per-row and must not add one
    assert(p.contains("partial_min"), p)
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$p")
  }

  test("p26c: the near-dup stage adds exactly the band exchange, and nothing re-reads text") {
    // head of the DAG: adding the simhash column to the one-scan
    // projection must change neither the scan count nor the exchange
    // count vs the p26 pin above
    val head = PipelineQueries.curationKeepersSim(spark, sfDir)
      .queryExecution.executedPlan.toString
    val headScans = head.linesIterator.count(l =>
      l.contains("Scan parquet") || l.contains("FileScan parquet"))
    assert(headScans == 1, s"expected exactly 1 documents scan, got $headScans:\n$head")
    val rs = head.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(rs.contains("doc_id") && rs.contains("text"), rs)
    assert(!rs.contains("lang") && !rs.contains("n_chars"), rs)
    assert(head.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1, head)
    // the near-dup stage itself, over the materialized keepers: NO
    // parquet scan anywhere (text is never re-read — the Hamming
    // verify runs on carried signatures), exactly ONE hash exchange
    // (the 4x16-bit band shuffle), and the drop set comes back as a
    // broadcast anti-join, never a shuffled one
    val keepers = Lineage.cut(PipelineQueries.curationKeepersSim(spark, sfDir))
    val nd = PipelineQueries.curationNearDup(keepers)
      .queryExecution.executedPlan.toString
    assert(!nd.contains("Scan parquet") && !nd.contains("FileScan parquet"),
      s"near-dup stage re-reads from disk:\n$nd")
    assert(nd.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1,
      s"expected exactly the band exchange:\n$nd")
    assert(nd.contains("BroadcastHashJoin") && nd.contains("LeftAnti"), nd)
    assert(!nd.contains("SortMergeJoin"), nd)
  }

  test("t15: the scoring plan carries no model aggregates — collect-once LocalRelations only") {
    // round-9's pre-broadcast guard probed the UNCACHED model
    // aggregates with count(), re-running the corpus tokenize/explode
    // twice per query (the round's only bench regression). The
    // collect-once design evaluates each model aggregate exactly once
    // (inside lmTryCollectModel's bounded collect, one job per table) and
    // hands the scorer LocalRelations — so the SCORING plan here must
    // contain exactly one documents scan, the two model tables as
    // LocalTableScans behind broadcast joins, and exactly one
    // aggregate pair (partial+final of the per-doc mean). Any extra
    // HashAggregate means the model lineage leaked back into the
    // scoring job and the corpus pays the explode again.
    val p = plan("t15_lm_perplexity")
    val scans = p.linesIterator.count(l =>
      l.contains("Scan parquet") || l.contains("FileScan parquet"))
    assert(scans == 1, s"expected exactly 1 documents scan, got $scans:\n$p")
    assert(p.linesIterator.count(_.contains("LocalTableScan")) == 2,
      s"expected the two collected model tables as LocalTableScans:\n$p")
    assert(p.linesIterator.count(_.contains("BroadcastHashJoin")) == 2, p)
    val aggs = p.linesIterator.count(_.contains("HashAggregate"))
    assert(aggs == 2, s"expected only the per-doc aggregate pair, got $aggs:\n$p")
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1, p)
  }

  test("t26/t27: the distributed-model variants never collect the model") {
    // TrainingDataOpsSpec pins row-for-row equality with broadcast
    // globally off; this pins the DEFAULT-CONFIG registry plan so a
    // future "optimization" cannot silently collect the model tables
    // to the driver (a LocalTableScan is lmTryCollectModel's signature —
    // the exact thing these fallbacks exist to avoid). The model may
    // legitimately arrive at the join via a BroadcastExchange over the
    // distributed aggregate at gate scale — that is the planner sizing
    // a small relation, not a driver collect — but it must stay a
    // DataFrame end to end: aggregates in-plan, zero local relations.
    for (q <- Seq("t26_lm_distributed", "t27_nb_distributed")) {
      val p = plan(q)
      assert(!p.contains("LocalTableScan"),
        s"$q: model was collected to the driver —\n$p")
      // the model aggregates execute inside this plan (collect-once
      // would leave only the scoring aggregate pair, t15's shape)
      val aggs = p.linesIterator.count(_.contains("HashAggregate"))
      assert(aggs > 2, s"$q: expected model aggregates in-plan, got $aggs:\n$p")
      // scoring joins the token keys
      assert(p.contains("Join"), s"$q: no token-key join in plan:\n$p")
    }
  }

  test("t15b: the model-path switch pins both physical plans in one registry query") {
    // the switch is cost-based and automatic (lmPerplexity measures
    // the model against the driver budget); this pins that the
    // DEFAULT-CONFIG registry union really contains BOTH shapes —
    // exactly one collect-and-broadcast half (its two model tables as
    // LocalTableScans) and one distributed half (model aggregates
    // in-plan). A regression that silently collects both halves (or
    // distributes both) flips one of these counts.
    val p = plan("t15b_lm_auto_switch")
    assert(p.linesIterator.count(_.contains("LocalTableScan")) == 2,
      s"expected exactly the collect half's two model tables:\n$p")
    // collect half: per-doc aggregate pair (2). distributed half: the
    // same pair PLUS the uni/big model aggregates in-plan (partial +
    // final each) — strictly more than double the collect half's
    val aggs = p.linesIterator.count(_.contains("HashAggregate"))
    assert(aggs > 4,
      s"distributed half's model aggregates missing from the plan " +
        s"(got $aggs HashAggregates):\n$p")
  }

  test("s21/t24/s20: the round-8 additions keep cartesians and corpus sorts out") {
    // s21: candidate fetch is an equi-join on the IVF cell + native
    // TopKPerKey — never a cartesian or nested-loop pair space
    val s21 = plan("s21_knn_join")
    assert(!s21.contains("CartesianProduct"), s21)
    assert(s21.contains("TopKPerKey"), s21)
    // t24: the rank table broadcasts back onto the corpus — the bin
    // assign must not shuffle-join, and no corpus-sized window exists
    val t24 = plan("t24_quantile_bins")
    assert(t24.contains("BroadcastHashJoin"), t24)
    assert(!t24.contains("SortMergeJoin"), t24)
    // s20: eval side broadcasts; the only aggregate is partial+final
    val s20 = plan("s20_eval_decontam")
    assert(s20.contains("Broadcast"), s20)
    assert(!s20.contains("SortMergeJoin"), s20)
    assert("HashAggregate".r.findAllIn(s20).size >= 2, s20)
  }

  test("q45b: the sketched profile never Expands the corpus") {
    // q45's exact multi-distinct pass widens every row 4-5x through an
    // Expand before the exchange; the sketched profile's contract is
    // that NOTHING does — each column's exact leg is a single-distinct
    // two-phase aggregate and the HLL++ sketch is a plain aggregate,
    // so the plan must contain no Expand node at all. Each profile
    // branch must also prune its scan to the one profiled column.
    val p = plan("q45b_profile_sketch")
    assert(!p.contains("Expand"), p)
    val readSchemas = p.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(readSchemas.nonEmpty, p)
    readSchemas.foreach { rs =>
      assert(!rs.contains("l_comment") && !rs.contains("l_extendedprice"), rs)
    }
  }

  test("q46: the quality suite runs exactly TWO actions (fused same-table checks)") {
    // the suite's scale discipline: orders-side checks fuse into one
    // aggregate, lineitem-side checks into one join+aggregate pass —
    // 2 driver actions / 2 fact-table scans, not 4. Counted via
    // QueryExecutionListener (one onSuccess per eager action); the
    // bus is async, so poll until the count is stable. The query runs
    // in a DEDICATED child session: ExecutionListenerBus filters
    // events by session, so eager actions from other suites (or
    // in-flight events posted before registration) can never inflate
    // the count — the listener sees exactly this session's actions.
    @volatile var executions = 0
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = executions += 1
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    val session = spark.newSession()
    session.listenerManager.register(listener)
    try {
      val out = SparkEntry.queries("q46_quality_checks")(session, sfDir)
      // settle the async listener bus: wait until no new events for a
      // full second (bounded at 30s)
      var last = -1
      var stableMs = 0L
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (stableMs < 1000 && System.nanoTime() < deadline) {
        if (executions == last) stableMs += 100 else { stableMs = 0; last = executions }
        Thread.sleep(100)
      }
      assert(executions == 2,
        s"q46 ran $executions eager actions — the fused suite runs exactly 2")
      // and the fused result still carries all four checks
      assert(out.count() == 4)
    } finally session.listenerManager.unregister(listener)
  }

  test("p29: CDC apply is one hash aggregate — no Window, no changelog sort") {
    val p = plan("p29_cdc_apply")
    assert(!p.contains("Window"), s"CDC apply regressed to a window:\n$p")
    // map-side partial combine on the latest-version fold — each task
    // shrinks its changelog to one row per local key pre-exchange
    assert(p.contains("partial_max_by"), s"no partial aggregation:\n$p")
    // the fold must stay a HashAggregate: a string-valued max_by would
    // demote it to SortAggregate (immutable buffer), which Sorts the
    // full changelog twice — the exact plan this operator replaces
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("SortAggregate"), s"fold demoted to SortAggregate:\n$p")
    // the only Sort is the presentation orderBy above the aggregate;
    // a per-key changelog sort below it would be a second one
    val sorts = p.linesIterator.count(_.contains("Sort ["))
    assert(sorts <= 1, s"expected at most the presentation sort, got $sorts:\n$p")
  }

  test("q51: the salted join stays shuffled-hash — no sort-merge, no broadcast, dim replicated") {
    val p = plan("q51_salted_skew_join")
    assert(p.contains("ShuffledHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("Generate"), s"dim side not salt-replicated:\n$p")
  }

  test("d22: the split adds no exchanges or aggregates over d14's survivorship plan") {
    // the leakage-free guarantee is by construction (split hashes
    // canonical_id), so the assignment must cost nothing beyond d14's
    // join — no extra exchange, no corpus-wide audit aggregate. It is
    // in fact strictly CHEAPER: d22 never reads cluster_size, so
    // Catalyst prunes the per-cluster size subtree (its aggregate pair
    // and exchange) out of the plan entirely — pin ≤ componentwise.
    def shape(n: String): (Int, Int) = {
      val p = plan(n)
      (p.linesIterator.count(_.contains("Exchange")),
        p.linesIterator.count(_.contains("HashAggregate")))
    }
    val d14 = shape("d14_dedup_materialize")
    val d22 = shape("d22_cluster_split")
    assert(d22._1 <= d14._1 && d22._2 <= d14._2,
      s"d22 plan shape $d22 exceeds d14's $d14 — the split " +
        "should be a narrow projection over the same survivorship join")
  }

  test("d23: the stored-components SERVE plan recomputes no components") {
    // the amortization claim is a plan property: after the one-time
    // build, a consumer reads the stored 24-byte assignment and joins
    // it onto the corpus — zero aggregates (no star rounds, no size
    // groupBy: sizes are STORED), zero object-boundary crossings (the
    // CC flatMaps serialize to/from objects), exactly two parquet
    // scans (corpus + store), one join
    val store = Cluster.buildComponentStore(spark, sfDir)
    val p = Cluster.dedupServeStored(spark, sfDir, store)
      .queryExecution.executedPlan.toString
    assert(!p.contains("HashAggregate") && !p.contains("SortAggregate"),
      s"serve plan aggregates — components/sizes recomputed:\n$p")
    assert(!p.contains("SerializeFromObject") &&
        !p.contains("MapPartitions"),
      s"serve plan crosses the object boundary — CC machinery leaked:\n$p")
    assert(p.linesIterator.count(_.contains("Scan parquet")) == 2,
      s"serve plan must scan exactly corpus + store:\n$p")
    assert(p.contains("ShuffledHashJoin") || p.contains("BroadcastHashJoin"),
      s"serve join degraded to sort-merge/cartesian:\n$p")
  }

  test("d24: the bucketed SERVE plan runs with ZERO Exchange") {
    // the scale floor: both sides bucketed by doc_id into the same
    // count, so the left SortMergeJoin is co-located — no Exchange
    // anywhere (the p14 pin, now on the dedup-serving consumer), and
    // still none of the component machinery d23's pin excludes
    val p = Cluster.dedupServeBucketed(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"d24 bucketed serve shuffled:\n$p")
    assert(!p.contains("HashAggregate") && !p.contains("SortAggregate"),
      s"serve plan aggregates — components/sizes recomputed:\n$p")
    assert(!p.contains("SerializeFromObject") &&
        !p.contains("MapPartitions"),
      s"serve plan crosses the object boundary — CC machinery leaked:\n$p")
  }

  test("q38: rank broadcast is size-gated — the fallback keeps edges in " +
      "place and never broadcasts the rank table") {
    // r16 (VERDICT r15 item 4): the per-iteration broadcast(rank) is
    // O(nodes); at corpus scale the gate must flip to the co-partitioned
    // shape (edges partitioned by src, only the small rank table moves).
    // Pin BOTH properties: (a) with broadcasts disabled the uncut
    // 10-iteration lineage contains ZERO BroadcastExchange, and (b) the
    // fallback computes the identical result (round(rank, 6) absorbs
    // any aggregation-order float drift at this scale).
    val default = SparkEntry.queries("q38_pagerank")(spark, sfDir)
      .collect().toSeq
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    sys.props("graft.lineage.nocut") = "true"
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = SparkEntry.queries("q38_pagerank")(spark, sfDir)
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastExchange"),
        s"fallback iteration body broadcasts — O(nodes) at scale:\n${p.take(4000)}")
      assert(df.collect().toSeq == default,
        "fallback path result diverges from the broadcast path")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      sys.props.remove("graft.lineage.nocut")
    }
  }
}
