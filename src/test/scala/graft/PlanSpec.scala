package graft

/** Plan-shape regression guards: the physical plans that make these
  * queries scale must not silently degrade (pushdown lost, broadcast
  * falling back to sort-merge, extra shuffles).
  */
class PlanSpec extends SparkSuite {

  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf001)
    df.queryExecution.executedPlan.toString
  }

  test("q1_agg pushes the shipdate filter and prunes columns at the scan") {
    val df = SparkEntry.queries("q1_agg")(spark, sf001)
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
    assert(scan.contains("ReadSchema: struct<l_quantity:double"))
    assert(!scan.contains("l_partkey")) // pruned
  }

  test("q5_star_join plans as a broadcast chain, never sort-merge") {
    val plan = planOf("q5_star_join")
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("j1 anti-join is a hash anti-join") {
    val plan = planOf("j1_anti_join")
    assert(plan.contains("LeftAnti"))
  }

  test("w1 latest-per-key needs exactly one shuffle for the window") {
    val plan = planOf("w1_latest_per_key")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles == 1, s"expected 1 hash exchange, got $shuffles:\n$plan")
  }

  test("o2 top-k plans as TakeOrderedAndProject (no global sort)") {
    val plan = planOf("o2_topk")
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("j4 semi-join is a shuffled hash semi-join (build side is table-scale)") {
    // r14: the build side is every order's custkey — ~10× the probe
    // side — but bigint keys compress under AQE's broadcast threshold,
    // which at sf10 built and shipped a 15 M-key hashed relation for a
    // "small" side (isolated 7.2 s vs ~1 s pinned). The pin keeps the
    // hash family (no sort) without the driver-scale build.
    val plan = planOf("j4_semi_join")
    assert(plan.contains("ShuffledHashJoin") && plan.contains("LeftSemi"),
      plan.linesIterator.filter(_.contains("Join")).mkString("\n"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("q3_topk_join keeps its partial top-k and broadcast segment filter (r15 audit)") {
    // r14 verdict suspected a lost TakeOrdered pushdown or the AQE
    // compressed-bytes broadcast class behind the 3.8 s sf10 median;
    // the r15 audit found neither — the cost is the legitimate
    // fact⋈orders join. Two rewrites were A-B measured and REJECTED
    // (SCALE_SOAK r15): eager aggregation below the join (partial agg
    // over mostly-unique l_orderkey is pure overhead: 8.3 vs 4.9 s
    // isolated) and a pre-filtered shuffle-hash orders side (rode the
    // same regression). This pin keeps what must not degrade: the
    // limit stays a partial top-k (never a global sort) and the
    // segment filter stays a broadcast.
    val plan = planOf("q3_topk_join")
    assert(plan.contains("TakeOrderedAndProject"),
      plan.linesIterator.take(8).mkString("\n"))
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("o1 pagination plans as a partial top-k with offset, no global sort") {
    val plan = planOf("o1_pagination")
    assert(plan.contains("TakeOrderedAndProject"),
      plan.linesIterator.take(8).mkString("\n"))
  }

  test("q7_pivot reads only the 3 pivot columns and needs one agg shuffle") {
    val df = SparkEntry.queries("q7_pivot")(spark, sf001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains(
      "ReadSchema: struct<o_orderstatus:string,o_totalprice:double,o_orderpriority:string>"),
      plan.linesIterator.filter(_.contains("ReadSchema")).mkString("\n"))
    // Spark pivots via two-phase aggregation: pre-agg on (group, pivot)
    // keys, then the pivot agg on the group key — 2 hash exchanges, the
    // second over already-aggregated rows (tiny). Explicit pivot values
    // mean no third job discovering distinct statuses.
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles == 2, s"expected 2 hash exchanges, got $shuffles")
  }

  test("w6_distribution: all three window functions share one partitioning shuffle") {
    val plan = planOf("w6_distribution")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles == 1, s"expected 1 hash exchange, got $shuffles:\n$plan")
  }

  test("cu_pack needs exactly one hash shuffle (the per-lang window)") {
    val plan = planOf("cu_pack")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles == 1, s"expected 1 hash exchange, got $shuffles:\n$plan")
  }

  test("cu_mix_sample joins rates by broadcast — the corpus never shuffles for the join") {
    val plan = planOf("cu_mix_sample")
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("tx_vocab ranks after a top-k, never sorting the vocabulary globally") {
    val plan = planOf("tx_vocab")
    assert(plan.contains("TakeOrderedAndProject"),
      plan.linesIterator.take(10).mkString("\n"))
  }

  test("scale-safe dedup/similarity entries never plan an all-pairs join") {
    // sim_cosine_topk/neardup are the exact baselines and legitimately
    // cross-join; every blocked variant must stay bucket-local
    for (q <- Seq("dd_minhash_lsh", "dd_simhash", "dd_ngram_jaccard",
        "dd_embed_neardup", "sim_ann_lsh", "dd_paragraph")) {
      val plan = planOf(q)
      assert(!plan.contains("CartesianProduct"), s"$q plans a cartesian product")
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"$q plans a nested-loop join")
    }
  }

  test("dd_substring: join-free window marking, one gram pass, per-doc spans (r17)") {
    val plan = planOf("dd_substring")
    // dup-marking is a WINDOW over the single gram pass — no join of
    // any kind exists, so a hot boilerplate gram can never pair docs
    // (the first-cut dictionary semi-join shape re-extracted grams per
    // branch: 74 s sf10 isolated; this one-pass shape replaced it)
    assert(!plan.contains("Join") && !plan.contains("CartesianProduct"),
      s"substring dedup must be join-free:\n$plan")
    // exactly one corpus-scale mark exchange (by gram hash) + the
    // per-doc span exchange; grams are generated ONCE
    val hashEx = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(hashEx == 2, s"expected 2 hash exchanges (h mark + doc_id spans), got $hashEx:\n$plan")
    assert("hashpartitioning\\(h#".r.findFirstIn(plan).isDefined &&
      "hashpartitioning\\(doc_id#".r.findFirstIn(plan).isDefined,
      s"exchanges must be the h mark and doc_id span partitionings:\n$plan")
    val generates = "\\bGenerate\\b".r.findAllIn(plan).size
    assert(generates == 1, s"gram stream must be generated once, got $generates:\n$plan")
  }

  test("substring keep1 spans: same join-free one-pass shape as the base policy (r18)") {
    // the canonical election is one more window function over the SAME
    // hashpartitioning(h) exchange — keep1 must not add a join or a
    // third corpus-scale exchange
    val df = graft.operators.Dedup.substringDupSpansKeep1(
      graft.sources.Tables.documents(spark, sf001), "text", "doc_id", k = 8)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("CartesianProduct"),
      s"keep1 substring spans must stay join-free:\n$plan")
    val hashEx = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(hashEx == 2, s"expected 2 hash exchanges (h mark + doc_id spans), got $hashEx:\n$plan")
    val generates = "\\bGenerate\\b".r.findAllIn(plan).size
    assert(generates == 1, s"gram stream must be generated once, got $generates:\n$plan")
  }

  test("keep1q spans keep the join-free 2-exchange shape; sim_quantize_pq is shuffle-free (r18)") {
    // quality election = scan-side score + an ORDER-FREE min(struct)
    // window (r19): never a join, a third corpus exchange, or more
    // sorts than the id election itself plans
    val df = graft.operators.Dedup.substringDupSpansKeep1Quality(
      graft.sources.Tables.documents(spark, sf001), "text", "doc_id", k = 8)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("CartesianProduct"),
      s"keep1q spans must stay join-free:\n$plan")
    val hashEx = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(hashEx == 2, s"expected 2 hash exchanges, got $hashEx:\n$plan")
    // r19 (VERDICT ask #3): the quality election must NOT re-sort the
    // gram exchange — keep1q plans exactly as many Sort nodes as keep1
    val keep1Plan = graft.operators.Dedup.substringDupSpansKeep1(
      graft.sources.Tables.documents(spark, sf001), "text", "doc_id", k = 8)
      .queryExecution.executedPlan.toString
    assert("\\bSort\\b".r.findAllIn(plan).size ==
      "\\bSort\\b".r.findAllIn(keep1Plan).size,
      s"keep1q must plan the same sorts as keep1 (order-free election), " +
        s"got keep1q=${"\\bSort\\b".r.findAllIn(plan).size} vs " +
        s"keep1=${"\\bSort\\b".r.findAllIn(keep1Plan).size}:\n$plan")
    // PQ: the codebook embeds as a literal — pure per-row compute
    val pq = SparkEntry.queries("sim_quantize_pq")(spark, sf001)
    val pqPlan = pq.queryExecution.executedPlan.toString
    assert(!pqPlan.contains("Join") && !pqPlan.contains("Exchange hashpartitioning"),
      s"PQ assignment must be scan-side (literal codebook, no join/shuffle):\n$pqPlan")
  }

  test("sim_ann_ivfpq: scan tier plans no candidate join; join tier ships codes (r19)") {
    // budget-admitted (the graded shape): the encoded index broadcasts
    // and the ADC scan is map-side — no candidate join of any kind,
    // the only joins are the exact-cosine rerank id attaches
    val plan = planOf("sim_ann_ivfpq")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"ivfpq must stay list-blocked, never all-pairs:\n$plan")
    assert(plan.contains("MapPartitions"),
      s"scan tier lost its map-side ADC kernel:\n$plan")
    assert(!"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \\[list_id".r
      .findFirstIn(plan).isDefined,
      s"scan tier still plans a list-keyed candidate join:\n$plan")
    // past the broadcast budget: ONE merge-pinned list_id candidate
    // join shipping (id, list_id, codes) — never vectors
    val joinPlan = graft.operators.Similarity.ivfPqSeededTopK(
      graft.sources.Tables.embeddings(spark, sf001), "vec_id", "embedding",
      k = 5, rerankC = 32, m = 4, codebookK = 16,
      maxIndexBroadcastBytes = 0L)
      .queryExecution.executedPlan.toString
    val smjList = "SortMergeJoin \\[list_id".r.findAllIn(joinPlan).size
    assert(smjList == 1,
      s"join tier: expected exactly 1 merge-pinned list_id join, got $smjList:\n$joinPlan")
    assert(joinPlan.contains("codes"),
      s"PQ codes column missing from the join-tier plan:\n$joinPlan")
    assert(!joinPlan.linesIterator.exists(l =>
      l.contains("Exchange") && l.contains("codes") && l.contains("vec")),
      s"candidate exchange carries vectors next to codes:\n$joinPlan")
  }

  test("mm_dedup_near: banded chunk join, payload bytes never enter the exchange (r19)") {
    val plan = planOf("mm_dedup_near")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"perceptual near-dup must stay banded, not all-pairs:\n$plan")
    // the pair join keys on the 4x16-bit chunk values
    assert("join.*chunk".r.findFirstIn(plan.toLowerCase).isDefined,
      s"expected a chunk-keyed banding join:\n$plan")
    // only (id, 16-hex ph) rows shuffle — the binary payload column
    // must be projected away before every exchange
    assert(!plan.linesIterator.exists(l =>
      l.contains("Exchange") && l.contains("payload")),
      s"payload bytes entered an exchange:\n$plan")
  }

  test("bloom decontamination probes scan-side; bpe pairs rank after a top-k (r18)") {
    // the contamination probe is a literal-bitmap filter — the only
    // joins are the broadcast flag attach; no gram-keyed shuffle join
    val plan = planOf("cu_decontaminate_bloom")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"bloom probe must not shuffle-join the corpus:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"flag attach should broadcast:\n$plan")
    val bpe = planOf("tx_bpe_pairs")
    assert(bpe.contains("TakeOrderedAndProject"),
      s"bpe ranking must follow a top-k, not a global sort:\n${bpe.linesIterator.take(12).mkString("\n")}")
  }

  test("tx_bpe_merges: per-iteration pair count is one map-side-combined aggregate (r20)") {
    // the trainer's per-iteration cost: pairCounts over the vocab-sized
    // word-freq frame must plan as partial -> exchange -> final hash
    // aggregate over the (<= alphabet^2) pair keys — no sort, no join,
    // and exactly the two aggregate exchanges (word-freq build + pairs)
    val wf = graft.operators.BpeTrainer.wordFreq(
      graft.sources.Tables.documents(spark, sf001), "text")
    val plan = graft.operators.BpeTrainer.pairCounts(wf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), s"pair count lost its hash aggregate:\n$plan")
    assert(!plan.contains("SortAggregate") && !plan.contains("Sort "),
      s"pair space must aggregate hash-side, never sort:\n$plan")
    assert(!plan.contains("Join"), s"pair counting must not join:\n$plan")
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges == 2,
      s"expected exactly 2 exchanges (word-freq groupBy + pair groupBy), got $exchanges:\n$plan")
  }

  test("dd_semdedup: scan tier plans no pair join; over-budget keeps the cell-keyed join") {
    // budget-admitted (r14): the pair enumeration is a map-side scan of
    // the broadcast inverted file — no join node, no cartesian, and the
    // only non-centroid work above the scan is the list-ordinal scatter
    val plan = planOf("dd_semdedup")
    assert(!plan.contains("CartesianProduct"), s"corpus-side cartesian:\n$plan")
    assert(plan.contains("MapPartitions"), s"scan tier lost its MapPartitions:\n$plan")
    assert(!"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \\[list_id".r
      .findFirstIn(plan).isDefined,
      s"scan tier still plans a cell-keyed pair join:\n$plan")
    // over-budget corpora (the 100 TB path): the pair join must stay an
    // equi-join keyed on the cell id, never a cartesian product
    val joinPlan = graft.operators.Dedup.semDedupPairs(
      graft.sources.Tables.embeddings(spark, sf001), "embedding", "vec_id",
      threshold = QueriesExt.NearDupCosine, maxIndexBroadcastBytes = 0)
      .queryExecution.executedPlan.toString
    assert(!joinPlan.contains("CartesianProduct"), s"corpus-side cartesian:\n$joinPlan")
    assert("(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \\[list_id".r
      .findFirstIn(joinPlan).isDefined,
      s"pair join is not keyed on the cell id:\n$joinPlan")
  }

  test("cu_dedup_keep_best ranks inside clusters with one window shuffle") {
    val plan = planOf("cu_dedup_keep_best")
    // quality is scan-side; the only hash exchanges are the label join
    // and the per-cluster ranking window
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles <= 3, s"expected <=3 hash exchanges, got $shuffles:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("cu_stratified_sample is shuffle-free: a pure scan+filter plan") {
    // the hash-threshold Bernoulli design exists precisely so the sample
    // never shuffles — the final orderBy is presentation-only (range
    // exchange), so assert no HASH partitioning anywhere
    val plan = planOf("cu_stratified_sample")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"stratified sample should not shuffle:\n$plan")
  }

  test("cu_chunk never shuffles: tokenize + window generation are scan-side") {
    val plan = planOf("cu_chunk")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"chunking should be a pure per-row Generate:\n$plan")
  }

  test("tx_repetition is shuffle-free: all array ops evaluate scan-side") {
    val plan = planOf("tx_repetition")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"repetition signals should not shuffle:\n$plan")
  }

  test("cu_token_mix aggregates partially before its single shuffle") {
    val plan = planOf("cu_token_mix")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles == 1, s"expected 1 hash exchange (the group-by), got $shuffles:\n$plan")
    assert(plan.contains("partial_count") || plan.contains("HashAggregate"),
      s"expected map-side partial aggregation:\n$plan")
  }

  test("cu_decontaminate joins stay broadcast — the corpus never shuffles for a join") {
    val plan = planOf("cu_decontaminate")
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast joins:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"corpus-side sort-merge join:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"unexpected all-pairs join:\n$plan")
  }

  test("q8_cube computes all four grouping sets in one Expand + one shuffle") {
    val plan = planOf("q8_cube")
    assert(plan.contains("Expand"), s"cube should plan via Expand:\n$plan")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles == 1, s"expected 1 hash exchange, got $shuffles:\n$plan")
  }

  test("w7_range_window needs exactly one shuffle for the per-user frame") {
    val plan = planOf("w7_range_window")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles == 1, s"expected 1 hash exchange, got $shuffles:\n$plan")
  }

  test("cu_corpus_curate gates rows scan-side, before the dedup shuffle") {
    // the lang/quality filters must run before the Exchange so only gate
    // survivors shuffle — at 100 TB that's the difference between
    // shuffling the whole corpus and a fraction of it
    val plan = planOf("cu_corpus_curate")
    val exchangeIdx = plan.indexOf("Exchange hashpartitioning")
    val filterIdx = plan.lastIndexOf("Filter")
    assert(exchangeIdx >= 0 && filterIdx > exchangeIdx,
      s"expected a Filter below (after, in plan text) the Exchange:\n$plan")
  }

  test("a2/a3 single-scan multi-aggregate reads only the PK columns") {
    val df = SparkEntry.queries("a2_distinct_pk")(spark, sf001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int>"))
  }
}

class BucketingSpec extends SparkSuite {
  import graft.sources.{Bucketing, Tables}

  test("co-located join of same-bucketed tables plans without a shuffle") {
    val o = Tables.orders(spark, sf001)
    val l = Tables.lineitem(spark, sf001)
      .withColumnRenamed("l_orderkey", "o_orderkey")
    // clear any leftover table + warehouse location from a prior run
    Seq("b_orders", "b_lineitem").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists) org.apache.commons.io.FileUtils.deleteDirectory(loc)
    }
    Bucketing.writeBucketed(o, "b_orders", "o_orderkey", 8)
    Bucketing.writeBucketed(l, "b_lineitem", "o_orderkey", 8)
    // disable auto-broadcast: at real scale neither side broadcasts, and
    // the point is the shuffle-free sort-merge over aligned buckets
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.colocatedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"), s"expected shuffle-free bucketed join:\n$plan")
      assert(joined.count() == l.count()) // every lineitem matches its order
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("verify-attach joins read the co-partitioned scratch with zero exchange and zero sort") {
    // the r9 sf10 soak died sort-spilling the full shingle-array frame on
    // the corpus side of every verify attach; persistScratchById lays the
    // scratch out hash-partitioned + sorted by id so the merge-pinned
    // attaches must plan the cached side BARE — any Sort or Exchange
    // between the join and the InMemoryTableScan means the layout (or its
    // alias propagation) regressed and the array frame is being re-sorted.
    // The machinery under test only attaches above the corpus-size floor
    // (r11) — force the scale path on the test corpus
    spark.conf.set(graft.operators.Dedup.ScaleFloorKey, "0")
    import org.apache.spark.sql.execution.{SparkPlan, SortExec}
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    import org.apache.spark.sql.execution.exchange.{Exchange, ReusedExchangeExec}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec, ShuffleQueryStageExec}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => p +: flatten(a.executedPlan)
      case q: QueryStageExec => p +: flatten(q.plan)
      case r: ReusedExchangeExec => p +: flatten(r.child)
      case _ => p +: p.children.flatMap(flatten)
    }
    try for (name <- Seq("dd_minhash_lsh", "dd_simhash", "dd_ngram_jaccard")) {
      val df = SparkEntry.queries(name)(spark, sf001)
      val exec = df.queryExecution.executedPlan
      exec.execute().count() // finalize AQE so the guard reads the real plan
      // the attach joins are the single-key SMJs on id_a/id_b; the band /
      // inverted-index self-joins key on band_hash/sh and legitimately
      // shuffle above the same cached scratch
      val attachSides = flatten(exec).collect {
        case j: SortMergeJoinExec
            if j.leftKeys.length == 1 && j.leftKeys.head.references.toSeq
              .exists(a => a.name == "id_a" || a.name == "id_b") =>
          flatten(j.right)
      }.filter(_.exists(_.isInstanceOf[InMemoryTableScanExec]))
      assert(attachSides.nonEmpty, s"$name: no attach join against the cached scratch found")
      for (side <- attachSides) {
        assert(!side.exists(_.isInstanceOf[SortExec]),
          s"$name: verify attach re-sorts the scratch side:\n${side.head}")
        assert(!side.exists(p => p.isInstanceOf[Exchange] || p.isInstanceOf[ShuffleQueryStageExec]),
          s"$name: verify attach re-shuffles the scratch side:\n${side.head}")
      }
    } finally spark.conf.unset(graft.operators.Dedup.ScaleFloorKey)
  }

  test("exploded candidate self-joins stay shuffle joins through AQE's final re-plan") {
    // the guard must read the FINAL adaptive plan (after an action):
    // AQE's broadcast conversion thresholds on COMPRESSED runtime
    // shuffle bytes, and the exploded ids-only sides compress ~50× —
    // at test scale the conversion would always fire, which is exactly
    // why the merge pins exist (at sf4 the deserialized build measured
    // 12.9 GiB, over the 8 GiB broadcast hard limit; on a cluster an
    // executor OOM). A broadcast appearing HERE means the pin is lost.
    // Pins only attach above the corpus-size floor (r11) — force them.
    // dd_embed_neardup's BROADCAST tier no longer self-joins at all
    // (r11 bucket-local rewrite): its guard moved below; the self-join
    // guard still applies to its over-budget SHUFFLE tier.
    spark.conf.set(graft.operators.Dedup.ScaleFloorKey, "0")
    def finalPlanOf(df: org.apache.spark.sql.DataFrame): String = {
      // df.count() would execute a *derived* plan, leaving this one
      // isFinalPlan=false; executing the plan object itself makes AQE
      // materialize every stage and commit its final re-plan here
      val exec = df.queryExecution.executedPlan
      exec.execute().count()
      exec.toString
    }
    def assertSelfJoinStaysSmj(name: String, plan: String, selfJoinKey: String): Unit = {
      // the bucket join may carry leading keys (e.g. [band, band_hash, __salt]),
      // so match the distinguishing key anywhere inside the key list —
      // but require it in BOTH key lists of the SAME join node, so an
      // unrelated SMJ elsewhere in the plan can't satisfy the guard
      val smjSelf = ("SortMergeJoin \\[[^\\]]*" + selfJoinKey +
        "[^\\]]*\\], \\[[^\\]]*" + selfJoinKey).r
      val bhjSelf = ("BroadcastHashJoin \\[[^\\]]*" + selfJoinKey +
        "[^\\]]*\\], \\[[^\\]]*" + selfJoinKey).r
      assert(smjSelf.findFirstIn(plan).isDefined,
        s"$name bucket self-join is no longer a sort-merge join:\n$plan")
      assert(bhjSelf.findFirstIn(plan).isEmpty,
        s"$name bucket self-join was broadcast-converted by AQE:\n$plan")
    }
    try {
      assertSelfJoinStaysSmj("dd_minhash_lsh",
        finalPlanOf(SparkEntry.queries("dd_minhash_lsh")(spark, sf001)), "band_hash")
      // embed broadcast tier: ONE exchange of the exploded index into a
      // bucket-local MapPartitions — no self-join node may reappear
      // (a second exploded pipeline + per-collision join machinery)
      val bcastPlan = finalPlanOf(SparkEntry.queries("dd_embed_neardup")(spark, sf001))
      assert(bcastPlan.contains("MapPartitions"),
        s"dd_embed_neardup broadcast tier lost the bucket-local MapPartitions:\n$bcastPlan")
      assert(!("SortMergeJoin \\[[^\\]]*bk".r.findFirstIn(bcastPlan).isDefined),
        s"dd_embed_neardup broadcast tier re-grew a bucket self-join:\n$bcastPlan")
      // embed shuffle tier (over-budget corpora) keeps the pinned SMJ
      val emb = graft.sources.Tables.embeddings(spark, sf001)
      assertSelfJoinStaysSmj("dd_embed_neardup (shuffle tier)",
        finalPlanOf(graft.operators.Dedup.embeddingNearDupPairs(
          emb, "embedding", "vec_id", threshold = QueriesExt.NearDupCosine,
          maxBroadcastBytes = 0L)), "bk")
    } finally spark.conf.unset(graft.operators.Dedup.ScaleFloorKey)
  }

  test("ANN rankers consume candidates with a bounded-heap aggregate, not a window sort") {
    // the window form sorts the full N·probe·listSize candidate stream
    // twice; the TopKNeighbors aggregate kills candidates map-side in
    // the producing stage (ObjectHashAggregate partial mode) and its
    // exchange carries ≤ queries·k packed entries — at sf10 the sorts
    // were the dominant cost of sim_ann_ivf (~2e9 candidate rows)
    // sim_ann_ivf (r12) and sim_ann_lsh (r13): under the
    // index-broadcast budget the graded queries take their SCAN tiers —
    // the candidate stream never exists, so there is no aggregate to
    // guard; each tier's own contract is stronger: no join, no window
    // sort, no candidate-volume exchange (only the compact query-side
    // round-robin spread), ranking inside the map-side scan loop
    // (bit-identical to TopKNeighbors — tier-parity specs in
    // DedupSimilaritySpec).
    for (name <- Seq("sim_ann_ivf", "sim_ann_lsh")) {
      val plan = SparkEntry.queries(name)(spark, sf001)
        .queryExecution.executedPlan.toString
      assert(plan.contains("MapPartitions"),
        s"$name no longer ranks via the map-side scan loop:\n$plan")
      assert(!plan.contains("WindowGroupLimit") && !plan.contains("Join"),
        s"$name scan tier grew a join or window sort:\n$plan")
    }
    // ...and the over-budget JOIN tiers keep the bounded-heap aggregate
    // contract the old guard pinned — the 2e9-candidate-row sort
    // regression it existed to catch must not ship silently to the
    // 100 TB path (maxIndexBroadcastBytes = 0 forces that tier)
    val emb = graft.sources.Tables.embeddings(spark, sf001)
    val joinTiers = Seq(
      "IVF" -> graft.operators.Similarity.ivfSeededTopK(emb, "vec_id",
        "embedding", k = 5, maxIndexBroadcastBytes = 0),
      "LSH" -> graft.operators.Similarity.lshTopK(emb, "vec_id",
        "embedding", k = 5, maxIndexBroadcastBytes = 0))
    for ((label, df) <- joinTiers) {
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("ObjectHashAggregate") &&
        plan.contains("graft_top_k_neighbors"),
        s"$label join tier no longer ranks via the TopKNeighbors aggregate:\n$plan")
      assert(!plan.contains("WindowGroupLimit"),
        s"$label join tier sorts candidates for a rank window again:\n$plan")
    }
  }
}
