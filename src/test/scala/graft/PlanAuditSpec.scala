package graft

import org.apache.spark.sql.execution.ExplainMode

/** Plan-shape guards: the properties that make the query surface hold at
  * 100 TB are asserted here against the actual physical plans, so a
  * refactor that silently de-broadcasts a dimension, un-pushes a filter,
  * reintroduces a global sort, or degrades a banded join to all-pairs
  * fails the suite — not just the benchmark.
  */
class PlanAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("star-join dimensions broadcast (q5 shape)") {
    assert(plan("q5_local_supplier").contains("BroadcastHashJoin"))
  }

  test("scan predicates reach the parquet reader as pushed filters (q6 shape)") {
    val p = plan("q6_forecast_revenue")
    assert(p.contains("PushedFilters"))
    assert(p.contains("l_shipdate"), "date range must be pushed into the lineitem scan")
  }

  test("projection prunes the scan schema to referenced columns") {
    val p = plan("q6_forecast_revenue")
    // ReadSchema carries only the four referenced lineitem columns — a
    // scan reading the full row width for a narrow aggregate is wrong
    val read = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(read.contains("l_shipdate") && read.contains("l_discount"))
    assert(!read.contains("l_comment") && !read.contains("l_orderkey"))
  }

  test("deletion-vector anti-join does not block pushdown: residual filters reach the scan") {
    // the vector wraps every read in a left_anti join — Catalyst must
    // still push the residual range THROUGH the join's left side into
    // the parquet scan, or a vectored table silently loses row-group
    // pruning on every predicate read at 100 TB
    import org.apache.spark.sql.functions._
    val t = new graft.ops.CdcTable(spark,
      tmpDir("dvpush") + "/t", Seq("id"))
    t.init(spark.range(1, 10001).toDF("id").withColumn("v", col("id") * 2)
      .repartitionByRange(4, col("id")))
    t.deleteVectored(col("id") === 5L)
    val p = t.readWhere(Seq(graft.ops.FileSkipping.Range("id", Some(100L), Some(200L))))
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("PushedFilters"), p)
    assert(p.contains("GreaterThanOrEqual(id,100)") && p.contains("LessThanOrEqual(id,200)"),
      s"range must push through the DV anti-join into the scan:\n$p")
  }

  test("equal-frequency bucketing never range-partitions; full-table window is hash-parallel") {
    // the sketch-based form assigns buckets with no Window operator and
    // no global-sort exchange anywhere in the plan
    val sketch = plan("x_bucket_boundaries").toLowerCase
    assert(!sketch.contains("rangepartitioning"))
    assert(!sketch.contains(" window"))
    // the EXACT form (histogram-rank decomposition) must also avoid the
    // global sort: no RangePartitioning anywhere, and its per-row window
    // (row_number) runs under hashpartitioning(n_chars) — the only
    // single-partition pass allowed is over the distinct-length histogram
    val ntile = plan("x_ntile_bucketing").toLowerCase
    assert(!ntile.contains("rangepartitioning"),
      "exact ntile must not reintroduce a global sort")
    assert(ntile.contains("hashpartitioning(n_chars"),
      "the full-table rank window must be hash-partitioned on n_chars")
  }

  test("bucketed co-located join: SortMergeJoin with zero shuffle exchanges end-to-end") {
    // both sides CLUSTERED BY the join key into the same bucket count:
    // the join AND the downstream per-key aggregate must read bucket i
    // against bucket i with no Exchange anywhere — the pay-shuffle-once-
    // at-write-time contract bucketing exists for
    val df = SparkEntry.queries("x_bucketed_join")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin"), s"bucketed join must sort-merge:\n$p")
    assert(!p.contains("Exchange"),
      s"bucketed join + bucket-key aggregate must be exchange-free:\n$p")
  }

  test("materialized-view auto-rewrite swaps the corpus scan for the view files") {
    // the query is WRITTEN against the base table; the optimizer rule
    // must leave the view relation as the only scan in the plan
    val df = SparkEntry.queries("x_mv_rewrite")(spark, dir)
    val leaves = df.queryExecution.optimizedPlan.collectLeaves().collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.inputFiles.toSeq
          case _ => Seq("<non-fs>")
        }
    }.flatten
    assert(leaves.nonEmpty && leaves.forall(_.contains("/view/")),
      s"aggregate must be served from the materialized view, scanned:\n${leaves.mkString("\n")}")
  }

  test("join-view auto-rewrite swaps the fact-dim join for the denormalized view") {
    val df = SparkEntry.queries("x_join_rewrite")(spark, dir)
    val leaves = df.queryExecution.optimizedPlan.collectLeaves().collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.inputFiles.toSeq
          case _ => Seq("<non-fs>")
        }
    }.flatten
    assert(leaves.nonEmpty && leaves.forall(_.contains("/jview/")),
      s"join must be served from the maintained join view, scanned:\n${leaves.mkString("\n")}")
  }

  test("banded similarity paths never degrade to a cartesian join") {
    Seq("x_dedup_embedding", "x_ann_lsh", "x_ann_multiprobe", "x_dedup_minhash_lsh")
      .foreach { n =>
        assert(!plan(n).contains("CartesianProduct"),
          s"$n must generate candidates via the band equi-join, not all-pairs")
      }
  }

  test("adaptive band width follows the occupancy rule and matches the oracle's operating points") {
    // smallest bits in [4,16] with n <= 64*2^bits; pinned at the values
    // the DuckDB oracle's nb CTE computes for the known corpora
    assert(SimilarityQueries.adaptiveBandBits(50) == 4)     // sf0.001
    assert(SimilarityQueries.adaptiveBandBits(500) == 4)    // sf0.01 (oracle gate)
    assert(SimilarityQueries.adaptiveBandBits(1024) == 4)   // boundary: 64*2^4
    assert(SimilarityQueries.adaptiveBandBits(1025) == 5)
    assert(SimilarityQueries.adaptiveBandBits(2000) == 5)   // sf0.1
    assert(SimilarityQueries.adaptiveBandBits(20000) == 9)  // sf1
    assert(SimilarityQueries.adaptiveBandBits(100000000L) == 16) // clamped at the shared envelope
  }

  test("plane literals generate on demand: any operating point constructs, first 64 byte-identical") {
    // the old fixed 64-array planeLit made operating points past 16 bits
    // throw; generation from the pure (plane, dim) function removes the
    // cap by construction — and must reproduce the original 64 planes
    // exactly (the DuckDB oracle derives the same weights arithmetically)
    val wide = SimilarityQueries.lshBandsSql(17) // 68 planes > the old 64 cap
    assert("dot_i64".r.findAllIn(wide).size == 68)
    val four = SimilarityQueries.lshBandsSql(4)
    val expectPlane0 = (0 until 64).map(d => s"${SimilarityQueries.planeWeight(0, d)}L")
      .mkString("array(", ",", ")")
    assert(four.contains(expectPlane0), "plane 0 literal must be byte-identical to the pure function")
    assert(wide.contains(expectPlane0), "wider operating points must reuse the identical low planes")
  }

  test("simhash band width follows the corpus-adaptive rule and matches the oracle's operating points") {
    // smallest b in [12,20] with n <= 2^b (signature width 3b); pinned at
    // the values the DuckDB oracle's nb CTE computes for the known corpora
    assert(SimilarityQueries.adaptiveSimhashBits(50) == 12)     // sf0.001
    assert(SimilarityQueries.adaptiveSimhashBits(500) == 12)    // sf0.01 (oracle gate)
    assert(SimilarityQueries.adaptiveSimhashBits(4096) == 12)   // boundary: 2^12
    assert(SimilarityQueries.adaptiveSimhashBits(4097) == 13)
    assert(SimilarityQueries.adaptiveSimhashBits(5000) == 13)   // sf0.1
    assert(SimilarityQueries.adaptiveSimhashBits(50000) == 16)  // sf1
    assert(SimilarityQueries.adaptiveSimhashBits(100000000L) == 20) // clamped at h64's 60 bits
  }

  test("simhash candidates come from the 3-band equi-join, not all-pairs") {
    val p = plan("x_dedup_simhash")
    assert(!p.contains("CartesianProduct"),
      "simhash near-dup must generate candidates via the band equi-join")
  }

  test("LSH banding is map-side: band values come from literal-plane projections, never a (vec_id, plane) aggregate exchange") {
    // the zero-shuffle banding computes all 16 projections per row with
    // dot_i64 against constant-folded literal plane arrays; the old shape
    // (CROSS JOIN planes + GROUP BY (vec_id, p)) re-appears in a plan as
    // an Exchange keyed on vec_id — assert it stays gone
    Seq("x_dedup_embedding", "x_ann_lsh").foreach { n =>
      val p = plan(n)
      assert(!p.contains("hashpartitioning(vec_id#"),
        s"$n must band per-row (map-side); an exchange keyed on vec_id means the banding re-grew an aggregate or shuffle join on per-vector rows")
    }
  }

  test("derived-partsupp TPC-H queries broadcast their dimension sides") {
    // partsupp is generated map-side from the part scan (4 rows per part);
    // the |supplier| count enters as a one-row broadcast, and the
    // dimension joins (part/supplier/nation/region) broadcast rather than
    // shuffling the fact side
    Seq("q2_min_acct_supplier", "q9_profit", "q16_parts_supplier", "q20_excess_suppliers")
      .foreach { n =>
        assert(plan(n).contains("BroadcastHashJoin"),
          s"$n must broadcast its dimension joins")
      }
  }

  test("decontamination probes the eval set through a broadcast, not a shuffle of the corpus side") {
    val p = plan("x_decontamination")
    assert(p.contains("BroadcastHashJoin"))
  }

  test("global top-k surfaces fold ORDER BY + LIMIT into TakeOrdered, not a full-input single-partition window") {
    Seq("x_weighted_sample", "x_bm25", "x_pagerank", "x_cooccurrence_pmi").foreach { n =>
      assert(plan(n).contains("TakeOrderedAndProject"),
        s"$n must plan its top-k as a map-side TakeOrdered; the final rank window may only see the k kept rows")
    }
  }

  test("retrieval model tables (idf, bigram LM) broadcast back to the corpus side") {
    Seq("x_tfidf", "x_bigram_lm").foreach { n =>
      assert(plan(n).contains("BroadcastHashJoin"),
        s"$n joins a vocabulary-bounded model table — it must broadcast, never shuffle the corpus")
    }
  }

  test("containment candidates come from the band equi-join, not all-pairs") {
    assert(!plan("x_containment").contains("CartesianProduct"))
  }

  test("z-order audit is map-side: no sort, no window, one small-key aggregation") {
    val p = plan("x_zorder").toLowerCase
    assert(!p.contains("rangepartitioning"), "morton bucketing must not global-sort")
    assert(!p.contains(" window"))
  }

  test("heavy-hitters top-20 plans as TakeOrdered; sketch rows never join all-pairs") {
    val p = plan("x_heavy_hitters")
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("CartesianProduct"))
  }

  test("cube expands grouping sets in one aggregation pass (single Expand, no plan-level union of scans)") {
    val p = plan("q_cube_agg")
    assert(p.contains("Expand"), "CUBE must plan as Expand + single aggregate")
    assert(!p.contains("Union"), "CUBE must not execute one scan per grouping set")
  }

  test("incremental dedup probes the corpus signatures with an equi-join, not all-pairs") {
    assert(!plan("x_dedup_incremental").contains("CartesianProduct"))
  }

  test("span dedup shuffles only span hashes (ReadSchema stays at doc_id + text)") {
    val read = plan("x_span_dedup").linesIterator
      .filter(_.contains("ReadSchema")).mkString
    assert(read.contains("doc_id") && read.contains("text"))
    assert(!read.contains("lang") && !read.contains("source"),
      "span dedup must prune unreferenced document columns from the scan")
  }

  test("bucketized range joins plan as hash equi-joins, never nested-loop all-pairs") {
    // a raw band predicate gives Catalyst only the key equality to hash
    // on (band as post-filter) or, keyless, a BroadcastNestedLoopJoin;
    // the bucketized form must plan every join as a hash/sort-merge
    // equi-join on (key, bucket) with zero nested-loop or cartesian
    // operators anywhere
    for (q <- Seq("x_range_join", "x_interval_overlap", "x_pit_join")) {
      val p = plan(q)
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"$q degraded to an all-pairs join:\n$p")
    }
    // the as-of-composed PIT join additionally must contain NO join at
    // all on its probe path: the interval carry is a window, not a join
    // (its only joins are the small dimension-side dedup/lead windows)
    assert(plan("x_range_join").contains("Join"), "pairs path should be a hash join")
  }

  test("dynamic partition pruning fires on a partitioned fact joined through a filtered dim") {
    // the 100 TB join shape: a date/hour-partitioned fact joined to a
    // dimension with a selective filter on the dim's attributes. The
    // partition values to read are only known at RUNTIME (they come from
    // the dim's surviving rows), so static pruning cannot help — the
    // fact scan must carry a DynamicPruningExpression in its
    // PartitionFilters, turning a full directory listing into a scan of
    // exactly the dim-selected partitions. A refactor that breaks this
    // (e.g. wrapping the fact read in something non-pushable) makes
    // every such join read the whole fact table.
    import org.apache.spark.sql.functions._
    val root = tmpDir("dpp") + "/fact"
    spark.range(0, 10000).toDF("id")
      .withColumn("p", pmod(col("id"), lit(20L)))
      .withColumn("v", col("id") * 3)
      .write.partitionBy("p").parquet(root)
    val fact = spark.read.parquet(root)
    val dim = spark.range(0, 20).toDF("pk")
      .withColumn("attr", concat(lit("a"), col("pk")))
    val joined = fact.join(broadcast(dim), col("p") === col("pk"))
      .filter(col("attr") === "a3")
      .groupBy(col("p")).agg(sum(col("v")).as("sv"))
    val p = joined.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("dynamicpruning"),
      s"fact scan must carry a dynamic partition pruning filter:\n$p")
    // partition values read back via directory inference (IntegerType)
    assert(joined.collect().map(_.get(0).toString).toSeq == Seq("3"))
  }

  test("histogram-refine quantiles never range-partition: no global sort at any SF") {
    // the whole point of the rewrite is that the k-th order statistic
    // comes from bucket counts + a rank window INSIDE candidate buckets
    // (hash-partitioned); a RangePartitioning exchange anywhere means a
    // global sort crept back in
    Seq("x_exact_quantiles", "x_group_quantiles").foreach { n =>
      assert(!plan(n).toLowerCase.contains("rangepartitioning"),
        s"$n must not contain a global-sort exchange")
    }
  }

  test("attribution computes both models from one scan and one window pass") {
    // both credits share the (user_id, ts, event_id) window spec (one
    // fused Window operator) and the two attribution models aggregate
    // via GROUPING SETS — the UNION ALL formulation would duplicate the
    // whole scan+window subtree (Catalyst inlines the CTE twice),
    // doubling the 100 TB scan
    val p = plan("x_attribution")
    val windows = p.linesIterator.count(_.matches("\\([0-9]+\\) Window.*"))
    val scans = p.linesIterator.count(_.matches("\\([0-9]+\\) Scan parquet.*"))
    assert(windows == 1, s"expected one fused Window operator, saw $windows:\n$p")
    assert(scans == 1, s"expected one events scan, saw $scans:\n$p")
    assert(p.contains("Expand"), "the two grouping sets must come from one Expand")
  }

  test("journey path mining folds its global top-20 into TakeOrdered") {
    assert(plan("x_sankey_paths").contains("TakeOrderedAndProject"))
  }

  test("single-evaluation discipline: one corpus scan per single-table analytics query") {
    // each of these reads its source table EXACTLY once — a second
    // "(n) Scan parquet" line means a multiply-referenced CTE got
    // inlined and the corpus pass doubled (the x_sankey_paths/
    // x_changepoint regression caught in r13 profiling)
    Seq("x_sankey_paths", "x_changepoint", "x_seasonality",
        "x_robust_stats", "x_winsorized", "x_inverted_index").foreach { n =>
      val scans = plan(n).linesIterator.count(_.matches("\\([0-9]+\\) Scan parquet.*"))
      assert(scans == 1, s"$n: expected one source scan, saw $scans")
    }
  }

  test("stats pack reads its source exactly once per query") {
    // the explode-to-ledger alignment (forecast/autocorr), value-grouped
    // rank sums (gini/auc/lift), windowed marginals (chi²/MI), and the
    // single-window survival reduction all exist to keep these at ONE
    // corpus scan — a second scan line means a CTE got inlined twice
    Seq("x_ols_trend", "x_gini", "x_chi_square", "x_forecast_backtest",
        "x_autocorrelation", "x_interarrival", "x_auc", "x_lift_deciles",
        "x_feature_mi", "x_vocab_coverage", "x_centroid_drift",
        "x_skipgram_pairs", "x_wilson_ci", "x_shard_rebalance").foreach { n =>
      val scans = plan(n).linesIterator.count(_.matches("\\([0-9]+\\) Scan parquet.*"))
      assert(scans == 1, s"$n: expected one source scan, saw $scans")
    }
    // survival (scalar-subquery corpus end) and PSI (bounds/split-point
    // probe) each pay exactly one extra min/max pass — never more
    Seq("x_survival_hazard", "x_psi").foreach { n =>
      val scans = plan(n).linesIterator.count(_.matches("\\([0-9]+\\) Scan parquet.*"))
      assert(scans == 2, s"$n: expected main scan + one min/max probe, saw $scans")
    }
  }

  test("stats-pack top-k queries fold into TakeOrdered; no cartesian products anywhere") {
    assert(plan("x_skipgram_pairs").contains("TakeOrderedAndProject"))
    val docSim = plan("x_doc_similarity")
    assert(docSim.contains("TakeOrderedAndProject"))
    Seq("x_doc_similarity", "x_triangle_count", "x_psi", "x_feature_mi").foreach { n =>
      assert(!plan(n).contains("CartesianProduct"),
        s"$n: no cartesian product may appear (1-row cross joins must broadcast)")
    }
  }

  test("inference pack: single-scan discipline and broadcast-only cross joins") {
    // one data pass each: the bootstrap's 200 replicas, the fold
    // encoding's two-level aggregate, and the Gram matrix's d² partials
    // all derive from ONE scan of their source table
    Seq("x_target_encoding", "x_gram_matrix",
      "x_anova_f", "x_ols_multi").foreach { n =>
      val scans = plan(n).linesIterator.count(_.matches("\\([0-9]+\\) Scan parquet.*"))
      assert(scans == 1, s"$n: expected one source scan, saw $scans")
    }
    // both bootstrap rows share the bs_u per-user revenue view (r17):
    // their plans read the checkpointed leaf, never events parquet
    Seq("x_bootstrap_ci", "x_bootstrap_median").foreach { n =>
      val p = plan(n)
      assert(p.linesIterator.count(_.matches("\\([0-9]+\\) Scan parquet.*")) == 0,
        s"$n: replica lattice must read the shared bs_u leaf, not events")
      assert(p.contains("Scan ExistingRDD") || p.contains("LocalTableScan"))
    }
    // spearman's one events pass materializes (localCheckpoint) because
    // the rank stage references it three times — the final plan reads
    // the in-memory leaf, never parquet
    val sp = plan("x_spearman")
    assert(sp.linesIterator.count(_.matches("\\([0-9]+\\) Scan parquet.*")) == 0,
      "spearman rank stage must read the checkpointed user pass")
    assert(sp.contains("Scan ExistingRDD") || sp.contains("LocalTableScan"))
    // market basket references its distinct (order, part) set four times
    // — the checkpoint caps it at ONE lineitem pass however it's used
    val mb = plan("x_market_basket")
    assert(mb.linesIterator.count(_.matches("\\([0-9]+\\) Scan parquet.*")) == 0,
      "basket stages must read the checkpointed distinct set, not lineitem")
    // JS divergence references its (source, term) counts four times —
    // the checkpoint caps it at ONE documents tokenize pass
    val js = plan("x_js_divergence")
    assert(js.linesIterator.count(_.matches("\\([0-9]+\\) Scan parquet.*")) == 0,
      "divergence stages must read the checkpointed term counts, not documents")
    // calibration/DiD pay one split-boundary probe, the permutation null
    // one label-proportion probe, conformal one model-fit probe —
    // exactly one extra pass each, never more
    Seq("x_calibration", "x_permutation_test", "x_did", "x_conformal").foreach { n =>
      val scans = plan(n).linesIterator.count(_.matches("\\([0-9]+\\) Scan parquet.*"))
      assert(scans == 2, s"$n: expected main scan + one probe, saw $scans")
    }
    // the median bootstrap is the same sentinel-replica shape as the
    // mean bootstrap, over the same shared bs_u leaf (asserted above)
    // the replica fan-outs cross-join only 1-row/200-row generator sides
    // — never a cartesian product over data
    Seq("x_bootstrap_ci", "x_permutation_test", "x_js_divergence",
      "x_pca_power", "x_pca_explained", "x_calibration").foreach { n =>
      assert(!plan(n).contains("CartesianProduct"),
        s"$n: generator/scalar cross joins must broadcast")
    }
  }

  test("bootstrap replica aggregation is map-side combinable (partial HashAggregate)") {
    // the 200-replica null distribution must pre-aggregate before the
    // exchange — the property that makes the bootstrap shuffle R rows
    // per task instead of R copies of the data
    val p = plan("x_bootstrap_ci")
    val aggs = p.linesIterator.count(_.contains("HashAggregate"))
    assert(aggs >= 2, s"expected partial+final HashAggregate pairs, saw $aggs")
    assert(!p.toLowerCase.contains("rangepartitioning"),
      "no global sort anywhere in the bootstrap plan")
  }

  test("unpartitioned windows sit on value-bounded inputs, never a raw corpus scan") {
    // The bench log's "No Partition Defined for Window" warnings are
    // design-accepted ONLY because every such window runs over a
    // distinct-value / model / histogram table (bounded by the value
    // domain, not the row count). This pins that invariant: for every
    // audited query, each unpartitioned logical Window's input subtree
    // must pass through an Aggregate whose grouping keys are VALUE
    // columns (never row-identity keys), a limit, or a literal/model
    // leaf before reaching a file scan. A future edit that moves a
    // full-corpus window onto one partition fails here, not in prod.
    import org.apache.spark.sql.execution._
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
    val identityKeys = Set("doc_id", "vec_id", "event_id", "l_orderkey",
      "o_orderkey", "ps_partkey")
    def bounded(p: SparkPlan): Boolean = p match {
      // an aggregate bounds downstream cardinality to its distinct
      // grouping values — unless the grouping carries a row-identity key,
      // in which case it only inherits whatever bound its input has
      // (e.g. the doc-pair aggregates over df-capped cached posting
      // views: identity-keyed, but fed by audited model leaves)
      case a: BaseAggregateExec =>
        val keys = a.groupingExpressions.flatMap(_.references.toSeq.map(_.name)).toSet
        keys.intersect(identityKeys).isEmpty || a.children.forall(bounded)
      case _: GlobalLimitExec | _: TakeOrderedAndProjectExec => true
      // rank-limit pushdown caps the window input at k rows per group
      case _: WindowGroupLimitExec => true
      case _: LocalTableScanExec => true
      // checkpointed model/view leaves: bounded by their builders, which
      // have their own scan-count audits above
      case _: RDDScanExec => true
      case l: LeafExecNode => false
      case other => other.children.nonEmpty && other.children.forall(bounded)
    }
    val audited = Seq(
      "x_gini", "x_auc", "x_lift_deciles", "x_calibration", "x_psi",
      "x_benford", "x_zipf_fit", "x_bucket_boundaries", "x_ntile_bucketing",
      "x_chi_square", "x_feature_mi", "x_survival_hazard", "x_gbdt_stumps",
      "q_median_window", "x_quality_score", "x_term_stats", "x_doc_similarity")
    audited.foreach { n =>
      val pp = SparkEntry.queries(n)(spark, dir).queryExecution.sparkPlan
      pp.foreach {
        case w: WindowExec if w.partitionSpec.isEmpty =>
          assert(bounded(w.child),
            s"$n: unpartitioned window over an unbounded (corpus-scale) input:\n$w")
        case _ => ()
      }
    }
    // negative control: the checker itself must catch a global window
    // directly over a corpus scan
    val bad = Tables(spark, dir, "documents")
      .selectExpr("doc_id", "row_number() OVER (ORDER BY doc_id) AS rn")
      .queryExecution.sparkPlan
    val badWindows = bad.collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
    assert(badWindows.nonEmpty && badWindows.forall(w => !bounded(w.child)),
      "checker failed to flag a global window over a raw scan")
  }

  test("triangle count runs over the checkpointed edge table, not re-derived scans") {
    // the support-2 edge build happens once at view-build time; the
    // triangle/degree/orientation joins must read the in-memory leaf
    val p = plan("x_triangle_count")
    val scans = p.linesIterator.count(_.matches("\\([0-9]+\\) Scan parquet.*"))
    assert(scans == 0, s"triangle query must not re-scan lineitem, saw $scans parquet scans")
    assert(p.contains("Scan ExistingRDD") || p.contains("LocalTableScan"), p.take(500))
  }
}
