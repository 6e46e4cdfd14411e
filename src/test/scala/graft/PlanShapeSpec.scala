package graft

import graft.operators.{Filters, Tokenize}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec, ShuffleQueryStageExec}
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Plan-shape assertions for the scale-design claims in SURVEY §4: these
  * fail if a future change silently adds an exchange to a path that must
  * stay co-partitioned.
  */
class PlanShapeSpec extends SparkSpec {
  import spark.implicits._

  private def countShuffles(df: DataFrame): Int = {
    df.collect() // materialize so AQE finalizes the plan
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Int = {
      val self = p match {
        case _: ShuffleExchangeExec | _: ShuffleQueryStageExec => 1
        case _ => 0
      }
      val sub = p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case s: ShuffleQueryStageExec => s.plan.children.map(walk).sum // below the exchange
        case q: QueryStageExec => walk(q.plan)
        case _ => 0
      }
      self + sub + p.children.map(walk).sum + p.subqueries.map(walk).sum
    }
    walk(df.queryExecution.executedPlan)
  }

  private def countSorts(df: DataFrame): Int = {
    df.collect() // materialize so AQE finalizes the plan
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Int = {
      val self = p match {
        case _: org.apache.spark.sql.execution.SortExec => 1
        case _ => 0
      }
      val sub = p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: QueryStageExec => walk(q.plan)
        case _ => 0
      }
      self + sub + p.children.map(walk).sum + p.subqueries.map(walk).sum
    }
    walk(df.queryExecution.executedPlan)
  }

  private lazy val cohort = (1L to 50L).flatMap { p =>
    (0 until 6).map(i => (p, Timestamp.valueOf(f"2020-01-0${i % 5 + 1} 10:00:00"), s"C$i", i * 1.0))
  }.toDF("patient_id", "time", "code", "numeric_value")

  test("patient-keyed chain (filter by #measurements -> tokenize seqs) shuffles exactly once") {
    // The window's hash(patient_id) partitioning must satisfy both the
    // (patient,time) and (patient) groupings downstream. (Round-13
    // adjudication: an agg + semi-join filter variant that made this
    // chain sort-free was measured SLOWER at 10×/100× — doubled scan,
    // broken exchange reuse — so the 1-exchange window shape stands;
    // see Filters.filterPatientsByNumMeasurements.)
    val out = Tokenize.seqsExploded(Filters.filterPatientsByNumMeasurements(cohort, 2))
    assert(countShuffles(out) == 1)
  }

  test("no query plan has an unbounded single-partition window") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.{GlobalLimitExec, TakeOrderedAndProjectExec}
    // A partition-less window funnels its whole input through ONE task.
    // That is only acceptable when the input is provably bounded: either
    // below a limit (top-k postprocessing) or bounded by operator
    // contract — vocabulary-sized (the code dimension, documented in
    // Vocabulary.lexicographicIndices) or day-granularity
    // (Survival.kaplanMeier's KM curve: one row per distinct duration
    // DAY, bounded by the observation horizon, never by keys or rows).
    // (q_bh: Benjamini-Hochberg ranks the TESTS frame — one row per
    // hypothesis — so its global windows order hundreds of rows by contract.)
    // (q_logrank: same day-granularity curve contract as q_km_survival.)
    // (q_pareto: the frontier's running strict-max orders the
    // DISTINCT-COST frame — value-domain-sized after the per-cost
    // collapse, like q_fit_vocab's vocabulary rank — and
    // Selection.paretoFrontier now ENFORCES the bound with a
    // raise_error past maxDistinctCosts, so the corpus can never
    // silently reach the window.)
    val vocabSizedByContract = Set(
      "q_fit_vocab", "q_normalize", "q_meds_pipeline", "q_pipeline_config",
      "q_tensorize", // vocab indexing rank, the q_fit_vocab contract
      "q_km_survival", "q_bh", "q_logrank",
      "q_nelson_aalen", // same day-curve contract as q_km_survival
      "q_cox", // Newton risk-set windows run over the same day curve
      "q_rmst", // KM-curve integral: same day-frame contract
      "q_cif", // Aalen-Johansen CIFs: same day-frame contract
      "q_sampling_table", // cumulative ranges over the VOCABULARY rank
      "q_neyman", // largest-remainder rank over the STRATA frame (q_bh contract)
      "q_curriculum", // group-index rank over the DISTINCT-SOURCE frame (vocab-sized)
      "q_holm", // step-down prefix max over the TESTS frame (q_bh contract)
      "q_srm_sweep", // BH over the per-source SRM tests frame (q_bh contract)
      "q_storey", // pi0/q windows over the same TESTS frame (q_bh contract)
      "q_pareto")

    def boundedBelow(p: SparkPlan): Boolean = p match {
      case _: GlobalLimitExec | _: TakeOrderedAndProjectExec => true
      case other => other.children.exists(boundedBelow)
    }
    def offenders(p: SparkPlan): Seq[String] = {
      val self = p match {
        case w: WindowExec if w.partitionSpec.isEmpty && !w.children.exists(boundedBelow) =>
          Seq(w.nodeName)
        case _ => Nil
      }
      self ++ p.children.flatMap(offenders) ++ p.subqueries.flatMap(offenders)
    }

    val sf = "/root/testdata/sf0.001"
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      if (vocabSizedByContract(name)) Nil
      else offenders(fn(spark, sf).queryExecution.sparkPlan).map(n => s"$name: $n")
    }
    assert(bad.isEmpty, s"unbounded global windows found:\n${bad.mkString("\n")}")
  }

  test("no query plan has a nested-loop or cartesian join outside the brute-by-contract allowance") {
    // PlanLint's nested-loop-join rule already auto-passes the
    // crossJoin(broadcast(one-row totals)) shape (provablySingleRow);
    // this sweep makes the NEXT quadratic registration fail the suite
    // the way partition-less windows already do. The only allowance:
    //   q_lof — the exact all-pairs LOF definition, broadcast-nested-loop
    //   BY CONTRACT (n² work, the oracle-checkable reference run at
    //   sf0.01); its production twin q_lof_scalable runs the multi-probe
    //   candidate path and must stay OUT of this list.
    val bruteByContract = Set("q_lof")
    // Bounded-build allowances: these queries DO plan a broadcast
    // nested-loop join, but the broadcast side is bounded by operator
    // contract — it never grows with the corpus, so scanning it per
    // probe row stays O(corpus · small-constant) at any scale. PlanLint
    // can only statically prove the ONE-ROW case; the rest are pinned
    // here with their bound:
    val boundedBuildByContract = Set(
      "q_ann_topk", "q_hard_negatives", "q_trunc_recall", // the probe QUERY frame (vec_id < 8 by registration)
      "q_ann_ivf_kmeans", "q_silhouette", "q_davies_bouldin", // the k-centroid / centroid-pair frame
      "q_chi2", "q_cramers_v", // category-marginal frames (contingency vocab)
      "q_kmv", // k=256-register sketches, one per source (source-pair algebra)
      "q_mvc", // the single control-arm summary row joined onto each arm
      "q_nb", "q_label_noise", // NB class-model frames (classes × bounded vocab)
      "q_lorenz", // cumulative via triangular join on the ≤100-bin frame (nBins contract)
      "q_fair_audit", // the limit(1) reference-group row (one row by construction; the limit sits below a select so PlanLint cannot prove it)
      "q_dtw", // PAA-vector pair join on the GROUP-sized shape frame (one row per event type — the q_kmv sketch-pair contract)
      "q_jl", // JL distortion probe pairs: both sides bounded by the maxId<=128 require (the q_ann_topk probe contract)
      "q_top_terms_drift", // rbo's one-row-per-side size frames under a constant-folded literal query key (20-row top-k lists)
      "q_burrows", // the (source-count × top-50-words) grid completion and the source-pair z join — both sides source/nWords-bounded (the q_kmv pair contract)
      "q_friedman", "q_cochran_q") // block-design joins on the (blocks × treatments) cells frame (50 rows by registration) under a constant-folded literal group key
    val sf = "/root/testdata/sf0.001"
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      if (bruteByContract(name) || boundedBuildByContract(name)) Nil
      else
        graft.plans.PlanLint.lint(fn(spark, sf))
          .filter(f => f.rule == "nested-loop-join" || f.rule == "cartesian")
          .map(f => s"$name: $f")
    }
    assert(bad.isEmpty, s"unbounded nested-loop/cartesian joins found:\n${bad.mkString("\n")}")
  }

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("bucketed fact-fact join on the bucket key is exchange-free") {
    val dir = "/root/testdata/sf0.001"
    graft.sources.Bucketed.bucketTpch(spark, dir, buckets = 4, prefix = "ps_")
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1"
    ) {
      val joined = spark.table("ps_lineitem")
        .join(spark.table("ps_orders"), col("l_orderkey") === col("o_orderkey"))
      assert(countShuffles(joined) == 0, "bucketed lineitem-orders join still shuffles")
      val plain = graft.sources.Tables.lineitem(spark, dir)
        .join(graft.sources.Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      assert(joined.count() == plain.count())
    }
  }

  test("aggregation on the bucket key reads pre-clustered data without a shuffle") {
    graft.sources.Bucketed.bucketEventsByPatient(spark, "/root/testdata/sf0.001", buckets = 4, table = "ps_events")
    val agg = spark.table("ps_events").groupBy("user_id").count()
    assert(countShuffles(agg) == 0, "groupBy on the bucket key shuffled")
    assert(agg.count() > 0)
  }

  test("dedup/scoring pipelines evaluate the corpus scan a bounded number of times") {
    // regression for the single-pass reworks: a second reference to the
    // shingle/signature/tf subtree silently re-tokenizes the whole corpus
    // (column pruning defeats exchange reuse)
    val sf = "/root/testdata/sf0.001"
    val maxScans = Map(
      "q_dedup_jaccard" -> 1, // packed id+count: one shingle evaluation
      "q_dedup_minhash" -> 1, // bounded bucket collect, no self-join
      "q_simhash_pairs" -> 1, // packed id+sig buckets
      "q_tfidf" -> 2,         // tf once + tokenization-free count scan
      "q_bm25" -> 3,          // tf once, dl once, stats re-derivation
      "q_embed_neardup" -> 1, // bounded vector collect, no cell self-join
      "q_postings" -> 1,      // tf agg once; df+rank share its exchange
      "q_pmi" -> 2,           // unigram scan + bigram scan (checkpointed)
      "q_fuzzy" -> 1,         // dictionary groupBy-collect, no self-join
      "q_diff" -> 2           // one scan per snapshot side, fp below join
    )
    val bad = maxScans.toSeq.sortBy(_._1).flatMap { case (name, cap) =>
      val df = SparkEntry.queries(name)(spark, sf)
      df.collect()
      // AQE's toString repeats the plan under "== Initial Plan ==" — count
      // scans in the final plan section only
      val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
      val scans = "Scan parquet".r.findAllIn(plan).size
      if (scans > cap) Some(s"$name: $scans scans (cap $cap)") else None
    }
    assert(bad.isEmpty, s"corpus re-scan regressions:\n${bad.mkString("\n")}")
  }

  test("rolling features + forward-fill chain reuses ONE key exchange") {
    val df = (1L to 40L).map { i =>
      (i, i % 4, Timestamp.valueOf(f"2020-01-01 ${(i % 24)}%02d:00:00"), i * 1.0)
    }.toDF("id", "k", "t", "v")
    val out = graft.operators.Rolling.forwardFill(
      graft.operators.Rolling.trailingAggregates(df, "k", "t", "v", 3600L * 1000000L),
      "k", "t", "id", "v", "filled")
    // same hash(k) partitioning serves both windows: 1 exchange, 2 sorts
    assert(countShuffles(out) == 1)
  }

  test("z-order value is a pure projection — zero shuffles, zero extra scans") {
    val df = graft.operators.ZOrder.withZValue(
      graft.sources.Tables.lineitem(spark, "/root/testdata/sf0.001"), "l_partkey", "l_suppkey")
    assert(countShuffles(df) == 0)
  }

  test("q_zorder's parquet scan is pruned to the four referenced columns") {
    val df = SparkEntry.queries("q_zorder")(spark, "/root/testdata/sf0.001")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    val read = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(plan).map(_.group(1))
    assert(read.exists(_.split(",").length == 4), s"expected a 4-column scan, got $read")
  }

  test("line dedup runs exactly its two inherent shuffles (line rank, doc reassembly)") {
    val docs = (1L to 30L).map(i => (i, s"common header\nbody $i\nfooter ${i % 3}"))
      .toDF("doc_id", "text")
    val out = graft.text.LineDedup.dedupLines(docs, "doc_id", "text")
    assert(countShuffles(out) == 2)
  }

  test("per-group ntile binning shuffles once, on the group key") {
    val df = (1L to 40L).map(i => (i, s"g${i % 4}", i * 1.5)).toDF("id", "g", "v")
    assert(countShuffles(graft.pipeline.Selection.ntilePerGroup(df, Seq("g"), "v", 4, "id")) == 1)
  }

  test("bloom pre-filter adds no shuffle ahead of the exact join") {
    val fact = (1L to 100L).map(i => (i, i % 7)).toDF("k", "payload")
    val build = Seq(3L, 9L).toDF("bk")
    val pre = graft.operators.BloomJoin.bloomFilterRows(fact, build, "k", "bk", expectedKeys = 10)
    assert(countShuffles(pre) == 0) // the sketch build is a separate driver-side pass
  }

  test("bigram LM shares one exchange between the bg and prefix windows") {
    val docs = (1L to 30L).map(i => (i, s"the quick fox $i jumps over the dog"))
      .toDF("doc_id", "text")
    val out = graft.text.Tfidf.bigramLogProb(docs)
    // (id,bg) count agg + prefix window (satisfies the (prefix,bg) window's
    // clustering too) + final per-doc agg = exactly 3; a per-bg window
    // partitioning would make it 4
    assert(countShuffles(out) == 3)
  }

  test("metadata-joined operators add no fact-side shuffle") {
    val meta = graft.operators.CodeMetadata.aggregate(cohort)
    val out = graft.operators.Outliers.occludeOutliers(cohort, meta, 2.0)
    // The only shuffle is the per-code stats aggregation on the (tiny)
    // broadcast side — and column pruning drops meta's countDistinct aggs
    // (2 exchanges standalone -> 1 here). The fact side reaches the
    // broadcast join unshuffled.
    assert(countShuffles(meta) == 2)
    assert(countShuffles(out) == 1)
  }

  test("diversity indices reduce in exactly two exchanges") {
    val df = (1 to 200).map(i => (s"g${i % 3}", s"c${i % 17}")).toDF("g", "c")
    // fact -> (group, cat) counts -> group moments; no totals join, no window
    assert(countShuffles(graft.operators.Diversity.indices(df, Seq("g"), "c")) == 2)
  }

  test("isotonic's j<=i<=k triple stays a hash join, never a nested loop") {
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    val rows = (1 to 200).map(i => (s"g${i % 2}", i / 200.0, i % 3 == 0))
      .toDF("g", "s", "y")
    val out = graft.operators.Evaluation.isotonicCalibration(rows, Seq("g"), "s", col("y"), 10)
    out.collect()
    def hasBnlj(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
      p.isInstanceOf[BroadcastNestedLoopJoinExec] ||
        p.children.exists(hasBnlj) || (p match {
          case a: AdaptiveSparkPlanExec => hasBnlj(a.executedPlan)
          case q: QueryStageExec => hasBnlj(q.plan)
          case _ => false
        })
    assert(!hasBnlj(out.queryExecution.executedPlan),
      "group-equi keys must carry the bin inequalities as residual filters")
  }

  test("emd drift reads the fact side a bounded number of times") {
    val sf = "/root/testdata/sf0.001"
    val df = SparkEntry.queries("q_emd")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    // range agg + binned counts: two fact scans; the grid/cum machinery
    // runs on the pinned vocab-sized count frame, never the facts
    assert("Scan parquet".r.findAllIn(plan).size <= 2,
      "emd must not re-scan events for grid/cum work")
  }

  test("trend sampling caps the pair frame before any self-join") {
    // the sampled frame windows once on the key; the pair join and rank
    // window reuse that partitioning: 3 exchanges ceiling for the chain
    val big = (1 to 500).map(i => ("g", i.toLong, i.toDouble, i * 2.0)).toDF("g", "id", "x", "y")
    val ts = graft.operators.Trend.theilSen(big, Seq("g"), "id", "x", "y", sampleN = 40)
    val out = ts.collect()
    assert(out.head.getAs[Long]("n") == 40L, "sample cap binds")
    assert(out.head.getAs[Long]("n_slopes") <= 40L * 39L / 2L)
    assert(countShuffles(ts) <= 5, "config-bounded chain must not add fact-sized exchanges")
  }
}
