package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.tools.PlanAudit

/** The plan linter must flag the known scale killers and stay quiet on the
  * engine's own (documented-clean) workhorse queries.
  */
class PlanAuditSpec extends SparkSpec {

  test("flags a global window as error") {
    import spark.implicits._
    val df = (1 to 100).toDF("x")
      .withColumn("rn", row_number().over(Window.orderBy("x")))
    val f = PlanAudit.audit(df)
    assert(f.exists(x => x.severity == "error" && x.rule == "global-window"), f)
    intercept[IllegalArgumentException] { PlanAudit.assertScaleSafe(df) }
    PlanAudit.assertScaleSafe(df, waived = Set("global-window")) // explicit waiver
  }

  test("flags a cartesian product as error") {
    import spark.implicits._
    val a = (1 to 10).toDF("x")
    val b = (1 to 10).toDF("y")
    val f = PlanAudit.audit(a.crossJoin(b))
    assert(f.exists(x => x.rule == "cartesian-product" ||
      x.rule == "nested-loop-join"), f)
  }

  test("flags object-agg buffering (percentile family)") {
    val df = Tables.orders(spark, sf0001)
      .groupBy("o_orderstatus").agg(expr("percentile(o_totalprice, 0.5)"))
    val f = PlanAudit.audit(df)
    assert(f.exists(_.rule == "object-agg-buffering"), f)
  }

  test("the engine's partitioned-window and histogram queries audit clean of errors") {
    for (q <- Seq("g_mad_outliers", "g_exact_pcts", "w_interval_merge",
      "w_funnel", "q1_pricing_summary", "j_bloom_semi")) {
      val df = SparkEntry.queries(q)(spark, sf0001)
      val errs = PlanAudit.audit(df).filter(_.severity == "error")
      assert(errs.isEmpty, s"$q: $errs")
    }
  }

  test("every round-9 addition audits clean of errors") {
    // the full TPC-H completion set plus the KMV / BFS operators — the
    // scalar-subquery stitches (q11 total, q15 max, KMV) are 1-row
    // broadcast nested loops, which the audit correctly leaves at `warn`
    for (q <- Seq("q2_min_cost", "q4_order_priority", "q7_volume_shipping",
      "q8_market_share", "q9_product_profit", "q11_important_parts",
      "q12_late_lines", "q13_custdist", "q15_top_supplier",
      "q16_supplier_cnt", "q19_disjunctive", "q20_excess_shipments",
      "q21_waiting_supplier", "x_kmv_setops", "x_bfs_hops", "x_kmv_retention")) {
      val df = SparkEntry.queries(q)(spark, sf0001)
      val errs = PlanAudit.audit(df).filter(_.severity == "error")
      assert(errs.isEmpty, s"$q: $errs")
    }
  }

  test("curation selection queries audit clean of errors") {
    // cutoff crossJoins are 1-row broadcasts (warn-level, like the TPC-H
    // scalar stitches); what must NOT appear is a data-scale global window
    for (q <- Seq("t_ppl_bucket", "t_dsir_select", "p_shuffle_shard",
      "t_zipf_fit", "d_ngram_novelty", "t_psi_drift", "p_epoch_plan",
      "w_cusum", "sql_recursive", "x_lpa_communities", "p_curation_funnel",
      "g_trimmed_mean", "t_token_entropy", "ts_vwap", "ts_candles", "ts_realized_vol",
      "s_triplet_mine", "x_skyline", "x_ab_test", "ts_acf1", "w_dow_profile",
      "r_prf_expand", "w_funnel_latency", "g_benford")) {
      val df = SparkEntry.queries(q)(spark, sf0001)
      val errs = PlanAudit.audit(df).filter(_.severity == "error")
      assert(errs.isEmpty, s"$q: $errs")
    }
  }

  test("every round-12 addition audits clean of errors") {
    // d_substring_spans / t_textrank / t_uni_encode window only PARTITIONED
    // BY doc_id (document-bounded); the vocab/cutoff crossJoins are 1-row
    // or vocab-bounded broadcast stitches (warn-level at most)
    for (q <- Seq("d_substring_spans", "t_kn_bigram", "t_textrank",
      "t_uni_vocab", "t_uni_encode", "t_wp_vocab", "t_wp_encode",
      "g_rollup_serve", "g_rollup_filtered", "x_adamic_adar", "s_silhouette",
      "d_source_overlap", "t_js_sources", "s_ncc_confusion", "x_hits",
      "x_assortativity", "t_wp_fertility", "s_label_outliers", "p_temp_alloc",
      "d_canon_longest", "t_pmi_colloc", "d_containment", "g_hhi",
      "x_bh_fdr")) {
      val df = SparkEntry.queries(q)(spark, sf0001)
      val errs = PlanAudit.audit(df).filter(_.severity == "error")
      assert(errs.isEmpty, s"$q: $errs")
    }
  }

  test("every round-11 addition audits clean of errors") {
    for (q <- Seq("x_kcore", "g_spearman", "ts_ewma", "ts_var_es",
      "g_mutual_info", "w_attribution", "x_srm_check", "w_stickiness",
      "g_cramers_v", "x_best_split", "ts_dow_strength", "x_feature_rank",
      "x_ks_test", "x_mann_whitney", "g_woe_iv", "x_linreg_2f",
      "x_welch_ttest", "x_anova_f", "x_cmh_test")) {
      val df = SparkEntry.queries(q)(spark, sf0001)
      val errs = PlanAudit.audit(df).filter(_.severity == "error")
      assert(errs.isEmpty, s"$q: $errs")
    }
  }
}
