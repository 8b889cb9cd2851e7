"""Plan linter (plans/lint.py): flags the scale anti-patterns the
plan-shape tests pin query-by-query, as a reusable advisory pass."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sales_data_pipeline_spark.catalog import table
from sales_data_pipeline_spark.plans import QUERIES
from sales_data_pipeline_spark.plans.lint import lint_plan


@pytest.fixture(autouse=True)
def _pristine(spark):
    spark.catalog.clearCache()
    yield


def _codes(findings):
    return {f.code for f in findings}


def test_clean_catalog_queries_lint_clean(spark, sf_dir):
    """The flagship pricing/mart/enrichment queries must produce ZERO
    findings — the linter's false-positive budget on known-good plans."""
    for q in ("q01_pricing_summary", "q02_customer_monthly_mart",
              "q04_star_enrichment", "q05_revenue_filter"):
        findings = lint_plan(QUERIES[q].fn(spark, sf_dir))
        assert findings == [], (q, findings)


def test_cartesian_product_flagged_as_error(spark, sf_dir):
    spark.conf.set("spark.sql.crossJoin.enabled", "true")
    a = table(spark, sf_dir, "nation")
    b = table(spark, sf_dir, "region")
    findings = lint_plan(a.crossJoin(b.hint("shuffle_replicate_nl")))
    assert "cartesian" in _codes(findings), findings


def test_global_window_flagged(spark, sf_dir):
    from pyspark.sql import Window

    li = table(spark, sf_dir, "lineitem")
    w = Window.orderBy("l_extendedprice")
    df = li.select("l_orderkey", F.row_number().over(w).alias("rn"))
    assert "global-window" in _codes(lint_plan(df))


def test_partitioned_window_not_flagged(spark, sf_dir):
    from pyspark.sql import Window

    li = table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy("l_extendedprice")
    df = li.select("l_orderkey", F.row_number().over(w).alias("rn"))
    assert "global-window" not in _codes(lint_plan(df))


def test_global_sort_flagged_but_takeordered_not(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    assert "global-sort" in _codes(lint_plan(li.orderBy("l_extendedprice")))
    topk = li.orderBy(F.desc("l_extendedprice")).limit(5)
    assert "global-sort" not in _codes(lint_plan(topk))


def test_python_udf_flagged_but_builtin_not(spark, sf_dir):
    from pyspark.sql.types import LongType

    li = table(spark, sf_dir, "lineitem").select("l_quantity")
    plus1 = F.udf(lambda x: int(x) + 1, LongType())
    assert "python-eval" in _codes(lint_plan(li.select(plus1("l_quantity"))))
    assert "python-eval" not in _codes(
        lint_plan(li.select(F.col("l_quantity") + 1))
    )


def test_unpushed_filter_flagged_for_function_over_column(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    bad = li.filter(F.year("l_shipdate") == 1996).select("l_orderkey")
    assert "unpushed-filter" in _codes(lint_plan(bad))
    good = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("l_orderkey")
    assert "unpushed-filter" not in _codes(lint_plan(good))


@pytest.fixture(scope="module")
def catalog_findings(spark):
    """One catalog-wide lint enumeration shared by the error gate and
    the warning ratchet below. Runs at sf0.001 so construction-eager
    queries (IVF training, cut-point collects) stay cheap."""
    spark.catalog.clearCache()
    out = {}
    for name, q in sorted(QUERIES.items()):
        out[name] = {f.code: f.severity
                     for f in lint_plan(q.fn(spark, "/root/testdata/sf0.001"))}
    return out


def test_entire_catalog_has_no_error_level_findings(catalog_findings):
    """Catalog-wide standing invariant: NO query's physical plan may
    contain an error-severity anti-pattern (cartesian product,
    row-at-a-time Python UDF) — the two classes with no legitimate
    judgment call."""
    errors = [
        (name, code)
        for name, codes in catalog_findings.items()
        for code, sev in codes.items()
        if sev == "error"
    ]
    assert errors == []


# Warning-level global-window / global-sort findings, pinned per query.
# This is the r8 ratchet VERDICT r7 asked for: q285's three global rank
# sorts entered the catalog silently because only error-level findings
# gated. Every entry below is a deliberate judgment call — a bounded
# aggregate under the window (histograms/report tails), a
# deterministic-output orderBy on a bounded result, or a documented
# compat tier. Registering a NEW query that carries one of these codes
# now fails this test until the author adds it here, with the same
# judgment applied; cleaning one up (the q285 path: rewrite on
# operators/scale.distributed_rank) fails it too, prompting the
# allowlist to shrink. Exact equality keeps the list honest in both
# directions.
GLOBAL_WINDOW_SORT_ALLOWLIST = {
    "q100_dataset_card": {'global-window'},
    "q117_skew_report": {'global-window'},
    "q128_neardup_pagerank": {'global-sort'},
    "q133_purchase_gap_histogram": {'global-window'},
    "q134_revenue_index": {'global-window'},
    "q135_spend_gini": {'global-window'},
    "q137_benford_audit": {'global-window'},
    "q138_pareto_curve": {'global-window'},
    "q140_rfm_segments": {'global-window'},
    "q142_basket_size_histogram": {'global-window'},
    "q162_revenue_autocorr": {'global-window'},
    "q170_cumulative_customers": {'global-window'},
    "q172_bm25_search": {'global-window'},
    "q175_price_volume_bridge": {'global-window'},
    "q176_pareto_curve_approx": {'global-window'},
    "q185_cusum_drift": {'global-window'},
    "q191_lpa_communities": {'global-sort'},
    "q194_embedding_standardize": {'global-sort'},
    "q200_image_neardup_ahash": {'global-sort'},
    "q202_supplier_skyline": {'global-window'},
    "q203_neardup_kcore": {'global-sort'},
    "q204_temperature_mixture": {'global-sort', 'global-window'},
    "q205_rolling_revenue": {'global-window'},
    "q208_repurchase_survival": {'global-window'},
    "q212_share_of_parent": {'global-window'},
    "q215_abc_xyz_classes": {'global-window'},
    "q218_embedding_pca": {'global-sort'},
    "q219_bloom_dedup_gate": {'global-sort'},
    "q220_zipf_fit": {'global-window'},
    "q221_logit_fit": {'global-sort'},
    "q229_seasonal_decomposition": {'global-window'},
    "q230_logit_gains": {'global-sort'},
    "q235_spend_gini_approx": {'global-window'},
    "q236_brand_price_qq_approx": {'global-sort'},
    "q237_dominant_suppliers": {'global-sort'},
    "q238_discount_elasticity": {'global-sort'},
    "q241_length_dup_calibration": {'global-sort', 'global-window'},
    "q242_market_share": {'global-sort'},
    "q243_burst_users": {'global-sort'},
    "q244_source_novelty_ladder": {'global-window'},
    "q245_return_rate_shift": {'global-sort'},
    "q247_nation_gross_margin": {'global-sort'},
    "q248_source_overlap_sketch": {'global-sort'},
    "q249_price_dispersion_decomposition": {'global-sort'},
    "q250_name_edit_neardup": {'global-sort'},
    "q251_hll_envelope_check": {'global-sort'},
    "q252_overlap_sketch_envelope": {'global-sort'},
    "q253_ks_returnflag_price": {'global-sort'},
    "q254_zorder_layout": {'global-sort'},
    "q255_compaction_plan": {'global-sort'},
    "q256_table_fingerprint": {'global-sort'},
    "q257_gopher_rules": {'global-sort'},
    "q260_zonemap_pruning": {'global-sort'},
    "q261_late_shipment_priority": {'global-sort'},
    "q262_incremental_mart": {'global-sort'},
    "q263_compressibility": {'global-sort'},
    "q264_pq_fidelity": {'global-sort'},
    "q265_pq_adc_search": {'global-sort'},
    "q267_bpe_merges": {'global-sort'},
    "q268_bpe_encoding_stats": {'global-sort'},
    "q269_phrase_search": {'global-sort'},
    "q270_bpe_lossless_audit": {'global-sort'},
    "q271_percentile_rank_envelope": {'global-sort'},
    "q273_rollup_cascade": {'global-sort'},
    "q277_view_no_purchase_7d": {'global-sort'},
    "q278_incremental_join": {'global-sort'},
    "q282_cohort_conversion": {'global-sort'},
    "q286_debounce_census": {'global-sort'},
    "q287_hybrid_search": {'global-window'},
    "q288_curation_funnel": {'global-sort'},
    "q65_sequence_packing": {'global-window'},
    "q67_token_budget_selection": {'global-window'},
    "q76_mixture_weights": {'global-window'},
    "q86_semantic_dedup": {'global-sort'},
    "q89_seq_length_histogram": {'global-window'},
    "q97_qoq_growth": {'global-window'},
}


def test_global_window_and_sort_warnings_are_ratcheted(catalog_findings):
    got = {
        name: {c for c in codes if c in ("global-window", "global-sort")}
        for name, codes in catalog_findings.items()
    }
    got = {name: codes for name, codes in got.items() if codes}
    new = {n: c for n, c in got.items()
           if c != GLOBAL_WINDOW_SORT_ALLOWLIST.get(n)}
    gone = {n: c for n, c in GLOBAL_WINDOW_SORT_ALLOWLIST.items()
            if n not in got}
    assert not new, (
        "queries with UNLISTED global-window/global-sort findings — a "
        "single-partition stage entered the catalog; rewrite it "
        "(operators/scale.distributed_rank / distributed_prefix_sum / "
        "TakeOrdered) or deliberately allowlist it: " + repr(new)
    )
    assert not gone, (
        "allowlisted queries now lint clean — ratchet the allowlist "
        "down: " + repr(gone)
    )
