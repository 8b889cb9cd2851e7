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


def test_entire_catalog_has_no_error_level_findings(spark):
    """Catalog-wide standing invariant: NO query's physical plan may
    contain an error-severity anti-pattern (cartesian product,
    row-at-a-time Python UDF) — the two classes with no legitimate
    judgment call. Warning classes (bounded-aggregate global windows,
    broadcast-scalar nested loops, deterministic-output sorts,
    documented quadratic tiers) are the author-judgment tier and are
    pinned per-query in test_plan_shapes instead. Runs at sf0.001 so
    construction-eager queries (IVF training, cut-point collects) stay
    cheap."""
    errors = []
    for name, q in sorted(QUERIES.items()):
        for f in lint_plan(q.fn(spark, "/root/testdata/sf0.001")):
            if f.severity == "error":
                errors.append((name, f.code))
    assert errors == []
