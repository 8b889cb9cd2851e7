"""Invariants of the skew-regime generators (tools/skew.py) — the
protocol behind SKEW.json. The skew measurement is only evidence if the
adversarial corpora actually have the structure the protocol claims:
the boilerplate corpus must contain template mega-clusters that reach
the near-dup operators (not collapsed earlier by exact dedup), and the
zipf corpus must plant a genuinely hot key while preserving referential
integrity. Pinned here at test scale (sf0.001 × 3 replicas)."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
    ),
)

SRC = "/root/testdata/sf0.001"
N_CLUSTERS = 8


@pytest.fixture(scope="module")
def base_dir(spark, tmp_path_factory):
    from scaling import generate

    dst = str(tmp_path_factory.mktemp("skewbase") / "sf3x")
    generate(src_dir=SRC, dst_dir=dst, n_replicas=3, spark=spark)
    return dst


@pytest.fixture(scope="module")
def boil_dir(spark, base_dir, tmp_path_factory):
    from skew import generate_boilerplate

    dst = str(tmp_path_factory.mktemp("skewboil") / "boil")
    generate_boilerplate(
        sf1_dir=base_dir,
        dst_dir=dst,
        spark=spark,
        n_clusters=N_CLUSTERS,
        template_tokens=40,
        tail_tokens=3,
    )
    return dst


@pytest.fixture(scope="module")
def zipf_dir(spark, base_dir, tmp_path_factory):
    from skew import generate_zipf

    dst = str(tmp_path_factory.mktemp("skewzipf") / "zipf")
    generate_zipf(
        sf1_dir=base_dir,
        dst_dir=dst,
        spark=spark,
        n_replicas=3,
        cust_per_replica=150,
        user_per_replica=15,
    )
    return dst


# --------------------------------------------------------------------
# boilerplate corpus
# --------------------------------------------------------------------


def test_boil_fraction_and_untouched_rows(spark, boil_dir, base_dir):
    """~40% of docs are template-rewritten; the rest are byte-identical
    to the base corpus (the measurement compares like with like)."""
    base = spark.read.parquet(f"{base_dir}/documents.parquet")
    boil = spark.read.parquet(f"{boil_dir}/documents.parquet")
    n = boil.count()
    assert n == base.count()
    rewritten = boil.filter(F.col("text").startswith("boil")).count()
    # hash-selected: binomial around 0.4 (n=1500, ±5σ ≈ ±0.065)
    assert 0.33 <= rewritten / n <= 0.47
    untouched = boil.filter(~F.col("text").startswith("boil"))
    assert untouched.exceptAll(
        base.join(untouched.select("doc_id"), "doc_id", "left_semi")
    ).count() == 0


def test_boil_clusters_are_near_dups_not_exact_dups(spark, boil_dir):
    """Within a cluster every doc shares the template but keeps a
    doc-unique tail: texts are pairwise DISTINCT (exact dedup must not
    absorb the storm before it reaches the near-dup operators) while
    sharing >90% of tokens (so it IS a near-dup mega-cluster)."""
    docs = spark.read.parquet(f"{boil_dir}/documents.parquet").filter(
        F.col("text").startswith("boil")
    )
    n = docs.count()
    assert docs.select("text").distinct().count() == n
    two = docs.filter(F.split("text", " ")[0] == "boil0t0").limit(2).collect()
    a, b = set(two[0]["text"].split(" ")), set(two[1]["text"].split(" "))
    jac = len(a & b) / len(a | b)
    assert jac >= 0.8, jac


def test_boil_cluster_sizes_balanced(spark, boil_dir):
    """Hash-assigned clusters: every cluster lands within 3x of the
    mean (the protocol's est-pairs arithmetic assumes ~equal sizes)."""
    docs = spark.read.parquet(f"{boil_dir}/documents.parquet").filter(
        F.col("text").startswith("boil")
    )
    sizes = [
        r["n"]
        for r in docs.groupBy(F.split("text", " ")[0].alias("c"))
        .agg(F.count("*").alias("n"))
        .collect()
    ]
    assert len(sizes) == N_CLUSTERS
    mean = sum(sizes) / len(sizes)
    assert all(mean / 3 <= s <= mean * 3 for s in sizes), sizes


def test_boil_n_chars_recomputed(spark, boil_dir):
    bad = (
        spark.read.parquet(f"{boil_dir}/documents.parquet")
        .filter(F.length("text") != F.col("n_chars"))
        .count()
    )
    assert bad == 0


def test_guard_fires_end_to_end_on_boil_corpus(spark, boil_dir):
    """The q22 candidate guard, driven by the generated corpus itself
    (the sf1 measurement's expectation, scaled down): the template
    clusters push the prefix-index pair estimate over a test-scale
    max_candidates, and the plan dies with the documented message."""
    from pyspark.errors import SparkRuntimeException

    from sales_data_pipeline_spark.operators.dedup import ngram_jaccard_pairs

    docs = spark.read.parquet(f"{boil_dir}/documents.parquet")
    with pytest.raises(SparkRuntimeException, match="max_candidates"):
        ngram_jaccard_pairs(docs, threshold=0.6, max_candidates=1_000).count()


def test_lsh_completes_and_bucket_cap_sheds_clusters(spark, boil_dir):
    """On the corpus that kills the exact tier, the LSH path completes;
    with max_bucket_size below the cluster size, the mega-buckets are
    shed and the output shrinks to (at most) the uncapped output."""
    from sales_data_pipeline_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.read.parquet(f"{boil_dir}/documents.parquet")
    full = minhash_lsh_pairs(docs, threshold=0.6).count()
    capped = minhash_lsh_pairs(docs, threshold=0.6, max_bucket_size=10).count()
    assert full > 0
    assert capped < full


# --------------------------------------------------------------------
# zipf corpus
# --------------------------------------------------------------------


def test_zipf_referential_integrity(spark, zipf_dir):
    """Every redrawn key must still resolve in its dimension — a
    dangling key would quietly empty the join queries the measurement
    compares."""
    orders = spark.read.parquet(f"{zipf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{zipf_dir}/customer.parquet")
    assert (
        orders.join(
            cust, orders.o_custkey == cust.c_custkey, "left_anti"
        ).count()
        == 0
    )


def test_zipf_plants_a_hot_key(spark, zipf_dir):
    """rank = floor(N^u) puts ~ln2/lnN of all rows on key 0. At N=450
    that's ~11% — vs 1/450 ≈ 0.2% uniform: a 50× hot key."""
    orders = spark.read.parquet(f"{zipf_dir}/orders.parquet")
    n = orders.count()
    top = (
        orders.groupBy("o_custkey")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"))
        .first()
    )
    assert top["o_custkey"] == 0
    assert 0.06 <= top["c"] / n <= 0.18, top["c"] / n


def test_zipf_events_hot_user_and_integrity(spark, zipf_dir):
    ev = spark.read.parquet(f"{zipf_dir}/events.parquet")
    n = ev.count()
    top = (
        ev.groupBy("user_id").agg(F.count("*").alias("c")).orderBy(F.desc("c")).first()
    )
    assert top["user_id"] == 0
    # N=45 users: ln2/ln45 ≈ 18% on the hot user
    assert 0.10 <= top["c"] / n <= 0.28, top["c"] / n
    # keys stay inside the replicated layout (r*stride + [0, per_replica))
    stray = ev.filter(
        (F.pmod(F.col("user_id"), F.lit(10_000_000)) >= 15)
        | (F.col("user_id") < 0)
        | (F.col("user_id") >= 3 * 10_000_000)
    ).count()
    assert stray == 0


def test_zipf_only_keys_changed(spark, zipf_dir, base_dir):
    """The redraw touches o_custkey ONLY — every other column of orders
    is byte-identical to the base (the measured delta is attributable
    to key distribution, nothing else)."""
    a = spark.read.parquet(f"{base_dir}/orders.parquet").drop("o_custkey")
    b = spark.read.parquet(f"{zipf_dir}/orders.parquet").drop("o_custkey")
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


# --------------------------------------------------------------------
# subset-merge protocol (pure — no Spark)
# --------------------------------------------------------------------


def _doc(queries, rows, errors):
    return {
        "boilerplate": {
            "queries": dict(queries),
            "rows_uniform": dict(rows),
            "rows_boil": dict(rows),
            "errors_uniform": {},
            "errors_boil": dict(errors),
            "probes": {"p": 1},
            "q22_guard_fired": True,
        },
        "zipf": {
            "queries": {},
            "rows_uniform": {},
            "rows_zipf": {},
            "errors_uniform": {},
            "errors_zipf": {},
            "hot_key_report": {"h": 1},
            "join_experiments": {"e": 1},
        },
    }


def test_merge_subset_refreshes_measured_and_keeps_rest():
    from skew import _merge_subset

    prev = _doc({"qA": {"ratio": 1.0}, "qB": {"ratio": 2.0}}, {"qA": 5, "qB": 6}, {})
    fresh = _doc({"qA": {"ratio": 9.0}}, {"qA": 50}, {})
    out = _merge_subset(prev, fresh, ["qA"], [])
    b = out["boilerplate"]
    assert b["queries"]["qA"] == {"ratio": 9.0}      # refreshed
    assert b["queries"]["qB"] == {"ratio": 2.0}      # untouched
    assert b["rows_boil"] == {"qA": 50, "qB": 6}
    assert b["probes"] == {"p": 1}                   # probe sections kept
    assert out["zipf"]["join_experiments"] == {"e": 1}


def test_merge_subset_fresh_failure_drops_stale_success():
    """The exact invariant the r8 ADVICE caught scaling.py violating:
    a re-measured query that FAILS this run must not keep its stale
    ratio entry, and the fresh error must survive."""
    from skew import _merge_subset

    prev = _doc({"qA": {"ratio": 1.0}}, {"qA": 5}, {})
    fresh = _doc({}, {}, {"qA": "boom"})
    out = _merge_subset(prev, fresh, ["qA"], [])
    b = out["boilerplate"]
    assert "qA" not in b["queries"]
    assert "qA" not in b["rows_boil"]
    assert b["errors_boil"]["qA"] == "boom"


def test_merge_subset_fresh_success_clears_stale_error():
    from skew import _merge_subset

    prev = _doc({}, {}, {"qA": "old boom"})
    fresh = _doc({"qA": {"ratio": 1.1}}, {"qA": 7}, {})
    out = _merge_subset(prev, fresh, ["qA"], [])
    b = out["boilerplate"]
    assert b["queries"]["qA"] == {"ratio": 1.1}
    assert "qA" not in b["errors_boil"]


def test_merge_subset_recomputes_q22_guard_flag():
    """The scalar q22_guard_fired flag must be derived from the MERGED
    errors_boil, not carried stale from either side (r8 ADVICE): a
    re-measured q22 that now completes must flip the flag to False,
    and one that now dies on the guard must flip it to True."""
    from skew import _merge_subset

    q22 = "q22_ngram_jaccard_pairs"
    # stale True, fresh run completed q22 → False
    prev = _doc({}, {}, {q22: "max_candidates exceeded"})
    fresh = _doc({q22: {"ratio": 1.2}}, {q22: 9}, {})
    out = _merge_subset(prev, fresh, [q22], [])
    assert out["boilerplate"]["q22_guard_fired"] is False
    # stale False, fresh run hit the guard → True
    prev2 = _doc({q22: {"ratio": 1.0}}, {q22: 9}, {})
    prev2["boilerplate"]["q22_guard_fired"] = False
    fresh2 = _doc({}, {}, {q22: "max_candidates exceeded: est 2e8"})
    out2 = _merge_subset(prev2, fresh2, [q22], [])
    assert out2["boilerplate"]["q22_guard_fired"] is True
    # q22 NOT in the measured subset → flag still reflects merged state
    prev3 = _doc({}, {}, {q22: "max_candidates exceeded"})
    fresh3 = _doc({"qB": {"ratio": 1.0}}, {"qB": 1}, {})
    out3 = _merge_subset(prev3, fresh3, ["qB"], [])
    assert out3["boilerplate"]["q22_guard_fired"] is True
