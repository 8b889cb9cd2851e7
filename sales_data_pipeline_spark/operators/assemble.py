"""Training-set assembly: deterministic global shuffle into shards and
domain-mixture reweighting.

The last mile of a pretraining data pipeline — after curation the corpus
must be (a) shuffled and cut into shard files a data loader can stream,
and (b) mixed across domains/sources at prescribed rates. Both are
formulated so the result is bit-identical across runs, partitionings and
cluster sizes (the same md5 determinism contract as
operators/quality.py's samplers — never ``rand()``, never
``monotonically_increasing_id``, both of which are partition-order
dependent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def shard_assignment(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 8,
) -> DataFrame:
    """Deterministic global shuffle + shard split: every row gets
    (shard, pos) such that reading shards in order of ``pos`` yields an
    md5-random permutation of the corpus — the "shuffle once at write
    time so the trainer streams sequentially" pattern.

    The 52-bit key ``h = md5(id)[:13 hex]`` drives BOTH the shard
    (``h mod n_shards``) and the within-shard order (``h``, ties broken
    by id) — one hash, uniform shards, reproducible everywhere.

    Plan: map (hash) + ONE keyed window per shard partition. There is
    deliberately no global row_number: ordering is per-shard, so the
    sort parallelizes across ``n_shards`` reducers instead of funneling
    the corpus through one. For 100 TB pick n_shards in the thousands
    (shard files of a few GB) — the window key keeps every reducer's
    slice bounded. Writing then uses
    ``repartition(n_shards, "shard").sortWithinPartitions("pos")`` so
    each shard lands as one sorted file with no extra shuffle."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    h = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 13), 16, 10).cast(
        "bigint"
    )
    w = Window.partitionBy("shard").orderBy("__h", id_col)
    return (
        df.withColumn("__h", h)
        .withColumn("shard", (F.col("__h") % n_shards).cast("int"))
        .withColumn("pos", F.row_number().over(w).cast("bigint"))
        .drop("__h")
    )


def mixture_weights(
    df: DataFrame,
    domain_col: str = "source",
    size_col: str | None = None,
    target_shares: dict[str, float] | None = None,
    round_digits: int = 6,
) -> DataFrame:
    """Per-domain sampling weights to hit a target mixture (the static
    DoReMi/Pile-style domain reweighting table a sampler consumes):
    (domain, n_rows, n_units, unit_share, target_share, mix_weight)
    where ``mix_weight = target_share / unit_share`` — the factor by
    which a uniform-over-units sampler must over/under-sample each
    domain. ``size_col`` weighs rows (e.g. token counts); omitted, every
    row counts 1. ``target_shares`` defaults to uniform over the
    domains present; missing domains get 0 (excluded from training).

    Plan: one map-side-combined groupBy collapses the corpus to one row
    per domain BEFORE any global work; the share normalization is a
    window over that domain-count-sized result (dozens of rows at any
    corpus scale — the single-partition window is over the aggregate,
    never the data)."""
    unit = F.col(size_col) if size_col else F.lit(1)
    agg = df.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(unit).cast("bigint").alias("n_units"),
    )
    everything = Window.partitionBy()
    share = F.col("n_units").cast("double") / F.sum(F.col("n_units").cast("double")).over(
        everything
    )
    if target_shares is None:
        target = F.lit(1.0) / F.count(F.lit(1)).over(everything)
    else:
        target = F.lit(0.0)
        for d, s in target_shares.items():
            target = F.when(F.col("domain") == d, F.lit(float(s))).otherwise(target)
    return agg.select(
        "domain",
        "n_rows",
        "n_units",
        F.round(share, round_digits).alias("unit_share"),
        F.round(target, round_digits).alias("target_share"),
        F.round(target / share, round_digits).alias("mix_weight"),
    )


def domain_cap(
    df: DataFrame,
    domain_col: str = "source",
    cap: int = 20,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-domain document cap (the Common-Crawl-style guard against
    one domain dominating the corpus): keep at most ``cap`` rows per
    domain, chosen by md5(id) order — a deterministic uniform sample of
    each domain, not "whichever rows arrived first" (head-of-scan bias,
    partition-order dependent). Adds ``cap_rank`` (1-based position in
    the domain's md5 order) to surviving rows.

    Plan: map (hash) + one keyed window per domain. A domain with
    billions of rows makes its window partition hot; at that scale cap
    FIRST with a cheap per-partition pre-filter (any partition holds at
    most ``cap`` survivors, so two-phase capping works: rank within
    (domain, salt) then re-rank the ≤ cap·n_salt survivors — the same
    two-phase shape as operators/scale.py salted_agg). This corpus's
    domains are bounded, so the direct window is the right plan here."""
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    h = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 13), 16, 10).cast(
        "bigint"
    )
    w = Window.partitionBy(domain_col).orderBy("__h", id_col)
    return (
        df.withColumn("__h", h)
        .withColumn("cap_rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("cap_rank") <= cap)
        .drop("__h")
    )


def temperature_mixture(
    df: DataFrame,
    domain_col: str = "source",
    size_col: str | None = None,
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-based domain sampling shares — the α-smoothing rule
    multilingual/multi-domain LLM training uses (mBERT/XLM-R style:
    p_i ∝ n_i^α): α=1 keeps natural proportions, α=0 forces uniform,
    between the two it UP-samples small domains without letting any
    domain dominate — the knob q76's explicit target_shares table
    hard-codes, derived instead of dictated.

    Returns (domain, n_units, unit_share, temp_share, mix_weight)
    with mix_weight = temp_share / unit_share (the factor a
    uniform-over-units sampler applies). Numerics: n_units are exact
    BIGINTs; pow(n, α) is one libm double per DOMAIN (dozens of rows —
    the only inexact step, confined to the aggregate, same contract as
    q143's regression outputs: consumers see rounded shares). Plan:
    one map-side-combined groupBy to |domains| rows, then a window
    over that aggregate — never over the data."""
    from pyspark.sql import Window as W

    unit = F.col(size_col) if size_col else F.lit(1)
    agg = df.groupBy(F.col(domain_col).alias("domain")).agg(
        F.sum(unit).cast("bigint").alias("n_units")
    )
    w = W.partitionBy()
    powed = agg.withColumn("p", F.pow(F.col("n_units").cast("double"), F.lit(alpha)))
    # mix_weight comes from the UNROUNDED ratios: deriving it from the
    # rounded display shares both loses precision and divides by zero
    # for any domain whose share rounds to 0 at 6 decimals (exactly the
    # tiny domains α-sampling exists to up-weight; ANSI mode makes that
    # a query-killing error, not a null)
    u_raw = F.col("n_units") / F.sum("n_units").over(w)
    t_raw = F.col("p") / F.sum("p").over(w)
    return (
        powed.withColumn("unit_share", F.round(u_raw, 6))
        .withColumn("temp_share", F.round(t_raw, 6))
        .withColumn("mix_weight", F.round(t_raw / u_raw, 6))
        .select("domain", "n_units", "unit_share", "temp_share", "mix_weight")
    )
