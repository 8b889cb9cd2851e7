"""End-to-end tests for the sales ETL pipeline over FIXTURES.md shapes:
happy path (8-col), extra-column acceptance (9-col), missing-column
quarantine (7-col), multi-file union, re-run idempotency, failed-run
resume probe, and the mart invariants (F5)."""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from sales_data_pipeline_spark.pipeline import PipelineConfig, run_pipeline
from sales_data_pipeline_spark.pipeline.state import AuditState
from tests.fixtures import dim_frames, write_sales_csv


@pytest.fixture()
def cfg(tmp_path):
    (tmp_path / "in").mkdir()
    return PipelineConfig(
        input_dir=str(tmp_path / "in"),
        quarantine_dir=str(tmp_path / "err"),
        processed_dir=str(tmp_path / "done"),
        output_dir=str(tmp_path / "out"),
        state_dir=str(tmp_path / "state"),
    )


def _in(cfg):
    from pathlib import Path

    return Path(cfg.input_dir)


def test_end_to_end(spark, cfg):
    p1 = write_sales_csv(_in(cfg) / "sales1.csv", n=400, seed=1)
    p2 = write_sales_csv(_in(cfg) / "sales2.csv", n=300, seed=2, extra_payment_mode=True)
    p3 = write_sales_csv(_in(cfg) / "bad.csv", n=50, seed=3, drop_store_id=True)
    customer, store, team = dim_frames(spark)

    res = run_pipeline(spark, cfg, customer, store, team)

    # quarantine: 7-col file rejected whole, moved to error dir
    assert [k.rsplit("/", 1)[-1] for k in res.quarantined_files] == ["bad.csv"]
    # keys are FS URIs (file:/... locally, s3a://... on object stores)
    (missing,) = [v for k, v in res.quarantined_files.items() if k.endswith("bad.csv")]
    assert missing == ["store_id"]
    assert (_in(cfg).parent / "err" / "bad.csv").exists()

    # union across ALL accepted files (the reference's loop bug, fixed by intent)
    assert res.n_fact_rows == 700
    assert sorted(f.rsplit("/", 1)[-1] for f in res.accepted_files) == [
        "sales1.csv", "sales2.csv"]
    # accepted files archived post-commit
    assert (_in(cfg).parent / "done" / "sales1.csv").exists()
    assert not (_in(cfg) / "sales1.csv").exists()

    cust_mart = spark.read.parquet(res.customer_mart_path)
    team_mart = spark.read.parquet(res.sales_team_mart_path)

    # F5.1: conservation — Σ mart.total_sales == Σ accepted fact total_cost
    # (all fixture keys exist in dims, so inner joins drop nothing)
    mart_total = cust_mart.agg(F.sum("total_sales")).collect()[0][0]
    team_total = team_mart.agg(F.sum("total_sales")).collect()[0][0]
    assert mart_total == team_total

    # F5.2: incentive rows — ≥1 rank-1 row per (store, month); 1% payout
    inc = team_mart.filter(F.col("incentive") > 0)
    per_group = inc.groupBy("store_id", "sales_month").count().collect()
    all_groups = team_mart.select("store_id", "sales_month").distinct().count()
    assert len(per_group) == all_groups
    row = inc.orderBy("store_id", "sales_month", "sales_person_id").first()
    assert row.incentive == (row.total_sales * Decimal("0.01")).quantize(Decimal("0.01"))

    # schema: mart money is DECIMAL(10,2), not float (SURVEY §2j.8)
    assert dict(cust_mart.dtypes)["total_sales"] == "decimal(10,2)"

    # extras folded to queryable JSON
    assert "payment_mode" not in cust_mart.columns


def test_extra_column_folding(spark, cfg):
    write_sales_csv(_in(cfg) / "extra.csv", n=50, seed=4, extra_payment_mode=True)
    from sales_data_pipeline_spark.operators.normalize import (
        read_validated_union,
        validate_headers,
    )
    from sales_data_pipeline_spark.pipeline import fs
    from sales_data_pipeline_spark.schemas import MANDATORY_COLUMNS, SALES_CONTRACT

    report = validate_headers(
        spark, fs.list_files(spark, cfg.input_dir), MANDATORY_COLUMNS
    )
    df = read_validated_union(spark, report, SALES_CONTRACT)
    assert df.columns[-1] == "additional_column"
    modes = {
        r[0]
        for r in df.select(
            F.get_json_object("additional_column", "$.payment_mode")
        ).distinct().collect()
    }
    assert modes == {"cash", "UPI"}

    # concat compat mode reproduces the reference's comma-join
    df2 = read_validated_union(spark, report, SALES_CONTRACT, extras_mode="concat")
    vals = {r[0] for r in df2.select("additional_column").distinct().collect()}
    assert vals == {"cash", "UPI"}


def test_rerun_is_idempotent(spark, cfg):
    write_sales_csv(_in(cfg) / "day1.csv", n=200, seed=5)
    customer, store, team = dim_frames(spark)
    res1 = run_pipeline(spark, cfg, customer, store, team)
    total1 = spark.read.parquet(res1.customer_mart_path).agg(F.sum("total_sales")).collect()[0][0]

    # second run with no new files: nothing to do, marts untouched
    res2 = run_pipeline(spark, cfg, customer, store, team)
    assert res2.accepted_files == []
    total2 = spark.read.parquet(res1.customer_mart_path).agg(F.sum("total_sales")).collect()[0][0]
    assert total1 == total2


def test_failed_run_probe(spark, cfg):
    """Files marked 'A' but never flipped (crashed run) surface on the
    next run — reference main.py:56-73 semantics."""
    state = AuditState(spark, cfg.state_dir)
    state.mark_active([f"{cfg.input_dir}/ghost.csv"])
    assert state.stale_active_files() == [f"{cfg.input_dir}/ghost.csv"]

    state.mark_inactive([f"{cfg.input_dir}/ghost.csv"])
    assert state.stale_active_files() == []


def test_state_missing_dir_is_empty_but_corrupt_dir_raises(spark, tmp_path):
    """'No state yet' reads as empty; an UNREADABLE state dir must
    propagate — an empty answer there would silently skip the
    failed-run probe."""
    import pytest

    fresh = AuditState(spark, str(tmp_path / "never_written"))
    assert fresh.stale_active_files() == []

    corrupt_dir = tmp_path / "corrupt_state"
    corrupt_dir.mkdir()
    (corrupt_dir / "part-00000.parquet").write_bytes(b"this is not parquet")
    broken = AuditState(spark, str(corrupt_dir))
    with pytest.raises(Exception, match="[Pp]arquet|magic|footer|FAILED_READ"):
        broken.stale_active_files()


def test_datewise_multifile_union(spark, cfg):
    """Datewise arrival (FIXTURES.md F2): one file per date; month
    bucketing spans files."""
    for i, d in enumerate([dt.date(2023, 3, 5), dt.date(2023, 3, 20), dt.date(2023, 4, 2)]):
        write_sales_csv(_in(cfg) / f"d{i}.csv", n=100, seed=10 + i, date=d)
    customer, store, team = dim_frames(spark)
    res = run_pipeline(spark, cfg, customer, store, team)
    assert res.n_fact_rows == 300
    months = {
        r[0]
        for r in spark.read.parquet(res.customer_mart_path)
        .select("sales_date_month").distinct().collect()
    }
    assert months == {"2023-03", "2023-04"}


def test_strict_compat_marts_match_default(spark, cfg):
    """window+distinct (reference literal) == groupBy rewrite on data
    where non-key columns are functionally dependent on keys (SURVEY §7)."""
    write_sales_csv(_in(cfg) / "s.csv", n=300, seed=6)
    customer, store, team = dim_frames(spark)
    from sales_data_pipeline_spark.operators.enrich import sales_enrichment
    from sales_data_pipeline_spark.operators.marts import (
        customer_monthly_mart,
        sales_team_mart,
    )
    from sales_data_pipeline_spark.operators.normalize import (
        read_validated_union,
        validate_headers,
    )
    from sales_data_pipeline_spark.pipeline import fs as _fs
    from sales_data_pipeline_spark.schemas import MANDATORY_COLUMNS, SALES_CONTRACT

    report = validate_headers(spark, _fs.list_files(spark, cfg.input_dir), MANDATORY_COLUMNS)
    enriched = sales_enrichment(
        read_validated_union(spark, report, SALES_CONTRACT), customer, store, team
    )
    for fn in (customer_monthly_mart, sales_team_mart):
        a = fn(enriched, strict_compat=False).toPandas()
        b = fn(enriched, strict_compat=True).toPandas()
        cols = sorted(a.columns)
        a = a[cols].sort_values(cols).reset_index(drop=True)
        b = b[cols].sort_values(cols).reset_index(drop=True)
        assert a.equals(b), fn.__name__


def test_delete_path_idempotent(spark, tmp_path):
    from sales_data_pipeline_spark.pipeline.fs import delete_path, list_files

    f = tmp_path / "landing" / "a.csv"
    f.parent.mkdir()
    f.write_text("x,y\n1,2\n")
    assert delete_path(spark, str(f)) is True
    assert list_files(spark, str(tmp_path / "landing")) == []
    assert delete_path(spark, str(f)) is False  # second delete: no error
    assert delete_path(spark, str(tmp_path / "landing"), recursive=True) is True


def test_orc_mart_format_parity_and_pruning(spark, tmp_path):
    """mart_format='orc' must produce marts identical to the parquet
    run, and ORC partitioned reads must prune like parquet (the format
    knob changes encoding, never semantics or the pruning story)."""
    import re

    from tests.fixtures import dim_frames as _dims

    customer, store, team = _dims(spark)
    results = {}
    for fmt in ("parquet", "orc"):
        base = tmp_path / fmt
        (base / "in").mkdir(parents=True)
        c = PipelineConfig(
            input_dir=str(base / "in"),
            quarantine_dir=str(base / "err"),
            processed_dir=str(base / "done"),
            output_dir=str(base / "out"),
            state_dir=str(base / "state"),
            mart_format=fmt,
        )
        write_sales_csv(_in(c) / "sales1.csv", n=300, seed=11)
        res = run_pipeline(spark, c, customer, store, team)
        mart = spark.read.format(fmt).option("basePath", res.sales_team_mart_path).load(
            res.sales_team_mart_path
        )
        results[fmt] = sorted(map(tuple, mart.collect()))
    assert results["parquet"] == results["orc"]

    # partition pruning reaches the ORC scan
    orc_path = str(tmp_path / "orc" / "out" / "sales_team_data_mart")
    df = (
        spark.read.format("orc").option("basePath", orc_path).load(orc_path)
        .filter(F.col("store_id") == 121)
    )
    plan = spark.sparkContext._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    m = re.search(r"PartitionFilters: \[(.*?)\]", plan)
    assert m and "store_id" in m.group(1), plan


def test_pipeline_observe_metrics_match_fact(spark, tmp_path):
    """df.observe() scorecard rides the ingest action: metrics must
    equal an independent aggregation of the landed fact, with the nulls
    and money sum agreeing exactly."""
    import datetime as dt

    from pyspark.sql import functions as F

    from sales_data_pipeline_spark.pipeline.sales_pipeline import (
        PipelineConfig,
        run_pipeline,
    )
    from tests.fixtures import dim_frames, write_sales_csv

    for d in ("in", "quar", "done", "out", "state"):
        (tmp_path / d).mkdir()
    write_sales_csv(tmp_path / "in" / "a.csv", n=120, seed=5, date=dt.date(2023, 6, 1))
    cfg = PipelineConfig(
        input_dir=str(tmp_path / "in"),
        quarantine_dir=str(tmp_path / "quar"),
        processed_dir=str(tmp_path / "done"),
        output_dir=str(tmp_path / "out"),
        state_dir=str(tmp_path / "state"),
    )
    customer, store, sales_team = dim_frames(spark)
    res = run_pipeline(spark, cfg, customer, store, sales_team)
    m = res.ingest_metrics
    assert m["n_rows"] == res.n_fact_rows == 120
    assert m["n_null_cost"] == 0
    # the observed money sum equals the mart total (conservation)
    mart = spark.read.parquet(res.customer_mart_path)
    assert mart.agg(F.sum("total_sales")).collect()[0][0] == m["sum_cost"]


def test_chaos_crash_between_mart_commit_and_state_flip(spark, cfg, monkeypatch):
    """The reference's failure window (main.py:403-448): both marts
    committed, then the run dies BEFORE archive + mark_inactive. The
    rerun must (a) surface exactly the stale-active files in
    resumed_files, (b) re-process them (they still sit in input_dir),
    (c) leave the marts without duplicated rows (overwrite semantics),
    and (d) complete the archive + 'I' flip."""
    from sales_data_pipeline_spark.pipeline import sales_pipeline as sp

    p1 = write_sales_csv(_in(cfg) / "day1.csv", n=200, seed=21)
    p2 = write_sales_csv(_in(cfg) / "day2.csv", n=100, seed=22)
    customer, store, team = dim_frames(spark)

    real_move = sp.fs.move_file

    def crash_on_archive(spark_, src, dst_dir):
        if dst_dir == cfg.processed_dir:
            raise RuntimeError("chaos: killed between mart commit and flip")
        return real_move(spark_, src, dst_dir)

    monkeypatch.setattr(sp.fs, "move_file", crash_on_archive)
    with pytest.raises(RuntimeError, match="chaos"):
        run_pipeline(spark, cfg, customer, store, team)
    monkeypatch.setattr(sp.fs, "move_file", real_move)

    # crashed state: marts ARE committed, inputs NOT archived, state 'A'
    cust_total_1 = (
        spark.read.parquet(f"{cfg.output_dir}/customers_data_mart")
        .agg(F.sum("total_sales"))
        .collect()[0][0]
    )
    team_rows_1 = spark.read.parquet(
        f"{cfg.output_dir}/sales_team_data_mart"
    ).count()
    assert sorted(p.name for p in _in(cfg).iterdir()) == ["day1.csv", "day2.csv"]
    state = AuditState(spark, cfg.state_dir)

    def names(paths):
        return sorted(p.rsplit("/", 1)[-1] for p in paths)

    assert names(state.stale_active_files()) == ["day1.csv", "day2.csv"]

    # rerun: resumes exactly the stale files, no mart duplication
    res = run_pipeline(spark, cfg, customer, store, team)
    assert names(res.resumed_files) == ["day1.csv", "day2.csv"]
    assert names(res.accepted_files) == ["day1.csv", "day2.csv"]
    assert res.n_fact_rows == 300
    cust_total_2 = (
        spark.read.parquet(res.customer_mart_path)
        .agg(F.sum("total_sales"))
        .collect()[0][0]
    )
    assert cust_total_2 == cust_total_1  # re-run rewrote, never appended
    assert spark.read.parquet(res.sales_team_mart_path).count() == team_rows_1
    assert state.stale_active_files() == []
    assert list(_in(cfg).iterdir()) == []  # archived this time
    from pathlib import Path

    assert sorted(p.name for p in Path(cfg.processed_dir).iterdir()) == [
        "day1.csv",
        "day2.csv",
    ]
# ---------------------------------------------------------------------------
# logging wiring (pipeline/logutil.py): library silence by default,
# opt-in run configuration, idempotent reconfiguration, stage logs
# ---------------------------------------------------------------------------

import logging


def test_get_logger_is_silent_by_default(capsys):
    from sales_data_pipeline_spark.pipeline.logutil import get_logger

    get_logger("some.module").info("should go nowhere")
    captured = capsys.readouterr()
    assert "should go nowhere" not in captured.err + captured.out


def test_configure_is_idempotent_and_writes_file(tmp_path):
    from sales_data_pipeline_spark.pipeline.logutil import (
        configure_pipeline_logging,
        get_logger,
    )

    logf = tmp_path / "run.log"
    try:
        configure_pipeline_logging(log_file=str(logf))
        configure_pipeline_logging(log_file=str(logf))  # no duplicate handlers
        get_logger("t").info("one line only")
        text = logf.read_text()
        assert text.count("one line only") == 1
    finally:
        root = logging.getLogger("sales_data_pipeline_spark")
        for h in list(root.handlers):
            if not isinstance(h, logging.NullHandler):
                root.removeHandler(h)
                h.close()
        root.propagate = True  # restore library default for other tests


def test_configure_disables_propagation_no_double_emit(tmp_path):
    """An application that ALSO configured the Python root logger (e.g.
    logging.basicConfig in a driver script) must not see every pipeline
    line twice: once run handlers are attached, the package logger stops
    propagating — our handlers are the single output path."""
    import io

    from sales_data_pipeline_spark.pipeline.logutil import (
        configure_pipeline_logging,
        get_logger,
    )

    app_stream = io.StringIO()
    app_handler = logging.StreamHandler(app_stream)
    logging.getLogger().addHandler(app_handler)  # simulate basicConfig
    logf = tmp_path / "run.log"
    try:
        root = configure_pipeline_logging(log_file=str(logf))
        assert root.propagate is False
        get_logger("t").info("exactly once")
        assert logf.read_text().count("exactly once") == 1
        assert "exactly once" not in app_stream.getvalue()  # not doubled via root
    finally:
        logging.getLogger().removeHandler(app_handler)
        root = logging.getLogger("sales_data_pipeline_spark")
        for h in list(root.handlers):
            if not isinstance(h, logging.NullHandler):
                root.removeHandler(h)
                h.close()
        root.propagate = True


def test_run_pipeline_emits_stage_logs(spark, cfg, caplog):
    from tests.fixtures import dim_frames, write_sales_csv

    write_sales_csv(_in(cfg) / "day1.csv", n=50, seed=41)
    customer, store, team = dim_frames(spark)
    with caplog.at_level(logging.INFO, logger="sales_data_pipeline_spark"):
        run_pipeline(spark, cfg, customer, store, team)
    text = caplog.text
    assert "discovered 1 input file" in text
    assert "accepted 1 file" in text
    assert "ingested 50 fact rows" in text
    assert "marts committed" in text
    assert "state flipped to inactive" in text


# ---------------------------------------------------------------------------
# property test: header-contract validation over random column sets
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sales_data_pipeline_spark.operators.normalize import validate_headers
from sales_data_pipeline_spark.schemas import MANDATORY_COLUMNS
from tests.fixtures import HEADER8


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    drop=st.lists(st.sampled_from(sorted(MANDATORY_COLUMNS)), max_size=3, unique=True),
    extras=st.lists(
        st.sampled_from(["payment_mode", "coupon", "channel"]), max_size=2, unique=True
    ),
    seed=st.integers(0, 10_000),
)
def test_validate_headers_contract_over_random_column_sets(
    spark, tmp_path_factory, drop, extras, seed
):
    """For ANY header built by dropping mandatory columns and/or adding
    extras: a file missing ANY mandatory column is quarantined with
    exactly the missing set reported; extra columns alone never
    quarantine — the reference's accept/reject rule (main.py:142-188)
    generalized beyond its two golden cases."""
    import csv as _csv

    header = [c for c in HEADER8 if c not in drop] + list(extras)
    tmp = tmp_path_factory.mktemp("hdrfuzz")
    path = tmp / "f.csv"
    with open(path, "w", newline="") as f:
        w = _csv.writer(f)
        w.writerow(header)
        w.writerow(["1"] * len(header))
    report = validate_headers(spark, [str(path)], MANDATORY_COLUMNS)
    if drop:
        assert report.valid_paths == []
        missing = set(next(iter(report.quarantined.values())))
        assert missing == set(drop)
    else:
        assert len(report.valid_paths) == 1
        assert report.quarantined == {}


def test_replay_quarantine_requeues_fixed_files(spark, cfg):
    """A quarantined file fixed in place is re-validated and moved back
    to the input dir, where the next pipeline run ingests it through
    the normal audit path; unfixed files stay quarantined."""
    from pathlib import Path

    from sales_data_pipeline_spark.pipeline.sales_pipeline import (
        replay_quarantine,
    )

    write_sales_csv(_in(cfg) / "good.csv", n=50, seed=61)
    write_sales_csv(_in(cfg) / "bad1.csv", n=20, seed=62, drop_store_id=True)
    write_sales_csv(_in(cfg) / "bad2.csv", n=20, seed=63, drop_store_id=True)
    customer, store, team = dim_frames(spark)
    res1 = run_pipeline(spark, cfg, customer, store, team)
    assert len(res1.quarantined_files) == 2 and res1.n_fact_rows == 50

    # producer fixes bad1 IN PLACE (full header now); bad2 stays broken
    write_sales_csv(Path(cfg.quarantine_dir) / "bad1.csv", n=20, seed=64)
    replay = replay_quarantine(spark, cfg)
    assert replay == {"requeued": ["bad1.csv"], "still_bad": ["bad2.csv"]}
    assert sorted(p.name for p in Path(cfg.quarantine_dir).iterdir()) == ["bad2.csv"]

    res2 = run_pipeline(spark, cfg, customer, store, team)
    assert [p.rsplit("/", 1)[-1] for p in res2.accepted_files] == ["bad1.csv"]
    assert res2.n_fact_rows == 20
    # replayed file completed the full audit cycle
    state = AuditState(spark, cfg.state_dir)
    assert state.stale_active_files() == []
    # empty quarantine: replay is a no-op
    write_sales_csv(Path(cfg.quarantine_dir) / "bad2.csv", n=1, seed=65, drop_store_id=True)
    assert replay_quarantine(spark, cfg)["requeued"] == []


def test_strict_lint_blocks_cartesian_mart_before_any_publish(
    spark, cfg, monkeypatch
):
    """lint='strict' turns the CI plan checklist into a runtime guard:
    a mart whose plan contains a CartesianProduct (error severity) must
    raise BEFORE either mart is written — zero marts published, inputs
    NOT archived, state still 'A' (the failed-run probe will resume
    them). The stock marts pass strict lint (second run)."""
    import dataclasses
    from pathlib import Path

    from sales_data_pipeline_spark.pipeline import sales_pipeline as sp

    write_sales_csv(_in(cfg) / "sales1.csv", n=60, seed=9)
    customer, store, team = dim_frames(spark)

    real_mart = sp.customer_monthly_mart

    def cartesian_mart(enriched, strict_compat=False):
        good = real_mart(enriched, strict_compat)
        # a deliberate scale-killer: all-pairs self cross join
        return good.crossJoin(good.select(F.col("sales_date_month").alias("m2")))

    monkeypatch.setattr(sp, "customer_monthly_mart", cartesian_mart)
    strict_cfg = dataclasses.replace(cfg, lint="strict")
    with pytest.raises(RuntimeError, match="cartesian"):
        run_pipeline(spark, strict_cfg, customer, store, team)
    out = Path(strict_cfg.output_dir)
    assert not (out / "customers_data_mart").exists()
    assert not (out / "sales_team_data_mart").exists()
    # pre-commit failure: file not archived, audit row still active
    assert (_in(cfg) / "sales1.csv").exists()
    assert AuditState(spark, cfg.state_dir).stale_active_files()

    # the real marts pass strict lint end-to-end (and the resumed file
    # is picked up by the probe)
    monkeypatch.setattr(sp, "customer_monthly_mart", real_mart)
    res = run_pipeline(spark, strict_cfg, customer, store, team)
    assert res.n_fact_rows == 60
    assert (out / "customers_data_mart").exists()


def test_lint_mode_validation_and_off(spark, cfg, monkeypatch):
    """Unknown lint modes are rejected loudly; lint='off' skips the
    guard entirely (a cartesian mart would publish — the operator asked
    for it)."""
    import dataclasses

    from sales_data_pipeline_spark.pipeline.sales_pipeline import _lint_mart_plans

    with pytest.raises(ValueError, match="off\\|warn\\|strict"):
        _lint_mart_plans("loud")
    _lint_mart_plans("off")  # no-op, no spark needed
