"""The end-to-end sales ETL — the reference's main.py, Spark-first.

Stage order preserves the reference's failure-aware semantics
(SURVEY §2j.9): quarantine precedes any state write; archive + status
flip happen only after both marts commit.

Deliberate physical upgrades over the reference (SURVEY §4 anti-patterns):
- the enriched frame is cached once and feeds every sink (the reference
  recomputes CSV scans + 3 joins per action, main.py:271-398);
- accepted files are read once, grouped by header, with the explicit
  contract schema (no inferSchema double pass, main.py:145-147+249-252);
- no local-disk staging hop: inputs are read where they land
  (local/s3a/hdfs alike via the Hadoop FS API).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from sales_data_pipeline_spark.operators.enrich import sales_enrichment
from sales_data_pipeline_spark.operators.marts import (
    customer_monthly_mart,
    sales_team_mart,
)
from sales_data_pipeline_spark.operators.normalize import (
    read_validated_union,
    validate_headers,
)
from sales_data_pipeline_spark.pipeline import fs
from sales_data_pipeline_spark.pipeline.logutil import get_logger
from sales_data_pipeline_spark.pipeline.state import AuditState
from sales_data_pipeline_spark.schemas import MANDATORY_COLUMNS, SALES_CONTRACT

# run-stage log (reference wires a logger through every transform,
# logging_config.py:1-4; silent unless the run opts in via
# logutil.configure_pipeline_logging)
log = get_logger(__name__)


@dataclass(frozen=True)
class PipelineConfig:
    input_dir: str
    quarantine_dir: str
    processed_dir: str
    output_dir: str
    state_dir: str
    extras_mode: str = "json"  # "concat" = reference bit-compat
    strict_compat: bool = False  # window+distinct mart replication
    # mart sink format: any Spark columnar batch format ("parquet",
    # "orc"). Both support partitionBy + dynamic partition overwrite +
    # predicate pushdown; parquet is the default lake choice, orc the
    # Hive-ecosystem one.
    mart_format: str = "parquet"
    # physical-plan lint of the mart plans BEFORE anything is written
    # (plans/lint.py — the scale checklist as a runtime guard, not just
    # a CI invariant): "off" = skip, "warn" = log findings and proceed,
    # "strict" = raise on any error-severity finding (cartesian product,
    # row-at-a-time Python UDF) so a scale-killer plan never publishes.
    lint: str = "warn"


@dataclass
class PipelineResult:
    accepted_files: list[str] = field(default_factory=list)
    quarantined_files: dict[str, list[str]] = field(default_factory=dict)
    resumed_files: list[str] = field(default_factory=list)
    n_fact_rows: int = 0
    customer_mart_path: str = ""
    sales_team_mart_path: str = ""
    # df.observe() metrics captured DURING the ingest action (no extra
    # scan): n_rows, n_null_cost, sum_cost — the run-report numbers an
    # operator reads before trusting a publish
    ingest_metrics: dict = field(default_factory=dict)


def _lint_mart_plans(mode: str, **marts: DataFrame) -> None:
    """Runtime face of the plan linter (plans/lint.py): warn-log every
    finding; in strict mode raise on error-severity ones (cartesian
    product, row-at-a-time Python UDF) BEFORE any sink action runs."""
    if mode == "off":
        return
    if mode not in ("warn", "strict"):
        raise ValueError(f"PipelineConfig.lint must be off|warn|strict, got {mode!r}")
    from sales_data_pipeline_spark.plans.lint import lint_plan

    errors: list[str] = []
    for name, df in marts.items():
        for f in lint_plan(df):
            log.warning("plan lint [%s] %s/%s: %s", f.severity, name, f.code, f.message)
            if f.severity == "error":
                errors.append(f"{name}: {f.code} — {f.message}")
    if errors and mode == "strict":
        raise RuntimeError(
            "strict plan lint failed; refusing to publish marts:\n  "
            + "\n  ".join(errors)
        )


def run_pipeline(
    spark: SparkSession,
    cfg: PipelineConfig,
    customer: DataFrame,
    store: DataFrame,
    sales_team: DataFrame,
) -> PipelineResult:
    result = PipelineResult()
    state = AuditState(spark, cfg.state_dir)

    # 1. failed-run probe: files activated by a crashed run are picked up
    #    again (reference: main.py:56-73). They still sit in input_dir
    #    because archive only happens post-commit.
    result.resumed_files = state.stale_active_files()
    if result.resumed_files:
        log.warning(
            "failed-run probe: %d stale-active file(s) from a crashed "
            "run will be resumed: %s",
            len(result.resumed_files), result.resumed_files,
        )

    # 2. discovery (replaces boto3 list+download, aws_read.py:7-23)
    discovered = fs.list_files(spark, cfg.input_dir, suffix=".csv")
    log.info("discovered %d input file(s) in %s", len(discovered), cfg.input_dir)
    if not discovered:
        return result

    # 3. file-level contract validation; rejects quarantined before any
    #    state write (reference ordering, main.py:142-188)
    report = validate_headers(spark, discovered, MANDATORY_COLUMNS)
    for path, missing in report.quarantined.items():
        log.warning("quarantining %s (missing columns: %s)", path, missing)
        fs.move_file(spark, path, cfg.quarantine_dir)
    result.quarantined_files = dict(report.quarantined)
    if not report.valid:
        return result

    # 4. audit trail: accepted files become status 'A' (main.py:196-225)
    result.accepted_files = report.valid_paths
    log.info("accepted %d file(s); marking active", len(result.accepted_files))
    state.mark_active(result.accepted_files)

    # 5. single-pass read + normalize + union; cached because it feeds
    #    two marts and a count (the reference re-scans per action).
    #    Observation metrics ride the SAME action as the count — the
    #    zero-extra-pass way to get a run scorecard (a separate agg
    #    would re-scan; the reference eyeballed .show() instead,
    #    main.py:271).
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    obs = Observation("fact_ingest")
    fact = (
        read_validated_union(spark, report, SALES_CONTRACT, cfg.extras_mode)
        .observe(
            obs,
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(
                F.when(F.col("total_cost").isNull(), 1).otherwise(0)
            ).alias("n_null_cost"),
            F.sum(F.col("total_cost")).alias("sum_cost"),
        )
        .cache()
    )
    result.n_fact_rows = fact.count()
    result.ingest_metrics = dict(obs.get)
    log.info("ingested %d fact rows; metrics=%s", result.n_fact_rows, result.ingest_metrics)

    # 6. enrichment (broadcast star joins, rename-before-join)
    enriched = sales_enrichment(fact, customer, store, sales_team)

    # 7. marts → parquet. The sales-team mart is partitioned by
    #    (sales_month, store_id) exactly like the reference's final write
    #    (main.py:363-368); dynamic partition overwrite keeps re-runs
    #    idempotent per partition instead of append-duplicating
    #    (SURVEY §2j.7).
    cust_mart = customer_monthly_mart(enriched, cfg.strict_compat)
    team_mart = sales_team_mart(enriched, cfg.strict_compat)
    # lint BOTH plans before EITHER write: a strict failure must leave
    # zero marts published, not one (half-published is the worst state)
    _lint_mart_plans(
        cfg.lint, customers_data_mart=cust_mart, sales_team_data_mart=team_mart
    )
    result.customer_mart_path = f"{cfg.output_dir}/customers_data_mart"
    cust_mart.write.mode("overwrite").format(
        cfg.mart_format
    ).save(result.customer_mart_path)
    result.sales_team_mart_path = f"{cfg.output_dir}/sales_team_data_mart"
    team_mart.write.mode("overwrite").partitionBy(
        "sales_month", "store_id"
    ).format(cfg.mart_format).save(result.sales_team_mart_path)
    fact.unpersist()
    log.info(
        "marts committed: %s, %s",
        result.customer_mart_path, result.sales_team_mart_path,
    )

    # 8. post-commit: archive inputs, flip state to 'I' (main.py:403-448)
    for path in result.accepted_files:
        fs.move_file(spark, path, cfg.processed_dir)
    state.mark_inactive(result.accepted_files)
    log.info("archived %d file(s); state flipped to inactive", len(result.accepted_files))
    return result


@dataclass(frozen=True)
class JdbcTopology:
    """The reference's actual deployment shape: dimension tables live in
    an RDBMS and both marts are published back to it (reference
    src/main/transformations/main.py:284-307 reads customer/store/
    sales_team from MySQL; :390-398 writes the two marts back via JDBC,
    in addition to the parquet copies)."""

    url: str
    properties: dict[str, str] = field(default_factory=dict)
    customer_table: str = "customer"
    store_table: str = "store"
    sales_team_table: str = "sales_team"
    customer_mart_table: str = "customers_data_mart"
    sales_team_mart_table: str = "sales_team_data_mart"


def run_pipeline_jdbc(
    spark: SparkSession, cfg: PipelineConfig, topo: JdbcTopology
) -> PipelineResult:
    """run_pipeline with the reference's database topology: the three
    dimension frames come from JDBC tables and, after the parquet marts
    commit, both marts are ALSO published to JDBC (idempotent overwrite,
    not the reference's blind append). The JDBC mart write happens after
    the parquet commit + archive/state flip, mirroring the reference's
    stage order (parquet write main.py:363-368 precedes the JDBC write
    :390-398): a JDBC failure leaves a consistent lake copy and the
    re-run republishes from it. Dims are tiny (bounded) — a
    single-partition pull each is the right plan; large dims would pass
    range-partition bounds through read_jdbc."""
    from sales_data_pipeline_spark.sources.jdbc import (
        read_jdbc,
        write_jdbc_atomic,
    )

    dims = [
        read_jdbc(spark, topo.url, t, properties=topo.properties)
        for t in (topo.customer_table, topo.store_table, topo.sales_team_table)
    ]
    result = run_pipeline(spark, cfg, *dims)
    if result.customer_mart_path:
        for path, table in (
            (result.customer_mart_path, topo.customer_mart_table),
            (result.sales_team_mart_path, topo.sales_team_mart_table),
        ):
            # staging-swap publish: readers of the DB marts never see
            # a dropped/half-loaded table during the reload (plain
            # overwrite = drop-then-load; sources/jdbc.py
            # write_jdbc_atomic docstring has the crash analysis)
            write_jdbc_atomic(
                spark,
                spark.read.format(cfg.mart_format).load(path),
                topo.url,
                table,
                properties=topo.properties,
            )
    return result


def replay_quarantine(spark: SparkSession, cfg: PipelineConfig) -> dict[str, list[str]]:
    """Recovery path for quarantined inputs — the loop the reference
    lacks entirely (its error folder is a dead end, move_files.py:26-62
    moves files in and nothing ever looks again). After the producer
    fixes a file in place (or the contract is relaxed), replaying
    RE-VALIDATES every quarantined file against the current mandatory
    columns: passes move back to ``input_dir`` for the next
    run_pipeline to ingest through the normal audit path; failures
    stay quarantined with their (possibly new) missing-column sets.

    Returns {"requeued": [...], "still_bad": [...]}; file names only,
    mirroring PipelineResult's reporting. Validation is header-probe
    cheap (one-line read per file); no state is written here — the
    requeued file earns its audit 'A' row from the pipeline run that
    ingests it, keeping a single writer for the state log."""
    from sales_data_pipeline_spark.operators.normalize import validate_headers

    out: dict[str, list[str]] = {"requeued": [], "still_bad": []}
    quarantined = fs.list_files(spark, cfg.quarantine_dir, suffix=".csv")
    if not quarantined:
        return out
    report = validate_headers(spark, quarantined, MANDATORY_COLUMNS)
    for path in report.valid_paths:
        fs.move_file(spark, path, cfg.input_dir)
        out["requeued"].append(path.rsplit("/", 1)[-1])
        log.info("replay: requeued %s", path)
    for path, missing in report.quarantined.items():
        out["still_bad"].append(path.rsplit("/", 1)[-1])
        log.info("replay: %s still missing %s", path, missing)
    return out
