"""CLI driver (`python -m sales_data_pipeline_spark`): the reference's
script entry point re-expressed as explicit subcommands over the
library API."""

from __future__ import annotations

import json

import pytest

from sales_data_pipeline_spark.__main__ import main
from tests.fixtures import write_sales_csv


def test_cli_pipeline_end_to_end(spark, tmp_path, capsys):
    (tmp_path / "in").mkdir()
    write_sales_csv(tmp_path / "in" / "sales1.csv", n=100, seed=5)
    rc = main([
        "pipeline",
        "--input-dir", str(tmp_path / "in"),
        "--output-dir", str(tmp_path / "out"),
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["accepted"] == ["sales1.csv"]
    assert out["n_fact_rows"] == 100
    assert spark.read.parquet(out["customer_mart"]).count() > 0


def test_cli_list_and_query(capsys):
    assert main(["list"]) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert any(line.startswith("q01_pricing_summary\toracle") for line in lines)
    assert len(lines) >= 110
    # unknown query → exit code 2, no traceback
    assert main(["query", "q_definitely_not_there"]) == 2
