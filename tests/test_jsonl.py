"""JSONL source/sink: contract reads, corrupt-line routing, schema
drift tolerance, compressed round-trip."""

from __future__ import annotations

import gzip
import json

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from sales_data_pipeline_spark.sources.jsonl import read_jsonl, split_corrupt, write_jsonl

DOC_CONTRACT = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ]
)


def _write_lines(path, lines):
    path.write_text("\n".join(lines) + "\n")


def test_jsonl_contract_read_and_corrupt_routing(spark, tmp_path):
    f = tmp_path / "docs.jsonl"
    _write_lines(
        f,
        [
            json.dumps({"doc_id": 1, "text": "hello world", "lang": "en"}),
            '{"doc_id": 2, "text": "broken',  # truncated JSON
            json.dumps({"doc_id": 3, "text": "ok", "lang": "de", "extra_key": 42}),
            json.dumps({"doc_id": 4, "lang": "en"}),  # missing text -> null
        ],
    )
    clean, bad = split_corrupt(read_jsonl(spark, str(f), DOC_CONTRACT))
    rows = {r.doc_id: r for r in clean.collect()}
    assert set(rows) == {1, 3, 4}
    assert rows[3].lang == "de"  # extra key ignored, contract cols intact
    assert "extra_key" not in clean.columns
    assert rows[4].text is None  # missing key -> null, not an error
    bad_lines = [r.raw_line for r in bad.collect()]
    assert bad_lines == ['{"doc_id": 2, "text": "broken']


def test_jsonl_gzip_shard_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, f"doc {i} text", "en") for i in range(100)],
        "doc_id long, text string, lang string",
    )
    out = str(tmp_path / "out")
    write_jsonl(df, out, compression="gzip", shards=4)
    import glob

    parts = glob.glob(f"{out}/part-*.json.gz")
    assert len(parts) == 4
    with gzip.open(parts[0], "rt") as fh:  # genuinely gzip, one object per line
        json.loads(fh.readline())
    back, bad = split_corrupt(read_jsonl(spark, out, DOC_CONTRACT))
    assert bad.count() == 0
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


# ---------------------------------------------------------------------------
# XML source/sink (sources/xml.py)
# ---------------------------------------------------------------------------


def test_xml_roundtrip_with_contract_schema(spark, tmp_path):
    """Write → read round-trip through the native XML format with an
    explicit contract schema (no inference scan), values intact."""
    from sales_data_pipeline_spark.sources.xml import read_xml, write_xml

    df = spark.createDataFrame(
        [(1, "alpha", 10.5), (2, "beta", 20.25), (3, "gamma", -1.0)],
        "id bigint, name string, score double",
    )
    path = str(tmp_path / "xmlout")
    write_xml(df, path, row_tag="rec")
    back = read_xml(
        spark, path, row_tag="rec", schema="id bigint, name string, score double"
    )
    assert [f.simpleString() for f in back.schema.fields] == [
        f.simpleString() for f in df.schema.fields
    ]
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_xml_read_mart_export_shape(spark, tmp_path):
    """A mart exported as XML reads back with row-count and money
    fidelity (decimal carried as string in XML, recovered by the
    contract schema)."""
    from decimal import Decimal

    from sales_data_pipeline_spark.sources.xml import read_xml, write_xml

    mart = spark.createDataFrame(
        [(i, f"c{i}", Decimal(100 + i).quantize(Decimal("0.01"))) for i in range(20)],
        "customer_id bigint, name string, total_sales decimal(10,2)",
    )
    path = str(tmp_path / "mart_xml")
    write_xml(mart, path, row_tag="row", root_tag="mart")
    back = read_xml(
        spark, path, row_tag="row",
        schema="customer_id bigint, name string, total_sales decimal(10,2)",
    )
    assert back.count() == 20
    got = back.agg(F.sum("total_sales")).collect()[0][0]
    want = mart.agg(F.sum("total_sales")).collect()[0][0]
    assert got == want


# ---------------------------------------------------------------------------
# property test: corrupt-line routing is a partition (hypothesis)
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_fuzz_settings = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@settings(**_fuzz_settings)
@given(
    n_good=st.integers(1, 8),
    corrupt_at=st.lists(st.integers(0, 7), max_size=4, unique=True),
    mangle=st.sampled_from(["truncate", "notjson", "badcomma"]),
    seed=st.integers(0, 10_000),
)
def test_jsonl_corrupt_routing_partitions_lines(
    spark, tmp_path_factory, n_good, corrupt_at, mangle, seed
):
    """For ANY mix of valid docs and corrupted lines (truncated JSON,
    non-JSON garbage, malformed syntax), clean ∪ corrupt must PARTITION
    the input: every valid doc parses with its values intact, every
    mangled line lands raw in the corrupt side, nothing is dropped or
    double-routed. (Top-level ARRAYS are deliberately absent from the
    corruption classes: Spark's JSON-lines reader legitimately explodes
    an array line into its element rows — hypothesis found that
    assumption bug in this test's first version.)"""
    import json as _json
    import random

    rng = random.Random(seed)
    good = {
        i: {"doc_id": i, "text": f"t{rng.randint(0, 99)}", "lang": "en"}
        for i in range(n_good)
    }
    lines, n_bad = [], 0
    for i in range(n_good):
        line = _json.dumps(good[i])
        if i in corrupt_at:
            n_bad += 1
            if mangle == "truncate":
                line = line[: len(line) // 2]
            elif mangle == "notjson":
                line = f"garbage line {i} :::"
            else:
                line = '{"doc_id": %d,,}' % i  # malformed comma
        lines.append(line)
    tmp = tmp_path_factory.mktemp("jsonlfuzz")
    f = tmp / "docs.jsonl"
    f.write_text("\n".join(lines) + "\n")
    clean, bad = split_corrupt(read_jsonl(spark, str(f), DOC_CONTRACT))
    rows = {r.doc_id: r for r in clean.collect()}
    expect_good = {i for i in range(n_good) if i not in corrupt_at}
    assert set(rows) == expect_good
    for i in expect_good:
        assert rows[i].text == good[i]["text"]
    assert bad.count() == n_bad
    spark.catalog.clearCache()
