"""binaryFile source: multimodal payload ingestion (sources/binary.py)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from sales_data_pipeline_spark.sources.binary import (
    oversized_listing,
    read_binary_files,
)


def _make_files(root):
    os.makedirs(os.path.join(root, "nested"), exist_ok=True)
    payloads = {
        "a.wav": b"RIFF" + bytes(range(64)),
        "b.wav": b"RIFF" + bytes(200 for _ in range(2000)),
        "nested/c.wav": b"RIFF" + b"\x01\x02",
        "skip.txt": b"not media",
    }
    for rel, blob in payloads.items():
        with open(os.path.join(root, rel), "wb") as fh:
            fh.write(blob)
    return payloads


def test_read_binary_files_contents_and_glob(spark, tmp_path):
    root = str(tmp_path / "media")
    payloads = _make_files(root)
    df = read_binary_files(spark, root, glob="*.wav")
    rows = {os.path.basename(r.path): r for r in df.collect()}
    assert set(rows) == {"a.wav", "b.wav", "c.wav"}  # txt pruned at listing
    assert bytes(rows["a.wav"].content) == payloads["a.wav"]
    assert rows["b.wav"].length == len(payloads["b.wav"])
    # nested file found via recursive lookup
    assert bytes(rows["c.wav"].content) == payloads["nested/c.wav"]


def test_max_bytes_guard_and_oversized_listing(spark, tmp_path):
    root = str(tmp_path / "media")
    _make_files(root)
    kept = read_binary_files(spark, root, glob="*.wav", max_bytes=100)
    assert {os.path.basename(r.path) for r in kept.collect()} == {
        "a.wav",
        "c.wav",
    }
    over = oversized_listing(spark, root, max_bytes=100, glob="*.wav")
    rows = over.collect()
    assert [os.path.basename(r.path) for r in rows] == ["b.wav"]
    assert rows[0].length == 2004
    assert "content" not in over.columns  # metadata-only report


def test_binary_source_feeds_multimodal_decode(spark, tmp_path):
    """End-to-end plumbing: files on disk → binary rows → WAV decode."""
    from sales_data_pipeline_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
    )

    root = str(tmp_path / "wavs")
    os.makedirs(root)
    blob = encode_wav(8000, [0, 1000, -1000, 32767, -32768])
    with open(os.path.join(root, "t.wav"), "wb") as fh:
        fh.write(blob)
    df = read_binary_files(spark, root, glob="*.wav").select(
        F.xxhash64("path").alias("media_id"),
        F.col("content").alias("payload"),
    )
    out = decode_wav(df).collect()
    assert len(out) == 1
    assert out[0].n_samples == 5
    assert out[0].sample_rate == 8000
