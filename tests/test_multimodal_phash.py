"""Perceptual-hash image dedup: aHash codec parity + blocked Hamming
pairs (operators/multimodal.py image_ahash / ahash_near_pairs)."""

from __future__ import annotations

import numpy as np

from sales_data_pipeline_spark.operators.multimodal import (
    ahash_near_pairs,
    encode_ppm,
    image_ahash,
)


def _py_ahash(w, h, rgb, grid=8):
    """Pure-python reference of the exact operator contract."""
    px = np.frombuffer(rgb, dtype=np.uint8).astype(np.int64).reshape(h, w, 3)
    luma = (299 * px[:, :, 0] + 587 * px[:, :, 1] + 114 * px[:, :, 2]) // 1000
    ys = [h * i // grid for i in range(grid + 1)]
    xs = [w * i // grid for i in range(grid + 1)]
    cells = np.empty((grid, grid), dtype=np.int64)
    for i in range(grid):
        for j in range(grid):
            blk = luma[ys[i]:ys[i + 1], xs[j]:xs[j + 1]]
            cells[i, j] = int(blk.sum()) // max(blk.size, 1)
    thresh = int(cells.sum()) // (grid * grid)
    v = 0
    for bit in (cells > thresh).flatten():
        v = (v << 1) | int(bit)
    return v


def _img(seed, w=16, h=16):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=w * h * 3, dtype=np.uint8).tobytes()


def test_image_ahash_matches_python_reference(spark):
    imgs = {i: _img(i, 24, 16) for i in range(8)}
    df = spark.createDataFrame(
        [(i, bytearray(encode_ppm(24, 16, b))) for i, b in imgs.items()],
        "media_id long, payload binary",
    )
    got = {r.media_id: (r.ahash, r.ahash_hex) for r in image_ahash(df).collect()}
    for i, b in imgs.items():
        v = _py_ahash(24, 16, b)
        signed = v - (1 << 64) if v >= (1 << 63) else v
        assert got[i] == (signed, f"{v:016x}"), i


def test_ahash_brightness_shift_is_near_dup(spark):
    """A globally brightness-shifted copy keeps (almost) the same hash —
    the invariance aHash exists for — while an unrelated image is far."""
    base = np.frombuffer(_img(42), dtype=np.uint8).astype(np.int64)
    brighter = np.clip(base + 30, 0, 255).astype(np.uint8).tobytes()
    rows = [
        (1, bytearray(encode_ppm(16, 16, base.astype(np.uint8).tobytes()))),
        (2, bytearray(encode_ppm(16, 16, brighter))),
        (3, bytearray(encode_ppm(16, 16, _img(7)))),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    pairs = {
        (r.media_a, r.media_b): r.hamming
        for r in ahash_near_pairs(image_ahash(df), max_hamming=6).collect()
    }
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_ahash_blocking_equals_bruteforce(spark):
    """Pigeonhole blocking loses NO pair vs the O(n²) compare."""
    imgs = {i: _img(100 + i) for i in range(30)}
    # plant near-dups: a few single-pixel edits of image 0
    base = np.frombuffer(imgs[0], dtype=np.uint8).copy()
    for k, i in enumerate([50, 51, 52]):
        mod = base.copy()
        mod[k * 3] = 255 - mod[k * 3]
        imgs[i] = mod.tobytes()
    df = spark.createDataFrame(
        [(i, bytearray(encode_ppm(16, 16, b))) for i, b in imgs.items()],
        "media_id long, payload binary",
    )
    hashes = {r.media_id: r.ahash for r in image_ahash(df).collect()}
    want = set()
    ids = sorted(hashes)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            d = bin((hashes[a] ^ hashes[b]) & ((1 << 64) - 1)).count("1")
            if d <= 6:
                want.add((a, b, d))
    got = {
        (r.media_a, r.media_b, r.hamming)
        for r in ahash_near_pairs(image_ahash(df), max_hamming=6).collect()
    }
    assert got == want
    assert any(p[0] == 0 for p in got)  # the planted dups were found


def test_ppm_text_payload_empty_text_still_decodes(spark):
    """q200's payload synthesis: empty text used to produce a 16x16
    header with a ZERO-byte raster (rpad with an empty pad string
    returns ""), crashing the decoder's frombuffer(count=768) for the
    whole stage. The single-space fallback must keep every payload at
    the full 768-byte raster and hash cleanly."""
    from pyspark.sql import functions as F

    from sales_data_pipeline_spark.plans.similarity_multimodal import (
        ppm_text_payload,
    )

    df = spark.createDataFrame(
        [(1, ""), (2, "hello world"), (3, None)],
        "doc_id long, text string",
    )
    imgs = df.select(
        F.col("doc_id").alias("media_id"),
        ppm_text_payload("text").alias("payload"),
    )
    sizes = {r.media_id: len(r.payload) for r in imgs.collect()}
    header = len(b"P6\n16 16\n255\n")
    assert all(v == header + 768 for v in sizes.values()), sizes
    hashes = image_ahash(imgs)
    assert hashes.count() == 3
