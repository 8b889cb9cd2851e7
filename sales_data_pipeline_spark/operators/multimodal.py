"""Multimodal columns: opaque binary payloads + typed metadata.

The Spark-side design is the real deliverable here: media travels as a
``binary`` column with a metadata struct beside it; decode / feature
extraction / frame sampling run as Arrow-batched pandas functions over
``mapInPandas`` (one Python process per partition, whole column batches
— never row-at-a-time). Codec support is tiered: ``codec="ppm"`` is a
REAL pure-Python decoder (binary P6 netpbm — header parse incl.
comments, raster decode, per-channel stats), proving the pipeline end
to end without image libraries; ``codec="fake"`` derives deterministic
metadata from raw bytes (the oracle-checkable stand-in for arbitrary
media); compressed codecs (jpeg/png/...) raise NotImplementedError
until their libraries exist in the runtime image.

Scale notes: payload columns dominate I/O — always column-prune before
a shuffle (select the id + payload only inside the UDF stage), size
``spark.sql.files.maxPartitionBytes`` so a batch of payloads fits
executor memory, and prefer ``mapInPandas`` (streamed batches) over
``collect``-style UDFs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "media_id long, byte_len long, checksum string, fake_width int, fake_height int"
)
FRAME_SCHEMA = "media_id long, frame_no int, frame_bytes binary"
FEATURE_DIM = 16
FEATURE_SCHEMA = f"media_id long, features array<double>"


def attach_binary_payload(
    df: DataFrame, id_col: str, text_col: str = "text"
) -> DataFrame:
    """Deterministic fake media: payload = utf-8 bytes of the text column
    (stands in for image/audio bytes), plus source metadata."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.lit("fake/utf8").alias("mime"),
            F.octet_length(F.encode(F.col(text_col), "UTF-8")).alias("n_bytes"),
        ).alias("meta"),
    )


PPM_DECODED_SCHEMA = (
    "media_id long, width int, height int, maxval int, n_pixels long, "
    "mean_r double, mean_g double, mean_b double, checksum string"
)


def _ppm_header(raw: bytes) -> tuple[int, int, int, int]:
    """Parse a binary-PPM (P6) header: returns (width, height, maxval,
    raster_offset). Handles arbitrary whitespace and '#' comments per
    the netpbm spec; raises ValueError on malformed input."""
    if raw[:2] != b"P6":
        raise ValueError(f"not a P6 PPM (magic={raw[:2]!r})")
    pos, vals = 2, []
    while len(vals) < 3:
        while pos < len(raw) and raw[pos : pos + 1].isspace():
            pos += 1
        if raw[pos : pos + 1] == b"#":
            while pos < len(raw) and raw[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(raw) and not raw[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PPM header")
        vals.append(int(raw[start:pos]))
    pos += 1  # exactly one whitespace byte separates maxval from raster
    w, h, maxval = vals
    if w <= 0 or h <= 0 or not 0 < maxval < 65536:
        raise ValueError(f"bad PPM dimensions {w}x{h} maxval={maxval}")
    return w, h, maxval, pos


def encode_ppm(width: int, height: int, rgb: bytes) -> bytes:
    """Inverse of the decoder — builds a valid P6 image from raw RGB
    bytes (len == width*height*3). Used by tests to generate
    deterministic real images without any image library."""
    if len(rgb) != width * height * 3:
        raise ValueError("rgb length must be width*height*3")
    return b"P6\n%d %d\n255\n" % (width, height) + rgb


def decode_media(df: DataFrame, codec: str = "fake") -> DataFrame:
    """Decode payloads via mapInPandas (Arrow batches).

    codec='ppm' REALLY decodes binary-P6 netpbm payloads (pure Python +
    numpy — no image libraries needed): header fields, pixel count, and
    per-channel means computed from the raster. codec='fake' derives
    deterministic metadata from the raw bytes (byte length, md5
    checksum, fake dimensions). Compressed codecs raise until their
    libraries exist in the runtime image."""
    if codec == "ppm":

        def _decode_ppm(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import hashlib

            import numpy as np

            for pdf in batches:
                rows = {k: [] for k in (
                    "media_id", "width", "height", "maxval", "n_pixels",
                    "mean_r", "mean_g", "mean_b", "checksum",
                )}
                for mid, b in zip(pdf["media_id"], pdf["payload"]):
                    raw = bytes(b)
                    w, h, maxval, off = _ppm_header(raw)
                    n = w * h
                    px = np.frombuffer(raw, dtype=np.uint8, count=n * 3, offset=off)
                    px = px.reshape(n, 3).astype(np.float64)
                    rows["media_id"].append(mid)
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["maxval"].append(maxval)
                    rows["n_pixels"].append(n)
                    rows["mean_r"].append(px[:, 0].mean())
                    rows["mean_g"].append(px[:, 1].mean())
                    rows["mean_b"].append(px[:, 2].mean())
                    rows["checksum"].append(hashlib.md5(raw).hexdigest())
                pdf_out = pd.DataFrame(rows)
                for c, t in (("width", "int32"), ("height", "int32"),
                             ("maxval", "int32"), ("n_pixels", "int64")):
                    pdf_out[c] = pdf_out[c].astype(t)
                yield pdf_out

        return df.select("media_id", "payload").mapInPandas(
            _decode_ppm, PPM_DECODED_SCHEMA
        )
    if codec != "fake":
        raise NotImplementedError(
            f"codec {codec!r}: no media libraries in this runtime; "
            "plug a real decoder into _decode_batch"
        )

    def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            raw = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "byte_len": raw.map(len).astype("int64"),
                    "checksum": raw.map(lambda b: hashlib.md5(bytes(b)).hexdigest()),
                    # fake dims: derived from content so they're stable
                    "fake_width": raw.map(lambda b: 64 + len(b) % 577).astype("int32"),
                    "fake_height": raw.map(lambda b: 64 + (len(b) * 7) % 577).astype(
                        "int32"
                    ),
                }
            )

    return df.select("media_id", "payload").mapInPandas(_decode_batch, DECODED_SCHEMA)


def extract_features(df: DataFrame) -> DataFrame:
    """Feature extraction stub: 16-bin byte histogram, L1-normalized —
    a stand-in for an embedding model, with the real Arrow batch shape."""

    def _featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            feats = []
            for b in pdf["payload"]:
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                hist = np.bincount(arr >> 4, minlength=FEATURE_DIM).astype("float64")
                total = hist.sum()
                feats.append((hist / total if total else hist).tolist())
            yield pd.DataFrame({"media_id": pdf["media_id"], "features": feats})

    return df.select("media_id", "payload").mapInPandas(_featurize, FEATURE_SCHEMA)


RESIZED_SCHEMA = "media_id long, width int, height int, pixels binary"


def resize_media(df: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """Resize stub with the real Arrow batch shape: interpret the payload
    as a 1-byte-per-pixel row-major 'image' (fake_width from
    decode_media's convention) and nearest-neighbor sample it to
    (width, height). A real implementation swaps the numpy sampling for
    PIL/cv2 on the decoded raster; schema, batching and output size
    contract (exactly width·height bytes per row) stay identical."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for b in pdf["payload"]:
                raw = np.frombuffer(bytes(b), dtype=np.uint8)
                src_w = 64 + len(raw) % 577  # decode_media's fake width
                src_h = max(len(raw) // src_w, 1)
                grid = np.resize(raw, (src_h, src_w))  # pad by repetition
                ys = (np.arange(height) * src_h // height).clip(0, src_h - 1)
                xs = (np.arange(width) * src_w // width).clip(0, src_w - 1)
                out.append(grid[np.ix_(ys, xs)].tobytes())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pd.array([width] * len(out), dtype="int32"),
                    "height": pd.array([height] * len(out), dtype="int32"),
                    "pixels": out,
                }
            )

    return df.select("media_id", "payload").mapInPandas(_resize, RESIZED_SCHEMA)


def sample_frames(df: DataFrame, frame_size: int = 256, stride: int = 2) -> DataFrame:
    """'Video' frame sampling stub: split the payload into frame_size
    chunks, keep every ``stride``-th — one input row fans out to many
    output rows, the real shape of a frame-sampling stage."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, frames = [], [], []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(b)
                for j, off in enumerate(range(0, len(raw), frame_size)):
                    if j % stride == 0:
                        ids.append(mid)
                        nos.append(j)
                        frames.append(raw[off : off + frame_size])
            yield pd.DataFrame(
                {"media_id": ids, "frame_no": pd.array(nos, dtype="int32"),
                 "frame_bytes": frames}
            )

    return df.select("media_id", "payload").mapInPandas(_frames, FRAME_SCHEMA)
