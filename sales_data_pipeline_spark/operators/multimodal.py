"""Multimodal columns: opaque binary payloads + typed metadata.

The Spark-side design is the real deliverable here: media travels as a
``binary`` column with a metadata struct beside it; decode / feature
extraction / frame sampling run as Arrow-batched pandas functions over
``mapInPandas`` (one Python process per partition, whole column batches
— never row-at-a-time). Codec support is tiered: ``codec="ppm"`` is a
REAL pure-Python decoder (binary P6 netpbm — header parse incl.
comments, raster decode, per-channel stats), proving the pipeline end
to end without image libraries; ``codec="image"`` auto-detects
PPM/PNG/baseline-JPEG by magic bytes through the REAL pure-Python
compressed codecs in operators/imagecodec.py; ``codec="fake"`` derives
deterministic metadata from raw bytes (the oracle-checkable stand-in
for arbitrary media). Formats outside those codecs (gif/webp/...)
raise NotImplementedError — loud, never silently skipped.

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
    per-channel means computed from the raster. codec='image'
    dispatches by magic bytes across PPM/PNG/baseline-JPEG via the
    real pure-Python codecs in operators/imagecodec.py. codec='fake'
    derives deterministic metadata from the raw bytes (byte length,
    md5 checksum, fake dimensions). Anything else raises
    NotImplementedError."""
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
    if codec == "image":
        # auto-detect by magic bytes: PPM (this module), PNG, baseline
        # JPEG (operators/imagecodec — REAL pure-python codecs, built
        # because the runtime image ships no image libraries). Same
        # output schema as 'ppm'; formats outside the three codecs
        # raise NotImplementedError inside the task — loud by design.
        def _decode_img(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import hashlib

            from sales_data_pipeline_spark.operators.imagecodec import (
                decode_image_rgb,
            )

            for pdf in batches:
                rows = {k: [] for k in (
                    "media_id", "width", "height", "maxval", "n_pixels",
                    "mean_r", "mean_g", "mean_b", "checksum",
                )}
                for mid, b in zip(pdf["media_id"], pdf["payload"]):
                    raw = bytes(b)
                    w, h, px = decode_image_rgb(raw)
                    flat = px.reshape(-1, 3).astype("float64")
                    rows["media_id"].append(mid)
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["maxval"].append(255)
                    rows["n_pixels"].append(w * h)
                    rows["mean_r"].append(flat[:, 0].mean())
                    rows["mean_g"].append(flat[:, 1].mean())
                    rows["mean_b"].append(flat[:, 2].mean())
                    rows["checksum"].append(hashlib.md5(raw).hexdigest())
                pdf_out = pd.DataFrame(rows)
                for c, t in (("width", "int32"), ("height", "int32"),
                             ("maxval", "int32"), ("n_pixels", "int64")):
                    pdf_out[c] = pdf_out[c].astype(t)
                yield pdf_out

        return df.select("media_id", "payload").mapInPandas(
            _decode_img, PPM_DECODED_SCHEMA
        )
    if codec != "fake":
        raise NotImplementedError(
            f"codec {codec!r}: in-sandbox codecs are 'ppm', 'image' "
            "(auto-detect PPM/PNG/baseline-JPEG via operators/imagecodec) "
            "and 'fake'; other formats need a real media library"
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


# ---------------------------------------------------------------------------
# audio: real RIFF/WAVE PCM16 codec (pure Python — no audio libraries)
# ---------------------------------------------------------------------------

WAV_DECODED_SCHEMA = (
    "media_id long, n_channels int, sample_rate int, bits int, n_samples long, "
    "duration_s double, rms double, zcr double, peak int, checksum string"
)


def encode_wav(sample_rate: int, samples) -> bytes:
    """Minimal valid RIFF/WAVE file: PCM (fmt 1), mono, 16-bit LE.
    Inverse of the decoder; used by tests/queries to generate
    deterministic real audio without any audio library."""
    import struct

    import numpy as np

    pcm = np.asarray(samples, dtype="<i2").tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
    fmt = b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16
    )
    data = b"data" + struct.pack("<I", len(pcm)) + pcm
    return hdr + fmt + data


def _wav_parse(raw: bytes):
    """Parse RIFF/WAVE: walk chunks, require PCM fmt + 16-bit; returns
    (n_channels, sample_rate, bits, int16 sample array). Raises
    ValueError on anything malformed — decode errors must be loud, not
    silently-zero rows."""
    import struct

    import numpy as np

    if raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError(f"not a RIFF/WAVE file (magic={raw[:4]!r})")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(raw):
        cid = raw[pos : pos + 4]
        (clen,) = struct.unpack("<I", raw[pos + 4 : pos + 8])
        body = raw[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            if clen < 16:
                raise ValueError("truncated fmt chunk")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(f"unsupported WAV (format={audio_format}, bits={bits})")
    samples = np.frombuffer(data, dtype="<i2")
    return n_channels, sample_rate, bits, samples


def decode_wav(df: DataFrame) -> DataFrame:
    """REAL audio decode + feature extraction over mapInPandas: parses
    the RIFF container, then computes the standard cheap audio features
    (duration, RMS energy, zero-crossing rate, peak amplitude) from the
    PCM samples. Same Arrow-batched shape as the image path; the
    features are exact integer/√rational arithmetic so they are
    oracle-reproducible from the generating formula."""

    def _decode(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        import hashlib

        import numpy as np

        for pdf in batches:
            rows = {k: [] for k in (
                "media_id", "n_channels", "sample_rate", "bits", "n_samples",
                "duration_s", "rms", "zcr", "peak", "checksum",
            )}
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(b)
                n_ch, sr, bits, s = _wav_parse(raw)
                n = len(s)
                s64 = s.astype(np.int64)
                sumsq = int((s64 * s64).sum())
                rms = float((sumsq / n) ** 0.5) if n else 0.0
                if n > 1:
                    prod = s64[:-1] * s64[1:]
                    zcr = float((prod < 0).sum() / (n - 1))
                else:
                    zcr = 0.0
                rows["media_id"].append(mid)
                rows["n_channels"].append(n_ch)
                rows["sample_rate"].append(sr)
                rows["bits"].append(bits)
                rows["n_samples"].append(n)
                # RAW doubles — rounding is the consuming query's
                # concern: Python's round() is banker's (half-to-even)
                # and disagrees with SQL round at exact binary ties
                # (zcr = 1/128 bit q91 at sf0.1)
                rows["duration_s"].append(n / sr if sr else 0.0)
                rows["rms"].append(rms)
                rows["zcr"].append(zcr)
                rows["peak"].append(int(np.abs(s64).max()) if n else 0)
                rows["checksum"].append(hashlib.md5(raw).hexdigest())
            out = pd.DataFrame(rows)
            for c, t in (("n_channels", "int32"), ("sample_rate", "int32"),
                         ("bits", "int32"), ("n_samples", "int64"),
                         ("peak", "int32")):
                out[c] = out[c].astype(t)
            yield out

    return df.select("media_id", "payload").mapInPandas(_decode, WAV_DECODED_SCHEMA)


def synth_wav_payloads(
    df: DataFrame, id_col: str = "doc_id", sample_rate: int = 8000
) -> DataFrame:
    """Deterministic synthetic audio attached per row: sample i of row
    id is ((id*7919 + i*31) % 65536) - 32768, n_samples = 100 + id%50 —
    arithmetic simple enough that a SQL oracle can recompute the
    decoded features independently, which is what upgrades the WAV
    codec from 'tested' to 'oracle-checked'. Generation runs in the
    same Arrow-batched shape real ingestion would (mapInPandas)."""

    def _gen(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        import numpy as np

        for pdf in batches:
            ids, payloads = [], []
            for mid in pdf[id_col]:
                mid = int(mid)
                n = 100 + mid % 50
                i = np.arange(n, dtype=np.int64)
                s = ((mid * 7919 + i * 31) % 65536) - 32768
                ids.append(mid)
                payloads.append(encode_wav(sample_rate, s))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    return df.select(id_col).mapInPandas(_gen, "media_id long, payload binary")


def synth_image_payloads(
    df: DataFrame,
    id_col: str = "doc_id",
    formats: tuple[str, ...] = ("ppm",),
    size: int = 16,
) -> DataFrame:
    """Deterministic synthetic images attached per row, one payload per
    requested format: pixel byte k of row id is (id·31 + k·7) mod 256
    — arithmetic simple enough that a SQL oracle can recompute the
    DECODED raster independently (the q91 WAV pattern), which is what
    upgrades the PNG codec from round-trip-tested to oracle-checked
    (PNG is lossless, so decode(encode(raster)) == raster exactly).
    media_id = id·len(formats) + format_index so each encoding of the
    same picture is its own row. formats ⊆ {'ppm','png','jpeg'}
    (operators/imagecodec). Arrow-batched mapInPandas, same plumbing
    real payload ingestion uses."""
    bad = set(formats) - {"ppm", "png", "jpeg"}
    if bad or not formats:
        raise ValueError(f"unsupported formats {sorted(bad)}")

    def _gen(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        import numpy as np

        from sales_data_pipeline_spark.operators.imagecodec import (
            encode_jpeg_baseline,
            encode_png,
        )

        n = len(formats)
        k = np.arange(size * size * 3, dtype=np.int64)
        for pdf in batches:
            ids, payloads = [], []
            for mid in pdf[id_col]:
                mid = int(mid)
                rgb = ((mid * 31 + k * 7) % 256).astype(np.uint8).tobytes()
                for j, fmt in enumerate(formats):
                    if fmt == "ppm":
                        p = encode_ppm(size, size, rgb)
                    elif fmt == "png":
                        p = encode_png(size, size, rgb)
                    else:
                        p = encode_jpeg_baseline(
                            np.frombuffer(rgb, dtype=np.uint8).reshape(
                                size, size, 3
                            ),
                            quality=95,
                        )
                    ids.append(mid * n + j)
                    payloads.append(p)
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    return df.select(id_col).mapInPandas(_gen, "media_id long, payload binary")


SPECTRAL_SCHEMA = (
    "media_id long, n_samples long, dominant_hz double, "
    "spectral_centroid_hz double, rolloff85_hz double, total_power double"
)


def audio_spectral_features(df: DataFrame) -> DataFrame:
    """Frequency-domain audio features via numpy's real FFT — the
    operator class where the Pandas-UDF escape hatch is GENUINELY
    required: a Fourier transform is not expressible in Spark's SQL
    expression algebra at any contortion, so this is Arrow-batched
    mapInPandas running vectorized numpy per batch (never per-row
    Python). Features per clip, from the one-sided power spectrum
    |rfft(x)|² with the DC bin excluded:

    - dominant_hz: frequency of the max-power bin (ties → lowest bin);
    - spectral_centroid_hz: power-weighted mean frequency (the
      'brightness' feature);
    - rolloff85_hz: lowest frequency below which 85% of total power
      lies (cumulative-power order statistic);
    - total_power: Σ|X_k|² over the non-DC bins.

    Deterministic for a given numpy build (same bytes → same floats —
    asserted against a local numpy reference in tests, the covering
    check since no SQL engine can recompute an FFT). Complements
    decode_wav's time-domain features; same input contract
    (media_id, payload RIFF/PCM16)."""

    def _spectral(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        import numpy as np

        for pdf in batches:
            rows = {k: [] for k in (
                "media_id", "n_samples", "dominant_hz",
                "spectral_centroid_hz", "rolloff85_hz", "total_power",
            )}
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                _, sr, _, s = _wav_parse(bytes(b))
                n = len(s)
                spec = np.abs(np.fft.rfft(s.astype(np.float64))) ** 2
                power = spec[1:]  # drop DC: constant offset is not pitch
                freqs = np.fft.rfftfreq(n, d=1.0 / sr)[1:]
                tot = float(power.sum())
                if tot > 0:
                    dom = float(freqs[int(power.argmax())])
                    centroid = float((freqs * power).sum() / tot)
                    cum = np.cumsum(power)
                    rolloff = float(freqs[int(np.searchsorted(cum, 0.85 * tot))])
                else:
                    dom = centroid = rolloff = 0.0
                rows["media_id"].append(mid)
                rows["n_samples"].append(n)
                rows["dominant_hz"].append(dom)
                rows["spectral_centroid_hz"].append(centroid)
                rows["rolloff85_hz"].append(rolloff)
                rows["total_power"].append(tot)
            out = pd.DataFrame(rows)
            out["n_samples"] = out["n_samples"].astype("int64")
            yield out

    return df.select("media_id", "payload").mapInPandas(_spectral, SPECTRAL_SCHEMA)


# ---------------------------------------------------------------------------
# perceptual hashing — image near-dup detection
# ---------------------------------------------------------------------------

AHASH_SCHEMA = "media_id long, ahash long, ahash_hex string"


def image_ahash(df: DataFrame, grid: int = 8) -> DataFrame:
    """Average-hash (aHash) perceptual fingerprint per image — the
    classic public perceptual-hash recipe: grayscale → downsample to
    ``grid×grid`` block means → threshold each cell at the global mean
    → pack row-major into a 64-bit signature. Two images whose hashes
    differ in few bits are visually near-identical even when their
    BYTES differ everywhere (re-encode, brightness shift), which is
    exactly the duplicate class byte-level dedup (q21/q90) cannot see
    — the image-side analogue of MinHash-for-text.

    Input rows: (media_id long, payload binary) in ANY in-sandbox
    image format — P6/PPM, PNG, or baseline JPEG, dispatched by magic
    bytes (operators/imagecodec.decode_image_rgb), so re-encodes of
    the same picture across FORMATS hash identically (PNG is lossless:
    bit-equal to the PPM original; JPEG lands within a few hash bits).
    Arrow-batched mapInPandas, numpy end to end; all post-decode
    arithmetic INTEGER (luma = (299R+587G+114B)//1000, block means via
    exact integer division, threshold strictly-greater-than the
    integer mean of cell means) — bit-for-bit reproducible anywhere,
    property the covering pure-python reference test pins. Map-only:
    no shuffle; at 100 TB the cost is the payload scan itself and
    column pruning keeps the 64-bit signatures as the only thing that
    travels onward."""

    def _hash(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        import numpy as np

        from sales_data_pipeline_spark.operators.imagecodec import (
            decode_image_rgb,
        )

        for pdf in batches:
            ids, hashes, hexes = [], [], []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(b)
                w, h, px = decode_image_rgb(raw)
                px = px.astype(np.int64)
                luma = (299 * px[:, :, 0] + 587 * px[:, :, 1] + 114 * px[:, :, 2]) // 1000
                # integer block means over a grid×grid partition of the
                # image (blocks cover the whole image, ragged at edges)
                ys = [h * i // grid for i in range(grid + 1)]
                xs = [w * i // grid for i in range(grid + 1)]
                cells = np.empty((grid, grid), dtype=np.int64)
                for i in range(grid):
                    for j in range(grid):
                        blk = luma[ys[i]:ys[i + 1], xs[j]:xs[j + 1]]
                        cells[i, j] = int(blk.sum()) // max(blk.size, 1)
                thresh = int(cells.sum()) // (grid * grid)
                bits = (cells > thresh).flatten()
                v = 0
                for bit in bits:
                    v = (v << 1) | int(bit)
                signed = v - (1 << 64) if v >= (1 << 63) else v
                ids.append(mid)
                hashes.append(signed)
                hexes.append(f"{v:016x}")
            yield pd.DataFrame(
                {"media_id": ids, "ahash": hashes, "ahash_hex": hexes}
            )

    return df.select("media_id", "payload").mapInPandas(_hash, AHASH_SCHEMA)


def ahash_near_pairs(hashes: DataFrame, max_hamming: int = 6) -> DataFrame:
    """All image pairs whose aHash Hamming distance ≤ ``max_hamming``,
    WITHOUT an all-pairs compare: pigeonhole blocking — split the 64
    bits into ``max_hamming+1`` blocks; two hashes within distance k
    must agree EXACTLY on ≥1 block (k flips cannot touch k+1 blocks),
    so candidates come from equi-joins on (block_no, block_value) and
    only candidates pay the popcount verify — the same guarantee-
    preserving trick as SimHash text blocking (operators/dedup.py).
    Exact, no recall loss. Verify is codegen bit_count(a^b); dedup of
    multi-block collisions via min block_no claim (exactly-once, no
    distinct over pairs). Input: (media_id, ahash) from image_ahash.
    Returns (media_a, media_b, hamming), media_a < media_b."""
    if not 0 <= max_hamming <= 31:
        # 33+ blocks of a 64-bit hash give 1-bit blocks — every hash
        # collides somewhere and the "blocking" is a cross join
        raise ValueError(f"max_hamming must be in [0, 31], got {max_hamming}")
    n_blocks = max_hamming + 1
    width = 64 // n_blocks
    blocks = []
    h = hashes.select("media_id", "ahash")
    for b in range(n_blocks):
        lo = b * width
        w = 64 - lo if b == n_blocks - 1 else width
        # the full-width mask (1<<64)-1 overflows BIGINT and parses as
        # DECIMAL(20,0), which `&` rejects — -1L is the same bit pattern
        mask = "-1L" if w >= 64 else str((1 << w) - 1)
        blocks.append(
            h.select(
                "media_id",
                "ahash",
                F.lit(b).alias("block_no"),
                F.expr(f"(ahash >> {lo}) & {mask}").alias("block_val"),
            )
        )
    from functools import reduce

    stacked = reduce(DataFrame.unionByName, blocks)
    a = stacked.select(
        F.col("media_id").alias("media_a"),
        F.col("ahash").alias("ha"),
        "block_no",
        "block_val",
    )
    b_ = stacked.select(
        F.col("media_id").alias("media_b"),
        F.col("ahash").alias("hb"),
        "block_no",
        "block_val",
    )
    cand = a.join(b_, ["block_no", "block_val"]).filter(
        F.col("media_a") < F.col("media_b")
    )
    verified = cand.withColumn(
        "hamming", F.bit_count(F.expr("ha ^ hb"))
    ).filter(F.col("hamming") <= max_hamming)
    # exactly-once: the pair is claimed by its lowest agreeing block
    from pyspark.sql.window import Window

    w_min = F.min("block_no").over(Window.partitionBy("media_a", "media_b"))
    return (
        verified.withColumn("__m", w_min)
        .filter(F.col("block_no") == F.col("__m"))
        .select("media_a", "media_b", "hamming")
    )
