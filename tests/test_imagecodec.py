"""Covering tests for the pure-Python image codecs
(operators/imagecodec.py) — the tests the module docstring promises.

PNG: lossless round-trip, hand-built fixtures that force every
scanline filter type (the encoder only ever emits filter 0, so the
decoder's Sub/Up/Average/Paeth reconstruction is reachable only via
fixtures) and every supported color type (grey / RGB / grey+alpha /
RGBA), plus the loud-failure contract (CRC, truncation, unsupported
profiles).

JPEG: round-trip error bounds over a quality x subsampling x
restart_interval grid on a smooth gradient (bounds calibrated against
this deterministic pure-Python implementation — every value is a pure
function of the input bytes, so tight bounds are safe), closed-form
flat-DC cases where the decoded value is computable by hand, restart
markers, grayscale scan, and the non-baseline/garbage rejection paths.

Dispatcher: magic-byte routing incl. the 16-bit-PPM loud gate, and the
exhaustive 256-residue proof behind q234's exact oracle (the synthetic
raster (doc_id*31 + k*7) mod 256 has exactly 256 distinct images, so
checking every residue proves the PPM<->JPEG ahash hamming bound for
EVERY possible doc_id).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from sales_data_pipeline_spark.operators.imagecodec import (
    _paeth,
    _png_chunk,
    _PNG_SIG,
    _QT_LUMA,
    _quality_scale,
    decode_image_rgb,
    decode_jpeg_baseline,
    decode_png,
    encode_jpeg_baseline,
    encode_png,
)

# ---------------------------------------------------------------------------
# deterministic rasters
# ---------------------------------------------------------------------------


def _gradient(h: int, w: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    r = (yy * 255 // max(h - 1, 1)).astype(np.uint8)
    g = (xx * 255 // max(w - 1, 1)).astype(np.uint8)
    b = ((yy + xx) * 255 // max(h + w - 2, 1)).astype(np.uint8)
    return np.stack([r, g, b], axis=2)


def _noise(h: int, w: int, nch: int = 3, seed: int = 7) -> np.ndarray:
    # deterministic "random" bytes without Random: LCG over a counter
    k = np.arange(h * w * nch, dtype=np.int64)
    return ((seed * 2654435761 + k * 40503) % 256).astype(np.uint8).reshape(
        h, w, nch
    )


# ---------------------------------------------------------------------------
# PNG: round-trip + forced-filter + color-type fixtures
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("h,w", [(1, 1), (3, 5), (16, 16), (9, 17)])
def test_png_roundtrip_lossless(h, w):
    rgb = _noise(h, w)
    dec_w, dec_h, out = decode_png(encode_png(w, h, rgb.tobytes()))
    assert (dec_w, dec_h) == (w, h)
    assert np.array_equal(out, rgb)


def _filter_row(cur, prev, ft, bpp):
    """Apply the FORWARD PNG filter `ft` to one scanline (int arrays),
    returning the filtered bytes — the inverse of what the decoder
    reconstructs."""
    n = len(cur)
    out = np.empty(n, dtype=np.int32)
    for x in range(n):
        a = int(cur[x - bpp]) if x >= bpp else 0
        b = int(prev[x])
        c = int(prev[x - bpp]) if x >= bpp else 0
        if ft == 0:
            out[x] = cur[x]
        elif ft == 1:
            out[x] = cur[x] - a
        elif ft == 2:
            out[x] = cur[x] - b
        elif ft == 3:
            out[x] = cur[x] - ((a + b) >> 1)
        else:
            out[x] = cur[x] - _paeth(a, b, c)
    return (out & 0xFF).astype(np.uint8)


def _build_png(px: np.ndarray, color_type: int, filters: list[int]) -> bytes:
    """Hand-built PNG with a CHOSEN filter type per scanline — the
    encoder never emits filters 1-4, so decoder coverage needs these."""
    h, w, nch = px.shape
    stride = w * nch
    flat = px.reshape(h, stride).astype(np.int32)
    zero = np.zeros(stride, dtype=np.int32)
    raw = bytearray()
    for y in range(h):
        prev = flat[y - 1] if y else zero
        raw.append(filters[y])
        raw += _filter_row(flat[y], prev, filters[y], nch).tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ft", [1, 2, 3, 4])
def test_png_single_filter_type_reconstructs(ft):
    """Every scanline carries the same non-zero filter type; the
    decoder must reconstruct the original raster exactly (these code
    paths are the sequential recurrences — unreachable from our own
    encoder's output)."""
    rgb = _noise(12, 7, seed=ft)
    _, _, out = decode_png(_build_png(rgb, 2, [ft] * 12))
    assert np.array_equal(out, rgb)


def test_png_mixed_filter_types_reconstruct():
    """Filter types vary per row (the layout real optimizing encoders
    emit): Up/Paeth rows depend on the PREVIOUS row's reconstruction,
    so this catches cross-row state bugs a single-filter image hides."""
    rgb = _noise(10, 9, seed=99)
    filters = [0, 1, 2, 3, 4, 4, 3, 2, 1, 0]
    _, _, out = decode_png(_build_png(rgb, 2, filters))
    assert np.array_equal(out, rgb)


@pytest.mark.parametrize(
    "color_type,nch",
    [(0, 1), (2, 3), (4, 2), (6, 4)],
)
def test_png_color_type_matrix(color_type, nch):
    """Grey replicates to 3 channels, alpha is dropped, RGB passes
    through — across all four supported color types, with non-zero
    filters so the per-channel bpp offsets are exercised too."""
    h, w = 8, 6
    px = _noise(h, w, nch=nch, seed=color_type + 1)
    filters = [0, 1, 2, 3, 4, 1, 3, 4]
    dec_w, dec_h, out = decode_png(_build_png(px, color_type, filters))
    assert (dec_w, dec_h) == (w, h)
    if color_type == 0:
        want = np.repeat(px, 3, axis=2)
    elif color_type == 2:
        want = px
    elif color_type == 4:
        want = np.repeat(px[:, :, :1], 3, axis=2)
    else:
        want = px[:, :, :3]
    assert np.array_equal(out, want)


def test_png_bad_crc_raises():
    raw = bytearray(encode_png(4, 4, _noise(4, 4).tobytes()))
    # flip a bit inside the IDAT body (after sig+IHDR chunk: 8+25=33,
    # IDAT header is 8 bytes)
    raw[33 + 8 + 2] ^= 0x01
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(raw))


def test_png_truncation_and_profile_gates():
    good = encode_png(4, 4, _noise(4, 4).tobytes())
    with pytest.raises(ValueError):
        decode_png(good[:40])  # truncated chunk
    with pytest.raises(ValueError):
        decode_png(b"\x89PNG\r\n\x1a\njunk")  # missing IHDR/IDAT
    # 16-bit depth: rebuild IHDR with depth=16
    ihdr = struct.pack(">IIBBBBB", 4, 4, 16, 2, 0, 0, 0)
    bad_depth = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"\x00" * (4 * (1 + 4 * 6))))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError, match="depth"):
        decode_png(bad_depth)
    # Adam7 interlace
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 1)
    interlaced = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"\x00" * (4 * 13)))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError, match="interlacing"):
        decode_png(interlaced)


# ---------------------------------------------------------------------------
# JPEG: round-trip bounds, closed-form DC, restart, grayscale, gates
# ---------------------------------------------------------------------------

# max-abs-error bounds per (quality, subsampling), calibrated with
# margin on the deterministic gradient below (observed: q50/444 7,
# q50/420 14, q85/444 4, q85/420 8, q95/444 2, q95/420 7)
_BOUNDS = {
    (50, "444"): 12,
    (50, "420"): 20,
    (85, "444"): 8,
    (85, "420"): 14,
    (95, "444"): 5,
    (95, "420"): 12,
}


@pytest.mark.parametrize("quality", [50, 85, 95])
@pytest.mark.parametrize("subsampling", ["444", "420"])
@pytest.mark.parametrize("restart", [0, 2])
def test_jpeg_roundtrip_error_bound(quality, subsampling, restart):
    """encode -> decode stays within a calibrated max-abs-error bound
    on a smooth gradient, across the full quality x sampling x restart
    grid — the docstring's promised round-trip coverage. 32x48 spans
    multiple MCUs in both dimensions for both samplings."""
    img = _gradient(32, 48)
    enc = encode_jpeg_baseline(
        img, quality=quality, subsampling=subsampling, restart_interval=restart
    )
    w, h, dec = decode_jpeg_baseline(enc)
    assert (w, h) == (48, 32)
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.max() <= _BOUNDS[(quality, subsampling)], err.max()


def test_jpeg_quality_monotonicity():
    """Higher quality -> lower mean reconstruction error (the IJG
    scaling is wired through correctly)."""
    img = _gradient(32, 48)
    means = []
    for q in (50, 85, 95):
        _, _, dec = decode_jpeg_baseline(encode_jpeg_baseline(img, quality=q))
        means.append(np.abs(dec.astype(int) - img.astype(int)).mean())
    assert means[0] > means[1] > means[2]


@pytest.mark.parametrize(
    "v,quality,expected",
    [
        # verified closed-form: flat grey v -> only the luma DC survives
        # (chroma of r=g=b is exactly 128 -> DC 0), so the decoded
        # value is round(round(8*(v-128)/qt00)*qt00/8 + 128); values
        # chosen away from .5 rounding boundaries
        (37, 85, 37),
        (90, 50, 90),   # qt00=16 divides 8*(90-128) -> bit-exact
        (128, 50, 128),
        (200, 50, 200),
        (251, 95, 251),
    ],
)
def test_jpeg_flat_dc_closed_form(v, quality, expected):
    img = np.full((16, 16, 3), v, dtype=np.uint8)
    qt00 = int(_quality_scale(_QT_LUMA, quality)[0])
    closed_form = int(
        np.clip(
            np.round(np.round(8 * (v - 128.0) / qt00) * qt00 / 8.0 + 128.0),
            0,
            255,
        )
    )
    assert closed_form == expected  # the hand computation itself
    _, _, dec = decode_jpeg_baseline(encode_jpeg_baseline(img, quality=quality))
    uniq = np.unique(dec)
    assert len(uniq) == 1 and int(uniq[0]) == expected


def test_jpeg_restart_markers_present_and_equivalent():
    """restart_interval emits DRI + RSTn and resets DC predictors;
    the quantized coefficients are untouched, so the decode must be
    BIT-IDENTICAL to the no-restart stream."""
    img = _gradient(24, 40)
    plain = encode_jpeg_baseline(img, quality=85)
    rst = encode_jpeg_baseline(img, quality=85, restart_interval=2)
    assert b"\xff\xdd" in rst and b"\xff\xdd" not in plain  # DRI
    assert b"\xff\xd0" in rst  # RST0
    _, _, dec_plain = decode_jpeg_baseline(plain)
    _, _, dec_rst = decode_jpeg_baseline(rst)
    assert np.array_equal(dec_plain, dec_rst)


def test_jpeg_grayscale_scan():
    """gray=True emits a single-component scan; decode replicates the
    luma plane to 3 channels, within the luma-only error bound."""
    img = _gradient(16, 16)
    _, _, dec = decode_jpeg_baseline(encode_jpeg_baseline(img, quality=95, gray=True))
    assert dec.shape == (16, 16, 3)
    assert np.array_equal(dec[:, :, 0], dec[:, :, 1])
    assert np.array_equal(dec[:, :, 0], dec[:, :, 2])
    luma = (
        0.299 * img[:, :, 0] + 0.587 * img[:, :, 1] + 0.114 * img[:, :, 2]
    ).round()
    assert np.abs(dec[:, :, 0].astype(int) - luma.astype(int)).max() <= 5


def test_jpeg_non_baseline_and_garbage_raise():
    img = _gradient(8, 8)
    enc = encode_jpeg_baseline(img, quality=85)
    progressive = enc.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(NotImplementedError, match="SOF"):
        decode_jpeg_baseline(progressive)
    with pytest.raises(ValueError):
        decode_jpeg_baseline(b"\x00\x00not a jpeg")
    with pytest.raises(ValueError):
        decode_jpeg_baseline(b"\xff\xd8\xff\xda\x00\x04\x01\x00")  # no SOF


def test_jpeg_bad_input_shapes_rejected():
    with pytest.raises(ValueError, match="expects"):
        encode_jpeg_baseline(np.zeros((8, 8), dtype=np.uint8))
    with pytest.raises(ValueError, match="quality"):
        encode_jpeg_baseline(_gradient(8, 8), quality=0)
    with pytest.raises(ValueError, match="subsampling"):
        encode_jpeg_baseline(_gradient(8, 8), subsampling="422x")


# ---------------------------------------------------------------------------
# dispatcher + the q234 oracle's exhaustive-residue proof
# ---------------------------------------------------------------------------


def test_dispatcher_routes_by_magic():
    from sales_data_pipeline_spark.operators.multimodal import encode_ppm

    rgb = _noise(6, 5)
    for payload in (
        encode_ppm(5, 6, rgb.tobytes()),
        encode_png(5, 6, rgb.tobytes()),
    ):
        w, h, out = decode_image_rgb(payload)
        assert (w, h) == (5, 6) and np.array_equal(out, rgb)
    w, h, out = decode_image_rgb(encode_jpeg_baseline(rgb, quality=95))
    assert (w, h) == (5, 6)
    with pytest.raises(NotImplementedError, match="magic"):
        decode_image_rgb(b"GIF89a....")


def test_dispatcher_16bit_ppm_raises():
    """_ppm_header accepts maxval up to 65535 but only 8-bit rasters
    are decodable — anything else must be loud, not a garbage raster."""
    payload = b"P6\n2 2\n65535\n" + b"\x00" * 24
    with pytest.raises(NotImplementedError, match="maxval"):
        decode_image_rgb(payload)


def _ahash_bits(px: np.ndarray, grid: int = 8) -> np.ndarray:
    """Pure-python replica of operators/multimodal.image_ahash's
    integer arithmetic (the covering reference)."""
    px = px.astype(np.int64)
    h, w = px.shape[:2]
    luma = (299 * px[:, :, 0] + 587 * px[:, :, 1] + 114 * px[:, :, 2]) // 1000
    ys = [h * i // grid for i in range(grid + 1)]
    xs = [w * i // grid for i in range(grid + 1)]
    cells = np.empty((grid, grid), dtype=np.int64)
    for i in range(grid):
        for j in range(grid):
            blk = luma[ys[i] : ys[i + 1], xs[j] : xs[j + 1]]
            cells[i, j] = int(blk.sum()) // blk.size
    thr = int(cells.sum()) // (grid * grid)
    return (cells > thr).flatten()


def test_jpeg_ahash_hamming_bound_exhaustive_residues():
    """q234's oracle ('every doc's PPM<->JPEG re-encode pairs within
    hamming 6') proved EXHAUSTIVELY: the synthetic raster
    (doc_id*31 + k*7) mod 256 takes exactly 256 distinct values over
    all doc_ids (it depends on doc_id only through doc_id mod 256), so
    checking every residue at the catalog's quality=95 covers every
    possible document at any scale factor. Observed worst case is 3;
    the catalog bound 6 has 2x margin."""
    k = np.arange(16 * 16 * 3, dtype=np.int64)
    worst = 0
    for d in range(256):
        rgb = ((d * 31 + k * 7) % 256).astype(np.uint8).reshape(16, 16, 3)
        _, _, dec = decode_jpeg_baseline(encode_jpeg_baseline(rgb, quality=95))
        ham = int((_ahash_bits(rgb) != _ahash_bits(dec)).sum())
        worst = max(worst, ham)
    assert worst <= 6, worst


# ---------------------------------------------------------------------------
# property tests (hypothesis): lossless invariants over generated rasters
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_property(w, h, seed):
    """decode(encode(raster)) == raster for ANY dimensions and pixel
    content — the PNG losslessness contract, not just the golden
    cases."""
    rgb = _noise(h, w, seed=seed)
    dw, dh, out = decode_png(encode_png(w, h, rgb.tobytes()))
    assert (dw, dh) == (w, h)
    assert np.array_equal(out, rgb)


@settings(max_examples=10, deadline=None)
@given(
    w=st.integers(1, 20),
    h=st.integers(1, 20),
    seed=st.integers(0, 2**31 - 1),
    quality=st.sampled_from([50, 85, 95]),
)
def test_jpeg_decoder_total_on_own_encoder_property(w, h, seed, quality):
    """The decoder must accept EVERY stream the encoder can produce
    (any dims incl. non-multiple-of-8/16, any content, any quality)
    and return a raster of the right shape with bounded worst-case
    error (255 would mean a desynced entropy stream; random noise at
    q50 stays far below that)."""
    rgb = _noise(h, w, seed=seed)
    dw, dh, out = decode_jpeg_baseline(encode_jpeg_baseline(rgb, quality=quality))
    assert (dw, dh) == (w, h)
    assert out.shape == (h, w, 3)
    err = np.abs(out.astype(int) - rgb.astype(int))
    assert err.max() <= 200, err.max()  # desync guard, not a quality bound
