"""Progressive (SOF2) JPEG encode/decode — ITU T.81 Annex G Huffman
variant, libjpeg's standard scan script.

The load-bearing property: progressive JPEG carries the SAME quantized
coefficients as baseline, just delivered across scans — so decoding the
progressive bytes must equal decoding the baseline bytes EXACTLY (every
pixel, every config). Any error in the successive-approximation
bookkeeping (EOB runs, correction bits, point transforms) breaks the
equality somewhere in the random matrix below."""

from __future__ import annotations

import numpy as np
import pytest

from mb_crdb_cdc_dlgen2_synapse_spark.operators import codecs


def _rand(h, w, c, seed):
    rng = np.random.default_rng(seed)
    if c == 1:
        return rng.integers(0, 256, (h, w), dtype=np.uint8)
    return rng.integers(0, 256, (h, w, c), dtype=np.uint8)


def _smooth(h, w, c, seed):
    """Low-frequency content: exercises long EOB runs across blocks."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (
        128
        + 100 * np.sin(yy / (4 + rng.integers(1, 9)))
        * np.cos(xx / (4 + rng.integers(1, 9)))
    )
    a = np.clip(base, 0, 255).astype(np.uint8)
    if c == 3:
        a = np.stack([a, np.roll(a, 3, 0), np.roll(a, 5, 1)], axis=2)
    return a


@pytest.mark.parametrize("quality", [100, 90, 50, 10])
@pytest.mark.parametrize(
    "shape", [(8, 8, 1), (16, 16, 3), (17, 23, 3), (24, 40, 1), (9, 9, 3)]
)
def test_progressive_equals_baseline_decode(quality, shape):
    h, w, c = shape
    for maker, seed in ((_rand, 1), (_smooth, 2)):
        img = maker(h, w, c, seed)
        base = codecs.decode_jpeg(codecs.encode_jpeg(img, quality))
        prog_bytes = codecs.encode_jpeg_progressive(img, quality)
        prog = codecs.decode_jpeg(prog_bytes)
        assert prog.shape == base.shape
        assert np.array_equal(prog, base), (
            f"progressive != baseline at q={quality} shape={shape}"
        )


@pytest.mark.parametrize("quality", [90, 35])
def test_progressive_subsampled_420(quality):
    """4:2:0 progressive: interleaved DC scan mixes 2x2 Y blocks with 1x1
    chroma; the Y AC scans are non-interleaved over Y's OWN block dims
    (not the MCU-padded grid) — the dims mismatch T.81 A.2.2 exists for."""
    for hw in [(32, 32), (17, 33), (40, 24)]:
        img = _smooth(hw[0], hw[1], 3, 9)
        base = codecs.decode_jpeg(
            codecs.encode_jpeg(img, quality, subsample=True)
        )
        prog = codecs.decode_jpeg(
            codecs.encode_jpeg_progressive(img, quality, subsample=True)
        )
        assert np.array_equal(prog, base)


def test_progressive_header_is_sof2_with_multiple_scans():
    data = codecs.encode_jpeg_progressive(_rand(16, 16, 3, 3), 80)
    assert b"\xff\xc2" in data and b"\xff\xc0" not in data
    assert data.count(b"\xff\xda") == 10  # libjpeg standard color script


def test_progressive_random_soak():
    """Many seeds/sizes/qualities: the refinement encoder/decoder pair has
    rare paths (ZRL inside refinement, EOBRUN flush at 0x7FFF, correction
    bits after the last new coef) that only random content reaches."""
    rng = np.random.default_rng(0)
    for trial in range(12):
        h = int(rng.integers(8, 49))
        w = int(rng.integers(8, 49))
        c = int(rng.choice([1, 3]))
        q = int(rng.integers(5, 101))
        img = _rand(h, w, c, 100 + trial)
        base = codecs.decode_jpeg(codecs.encode_jpeg(img, q))
        prog = codecs.decode_jpeg(codecs.encode_jpeg_progressive(img, q))
        assert np.array_equal(prog, base), (h, w, c, q)


def test_baseline_quality50_dequantizes_exactly():
    """Regression pin for the zigzag/raster dequantization-order bug: at
    quality<100 the decoder must reproduce the independently-computed
    round(DCT/Q)*Q reconstruction bit-exactly (the bug multiplied
    scan-ordered coefs by raster-ordered quant values — up to 161 levels
    of error that quality-100 tests cannot see)."""
    img = _rand(16, 16, 1, 7)
    got = codecs.decode_jpeg(codecs.encode_jpeg(img, quality=50)).squeeze()
    ql, _ = codecs._quality_tables(50)
    qt = ql.reshape(8, 8).astype(np.float64)
    C = codecs._DCT_C
    ref = np.zeros((16, 16))
    for by in range(2):
        for bx in range(2):
            b = img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
            q = np.round((C @ b @ C.T) / qt)
            ref[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                C.T @ (q * qt) @ C + 128.0
            )
    ref = np.clip(np.round(ref), 0, 255).astype(np.uint8)
    assert np.array_equal(got, ref)


def test_baseline_restart_markers_still_roundtrip():
    """DRI/RST interacts with the refactored scan loop (restart resets DC
    predictors and byte-aligns): pin the restart path post-refactor."""
    img = _rand(32, 24, 3, 11)
    data = codecs.encode_jpeg(img, 85, restart_interval=3)
    assert b"\xff\xd0" in data
    assert np.array_equal(
        codecs.decode_jpeg(data), codecs.decode_jpeg(codecs.encode_jpeg(img, 85))
    )
