"""Pure-stdlib PNG/WAV codecs (operators/codecs.py) — the round-6 change
that made the multimodal decode stage REAL for the formats zlib/struct
can express. Round-trips across every PNG row filter and channel count,
malformed-input refusals, and the Spark decode stages end to end."""

from __future__ import annotations

import numpy as np
import pytest

from mb_crdb_cdc_dlgen2_synapse_spark.operators import codecs


def _img(h, w, c=None, seed=7):
    rng = np.random.default_rng(seed)
    shape = (h, w) if c is None else (h, w, c)
    return rng.integers(0, 256, size=shape, dtype=np.uint8)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("channels", [None, 2, 3, 4])
def test_png_roundtrip_all_filters_and_channels(filter_type, channels):
    a = _img(11, 17, channels, seed=filter_type * 10 + (channels or 1))
    data = codecs.encode_png(a, filter_type=filter_type)
    out = codecs.decode_png(data)
    expect = a if a.ndim == 3 else a[:, :, None]
    assert out.shape == expect.shape
    assert (out == expect).all()


def test_png_tiny_and_gradient_images():
    for arr in (
        np.zeros((1, 1), np.uint8),
        np.full((1, 5), 255, np.uint8),
        (np.add.outer(np.arange(9), np.arange(13)) % 251).astype(np.uint8),
    ):
        out = codecs.decode_png(codecs.encode_png(arr, filter_type=4))
        assert (out[:, :, 0] == arr).all()


def test_png_refusals():
    with pytest.raises(ValueError, match="signature"):
        codecs.decode_png(b"GIF89a not a png")
    # 16-bit depth refused honestly, not mis-decoded
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    fake = (
        b"\x89PNG\r\n\x1a\n"
        + codecs._chunk(b"IHDR", ihdr)
        + codecs._chunk(b"IDAT", zlib.compress(b"\x00" * 10))
        + codecs._chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError, match="bit depth"):
        codecs.decode_png(fake)


def test_wav_roundtrip_and_refusals():
    s = (np.sin(np.linspace(0, 20, 1600)) * 20000).astype(np.int16)
    rate, out = codecs.decode_wav(codecs.encode_wav(s, 8000))
    assert rate == 8000 and (out == s).all()
    with pytest.raises(ValueError, match="RIFF"):
        codecs.decode_wav(b"not audio at all")


def test_decode_image_real_runs_on_spark(spark, sf_dir):
    """The formerly-stubbed entry point decodes real PNG bytes through
    mapInPandas, and the stats agree with the closed-form pixel rule."""
    from pyspark.sql import functions as F

    from mb_crdb_cdc_dlgen2_synapse_spark.operators import multimodal
    from mb_crdb_cdc_dlgen2_synapse_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    media = multimodal.synthetic_png_media(docs, limit=50)
    got = {r.media_id: r for r in multimodal.decode_image_real(media).collect()}
    assert len(got) == 50
    for did, r in got.items():
        w, h = did % 13 + 4, did % 7 + 4
        assert (r.width, r.height, r.channels) == (w, h, 1)
        grid = (np.add.outer(np.arange(h), np.arange(w)) + did) % 251
        assert r.mean_px == grid.sum() / grid.size  # exact int sums in f64
        assert r.max_px == grid.max()
    # non-PNG mime hits the honest NotImplementedError boundary
    fake = media.withColumn("mime", F.lit("image/jpeg"))
    with pytest.raises(Exception, match="external codec|NotImplementedError"):
        multimodal.decode_image_real(fake).collect()


def test_decode_audio_real_runs_on_spark(spark):
    import pandas as pd
    from pyspark.sql import types as T

    from mb_crdb_cdc_dlgen2_synapse_spark.operators import multimodal

    rows = []
    for i in range(5):
        s = (np.arange(800 + i * 10) % 97 * 100).astype(np.int16)
        rows.append((i, bytearray(codecs.encode_wav(s, 16000)), "audio/wav"))
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("mime", T.StringType()),
        ]
    )
    media = spark.createDataFrame(rows, schema)
    got = {r.media_id: r for r in multimodal.decode_audio_real(media).collect()}
    for i in range(5):
        n = 800 + i * 10
        assert got[i].sample_rate == 16000
        assert got[i].n_samples == n
        assert got[i].duration_ms == n * 1000 // 16000
        assert got[i].peak == 9600
