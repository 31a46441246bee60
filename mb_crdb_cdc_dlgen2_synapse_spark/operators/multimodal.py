"""Multimodal column handling (SURVEY.md §2.8 X5): image/audio/video as
opaque ``binary`` columns with typed metadata, plus the Pandas-UDF plumbing
for decode / feature-extract stages.

Decode status (round 6): PNG, baseline JPEG, and WAV decode are REAL —
pure stdlib+numpy codecs (operators/codecs.py: zlib inflate + all five
PNG row filters; baseline-DCT JPEG with table-driven Huffman, any
sampling factors, restart markers; RIFF walk + PCM16), value-oracled
through ``synthetic_png_media``/``synthetic_jpeg_media`` ->
``decode_image_real``. Formats that genuinely need an external library
(H.264, progressive JPEG, ...) still raise NotImplementedError at the
exact per-batch point the codec call would go, and
``decode_image_features`` keeps the deterministic fake for plumbing
tests. Everything Spark-side — schema, Arrow batch shape,
``mapInPandas`` signature, partition behavior — is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: payload + typed metadata: the lake-side layout for multimodal data.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("meta", T.StructType(
            [
                T.StructField("width", T.IntegerType(), True),
                T.StructField("height", T.IntegerType(), True),
                T.StructField("duration_ms", T.LongType(), True),
            ]
        ), True),
    ]
)


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Derive a media table from ``documents``: the text payload encoded as
    binary stands in for an image blob (deterministic; real pipelines read
    binary files via ``spark.read.format('binaryFile')``)."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
    )


def media_stats(media: DataFrame) -> DataFrame:
    """Binary-column analytics without decoding: size + content digest.
    Operates on BinaryType directly — the cheap metadata pass that should
    always run before any decode stage at scale."""
    return media.select(
        "media_id",
        F.octet_length("payload").alias("n_bytes"),
        F.sha2("payload", 256).alias("digest"),
    )


_FEATURE_DIM = 8

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("features", T.ArrayType(T.DoubleType()), True),
    ]
)


def _fake_decode(payload: bytes) -> list[float]:
    """Deterministic stand-in for a codec+model feature extractor."""
    h = hashlib.sha256(payload).digest()
    return [int.from_bytes(h[i * 4 : i * 4 + 4], "big") / 2**32 for i in range(_FEATURE_DIM)]


def decode_image_features(media: DataFrame, max_partitions: int | None = None) -> DataFrame:
    """X5 decode/feature stage: Arrow-batched ``mapInPandas`` over binary
    payloads — the real plumbing (batch iterator in, batch iterator out;
    one Python worker per partition; no row-at-a-time serialization).

    ``max_partitions``: by default the decode inherits the input partitioning,
    which is correct on a cluster — a heavy codec at 100 TB wants every
    executor decoding, never an artificial cap. Pass a small cap ONLY for
    cheap decodes on small local inputs, where Python-worker startup is the
    dominant fixed cost (measured here: 16 parts 2 s vs 32 parts 14 s on the
    same tiny data — the local bench uses 16).

    Swap ``_fake_decode`` for a real codec (PIL/ffmpeg/torch) in a container
    that has one; the Spark side is unchanged.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(len),
                    "features": pdf["payload"].map(_fake_decode),
                }
            )

    src = media.select("media_id", "payload")
    if max_partitions is not None:
        src = src.repartition(
            min(src.sparkSession.sparkContext.defaultParallelism, max_partitions)
        )
    return src.mapInPandas(batches, FEATURE_SCHEMA)


IMAGE_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("mean_px", T.DoubleType(), True),
        T.StructField("max_px", T.IntegerType(), True),
    ]
)


def decode_image_real(media: DataFrame) -> DataFrame:
    """REAL image decode — no longer a stub for PNG or JPEG: the
    pure-stdlib codecs (operators/codecs.decode_png — zlib + numpy, all
    five row filters; operators/codecs.decode_jpeg — table-driven
    Huffman + IDCT, baseline SOF0 AND progressive SOF2 multi-scan, any
    sampling factors, restart markers) decode ``image/png`` /
    ``image/jpeg`` payloads inside the Arrow-batched ``mapInPandas``
    stage and emit shape + pixel statistics. PNG means are
    exact-in-float64 (lossless codec, integer pixel sums < 2^53) and
    value-oracle-able against a closed-form SQL twin; JPEG shape is exact
    and means land within the quantization error bound the gate asserts.
    Other mimes (H.264, ...) raise NotImplementedError at the same
    per-batch point — the honest boundary."""
    from . import codecs

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload, mime in zip(
                pdf["media_id"], pdf["payload"], pdf["mime"]
            ):
                if mime == "image/png":
                    arr = codecs.decode_png(bytes(payload))
                elif mime == "image/jpeg":
                    arr = codecs.decode_jpeg(bytes(payload))
                else:
                    raise NotImplementedError(
                        f"decode for mime {mime!r} needs an external codec "
                        "(PIL/ffmpeg); image/png and image/jpeg (baseline "
                        "+ progressive) decode stdlib-pure"
                    )
                rows.append(
                    (
                        mid,
                        arr.shape[1],
                        arr.shape[0],
                        arr.shape[2],
                        float(arr.astype("int64").sum())
                        / float(arr.size),
                        int(arr.max()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height", "channels",
                    "mean_px", "max_px",
                ],
            )

    return media.select("media_id", "payload", "mime").mapInPandas(
        batches, IMAGE_DECODE_SCHEMA
    )


AUDIO_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("peak", T.IntegerType(), True),
    ]
)


def decode_audio_real(media: DataFrame) -> DataFrame:
    """REAL audio decode for ``audio/wav`` PCM16 payloads (RIFF walk +
    numpy frombuffer — operators/codecs.decode_wav): sample rate, length,
    duration, integer peak. Same Arrow batch shape as the image stage."""
    from . import codecs

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload, mime in zip(
                pdf["media_id"], pdf["payload"], pdf["mime"]
            ):
                if mime != "audio/wav":
                    raise NotImplementedError(
                        f"decode for mime {mime!r} needs an external codec"
                    )
                rate, samples = codecs.decode_wav(bytes(payload))
                rows.append(
                    (
                        mid,
                        rate,
                        int(samples.shape[0]),
                        int(samples.shape[0] * 1000 // rate),
                        int(np.abs(samples.astype("int32")).max())
                        if samples.size
                        else 0,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "sample_rate", "n_samples",
                    "duration_ms", "peak",
                ],
            )

    return media.select("media_id", "payload", "mime").mapInPandas(
        batches, AUDIO_DECODE_SCHEMA
    )


def synthetic_png_media(documents: DataFrame, limit: int = 300) -> DataFrame:
    """Deterministic PNG fixture derived from the documents table: doc_id
    keys a (h, w) grayscale image with pixel(y, x) = (x + y + doc_id) %
    251 — a closed form BOTH engines can aggregate, which is what makes
    the decode stage value-oracle-able (mean over exact integer sums).
    Encoding runs in the same Arrow-batched stage shape as decoding, with
    the PNG row filter cycling over all five types by doc_id — and every
    sixth image Adam7-INTERLACED — so the decoder's every unfilter path
    and the interlace scatter are exercised in the gate itself."""
    from . import codecs

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for did in pdf["doc_id"]:
                w = int(did) % 13 + 4
                h = int(did) % 7 + 4
                y, x = np.mgrid[0:h, 0:w]
                arr = ((x + y + int(did)) % 251).astype(np.uint8)
                payloads.append(
                    codecs.encode_png(
                        arr,
                        filter_type=int(did) % 5,
                        interlace=int(did) % 6 == 0,
                    )
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "payload": payloads,
                    "mime": "image/png",
                }
            )

    src = documents.select("doc_id").filter(F.col("doc_id") < limit)
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), True),
            T.StructField("mime", T.StringType(), True),
        ]
    )
    return src.mapInPandas(batches, out_schema)


def synthetic_wav_media(documents: DataFrame, limit: int = 300) -> DataFrame:
    """Deterministic PCM16 WAV fixture keyed by doc_id: n = 400 +
    (doc_id % 5)·100 samples at 8 kHz with sample(i) = (doc_id·7 +
    i·13) % 241 − 120 — a closed form BOTH engines can aggregate, so the
    encode→decode→feature path is value-oracle-able with exact integer
    sums. Same Arrow batch shape as the image fixtures."""
    from . import codecs

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for did in pdf["doc_id"]:
                n = 400 + int(did) % 5 * 100
                i = np.arange(n, dtype=np.int64)
                samples = ((int(did) * 7 + i * 13) % 241 - 120).astype(np.int16)
                payloads.append(codecs.encode_wav(samples, sample_rate=8000))
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "payload": payloads,
                    "mime": "audio/wav",
                }
            )

    src = documents.select("doc_id").filter(F.col("doc_id") < limit)
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), True),
            T.StructField("mime", T.StringType(), True),
        ]
    )
    return src.mapInPandas(batches, out_schema)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_samples", T.IntegerType(), True),
        T.StructField("sum_sq", T.LongType(), True),
        T.StructField("zero_crossings", T.IntegerType(), True),
        T.StructField("peak", T.IntegerType(), True),
    ]
)


def decode_audio_features(media: DataFrame) -> DataFrame:
    """REAL audio decode + frame features over PCM16 WAV payloads: total
    energy (exact int64 sum of squares), zero crossings (adjacent pairs
    with strictly opposite signs — s[i]·s[i+1] < 0), integer peak. All
    integer-exact, so the whole decode+feature path value-oracles with no
    tolerance. Arrow-batched ``mapInPandas``; numpy vector ops per batch,
    never per sample."""
    from . import codecs

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload, mime in zip(
                pdf["media_id"], pdf["payload"], pdf["mime"]
            ):
                if mime != "audio/wav":
                    raise NotImplementedError(
                        f"decode for mime {mime!r} needs an external codec"
                    )
                rate, samples = codecs.decode_wav(bytes(payload))
                s = samples.astype(np.int64)
                rows.append(
                    (
                        mid,
                        rate,
                        int(s.shape[0]),
                        int((s * s).sum()),
                        int((s[:-1] * s[1:] < 0).sum()) if s.size > 1 else 0,
                        int(np.abs(s).max()) if s.size else 0,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "sample_rate", "n_samples",
                    "sum_sq", "zero_crossings", "peak",
                ],
            )

    return media.select("media_id", "payload", "mime").mapInPandas(
        batches, AUDIO_FEATURES_SCHEMA
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: expands each media row into frame
    timestamps (sequence/explode — JVM-side); the per-frame decode would then
    run through ``decode_image_features``. Demonstrates the fan-out shape
    without a codec."""
    duration = F.coalesce(F.col("meta.duration_ms"), F.octet_length("payload").cast("long"))
    return media.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0).cast("long"), duration, F.lit(every_ms).cast("long"))
        ).alias("frame_ts_ms"),
    )


def synthetic_jpeg_media(documents: DataFrame, limit: int = 300) -> DataFrame:
    """Deterministic baseline-JPEG fixture keyed by doc_id: a clip-free
    linear gradient (gray for even ids, RGB with +40/+80 channel offsets
    for odd), so the TRUE pixel mean is closed-form SQL — which is what
    lets the decode gate assert VALUE accuracy (|decoded - true| under
    the quantization bound) with a DuckDB oracle, not just shapes.
    Quality cycles 85/90/95; every third image is 4:2:0 subsampled, every
    fifth carries restart markers, and every SEVENTH is encoded
    PROGRESSIVE (SOF2, libjpeg's standard scan script) — so the gate
    exercises the decoder's upsampling, RST, and multi-scan successive-
    approximation paths in every run."""
    from . import codecs

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                w = did % 13 + 10
                h = did % 7 + 9
                y, x = np.mgrid[0:h, 0:w]
                base = (3 * x + 2 * y + did % 64).astype(np.uint8)
                if did % 2 == 0:
                    arr = base
                else:
                    arr = np.stack(
                        [base, base + 40, base + 80], axis=2
                    ).astype(np.uint8)
                if did % 7 == 0:
                    payloads.append(
                        codecs.encode_jpeg_progressive(
                            arr,
                            quality=(85, 90, 95)[did % 3],
                            subsample=did % 3 == 0 and did % 2 == 1,
                        )
                    )
                else:
                    payloads.append(
                        codecs.encode_jpeg(
                            arr,
                            quality=(85, 90, 95)[did % 3],
                            subsample=did % 3 == 0 and did % 2 == 1,
                            restart_interval=2 if did % 5 == 0 else 0,
                        )
                    )
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "payload": payloads,
                    "mime": "image/jpeg",
                }
            )

    src = documents.select("doc_id").filter(F.col("doc_id") < limit)
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), True),
            T.StructField("mime", T.StringType(), True),
        ]
    )
    return src.mapInPandas(batches, out_schema)
