"""Pure-stdlib media codecs (X5): PNG and WAV decode/encode with nothing
but ``zlib``/``struct``/numpy — no PIL, no ffmpeg.

Why this exists: the container ships no image/audio library, and the
multimodal stage was honestly stubbed for that reason. But PNG is zlib
(stdlib) + per-row byte filters, and WAV PCM is a RIFF header + int16
samples — both fully decodable with numpy. These codecs make
``decode_image_real`` / ``decode_audio_real`` REAL for the two formats,
while exotic codecs (JPEG/H.264/...) stay behind the explicit
NotImplementedError.

Scope: PNG 8-bit, color types 0 (gray), 2 (RGB), 4 (gray+alpha),
6 (RGBA), no interlace, all five row filters. WAV PCM 16-bit. That is
the deterministic, dependency-free subset a test/lake fixture needs;
a cluster with real codec libraries swaps them in at the same seam.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

#: channels per PNG color type (8-bit, non-palette)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """8-bit PNG from a (h, w) grayscale or (h, w, c) array, c in
    {1, 2, 3, 4}. ``filter_type`` applies one of the five PNG row filters
    to EVERY row (real encoders choose per row; a fixed type keeps the
    fixture deterministic and exercises the decoder's unfilter paths)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    bpp = c  # bytes per pixel at bit depth 8
    if not 0 <= filter_type <= 4:
        raise ValueError(f"PNG filter type must be 0..4, got {filter_type}")
    raw = bytearray()
    prev = np.zeros((w, c), dtype=np.uint8)
    for y in range(h):
        row = a[y]
        flat = row.reshape(-1).astype(np.int16)
        left = np.concatenate(
            [np.zeros(bpp, np.int16), flat[:-bpp]]
        )
        up = prev.reshape(-1).astype(np.int16)
        upleft = np.concatenate([np.zeros(bpp, np.int16), up[:-bpp]])
        if filter_type == 0:
            enc = flat
        elif filter_type == 1:
            enc = flat - left
        elif filter_type == 2:
            enc = flat - up
        elif filter_type == 3:
            enc = flat - (left + up) // 2
        else:  # Paeth
            enc = flat - _paeth(left, up, upleft)
        raw.append(filter_type)
        raw.extend((enc % 256).astype(np.uint8).tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def _paeth(left: np.ndarray, up: np.ndarray, upleft: np.ndarray) -> np.ndarray:
    p = left + up - upleft
    pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - upleft)
    out = np.where(
        (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, upleft)
    )
    return out.astype(np.int16)


def decode_png(data: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG to a (h, w, c) uint8 array.
    Handles all five row filters. Raises ValueError on non-PNG bytes and
    NotImplementedError on the unsupported corners (16-bit, palette,
    interlace) — the honest boundary of the stdlib codec."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos, w = 8, None
    idat = bytearray()
    h = ctype = None
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise NotImplementedError(f"PNG bit depth {depth} (only 8)")
            if ctype not in _CHANNELS:
                raise NotImplementedError(f"PNG color type {ctype}")
            if interlace:
                raise NotImplementedError("interlaced PNG")
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("truncated PNG: missing IHDR/IDAT")
    c = _CHANNELS[ctype]
    raw = zlib.decompress(bytes(idat))
    stride = w * c
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    bpp = c
    for y in range(h):
        ft = raw[y * (stride + 1)]
        row = np.frombuffer(
            raw, np.uint8, stride, y * (stride + 1) + 1
        ).astype(np.int16)
        prev = out[y - 1].astype(np.int16) if y else np.zeros(stride, np.int16)
        if ft == 0:
            cur = row
        elif ft == 2:
            cur = (row + prev) % 256
        elif ft in (1, 3, 4):
            # left-dependent filters are sequential in x; vectorize over
            # channels by walking pixel positions (w steps, not w*c)
            cur = np.zeros(stride, np.int16)
            for x in range(0, stride, bpp):
                left = cur[x - bpp : x] if x else np.zeros(bpp, np.int16)
                up = prev[x : x + bpp]
                upleft = (
                    prev[x - bpp : x] if x else np.zeros(bpp, np.int16)
                )
                seg = row[x : x + bpp]
                if ft == 1:
                    cur[x : x + bpp] = (seg + left) % 256
                elif ft == 3:
                    cur[x : x + bpp] = (seg + (left + up) // 2) % 256
                else:
                    cur[x : x + bpp] = (seg + _paeth(left, up, upleft)) % 256
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        out[y] = cur.astype(np.uint8)
    return out.reshape(h, w, c)


# ---------------------------------------------------------------------------
# WAV (RIFF PCM16)


def encode_wav(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """Mono PCM16 WAV from an int16 (or castable) 1-D array."""
    s = np.asarray(samples).astype(np.int16)
    body = s.tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16
    )
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(body))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(body))
        + body
    )


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """(sample_rate, int16 samples) from a PCM16 WAV. Walks RIFF chunks
    properly (fmt anywhere before data, unknown chunks skipped)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF header")
    pos = 12
    rate = None
    n_channels = 1
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)
        if tag == b"fmt ":
            audio_fmt, n_channels, rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", body
            )
            if audio_fmt != 1 or bits != 16:
                raise NotImplementedError(
                    f"WAV format {audio_fmt}/{bits}-bit (only PCM16)"
                )
        elif tag == b"data":
            if rate is None:
                raise ValueError("WAV data chunk before fmt")
            samples = np.frombuffer(body, dtype="<i2")
            if n_channels > 1:
                samples = samples.reshape(-1, n_channels)
            return rate, samples
    raise ValueError("truncated WAV: no data chunk")
