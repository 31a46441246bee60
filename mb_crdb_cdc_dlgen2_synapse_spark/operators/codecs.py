"""Pure-stdlib media codecs (X5): PNG and WAV decode/encode with nothing
but ``zlib``/``struct``/numpy — no PIL, no ffmpeg.

Why this exists: the container ships no image/audio library, and the
multimodal stage was honestly stubbed for that reason. But PNG is zlib
(stdlib) + per-row byte filters, and WAV PCM is a RIFF header + int16
samples — both fully decodable with numpy. These codecs make
``decode_image_real`` / ``decode_audio_real`` REAL for the two formats,
while exotic codecs (JPEG/H.264/...) stay behind the explicit
NotImplementedError.

Scope: PNG 8/16-bit, color types 0 (gray), 2 (RGB), 3 (palette + tRNS),
4 (gray+alpha), 6 (RGBA), all five row filters, Adam7 interlace. JPEG
baseline (SOF0) and progressive (SOF2). WAV PCM 16-bit. That is the
deterministic, dependency-free subset a test/lake fixture needs; a
cluster with real codec libraries swaps them in at the same seam.
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


def _filter_scanlines(
    byte_rows: np.ndarray, bpp: int, filter_type: int
) -> bytes:
    """Apply one PNG row filter to every scanline of an (h, stride) uint8
    array. Filtering is BYTE-level per the spec (bpp = bytes per pixel),
    so the same code serves 8-bit, 16-bit, and palette images."""
    if not 0 <= filter_type <= 4:
        raise ValueError(f"PNG filter type must be 0..4, got {filter_type}")
    h, stride = byte_rows.shape
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int16)
    for y in range(h):
        flat = byte_rows[y].astype(np.int16)
        left = np.concatenate([np.zeros(bpp, np.int16), flat[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, np.int16), prev[:-bpp]])
        if filter_type == 0:
            enc = flat
        elif filter_type == 1:
            enc = flat - left
        elif filter_type == 2:
            enc = flat - prev
        elif filter_type == 3:
            enc = flat - (left + prev) // 2
        else:  # Paeth
            enc = flat - _paeth(left, prev, upleft)
        raw.append(filter_type)
        raw.extend((enc % 256).astype(np.uint8).tobytes())
        prev = flat
    return bytes(raw)


def encode_png(
    arr: np.ndarray, filter_type: int = 0, interlace: bool = False
) -> bytes:
    """8-bit PNG from a (h, w) grayscale or (h, w, c) array, c in
    {1, 2, 3, 4}. ``filter_type`` applies one of the five PNG row filters
    to EVERY row (real encoders choose per row; a fixed type keeps the
    fixture deterministic and exercises the decoder's unfilter paths).
    ``interlace=True`` emits Adam7 (seven independently-filtered
    sub-images in the standard pass order)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    img = a.reshape(h, w * c)
    raw = (
        _adam7_filtered(img, c, filter_type)
        if interlace
        else _filter_scanlines(img, c, filter_type)
    )
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, int(interlace))
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def encode_png16(
    arr: np.ndarray, filter_type: int = 0, interlace: bool = False
) -> bytes:
    """16-bit PNG from a (h, w) or (h, w, c) uint16 array (c in 1..4) —
    big-endian sample bytes, byte-level filtering (bpp = 2c), optional
    Adam7 interlace."""
    a = np.asarray(arr, dtype=np.uint16)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    be = np.stack([(a >> 8).astype(np.uint8), (a & 0xFF).astype(np.uint8)],
                  axis=3)
    img = be.reshape(h, w * c * 2)
    raw = (
        _adam7_filtered(img, c * 2, filter_type)
        if interlace
        else _filter_scanlines(img, c * 2, filter_type)
    )
    ihdr = struct.pack(">IIBBBBB", w, h, 16, ctype, 0, 0, int(interlace))
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def encode_png_palette(
    indices: np.ndarray,
    palette: np.ndarray,
    trns: np.ndarray | None = None,
    filter_type: int = 0,
    interlace: bool = False,
) -> bytes:
    """Palette (color type 3) PNG from (h, w) uint8 indices into a
    (n, 3) uint8 palette, with optional per-entry tRNS alpha and
    optional Adam7 interlace."""
    idx = np.asarray(indices, dtype=np.uint8)
    pal = np.asarray(palette, dtype=np.uint8)
    if pal.ndim != 2 or pal.shape[1] != 3 or len(pal) > 256:
        raise ValueError("palette must be (n<=256, 3) uint8")
    if idx.max(initial=0) >= len(pal):
        raise ValueError("palette index out of range")
    h, w = idx.shape
    img = idx.reshape(h, w)
    raw = (
        _adam7_filtered(img, 1, filter_type)
        if interlace
        else _filter_scanlines(img, 1, filter_type)
    )
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, int(interlace))
    out = _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"PLTE", pal.tobytes())
    if trns is not None:
        out += _chunk(b"tRNS", np.asarray(trns, np.uint8).tobytes())
    return out + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")


def _paeth(left: np.ndarray, up: np.ndarray, upleft: np.ndarray) -> np.ndarray:
    p = left + up - upleft
    pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - upleft)
    out = np.where(
        (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, upleft)
    )
    return out.astype(np.int16)


#: Adam7 interlace passes: (x offset, y offset, x stride, y stride)
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _adam7_filtered(
    byte_img: np.ndarray, bpp: int, filter_type: int
) -> bytes:
    """Filtered scanline stream for an INTERLACED image: each Adam7 pass
    is an independent sub-image (its own filter bytes and left/up
    neighbors); empty passes contribute nothing. ``byte_img`` is the
    (h, w*bpp) byte-level image."""
    h = byte_img.shape[0]
    w = byte_img.shape[1] // bpp
    px = byte_img.reshape(h, w, bpp)
    raw = bytearray()
    for x0, y0, dx, dy in _ADAM7:
        sub = px[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        ph, pw = sub.shape[:2]
        raw += _filter_scanlines(
            np.ascontiguousarray(sub).reshape(ph, pw * bpp), bpp, filter_type
        )
    return bytes(raw)


def _unfilter_image(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse PNG row filtering over an (h, stride) scanline block (each
    scanline prefixed by its filter-type byte). Byte-level per the spec,
    so one loop serves every depth/color-type and every Adam7 pass."""
    out = np.zeros((h, stride), dtype=np.uint8)
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
    return out


def decode_png(data: bytes) -> np.ndarray:
    """Decode a non-interlaced PNG to a (h, w, c) array. 8-bit images
    (gray/GA/RGB/RGBA and PALETTE with optional tRNS alpha) come back
    uint8; 16-bit images come back uint16. Handles all five row filters
    (unfiltering is byte-level per the spec, so the same loop serves
    every depth). Raises ValueError on non-PNG bytes and
    NotImplementedError on the remaining corner (sub-8-bit palette
    depths) — the honest boundary of the stdlib codec. Adam7-interlaced
    files decode (seven independently-filtered passes scattered back to
    sample positions)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos, w = 8, None
    idat = bytearray()
    h = ctype = depth = None
    palette = None
    trns = None
    interlace = 0
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if ctype == 3:
                if depth != 8:
                    raise NotImplementedError(
                        f"palette PNG bit depth {depth} (only 8)"
                    )
            elif ctype in _CHANNELS:
                if depth not in (8, 16):
                    raise NotImplementedError(
                        f"PNG bit depth {depth} (only 8/16)"
                    )
            else:
                raise NotImplementedError(f"PNG color type {ctype}")
            if interlace not in (0, 1):
                raise ValueError(f"bad PNG interlace method {interlace}")
        elif tag == b"PLTE":
            palette = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif tag == b"tRNS" and ctype == 3:
            trns = np.frombuffer(body, np.uint8)
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("truncated PNG: missing IHDR/IDAT")
    c = 1 if ctype == 3 else _CHANNELS[ctype]
    nbytes = 1 if (depth == 8 or ctype == 3) else 2
    raw = zlib.decompress(bytes(idat))
    stride = w * c * nbytes
    bpp = c * nbytes
    if interlace:
        # Adam7: seven independently-filtered sub-images, scattered back
        # to sample positions (empty passes contribute zero bytes)
        px = np.zeros((h, w, bpp), np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx if w > x0 else 0
            ph = (h - y0 + dy - 1) // dy if h > y0 else 0
            if pw <= 0 or ph <= 0:
                continue
            pstride = pw * bpp
            need = ph * (pstride + 1)
            sub = _unfilter_image(raw[off : off + need], ph, pstride, bpp)
            off += need
            px[y0::dy, x0::dx] = sub.reshape(ph, pw, bpp)
        if off != len(raw):
            raise ValueError("PNG data length mismatch")
        out = px.reshape(h, stride)
    else:
        if len(raw) != h * (stride + 1):
            raise ValueError("PNG data length mismatch")
        out = _unfilter_image(raw, h, stride, bpp)
    if ctype == 3:
        if palette is None:
            raise ValueError("palette PNG without PLTE chunk")
        idx = out.reshape(h, w)
        rgb = palette[idx]  # (h, w, 3) lookup
        if trns is not None:
            alpha = np.full(len(palette), 255, np.uint8)
            alpha[: len(trns)] = trns
            return np.concatenate([rgb, alpha[idx][:, :, None]], axis=2)
        return rgb
    if nbytes == 2:  # 16-bit: big-endian byte pairs -> uint16 samples
        u16 = out.reshape(h, w, c, 2).astype(np.uint16)
        return (u16[..., 0] << 8) | u16[..., 1]
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


# ---------------------------------------------------------------------------
# JPEG (baseline sequential DCT, Huffman entropy coding) — pure stdlib+numpy.
#
# Decoder: fully table-driven baseline JFIF — any DQT/DHT the stream
# declares, 1- or 3-component SOF0, any sampling factors (4:4:4 / 4:2:2 /
# 4:2:0 upsampled by replication), restart markers, byte unstuffing.
# Progressive (SOF2) and arithmetic coding refuse with NotImplementedError
# — the honest boundary of a fixture codec.
#
# Encoder (fixtures): 4:4:4, quality-scaled Annex-K quant tables, and FLAT
# canonical Huffman tables built here rather than transcribed from the
# spec — every DC category gets a 4-bit code, every AC (run, size) symbol
# an 8-bit code (Kraft sums 12/16 and 162/256, all-ones never assigned, so
# the tables are valid baseline Huffman tables by construction). A real
# encoder's tables are denser; a decoder cannot tell the difference, which
# is the point: our decoder handles ANY table the DHT declares, including
# libjpeg's — the flat choice only costs fixture bytes.
# ---------------------------------------------------------------------------

_QL_BASE = np.array(  # Annex K luminance quantization table
    [16, 11, 10, 16, 24, 40, 51, 61,
     12, 12, 14, 19, 26, 58, 60, 55,
     14, 13, 16, 24, 40, 57, 69, 56,
     14, 17, 22, 29, 51, 87, 80, 62,
     18, 22, 37, 56, 68, 109, 103, 77,
     24, 35, 55, 64, 81, 104, 113, 92,
     49, 64, 78, 87, 103, 121, 120, 101,
     72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int32)
_QC_BASE = np.array(  # Annex K chrominance quantization table
    [17, 18, 24, 47, 99, 99, 99, 99,
     18, 21, 26, 66, 99, 99, 99, 99,
     24, 26, 56, 99, 99, 99, 99, 99,
     47, 66, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int32)

#: zigzag scan order: _ZIGZAG[i] = raster index of the i-th scanned coef
_ZIGZAG = np.array(
    [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
     12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
     35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
     58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int64)

#: orthonormal 8-point DCT-II matrix: dct2(B) = C @ B @ C.T
_DCT_C = np.array(
    [[(np.sqrt(0.125) if u == 0 else 0.5)
      * np.cos((2 * x + 1) * u * np.pi / 16) for x in range(8)]
     for u in range(8)])


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling: 1..100 -> scaled Annex-K tables (100 = all-1s,
    the near-lossless corner the exactness tests pin)."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    ql = np.clip((_QL_BASE * scale + 50) // 100, 1, 255).astype(np.int32)
    qc = np.clip((_QC_BASE * scale + 50) // 100, 1, 255).astype(np.int32)
    return ql, qc


#: flat Huffman specs: (BITS[1..16], HUFFVAL) — see the header comment
_DC_BITS = [0, 0, 0, 12] + [0] * 12
_DC_VALS = list(range(12))
_AC_VALS = (
    [0x00, 0xF0]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)
_AC_BITS = [0] * 7 + [len(_AC_VALS)] + [0] * 8


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the JPEG canonical-code construction
    (Annex C): codes of each length are consecutive, doubling on length
    increase."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            self.put(0x7F, 7 - ((self.n - 1) % 8) + 1)  # pad with 1s
        return bytes(self.buf)


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _encode_block(
    bw: _BitWriter, coefs: np.ndarray, prev_dc: int,
    dc_codes: dict, ac_codes: dict,
) -> int:
    """Entropy-encode one zigzagged, quantized 8x8 (64,) int block."""
    dc = int(coefs[0])
    diff = dc - prev_dc
    s = int(diff != 0 and abs(diff).bit_length())
    code, length = dc_codes[s]
    bw.put(code, length)
    if s:
        bw.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = int(np.max(np.nonzero(coefs)[0])) if np.any(coefs[1:]) else 0
    for i in range(1, 64):
        v = int(coefs[i])
        if i > last_nz:
            code, length = ac_codes[0x00]  # EOB
            bw.put(code, length)
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            bw.put(code, length)
            run -= 16
        s = abs(v).bit_length()
        code, length = ac_codes[(run << 4) | s]
        bw.put(code, length)
        bw.put(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    return dc


def _jpeg_coefs(
    arr: np.ndarray, quality: int, subsample: bool
) -> tuple:
    """Shared encoder front half: color transform, optional 4:2:0
    downsample, pad to MCU grid, block DCT + quantization. Returns
    ``(gray, h, w, samp, (ql, qc), mcux, mcuy, coefs)`` where
    ``coefs[ci]`` is an (mcu-padded block rows, block cols, 64) int32
    array of ZIGZAG-ordered quantized coefficients — the one
    representation both the baseline and the progressive entropy coders
    consume (progressive JPEG is the SAME coefficients emitted across
    several scans)."""
    a = np.asarray(arr, dtype=np.uint8)
    gray = a.ndim == 2
    if not gray and (a.ndim != 3 or a.shape[2] != 3):
        raise ValueError("encode_jpeg wants (h,w) gray or (h,w,3) RGB")
    h, w = a.shape[:2]
    if gray:
        planes = [a.astype(np.float64)]
        samp = [(1, 1)]
    else:
        r, g, b = (a[:, :, i].astype(np.float64) for i in range(3))
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
        samp = [(2, 2), (1, 1), (1, 1)] if subsample else [(1, 1)] * 3
    maxh = max(s[0] for s in samp)
    maxv = max(s[1] for s in samp)
    mcux = -(-w // (8 * maxh))
    mcuy = -(-h // (8 * maxv))
    ql, qc = _quality_tables(quality)
    qtabs = [ql] + ([qc] if not gray else [])
    coefs = []
    for ci, (p, (sh, sv)) in enumerate(zip(planes, samp)):
        fy, fx = maxv // sv, maxh // sh
        if fy > 1 or fx > 1:  # box-average downsample (pad to factor first)
            pp = np.pad(
                p,
                ((0, (-p.shape[0]) % fy), (0, (-p.shape[1]) % fx)),
                mode="edge",
            )
            p = pp.reshape(
                pp.shape[0] // fy, fy, pp.shape[1] // fx, fx
            ).mean(axis=(1, 3))
        th, tw = mcuy * sv * 8, mcux * sh * 8
        p = np.pad(
            p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge"
        )
        qt = qtabs[min(ci, len(qtabs) - 1)].reshape(8, 8).astype(np.float64)
        bh, bwd = mcuy * sv, mcux * sh
        blocks = (
            p.reshape(bh, 8, bwd, 8).transpose(0, 2, 1, 3) - 128.0
        )
        d = np.einsum("ij,xyjk,lk->xyil", _DCT_C, blocks, _DCT_C)
        q = np.round(d / qt).astype(np.int32)
        coefs.append(q.reshape(bh, bwd, 64)[:, :, _ZIGZAG])
    return gray, h, w, samp, (ql, qc), mcux, mcuy, coefs


def _jpeg_headers(
    sof_marker: int,
    gray: bool,
    h: int,
    w: int,
    samp: list,
    ql: np.ndarray,
    qc: np.ndarray,
    huffs: list,
    restart_interval: int,
) -> bytearray:
    """SOI..DHT/DRI header bytes shared by the sequential (SOF0) and
    progressive (SOF2) encoders; ``huffs`` = [(tc, th, bits, vals)]."""
    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, b"\x00" + bytes(ql.reshape(-1)[_ZIGZAG].astype(np.uint8)))
    if not gray:
        out += _seg(
            0xDB, b"\x01" + bytes(qc.reshape(-1)[_ZIGZAG].astype(np.uint8))
        )
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sh, sv = samp[ci]
        sof += bytes([ci + 1, (sh << 4) | sv, min(ci, 1)])
    out += _seg(sof_marker, sof)
    for tc, th_, bits, vals in huffs:
        out += _seg(0xC4, bytes([(tc << 4) | th_]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    return out


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Baseline JFIF from a (h, w) grayscale or (h, w, 3) RGB uint8 array.
    Quality-scaled Annex-K quant tables, flat custom Huffman tables (valid
    by construction, see header), MCU-interleaved entropy coding.

    ``subsample=True`` emits 4:2:0 (Y at 2x2, box-averaged chroma at 1x1 —
    the layout virtually every camera JPEG uses); default is 4:4:4.
    ``restart_interval=N`` emits a DRI segment and an RSTn marker every N
    MCUs (what real encoders do for error resilience) — both exist mainly
    so the decoder's upsampling and restart paths are testable end to end
    without an external encoder."""
    gray, h, w, samp, (ql, qc), mcux, mcuy, coefs = _jpeg_coefs(
        arr, quality, subsample
    )
    dc_codes = _canonical_codes(_DC_BITS, _DC_VALS)
    ac_codes = _canonical_codes(_AC_BITS, _AC_VALS)
    bw = _BitWriter()
    entropy = bytearray()
    prev_dc = [0] * len(coefs)
    mcu_count = 0
    rst_idx = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                entropy += bw.flush()
                bw = _BitWriter()
                entropy += bytes([0xFF, 0xD0 + (rst_idx % 8)])
                rst_idx += 1
                prev_dc = [0] * len(coefs)
            mcu_count += 1
            for ci, (cf, (sh, sv)) in enumerate(zip(coefs, samp)):
                for byi in range(sv):
                    for bxi in range(sh):
                        prev_dc[ci] = _encode_block(
                            bw,
                            cf[my * sv + byi, mx * sh + bxi],
                            prev_dc[ci],
                            dc_codes,
                            ac_codes,
                        )
    entropy += bw.flush()
    ncomp = 1 if gray else 3
    huffs = [(0, 0, _DC_BITS, _DC_VALS), (1, 0, _AC_BITS, _AC_VALS)]
    if not gray:
        huffs += [(0, 1, _DC_BITS, _DC_VALS), (1, 1, _AC_BITS, _AC_VALS)]
    out = _jpeg_headers(
        0xC0, gray, h, w, samp, ql, qc, huffs, restart_interval
    )
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0 if ci == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += _seg(0xDA, sos)
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Progressive (SOF2) entropy coding — ITU T.81 Annex G, Huffman variant.
# A progressive file carries the SAME quantized coefficients as a baseline
# one; the scans just deliver them incrementally: DC first/refine over
# successive-approximation bits, AC bands by spectral selection with
# EOB-run codes, AC refinement with correction bits. The scan script below
# is libjpeg's standard progression (jcparam.c), so the decoder sees the
# exact shapes real progressive JPEGs use: interleaved DC scans,
# non-interleaved AC scans, repeated Y-channel refinement.
# The flat progressive AC table extends the baseline one with the EOBn
# symbols (r<<4 for r=0..14): 176 symbols, all 8-bit, all-ones unassigned
# — valid by the same construction argument.
# ---------------------------------------------------------------------------

_AC_VALS_P = (
    [r << 4 for r in range(15)]
    + [0xF0]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)
_AC_BITS_P = [0] * 7 + [len(_AC_VALS_P)] + [0] * 8


def _noninterleaved_dims(
    h: int, w: int, samp: list, maxh: int, maxv: int
) -> list:
    """Per-component block dims for NON-interleaved scans (T.81 A.2.2:
    ceil over the component's own sampled size, not the MCU-padded grid)."""
    out = []
    for sh, sv in samp:
        cw = -(-w * sh // maxh)
        ch = -(-h * sv // maxv)
        out.append((-(-ch // 8), -(-cw // 8)))
    return out


def _scan_units(
    cis: list, samp: list, nib: list, mcux: int, mcuy: int
) -> list:
    """Restartable coding units in scan order: for an interleaved scan
    (ns > 1) one unit per MCU holding each component's v*h blocks; for a
    single-component scan one unit per block, raster over the component's
    non-interleaved dims."""
    units = []
    if len(cis) > 1:
        for my in range(mcuy):
            for mx in range(mcux):
                unit = []
                for ci in cis:
                    sh, sv = samp[ci]
                    for byi in range(sv):
                        for bxi in range(sh):
                            unit.append((ci, my * sv + byi, mx * sh + bxi))
                units.append(unit)
    else:
        ci = cis[0]
        bh, bwd = nib[ci]
        for by in range(bh):
            for bx in range(bwd):
                units.append([(ci, by, bx)])
    return units


def _p_emit_dc(bw, coefs, units, dc_codes, ah, al) -> None:
    """DC scan: first pass (Ah=0) codes DPCM of dc >> Al (arithmetic
    shift); a refinement pass emits one raw bit per block."""
    prev: dict[int, int] = {}
    for unit in units:
        for ci, by, bx in unit:
            dc = int(coefs[ci][by, bx, 0])
            if ah == 0:
                v = dc >> al
                diff = v - prev.get(ci, 0)
                prev[ci] = v
                s = int(diff != 0 and abs(diff).bit_length())
                code, length = dc_codes[s]
                bw.put(code, length)
                if s:
                    bw.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
            else:
                bw.put((dc >> al) & 1, 1)


def _p_emit_ac_first(bw, cf, units, ac_codes, ss, se, al) -> None:
    """AC spectral-selection first pass: baseline run/size coding plus
    EOB-run accumulation (EOBn codes batch consecutive all-zero bands)."""
    eobrun = 0

    def emit_eobrun():
        nonlocal eobrun
        if eobrun:
            r = eobrun.bit_length() - 1
            code, length = ac_codes[r << 4]
            bw.put(code, length)
            if r:
                bw.put(eobrun - (1 << r), r)
            eobrun = 0

    for unit in units:
        (ci, by, bx) = unit[0]
        block = cf[by, bx]
        run = 0
        for k in range(ss, se + 1):
            v = int(block[k])
            av = abs(v) >> al
            if av == 0:
                run += 1
                continue
            emit_eobrun()
            while run > 15:
                code, length = ac_codes[0xF0]
                bw.put(code, length)
                run -= 16
            s = av.bit_length()
            code, length = ac_codes[(run << 4) | s]
            bw.put(code, length)
            bw.put(av if v > 0 else (-av) + (1 << s) - 1, s)
            run = 0
        if run:
            eobrun += 1
            if eobrun == 0x7FFF:
                emit_eobrun()
    emit_eobrun()


def _p_emit_ac_refine(bw, cf, units, ac_codes, ss, se, al) -> None:
    """AC successive-approximation refinement (the libjpeg
    encode_mcu_AC_refine algorithm): already-nonzero coefficients get one
    correction bit each, newly-nonzero ones a (run,1) symbol + sign; the
    correction bits ride along buffered after the symbol (or after the
    EOBn that covers their blocks)."""
    eobrun = 0
    be: list = []  # correction bits owned by the pending EOB run

    def emit_eobrun():
        nonlocal eobrun, be
        if eobrun:
            r = eobrun.bit_length() - 1
            code, length = ac_codes[r << 4]
            bw.put(code, length)
            if r:
                bw.put(eobrun - (1 << r), r)
            eobrun = 0
        for b in be:
            bw.put(b, 1)
        be = []

    for unit in units:
        (ci, by, bx) = unit[0]
        block = cf[by, bx]
        absv = [abs(int(block[k])) >> al for k in range(ss, se + 1)]
        eob = -1  # index of the LAST newly-nonzero coef in this band
        for i, a in enumerate(absv):
            if a == 1:
                eob = i
        run = 0
        br_bits: list = []  # this block's pending correction bits
        for i, a in enumerate(absv):
            if a == 0:
                run += 1
                continue
            while run > 15 and i <= eob:
                emit_eobrun()
                code, length = ac_codes[0xF0]
                bw.put(code, length)
                run -= 16
                for b in br_bits:
                    bw.put(b, 1)
                br_bits = []
            if a > 1:  # history coef: correction bit only, run unaffected
                br_bits.append(a & 1)
                continue
            emit_eobrun()
            code, length = ac_codes[(run << 4) | 1]
            bw.put(code, length)
            bw.put(1 if int(block[ss + i]) > 0 else 0, 1)
            for b in br_bits:
                bw.put(b, 1)
            br_bits = []
            run = 0
        if run > 0 or br_bits:
            eobrun += 1
            be += br_bits
            if eobrun == 0x7FFF:
                emit_eobrun()
    emit_eobrun()


def encode_jpeg_progressive(
    arr: np.ndarray, quality: int = 90, subsample: bool = False
) -> bytes:
    """Progressive (SOF2) JFIF from a (h, w) gray or (h, w, 3) RGB uint8
    array — same coefficients as ``encode_jpeg``, delivered through
    libjpeg's standard scan script (DC first at Al=1 interleaved, per-
    component AC bands, two Y refinement passes, DC refinement), so
    ``decode_jpeg`` of the progressive bytes must equal decoding the
    baseline bytes EXACTLY — the round-trip equality the tests pin."""
    gray, h, w, samp, (ql, qc), mcux, mcuy, coefs = _jpeg_coefs(
        arr, quality, subsample
    )
    maxh = max(s[0] for s in samp)
    maxv = max(s[1] for s in samp)
    nib = _noninterleaved_dims(h, w, samp, maxh, maxv)
    dc_codes = _canonical_codes(_DC_BITS, _DC_VALS)
    ac_codes = _canonical_codes(_AC_BITS_P, _AC_VALS_P)
    if gray:
        script = [
            ([0], 0, 0, 0, 1),
            ([0], 1, 5, 0, 2),
            ([0], 6, 63, 0, 2),
            ([0], 1, 63, 2, 1),
            ([0], 0, 0, 1, 0),
            ([0], 1, 63, 1, 0),
        ]
    else:
        script = [
            ([0, 1, 2], 0, 0, 0, 1),
            ([0], 1, 5, 0, 2),
            ([2], 1, 63, 0, 1),
            ([1], 1, 63, 0, 1),
            ([0], 6, 63, 0, 2),
            ([0], 1, 63, 2, 1),
            ([0, 1, 2], 0, 0, 1, 0),
            ([2], 1, 63, 1, 0),
            ([1], 1, 63, 1, 0),
            ([0], 1, 63, 1, 0),
        ]
    huffs = [(0, 0, _DC_BITS, _DC_VALS), (1, 0, _AC_BITS_P, _AC_VALS_P)]
    if not gray:
        huffs += [(0, 1, _DC_BITS, _DC_VALS), (1, 1, _AC_BITS_P, _AC_VALS_P)]
    out = _jpeg_headers(0xC2, gray, h, w, samp, ql, qc, huffs, 0)
    for cis, ss, se, ah, al in script:
        sos = bytes([len(cis)])
        for ci in cis:
            t = 0 if ci == 0 else 1
            sos += bytes([ci + 1, (t << 4) | t])
        sos += bytes([ss, se, (ah << 4) | al])
        out += _seg(0xDA, sos)
        units = _scan_units(cis, samp, nib, mcux, mcuy)
        bw = _BitWriter()
        if ss == 0:
            _p_emit_dc(bw, coefs, units, dc_codes, ah, al)
        elif ah == 0:
            _p_emit_ac_first(bw, coefs[cis[0]], units, ac_codes, ss, se, al)
        else:
            _p_emit_ac_refine(bw, coefs[cis[0]], units, ac_codes, ss, se, al)
        out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)
class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 unstuffing;
    stops at any non-RST marker (the caller sees RSTs via ``restart``)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        d = self.data
        while self.n <= 24 and self.pos < len(d):
            byte = d[self.pos]
            if byte == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    break  # restart marker: caller resyncs
                else:
                    break  # real marker (EOI/next segment)
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | byte
            self.n += 8

    def bits(self, k: int) -> int:
        if k == 0:
            return 0
        while self.n < k:
            before = self.n
            self._fill()
            if self.n == before:  # at a marker: spec pads with 1-bits
                self.acc = (self.acc << 8) | 0xFF
                self.n += 8
        v = (self.acc >> (self.n - k)) & ((1 << k) - 1)
        self.n -= k
        self.acc &= (1 << self.n) - 1
        return v

    def restart(self) -> None:
        """Skip an RST marker and realign to a byte boundary."""
        self.acc = 0
        self.n = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1


def _huff_decode(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bits(1)
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG: no Huffman code matched in 16 bits")


def _extend(v: int, s: int) -> int:
    """Sign-extend an s-bit JPEG magnitude value."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _d_scan_block(
    br, block, mode, state, huff_dc, huff_ac, ss, se, ah, al
) -> None:
    """Decode one block's contribution to one scan. ``block`` is the
    (64,) int32 ZIGZAG-ordered coefficient view mutated in place;
    ``state`` carries the scan-lived DC predictors / EOB run."""
    if mode == "full":  # sequential: DC + AC in one pass (EOBn-tolerant)
        s = _huff_decode(br, huff_dc)
        diff = _extend(br.bits(s), s) if s else 0
        state["pred"] += diff
        block[0] = state["pred"]
        if state["eobrun"] > 0:
            state["eobrun"] -= 1
            return
        k = 1
        while k <= 63:
            rs = _huff_decode(br, huff_ac)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r != 15:
                    state["eobrun"] = (1 << r) - 1 + (br.bits(r) if r else 0)
                    break
                k += 16  # ZRL
                continue
            k += r
            if k > 63:
                raise ValueError("JPEG AC index overflow")
            block[k] = _extend(br.bits(s), s)
            k += 1
    elif mode == "dc_first":
        s = _huff_decode(br, huff_dc)
        diff = _extend(br.bits(s), s) if s else 0
        state["pred"] += diff
        block[0] = state["pred"] << al
    elif mode == "dc_refine":
        if br.bits(1):
            block[0] |= 1 << al
    elif mode == "ac_first":
        if state["eobrun"] > 0:
            state["eobrun"] -= 1
            return
        k = ss
        while k <= se:
            rs = _huff_decode(br, huff_ac)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r != 15:
                    state["eobrun"] = (1 << r) - 1 + (br.bits(r) if r else 0)
                    break
                k += 16
                continue
            k += r
            if k > se:
                raise ValueError("JPEG AC index overflow")
            block[k] = _extend(br.bits(s), s) << al
            k += 1
    else:  # ac_refine — T.81 G.1.2.3 / libjpeg decode_mcu_AC_refine
        p1 = 1 << al
        k = ss
        if state["eobrun"] == 0:
            while k <= se:
                rs = _huff_decode(br, huff_ac)
                r, s = rs >> 4, rs & 0xF
                newval = 0
                if s == 0:
                    if r != 15:
                        state["eobrun"] = (1 << r) + (br.bits(r) if r else 0)
                        break
                    # ZRL: pass over 16 zero-HISTORY coefs
                else:
                    newval = p1 if br.bits(1) else -p1
                while k <= se:
                    c = int(block[k])
                    if c != 0:
                        # every nonzero-history coef passed costs one
                        # correction bit (read unconditionally)
                        if br.bits(1) and (c & p1) == 0:
                            block[k] = c + (p1 if c >= 0 else -p1)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if newval and k <= se:
                    block[k] = newval
                k += 1
        if state["eobrun"] > 0:
            # current block's tail, then whole blocks, carry only
            # correction bits for already-nonzero coefs
            while k <= se:
                c = int(block[k])
                if c != 0 and br.bits(1) and (c & p1) == 0:
                    block[k] = c + (p1 if c >= 0 else -p1)
                k += 1
            state["eobrun"] -= 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline (SOF0) or progressive (SOF2) JFIF/JPEG to
    (h, w, c) uint8 (c = 1 or 3, RGB). Table-driven: any quant/Huffman
    tables, any sampling factors (replication upsampling), DRI/RST,
    multi-scan files with spectral selection + successive approximation
    (DC/AC first and refinement passes, EOB-run codes, interleaved and
    non-interleaved scans). Refuses arithmetic/hierarchical/12-bit frames
    with NotImplementedError."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: bad SOI")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    comps: list[dict] = []
    h = w = None
    restart_interval = 0
    progressive = False
    coef: list[np.ndarray] | None = None
    maxh = maxv = mcux = mcuy = 0
    nib: list = []
    saw_scan = False
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("invalid JPEG: expected marker")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        body = data[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                tab = np.zeros(64, np.int32)
                tab[_ZIGZAG] = np.frombuffer(body, np.uint8, 64, b + 1)
                qtabs[tq] = tab
                b += 65
        elif marker == 0xC4:  # DHT (possibly several tables)
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 0xF
                bits = list(body[b + 1 : b + 17])
                nv = sum(bits)
                vals = list(body[b + 17 : b + 17 + nv])
                codes = _canonical_codes(bits, vals)
                huff[(tc, th)] = {
                    (length, code): sym
                    for sym, (code, length) in codes.items()
                }
                b += 17 + nv
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            progressive = marker == 0xC2
            depth, h, w, nc = struct.unpack_from(">BHHB", body)
            if depth != 8:
                raise NotImplementedError(f"JPEG bit depth {depth}")
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
            maxh = max(c["h"] for c in comps)
            maxv = max(c["v"] for c in comps)
            mcux = -(-w // (8 * maxh))
            mcuy = -(-h // (8 * maxv))
            coef = [
                np.zeros((mcuy * c["v"], mcux * c["h"], 64), np.int32)
                for c in comps
            ]
            nib = _noninterleaved_dims(
                h, w, [(c["h"], c["v"]) for c in comps], maxh, maxv
            )
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"unsupported JPEG frame (SOF{marker - 0xC0}); baseline "
                "(SOF0) and progressive (SOF2) decode"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body)
        elif marker == 0xDA:  # SOS: one scan's entropy data follows
            if coef is None:
                raise ValueError("invalid JPEG: SOS before SOF")
            saw_scan = True
            ns = body[0]
            cis = []
            tabs = []
            for si in range(ns):
                cs, tdta = body[1 + 2 * si], body[2 + 2 * si]
                ci = next(
                    i for i, c in enumerate(comps) if c["id"] == cs
                )
                cis.append(ci)
                tabs.append((tdta >> 4, tdta & 0xF))
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0xF
            if not progressive:
                mode_of = {ci: "full" for ci in cis}
            elif ss == 0:
                mode_of = {
                    ci: ("dc_first" if ah == 0 else "dc_refine")
                    for ci in cis
                }
            else:
                if ns != 1:
                    raise ValueError(
                        "invalid progressive JPEG: AC scan must be "
                        "single-component"
                    )
                mode_of = {
                    cis[0]: "ac_first" if ah == 0 else "ac_refine"
                }
            samp = [(c["h"], c["v"]) for c in comps]
            units = _scan_units(cis, samp, nib, mcux, mcuy)
            br = _BitReader(data, pos)
            states = {
                ci: {"pred": 0, "eobrun": 0} for ci in cis
            }
            unit_count = 0
            for unit in units:
                if (
                    restart_interval
                    and unit_count
                    and unit_count % restart_interval == 0
                ):
                    br.restart()
                    for st in states.values():
                        st["pred"] = 0
                        st["eobrun"] = 0
                unit_count += 1
                for ci, by, bx in unit:
                    td, ta = tabs[cis.index(ci)]
                    _d_scan_block(
                        br,
                        coef[ci][by, bx],
                        mode_of[ci],
                        states[ci],
                        huff.get((0, td)),
                        huff.get((1, ta)),
                        ss,
                        se,
                        ah,
                        al,
                    )
            # resync to the next marker (skip pad bits / stray RSTs)
            p = br.pos
            while p + 1 < len(data) and not (
                data[p] == 0xFF
                and data[p + 1] != 0x00
                and not (0xD0 <= data[p + 1] <= 0xD7)
            ):
                p += 1
            pos = p
    if coef is None or h is None:
        raise ValueError("truncated JPEG: no SOF")
    if not saw_scan:
        raise ValueError("truncated JPEG: no SOS")

    idct_t = _DCT_C.T
    out_planes = []
    for ci, c in enumerate(comps):
        qt = qtabs[c["tq"]].astype(np.float64)  # raster order
        cf = coef[ci]
        bh, bwd = cf.shape[:2]
        nat = np.zeros((bh, bwd, 64), np.float64)
        nat[:, :, _ZIGZAG] = cf  # zigzag -> raster, THEN dequantize
        nat *= qt
        blocks = nat.reshape(bh, bwd, 8, 8)
        pix = (
            np.einsum("ij,xyjk,kl->xyil", idct_t, blocks, _DCT_C) + 128.0
        )
        plane = pix.transpose(0, 2, 1, 3).reshape(bh * 8, bwd * 8)
        up = np.repeat(
            np.repeat(plane, maxv // c["v"], axis=0),
            maxh // c["h"],
            axis=1,
        )
        out_planes.append(up[:h, :w])
    if len(out_planes) == 1:
        return np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)[
            :, :, None
        ]
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
