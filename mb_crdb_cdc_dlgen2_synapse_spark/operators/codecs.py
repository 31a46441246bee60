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
    raw = _filter_scanlines(a.reshape(h, w * c), c, filter_type)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def encode_png16(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """16-bit PNG from a (h, w) or (h, w, c) uint16 array (c in 1..4) —
    big-endian sample bytes, byte-level filtering (bpp = 2c)."""
    a = np.asarray(arr, dtype=np.uint16)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    be = np.stack([(a >> 8).astype(np.uint8), (a & 0xFF).astype(np.uint8)],
                  axis=3)
    raw = _filter_scanlines(be.reshape(h, w * c * 2), c * 2, filter_type)
    ihdr = struct.pack(">IIBBBBB", w, h, 16, ctype, 0, 0, 0)
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
) -> bytes:
    """Palette (color type 3) PNG from (h, w) uint8 indices into a
    (n, 3) uint8 palette, with optional per-entry tRNS alpha."""
    idx = np.asarray(indices, dtype=np.uint8)
    pal = np.asarray(palette, dtype=np.uint8)
    if pal.ndim != 2 or pal.shape[1] != 3 or len(pal) > 256:
        raise ValueError("palette must be (n<=256, 3) uint8")
    if idx.max(initial=0) >= len(pal):
        raise ValueError("palette index out of range")
    h, w = idx.shape
    raw = _filter_scanlines(idx.reshape(h, w), 1, filter_type)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
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


def decode_png(data: bytes) -> np.ndarray:
    """Decode a non-interlaced PNG to a (h, w, c) array. 8-bit images
    (gray/GA/RGB/RGBA and PALETTE with optional tRNS alpha) come back
    uint8; 16-bit images come back uint16. Handles all five row filters
    (unfiltering is byte-level per the spec, so the same loop serves
    every depth). Raises ValueError on non-PNG bytes and
    NotImplementedError on the remaining corners (sub-8-bit palette
    depths, interlace) — the honest boundary of the stdlib codec."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos, w = 8, None
    idat = bytearray()
    h = ctype = depth = None
    palette = None
    trns = None
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
            if interlace:
                raise NotImplementedError("interlaced PNG")
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
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    bpp = c * nbytes
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
    dc_codes = _canonical_codes(_DC_BITS, _DC_VALS)
    ac_codes = _canonical_codes(_AC_BITS, _AC_VALS)

    prepped = []
    for p, (sh, sv) in zip(planes, samp):
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
        prepped.append(
            np.pad(
                p,
                ((0, th - p.shape[0]), (0, tw - p.shape[1])),
                mode="edge",
            )
        )

    bw = _BitWriter()
    entropy = bytearray()
    prev_dc = [0] * len(planes)
    mcu_count = 0
    rst_idx = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                entropy += bw.flush()
                bw = _BitWriter()
                entropy += bytes([0xFF, 0xD0 + (rst_idx % 8)])
                rst_idx += 1
                prev_dc = [0] * len(planes)
            mcu_count += 1
            for ci, (p, (sh, sv)) in enumerate(zip(prepped, samp)):
                qt = qtabs[min(ci, len(qtabs) - 1)].reshape(8, 8)
                for byi in range(sv):
                    for bxi in range(sh):
                        y0 = (my * sv + byi) * 8
                        x0 = (mx * sh + bxi) * 8
                        block = p[y0:y0 + 8, x0:x0 + 8] - 128.0
                        d = _DCT_C @ block @ _DCT_C.T
                        q = np.round(d / qt).astype(np.int32)
                        zz = q.reshape(-1)[_ZIGZAG]
                        prev_dc[ci] = _encode_block(
                            bw, zz, prev_dc[ci], dc_codes, ac_codes
                        )
    entropy += bw.flush()

    def dht(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
        return bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)

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
    out += _seg(0xC0, sof)
    out += _seg(0xC4, dht(0, 0, _DC_BITS, _DC_VALS))
    out += _seg(0xC4, dht(1, 0, _AC_BITS, _AC_VALS))
    if not gray:
        out += _seg(0xC4, dht(0, 1, _DC_BITS, _DC_VALS))
        out += _seg(0xC4, dht(1, 1, _AC_BITS, _AC_VALS))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        td_ta = 0 if ci == 0 else 0x11
        sos += bytes([ci + 1, td_ta])
    sos += b"\x00\x3f\x00"
    out += _seg(0xDA, sos)
    out += entropy
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


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline JFIF/JPEG to (h, w, c) uint8 (c = 1 or 3, RGB).
    Table-driven: any quant/Huffman tables, any sampling factors
    (replication upsampling), DRI/RST supported. Refuses progressive
    (SOF2) and other non-baseline frames with NotImplementedError."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: bad SOI")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    comps: list[dict] = []
    h = w = None
    restart_interval = 0
    scan = None
    while pos + 4 <= len(data):
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
        elif marker == 0xC0:  # SOF0 baseline
            depth, h, w, nc = struct.unpack_from(">BHHB", body)
            if depth != 8:
                raise NotImplementedError(f"JPEG bit depth {depth}")
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG frame (SOF{marker - 0xC0}); only "
                "baseline sequential (SOF0) decodes"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body)
        elif marker == 0xDA:  # SOS: entropy data follows
            ns = body[0]
            scan = []
            for si in range(ns):
                cs, tdta = body[1 + 2 * si], body[2 + 2 * si]
                comp = next(c for c in comps if c["id"] == cs)
                scan.append((comp, tdta >> 4, tdta & 0xF))
            break
    if scan is None or h is None:
        raise ValueError("truncated JPEG: no SOS/SOF")

    maxh = max(c["h"] for c in comps)
    maxv = max(c["v"] for c in comps)
    mcux = -(-w // (8 * maxh))
    mcuy = -(-h // (8 * maxv))
    planes = [
        np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), np.float64)
        for c, _, _ in scan
    ]
    br = _BitReader(data, pos)
    prev_dc = [0] * len(scan)
    idct_t = _DCT_C.T
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.restart()
                prev_dc = [0] * len(scan)
            mcu_count += 1
            for si, (comp, td, ta) in enumerate(scan):
                dct = huff[(0, td)]
                act = huff[(1, ta)]
                qt = qtabs[comp["tq"]]
                for byi in range(comp["v"]):
                    for bxi in range(comp["h"]):
                        s = _huff_decode(br, dct)
                        diff = _extend(br.bits(s), s) if s else 0
                        prev_dc[si] += diff
                        zz = np.zeros(64, np.int32)
                        zz[0] = prev_dc[si]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(br, act)
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += rs >> 4
                            size = rs & 0xF
                            if k > 63:
                                raise ValueError("JPEG AC index overflow")
                            zz[k] = _extend(br.bits(size), size)
                            k += 1
                        coefs = np.zeros(64, np.float64)
                        coefs[_ZIGZAG] = zz * qt
                        block = idct_t @ coefs.reshape(8, 8) @ _DCT_C + 128.0
                        y0 = (my * comp["v"] + byi) * 8
                        x0 = (mx * comp["h"] + bxi) * 8
                        planes[si][y0:y0 + 8, x0:x0 + 8] = block
    out_planes = []
    for (comp, _, _), p in zip(scan, planes):
        up = np.repeat(
            np.repeat(p, maxv // comp["v"], axis=0), maxh // comp["h"], axis=1
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
