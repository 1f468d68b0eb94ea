"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The container has no image/audio codec LIBRARIES (PIL/cv2/ffmpeg), so
decode is implemented here from the public file-format specs: PPM "P6"
(netpbm), 24-bit BMP (BITMAPINFOHEADER, BI_RGB), PNG (the W3C PNG
spec — stdlib-zlib inflate + per-scanline un-filter, bit depth 8,
color types 0/2/3/4/6, all five filter types), and baseline JPEG
(ITU-T T.81 sequential DCT: canonical Huffman decode with byte
unstuffing and restart markers, dequantize + 8×8 IDCT, 4:4:4/4:2:0/
4:2:2 chroma upsampling, YCbCr→RGB) — a real decode → resize →
feature pipeline over the formats real-world image corpora actually
ship. Progressive JPEG / 12-bit / arithmetic coding raise clearly.

At 100 TB the shape matters more than the codec: payloads stay in
executor-side Arrow batches end-to-end (never driver-collected),
`spark.sql.files.maxPartitionBytes` bounds scan partitions, and
decode + feature extraction is a narrow map (zero shuffles).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 8


def attach_payload(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Build a media table from the documents fixture: utf-8 payload
    bytes + typed metadata (the generic binary-column pattern)."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("format"),
            F.length(payload).cast("long").alias("n_bytes"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
        ).alias("meta"),
    )


def _decode_ppm(payload: bytes) -> np.ndarray:
    """Decode binary PPM ("P6", maxval<=255) per the netpbm spec:
    ASCII header of 3 tokens (width height maxval) with '#' comments,
    one whitespace byte, then width*height*3 raw RGB bytes."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos] not in (10, 13):
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # exactly one whitespace byte after maxval
    width, height, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    n = width * height * 3
    raster = payload[pos : pos + n]
    if len(raster) != n:
        raise ValueError(f"truncated PPM raster: {len(raster)} != {n}")
    return np.frombuffer(raster, dtype=np.uint8).reshape(height, width, 3)


def _decode_bmp(payload: bytes) -> np.ndarray:
    """Decode uncompressed 24-bit BMP (BITMAPINFOHEADER, BI_RGB):
    14-byte file header (pixel offset at byte 10), width/height at
    18/22 (height>0 → bottom-up rows), rows padded to 4 bytes, BGR."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    off = int.from_bytes(payload[10:14], "little")
    width = int.from_bytes(payload[18:22], "little", signed=True)
    height = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24-bit BI_RGB BMP supported (bpp={bpp})")
    bottom_up, height = height > 0, abs(height)
    stride = (width * 3 + 3) & ~3
    rows = np.frombuffer(
        payload[off : off + stride * height], dtype=np.uint8
    ).reshape(height, stride)[:, : width * 3].reshape(height, width, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR → RGB


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# channels per PNG color type at bit depth 8
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    """One PNG chunk: length(4,BE) + type + data + CRC32(type+data)."""
    import zlib

    return (
        len(data).to_bytes(4, "big")
        + typ
        + data
        + (zlib.crc32(typ + data) & 0xFFFFFFFF).to_bytes(4, "big")
    )


def _png_paeth_vec(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Vectorized Paeth predictor (spec §6.6): nearest of (left, up,
    upper-left) to a+b−c, ties broken left → up → upper-left."""
    a = a.astype(np.int32)
    b = b.astype(np.int32)
    c = c.astype(np.int32)
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where(
        (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)
    ).astype(np.uint8)


def _decode_png(payload: bytes) -> np.ndarray:
    """Decode a PNG (public W3C spec) to (H, W, 3) uint8 RGB with
    stdlib zlib: signature → chunk walk with CRC verification → IDAT
    inflate → per-scanline un-filter (all five filter types) →
    color-type expansion (gray replicate, palette lookup, alpha
    dropped). Bit depth 8, non-interlaced only — 16-bit and Adam7
    raise with a clear message rather than decode wrong."""
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, ihdr, plte, idat = 8, None, None, []
    while pos + 12 <= len(payload):
        ln = int.from_bytes(payload[pos : pos + 4], "big")
        typ = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        if len(data) != ln:
            raise ValueError("truncated PNG chunk")
        crc = int.from_bytes(payload[pos + 8 + ln : pos + 12 + ln], "big")
        if (zlib.crc32(typ + data) & 0xFFFFFFFF) != crc:
            raise ValueError(f"PNG chunk {typ!r} CRC mismatch")
        if typ == b"IHDR":
            ihdr = data
        elif typ == b"PLTE":
            plte = data
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None or len(ihdr) != 13 or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    width = int.from_bytes(ihdr[0:4], "big")
    height = int.from_bytes(ihdr[4:8], "big")
    depth, color, interlace = ihdr[8], ihdr[9], ihdr[12]
    if depth != 8:
        raise ValueError(f"only bit depth 8 supported (got {depth})")
    if interlace != 0:
        raise ValueError("Adam7-interlaced PNG not supported")
    if color not in _PNG_CHANNELS:
        raise ValueError(f"unknown PNG color type {color}")
    bpp = _PNG_CHANNELS[color]
    stride = width * bpp
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != (stride + 1) * height:
        raise ValueError(
            f"PNG raster size mismatch: {len(raw)} != {(stride + 1) * height}"
        )
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(raw, np.uint8, stride, y * (stride + 1) + 1)
        if f == 0:  # None
            cur = line.copy()
        elif f == 1:  # Sub: recon[i] = raw[i] + recon[i-bpp] — a
            # per-channel running sum, so cumsum mod 256 along pixels
            cur = (
                line.reshape(width, bpp)
                .astype(np.uint32)
                .cumsum(axis=0)
                .astype(np.uint8)
                .reshape(stride)
            )
        elif f == 2:  # Up (uint8 addition wraps mod 256)
            cur = line + prev
        elif f == 3:  # Average: sequential in x (recon feeds left)
            cur = np.empty(stride, dtype=np.uint8)
            for i in range(stride):
                left = int(cur[i - bpp]) if i >= bpp else 0
                cur[i] = (int(line[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        elif f == 4:  # Paeth: sequential in x
            cur = np.empty(stride, dtype=np.uint8)
            for i in range(stride):
                a = int(cur[i - bpp]) if i >= bpp else 0
                c = int(prev[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (int(line[i]) + pr) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {f}")
        out[y] = cur
        prev = cur
    px = out.reshape(height, width, bpp)
    if color == 3:
        if plte is None or len(plte) % 3:
            raise ValueError("palette PNG missing/malformed PLTE")
        pal = np.frombuffer(plte, np.uint8).reshape(-1, 3)
        idx = px[:, :, 0]
        if int(idx.max(initial=0)) >= pal.shape[0]:
            raise ValueError("PNG palette index out of range")
        return pal[idx]
    if color == 0:
        return np.repeat(px, 3, axis=2)
    if color == 4:
        return np.repeat(px[:, :, :1], 3, axis=2)
    if color == 6:
        return px[:, :, :3].copy()
    return px.copy()  # color type 2 (RGB)


def encode_png(
    img: np.ndarray, *, filter_type: int = 0, grayscale: bool = False
) -> bytes:
    """Serialize an (H, W, 3) uint8 RGB array (or (H, W) with
    ``grayscale=True``) as a genuine PNG: IHDR + one zlib IDAT + IEND,
    every scanline filtered with ``filter_type`` (0-4 — encoding is
    fully vectorizable because the predictors read original bytes).
    Deterministic for a given input (single zlib stream, level 6)."""
    import zlib

    img = np.ascontiguousarray(img, dtype=np.uint8)
    if grayscale:
        if img.ndim != 2:
            raise ValueError("grayscale encode expects (H, W)")
        h, w = img.shape
        bpp, color = 1, 0
        flat = img.reshape(h, w)
    else:
        if img.ndim != 3 or img.shape[2] != 3:
            raise ValueError("RGB encode expects (H, W, 3)")
        h, w = img.shape[:2]
        bpp, color = 3, 2
        flat = img.reshape(h, w * 3)
    if not 0 <= filter_type <= 4:
        raise ValueError(f"unknown PNG filter type {filter_type}")
    raw = bytearray()
    prev = np.zeros(w * bpp, dtype=np.uint8)
    for y in range(h):
        line = flat[y]
        left = np.zeros_like(line)
        left[bpp:] = line[:-bpp]
        if filter_type == 0:
            pred = np.zeros_like(line)
        elif filter_type == 1:
            pred = left
        elif filter_type == 2:
            pred = prev
        elif filter_type == 3:
            pred = ((left.astype(np.int32) + prev) >> 1).astype(np.uint8)
        else:
            upleft = np.zeros_like(prev)
            upleft[bpp:] = prev[:-bpp]
            pred = _png_paeth_vec(left, prev, upleft)
        raw.append(filter_type)
        raw += (line - pred).tobytes()  # uint8 subtraction wraps mod 256
        prev = line
    ihdr = (
        w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + bytes([8, color, 0, 0, 0])
    )
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# Baseline JPEG (ITU-T T.81, public spec) — pure numpy + stdlib. The
# decoder handles any baseline/extended-sequential stream (8-bit, Huffman):
# DQT/SOF0/SOF1/DHT/DRI/SOS marker walk, canonical Huffman per spec C.2,
# entropy decode with 0xFF00 unstuffing and RSTn restarts (F.2), dequantize
# + separable 8×8 IDCT, general (h,v) sampling-factor upsampling, BT.601
# YCbCr→RGB. The encoder (Annex K typical tables, 4:4:4 or 4:2:0) exists to
# round-trip the decoder in tests and fixtures. Progressive (SOF2) and
# 12-bit raise — they are different codecs, not parameter tweaks.
# ---------------------------------------------------------------------------

_JPEG_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

# Annex K quantization matrices (natural row-major order)
_JPEG_QL = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
])
_JPEG_QC = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
])

# Annex K typical Huffman tables: (BITS[1..16], HUFFVAL)
_JPEG_DC_L = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
_JPEG_DC_C = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
_JPEG_AC_L = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
])
_JPEG_AC_C = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
])


def _jpeg_dct_basis() -> np.ndarray:
    u = np.arange(8)[:, None]
    x = np.arange(8)[None, :]
    c = np.where(u == 0, 1 / np.sqrt(2), 1.0)
    return 0.5 * c * np.cos((2 * x + 1) * u * np.pi / 16)


_JPEG_C = _jpeg_dct_basis()


def _jpeg_huff_decode_table(bits, vals):
    """Canonical code assignment per spec C.2: {(length, code): symbol}."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


class _JpegBitReader:
    """Entropy-coded segment reader: 0xFF00 unstuffing; a real marker
    stops consumption (zero-padded reads past it, spec F.2.2.5)."""

    def __init__(self, data: bytes, pos: int):
        self.data, self.pos, self.bitbuf, self.nbits = data, pos, 0, 0

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.pos >= len(self.data):
                self.bitbuf <<= 8
                self.nbits += 8
                continue
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = (
                    self.data[self.pos + 1]
                    if self.pos + 1 < len(self.data)
                    else 0xD9
                )
                if nxt == 0x00:
                    self.pos += 2
                    self.bitbuf = (self.bitbuf << 8) | 0xFF
                    self.nbits += 8
                    continue
                self.bitbuf <<= 8  # real marker: pad, leave pos on it
                self.nbits += 8
                continue
            self.pos += 1
            self.bitbuf = (self.bitbuf << 8) | b
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_huff(self, table) -> int:
        length, code = 0, 0
        while length < 17:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")

    def restart(self) -> None:
        """Byte-align and consume the next RSTn marker (spec F.2.1.3.1)."""
        self.bitbuf = self.nbits = 0
        while self.pos + 1 < len(self.data):
            if (
                self.data[self.pos] == 0xFF
                and 0xD0 <= self.data[self.pos + 1] <= 0xD7
            ):
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("missing JPEG restart marker")


def _jpeg_extend(v: int, t: int) -> int:
    """Spec F.2.2.1: t-bit magnitude → signed coefficient."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _decode_jpeg(payload: bytes) -> np.ndarray:
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos, qt, huff_dc, huff_ac = 2, {}, {}, {}
    sof = None
    restart_interval = 0
    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        # T.81 B.1.1.2: a marker may be preceded by any number of 0xFF
        # fill bytes — skip them before reading the marker id
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        if pos + 2 > len(payload):
            break
        m = payload[pos + 1]
        if m == 0xD9:
            break
        if m == 0x01 or 0xD0 <= m <= 0xD8:
            # standalone markers carry NO length segment: TEM (0x01),
            # RSTn (spec-illegal outside a scan — tolerate), SOI
            pos += 2
            continue
        if pos + 4 > len(payload):
            break
        seg_len = int.from_bytes(payload[pos + 2 : pos + 4], "big")
        seg = payload[pos + 4 : pos + 2 + seg_len]
        if m == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                i += 1
                if pq != 0:
                    raise ValueError("16-bit JPEG quant tables not supported")
                tbl = np.zeros(64, dtype=np.int32)
                tbl[_JPEG_ZIGZAG] = np.frombuffer(seg[i : i + 64], np.uint8)
                qt[tq] = tbl.reshape(8, 8)
                i += 64
        elif m in (0xC0, 0xC1):  # baseline / extended sequential
            if seg[0] != 8:
                raise ValueError("only 8-bit JPEG supported")
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            comps = []
            for ci in range(seg[5]):
                hv = seg[7 + ci * 3]
                comps.append(
                    {"id": seg[6 + ci * 3], "h": hv >> 4, "v": hv & 0xF,
                     "tq": seg[8 + ci * 3]}
                )
            sof = (h, w, comps)
        elif m == 0xC2:
            raise ValueError("progressive JPEG not supported (baseline only)")
        elif m in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported JPEG SOF marker 0x{m:02X}")
        elif m == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                tbl = _jpeg_huff_decode_table(bits, list(seg[i + 17 : i + 17 + n]))
                (huff_dc if tc == 0 else huff_ac)[th] = tbl
                i += 17 + n
        elif m == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif m == 0xDA:  # SOS — entropy data follows
            if sof is None:
                raise ValueError("JPEG SOS before SOF")
            scomp = [
                {"id": seg[1 + si * 2], "td": seg[2 + si * 2] >> 4,
                 "ta": seg[2 + si * 2] & 0xF}
                for si in range(seg[0])
            ]
            return _jpeg_decode_scan(
                payload, pos + 2 + seg_len, sof, scomp, qt,
                huff_dc, huff_ac, restart_interval,
            )
        pos += 2 + seg_len
    raise ValueError("JPEG has no scan")


def _jpeg_decode_scan(payload, pos, sof, scomp, qt, huff_dc, huff_ac, dri):
    h, w, comps = sof
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    by_id = {c["id"]: c for c in comps}
    order = []
    for s in scomp:
        c = by_id[s["id"]]
        c["td"], c["ta"] = s["td"], s["ta"]
        c["plane"] = np.zeros(
            (mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64
        )
        c["dcpred"] = 0
        order.append(c)
    br = _JpegBitReader(payload, pos)
    mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and mcu and mcu % dri == 0:
                br.restart()
                for c in order:
                    c["dcpred"] = 0
            for c in order:
                hdc, hac, q = huff_dc[c["td"]], huff_ac[c["ta"]], qt[c["tq"]]
                for v in range(c["v"]):
                    for hh in range(c["h"]):
                        coef = np.zeros(64, dtype=np.float64)
                        t = br.decode_huff(hdc)
                        c["dcpred"] += _jpeg_extend(br.receive(t), t)
                        coef[0] = c["dcpred"]
                        k = 1
                        while k < 64:
                            rs = br.decode_huff(hac)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC run overflow")
                            coef[_JPEG_ZIGZAG[k]] = _jpeg_extend(br.receive(s), s)
                            k += 1
                        blk = _JPEG_C.T @ (coef.reshape(8, 8) * q) @ _JPEG_C
                        y0 = (my * c["v"] + v) * 8
                        x0 = (mx * c["h"] + hh) * 8
                        c["plane"][y0 : y0 + 8, x0 : x0 + 8] = blk
            mcu += 1
    planes = []
    for c in comps:
        p = c["plane"]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        planes.append(p[:h, :w])
    if len(planes) == 1:
        g = np.clip(np.round(planes[0] + 128), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    if len(planes) != 3:
        raise ValueError(f"unsupported JPEG component count {len(planes)}")
    Y, Cb, Cr = planes[0] + 128, planes[1], planes[2]
    rgb = np.stack(
        [Y + 1.402 * Cr,
         Y - 0.344136 * Cb - 0.714136 * Cr,
         Y + 1.772 * Cb],
        axis=2,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


class _JpegBitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits (spec F.1.2.3)


def encode_jpeg(
    img: np.ndarray,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Serialize an (H, W, 3) uint8 RGB array as a genuine baseline
    JPEG: Annex K quantization tables scaled by ``quality`` (IJG
    convention), Annex K typical Huffman tables, 4:4:4 or
    (``subsample=True``) 4:2:0 with box-mean chroma downsampling,
    optional DRI/RSTn restart markers. Exists to round-trip the
    decoder on genuine lossy streams; deterministic per input."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_jpeg expects (H, W, 3)")
    h, w = img.shape[:2]
    R, G, B = (img[:, :, i].astype(np.float64) for i in range(3))
    Y = 0.299 * R + 0.587 * G + 0.114 * B - 128
    Cb = -0.168736 * R - 0.331264 * G + 0.5 * B
    Cr = 0.5 * R - 0.418688 * G - 0.081312 * B

    quality = max(1, min(100, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    ql = np.clip((_JPEG_QL.astype(np.int64) * s + 50) // 100, 1, 255).reshape(8, 8)
    qc = np.clip((_JPEG_QC.astype(np.int64) * s + 50) // 100, 1, 255).reshape(8, 8)

    def enc_table(bits_vals):
        dec = _jpeg_huff_decode_table(*bits_vals)
        return {sym: (code, length) for (length, code), sym in dec.items()}

    e_dc = [enc_table(_JPEG_DC_L), enc_table(_JPEG_DC_C)]
    e_ac = [enc_table(_JPEG_AC_L), enc_table(_JPEG_AC_C)]

    hY = vY = 2 if subsample else 1
    mcux = -(-w // (8 * hY))
    mcuy = -(-h // (8 * vY))

    def pad_plane(p, ph, pw):
        out = np.zeros((ph, pw))
        out[: p.shape[0], : p.shape[1]] = p
        if p.shape[0] < ph:  # edge-extend, not zero-pad (less ringing)
            out[p.shape[0] :, : p.shape[1]] = p[-1:, :]
        if p.shape[1] < pw:
            out[:, p.shape[1] :] = out[:, p.shape[1] - 1 : p.shape[1]]
        return out

    Yp = pad_plane(Y, mcuy * vY * 8, mcux * hY * 8)
    if subsample:
        def down(p):
            pp = pad_plane(p, -(-h // 2) * 2, -(-w // 2) * 2)
            return (
                pp[0::2, 0::2] + pp[0::2, 1::2] + pp[1::2, 0::2] + pp[1::2, 1::2]
            ) / 4
        Cbp = pad_plane(down(Cb), mcuy * 8, mcux * 8)
        Crp = pad_plane(down(Cr), mcuy * 8, mcux * 8)
    else:
        Cbp = pad_plane(Cb, mcuy * 8, mcux * 8)
        Crp = pad_plane(Cr, mcuy * 8, mcux * 8)

    bw = _JpegBitWriter()
    pred = [0, 0, 0]

    def put_block(plane, y0, x0, q, tsel, ci):
        blk = _JPEG_C @ plane[y0 : y0 + 8, x0 : x0 + 8] @ _JPEG_C.T
        zz = np.round(blk / q).astype(np.int64).flatten()[_JPEG_ZIGZAG]
        diff = int(zz[0]) - pred[ci]
        pred[ci] = int(zz[0])
        t = abs(diff).bit_length()
        code, ln = e_dc[tsel][t]
        bw.write(code, ln)
        if t:
            bw.write(diff if diff > 0 else diff + (1 << t) - 1, t)
        nz = np.nonzero(zz[1:])[0]
        last = (nz[-1] + 1) if len(nz) else 0
        run = 0
        for k in range(1, last + 1):
            if zz[k] == 0:
                run += 1
                continue
            while run > 15:
                code, ln = e_ac[tsel][0xF0]  # ZRL
                bw.write(code, ln)
                run -= 16
            v = int(zz[k])
            sz = abs(v).bit_length()
            code, ln = e_ac[tsel][(run << 4) | sz]
            bw.write(code, ln)
            bw.write(v if v > 0 else v + (1 << sz) - 1, sz)
            run = 0
        if last < 63:
            code, ln = e_ac[tsel][0x00]  # EOB
            bw.write(code, ln)

    mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + ((mcu // restart_interval - 1) % 8)])
                pred[0] = pred[1] = pred[2] = 0
            for v in range(vY):
                for hh in range(hY):
                    put_block(Yp, (my * vY + v) * 8, (mx * hY + hh) * 8, ql, 0, 0)
            put_block(Cbp, my * 8, mx * 8, qc, 1, 1)
            put_block(Crp, my * 8, mx * 8, qc, 1, 2)
            mcu += 1
    bw.flush()

    def seg(marker, body):
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    def dqt(tq, tbl):
        return seg(
            0xDB, bytes([tq]) + bytes(tbl.flatten()[_JPEG_ZIGZAG].astype(np.uint8))
        )

    def dht(tc, th, bits_vals):
        bits, vals = bits_vals
        return seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))

    out = b"\xff\xd8" + dqt(0, ql) + dqt(1, qc)
    out += seg(
        0xC0,
        bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([3])
        + bytes([1, (hY << 4) | vY, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1]),
    )
    out += dht(0, 0, _JPEG_DC_L) + dht(1, 0, _JPEG_AC_L)
    out += dht(0, 1, _JPEG_DC_C) + dht(1, 1, _JPEG_AC_C)
    if restart_interval:
        out += seg(0xDD, restart_interval.to_bytes(2, "big"))
    out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    return out + bytes(bw.out) + b"\xff\xd9"


def _gif_lzw_compress(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF-variant LZW (spec appendix F): variable code width starting
    at min_code_size+1, LSB-first bit packing, CLEAR emitted up front
    and again when the table hits 4096 codes."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    bitbuf = nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal bitbuf, nbits
        bitbuf |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            nbits -= 8

    table: dict[tuple[int, int], int] = {}
    next_code = end + 1
    width = min_code_size + 1
    emit(clear, width)
    prefix = -1
    for k in map(int, indices):
        if prefix < 0:
            prefix = k
            continue
        got = table.get((prefix, k))
        if got is not None:
            prefix = got
            continue
        emit(prefix, width)
        table[(prefix, k)] = next_code
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code == 4096:
            emit(clear, width)
            table.clear()
            next_code = end + 1
            width = min_code_size + 1
        prefix = k
    if prefix >= 0:
        emit(prefix, width)
    emit(end, width)
    if nbits:
        out.append(bitbuf & 0xFF)
    return bytes(out)


def _gif_lzw_decompress(data: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code_size + 1
    out = bytearray()
    bitbuf = nbits = pos = 0
    prev: bytes | None = None
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("GIF LZW stream truncated")
            bitbuf |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = bitbuf & ((1 << width) - 1)
        bitbuf >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            return bytes(out)
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the cScSc special case
        else:
            raise ValueError("bad GIF LZW code")
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
            # width grows when the table FILLS the current code space
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def encode_gif(img: np.ndarray) -> bytes:
    """Serialize an (H, W, 3) uint8 array as a single-frame GIF89a
    (public spec: logical screen descriptor, global color table, LZW
    image data). GIF is palette-based — more than 256 distinct colors
    raises (an honest limit, not quantization-by-stealth)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    flat = img.reshape(-1, 3)
    palette, indices = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(f"GIF palette overflow: {len(palette)} colors > 256")
    # GCT size is a power of two ≥ 2 entries
    size_bits = max(1, int(np.ceil(np.log2(max(2, len(palette))))))
    n_entries = 1 << size_bits
    gct = np.zeros((n_entries, 3), dtype=np.uint8)
    gct[: len(palette)] = palette
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out.append(0x80 | ((size_bits - 1) << 4) | (size_bits - 1))  # GCT flag+size
    out += b"\x00\x00"  # bg index, aspect
    out += gct.tobytes()
    out += b"\x2c" + b"\x00\x00\x00\x00"  # image descriptor at (0,0)
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little") + b"\x00"
    mcs = max(2, size_bits)
    out.append(mcs)
    lzw = _gif_lzw_compress(indices.astype(np.int64), mcs)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def _decode_gif(payload: bytes) -> np.ndarray:
    """GIF87a/89a decode (public spec): LSD + color tables, extension
    skip, LZW decompress, interlace reassembly; the FIRST frame is
    composed onto a background-color canvas and returned as RGB."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    w = int.from_bytes(payload[6:8], "little")
    h = int.from_bytes(payload[8:10], "little")
    packed, bg = payload[10], payload[11]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload[pos : pos + 3 * n], np.uint8).reshape(n, 3)
        pos += 3 * n
    while pos < len(payload):
        b0 = payload[pos]
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension: label + sub-blocks
            pos += 2
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b0 != 0x2C:
            raise ValueError(f"bad GIF block 0x{b0:02X}")
        left = int.from_bytes(payload[pos + 1 : pos + 3], "little")
        top = int.from_bytes(payload[pos + 3 : pos + 5], "little")
        fw = int.from_bytes(payload[pos + 5 : pos + 7], "little")
        fh = int.from_bytes(payload[pos + 7 : pos + 9], "little")
        fpack = payload[pos + 9]
        pos += 10
        table = gct
        if fpack & 0x80:
            n = 2 << (fpack & 0x07)
            table = np.frombuffer(payload[pos : pos + 3 * n], np.uint8).reshape(n, 3)
            pos += 3 * n
        if table is None:
            raise ValueError("GIF frame has no color table")
        mcs = payload[pos]
        pos += 1
        data = bytearray()
        while payload[pos] != 0:
            ln = payload[pos]
            data += payload[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = np.frombuffer(
            _gif_lzw_decompress(bytes(data), mcs), np.uint8
        )
        if len(idx) < fw * fh:
            raise ValueError("GIF frame data truncated")
        rows = idx[: fw * fh].reshape(fh, fw)
        if fpack & 0x40:  # interlaced: reassemble the four passes
            de = np.zeros_like(rows)
            src = 0
            for start, step in _GIF_INTERLACE_PASSES:
                n_rows = len(range(start, fh, step))
                de[start::step] = rows[src : src + n_rows]
                src += n_rows
            rows = de
        if idx.max() >= len(table):
            raise ValueError("GIF index beyond color table")
        canvas_idx = np.full((h, w), min(bg, len(table) - 1), dtype=np.uint8)
        canvas_idx[top : top + fh, left : left + fw] = rows
        return table[canvas_idx]
    raise ValueError("GIF has no image data")


def decode_image(payload: bytes) -> np.ndarray:
    """Decode an image payload to an (H, W, 3) uint8 RGB array.

    Real decoders (from the public format specs, no codec library):
    PPM P6, uncompressed 24-bit BMP, PNG (stdlib-zlib inflate +
    per-scanline un-filter), baseline JPEG (Huffman + IDCT), and GIF
    (LZW + palette, first frame). Anything else (WebP, AVIF, ...)
    needs a codec library absent from this container and raises."""
    if payload[:2] == b"P6":
        return _decode_ppm(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[:8] == _PNG_SIG:
        return _decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        return _decode_jpeg(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return _decode_gif(payload)
    raise NotImplementedError(
        "only PPM(P6)/BMP(24-bit)/PNG/baseline-JPEG/GIF decode in this "
        "environment; other formats require an image codec library not "
        "present here"
    )


def encode_ppm(img: np.ndarray) -> bytes:
    """Serialize an (H, W, 3) uint8 array as binary PPM (P6)."""
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(img, dtype=np.uint8).tobytes()


def resize_image(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize (floor sampling): out[j, i] =
    img[j*H//height, i*W//width] — integer-exact, so an SQL oracle can
    reproduce it bit-for-bit."""
    h, w = img.shape[:2]
    ys = (np.arange(height) * h) // height
    xs = (np.arange(width) * w) // width
    return img[np.ix_(ys, xs)]


def synth_image(seed: int, width: int, height: int) -> np.ndarray:
    """Deterministic synthetic RGB test image:
    pixel[y, x, c] = (3x + 7y + 11*(seed % 97) + 29c) % 256.
    Pure integer arithmetic — expressible in ANSI SQL for oracles."""
    x = np.arange(width)[None, :, None]
    y = np.arange(height)[:, None, None]
    c = np.arange(3)[None, None, :]
    return ((3 * x + 7 * y + 11 * (seed % 97) + 29 * c) % 256).astype(np.uint8)


def synth_smooth_image(seed: int, width: int, height: int) -> np.ndarray:
    """Deterministic CONTINUOUS synthetic RGB image (triangle wave —
    |Δ| ≤ 7 between adjacent pixels, range [96, 160], per-channel phase
    shift): the lossy-codec test fixture. synth_image's mod-256 wraps
    are step edges that a DCT codec legitimately rings on; a round-trip
    contract needs content without discontinuities."""
    x = np.arange(width)[None, :, None]
    y = np.arange(height)[:, None, None]
    c = np.arange(3)[None, None, :]
    t = (3 * x + 7 * y + 11 * (seed % 97) + 17 * c) % 128
    return (96 + np.where(t < 64, t, 128 - t)).astype(np.uint8)


def jpeg_roundtrip_stats(
    df: DataFrame, quality: int = 95, max_err: int = 24, mean_err: float = 4.0
) -> DataFrame:
    """Lossy-codec contract scan: per media row, build the smooth
    deterministic fixture, encode it as a genuine baseline JPEG
    (subsampling and restart-interval vary by id so 4:4:4, 4:2:0, and
    RSTn paths are all exercised), decode it back, and emit
    [media_id, width, height, roundtrip_ok] where roundtrip_ok bounds
    the reconstruction error (max |err| ≤ max_err, mean ≤ mean_err).
    The DCT/Huffman math is not SQL-expressible, so the driver-checked
    surface is exact geometry + the boolean (the parseval_ok device):
    a skipped or broken codec path cannot return TRUE. Narrow Arrow
    map, zero shuffles."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
            T.StructField("roundtrip_ok", T.BooleanType(), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid in pdf["media_id"].astype("int64"):
                i = int(mid)
                w, h = 16 + (i % 3) * 8, 16 + (i % 2) * 8
                img = synth_smooth_image(i, w, h)
                try:
                    dec = decode_image(
                        encode_jpeg(
                            img,
                            quality=quality,
                            subsample=(i % 2 == 1),
                            restart_interval=i % 3,
                        )
                    )
                    err = np.abs(dec.astype(np.int64) - img.astype(np.int64))
                    ok = (
                        dec.shape == img.shape
                        and int(err.max()) <= max_err
                        and float(err.mean()) <= mean_err
                    )
                    rows.append((i, dec.shape[1], dec.shape[0], bool(ok)))
                except (ValueError, NotImplementedError):
                    rows.append((i, None, None, False))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "roundtrip_ok"]
            )

    return df.select("media_id").mapInPandas(batches, out_schema)


def decode_resize_features(
    df: DataFrame, width: int = 8, height: int = 8
) -> DataFrame:
    """REAL image pipeline: binary payload → decode (PPM/BMP) →
    nearest-neighbor resize → per-channel mean features.

    Narrow Arrow-batched map, zero shuffles; decode failures surface as
    NULL feature rows (the standard corrupt-sample policy in training
    pipelines) rather than failing the job."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
            T.StructField("mean_r", T.DoubleType(), True),
            T.StructField("mean_g", T.DoubleType(), True),
            T.StructField("mean_b", T.DoubleType(), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    img = decode_image(bytes(payload))
                    h, w = img.shape[:2]
                    small = resize_image(img, width, height).astype(np.int64)
                    means = small.reshape(-1, 3).mean(axis=0)
                    rows.append((mid, w, h, means[0], means[1], means[2]))
                except (ValueError, NotImplementedError):
                    rows.append((mid, None, None, None, None, None))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "mean_r", "mean_g", "mean_b"]
            )

    return df.select("media_id", "payload").mapInPandas(batches, out_schema)


def _decode_wav(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a PCM WAV (RIFF) file per the public spec: 'RIFF'/'WAVE'
    container, chunk walk for 'fmt ' (must be PCM int16) and 'data'.
    Returns (sample_rate, channels, int16 samples interleaved)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, rate, channels, bits, data = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = int.from_bytes(body[0:2], "little")
            channels = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
            if fmt != 1 or bits != 16:
                raise ValueError(f"only 16-bit PCM supported (fmt={fmt}, bits={bits})")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    return rate, channels, np.frombuffer(data, dtype="<i2")


def encode_wav(samples: np.ndarray, sample_rate: int, channels: int = 1) -> bytes:
    """Serialize int16 samples as a canonical 44-byte-header PCM WAV."""
    data = np.asarray(samples, dtype="<i2").tobytes()
    byte_rate = sample_rate * channels * 2
    hdr = (
        b"RIFF" + (36 + len(data)).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + channels.to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little") + byte_rate.to_bytes(4, "little")
        + (channels * 2).to_bytes(2, "little") + (16).to_bytes(2, "little")
        + b"data" + len(data).to_bytes(4, "little")
    )
    return hdr + data


def synth_audio(seed: int, n: int) -> np.ndarray:
    """Deterministic int16 test signal:
    s_k = ((31k² + 17·(seed % 89)) mod 65536) − 32768.
    Pure integer arithmetic — expressible in ANSI SQL for oracles."""
    k = np.arange(n, dtype=np.int64)
    return ((31 * k * k + 17 * (seed % 89)) % 65536 - 32768).astype(np.int16)


def attach_synth_wav(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Media table of REAL WAV bytes: per row, 64 + id%37 samples at
    8000 + (id%3)·4000 Hz from synth_audio(id) — a genuine PCM file
    any audio tool would play."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf["media_id"].astype("int64")
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "payload": [
                        encode_wav(
                            synth_audio(i, 64 + i % 37), 8000 + (i % 3) * 4000
                        )
                        for i in ids
                    ],
                }
            )

    return df.select(F.col(id_col).cast("long").alias("media_id")).mapInPandas(
        batches, out_schema
    )


def audio_features(df: DataFrame) -> DataFrame:
    """REAL audio pipeline: WAV payload → spec-based decode → signal
    stats (peak, mean |s|, RMS). Narrow Arrow-batched map, zero
    shuffles; undecodable payloads degrade to NULL rows. Sums are
    integer-exact in double (≤2³⁷ for bench-sized clips), so the stats
    are bit-reproducible cross-engine."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("sample_rate", T.IntegerType(), True),
            T.StructField("n_samples", T.LongType(), True),
            T.StructField("peak", T.LongType(), True),
            T.StructField("mean_abs", T.DoubleType(), True),
            T.StructField("rms", T.DoubleType(), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    rate, _, s = _decode_wav(bytes(payload))
                    v = s.astype(np.int64)
                    n = len(v)
                    rows.append(
                        (
                            mid,
                            rate,
                            n,
                            int(np.abs(v).max()) if n else None,
                            float(np.abs(v).sum()) / n if n else None,
                            float(np.sqrt(float((v * v).sum()) / n)) if n else None,
                        )
                    )
                except ValueError:
                    rows.append((mid, None, None, None, None, None))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "sample_rate", "n_samples", "peak", "mean_abs", "rms"],
            )

    return df.select("media_id", "payload").mapInPandas(batches, out_schema)


def _decode_y4m(payload: bytes) -> tuple[int, int, list[np.ndarray]]:
    """Decode YUV4MPEG2 (.y4m) per the public spec: ASCII stream header
    "YUV4MPEG2 W<w> H<h> F<n>:<d> ... [C<space>]\\n", then per frame a
    "FRAME[ params]\\n" marker followed by raw planes — Y (w·h) plus
    U,V (w/2·h/2 each) for 4:2:0. Returns (width, height, Y planes);
    chroma is parsed past but not returned (luma features only)."""
    nl = payload.index(b"\n")
    header = payload[:nl].split(b" ")
    if header[0] != b"YUV4MPEG2":
        raise ValueError("not a YUV4MPEG2 stream")
    width = height = None
    colorspace = b"420"
    for tok in header[1:]:
        if tok[:1] == b"W":
            width = int(tok[1:])
        elif tok[:1] == b"H":
            height = int(tok[1:])
        elif tok[:1] == b"C":
            colorspace = tok[1:]
    if width is None or height is None:
        raise ValueError("missing W/H in y4m header")
    if not colorspace.startswith(b"420"):
        raise ValueError(f"only C420* supported, got {colorspace!r}")
    y_size = width * height
    frame_size = y_size + 2 * (width // 2) * (height // 2)
    frames: list[np.ndarray] = []
    pos = nl + 1
    while pos < len(payload):
        fnl = payload.index(b"\n", pos)
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError("bad FRAME marker")
        pos = fnl + 1
        y = payload[pos : pos + y_size]
        if len(y) != y_size:
            raise ValueError("truncated y4m frame")
        frames.append(np.frombuffer(y, dtype=np.uint8).reshape(height, width))
        pos += frame_size
    return width, height, frames


def encode_y4m(frames_y: list[np.ndarray], width: int, height: int) -> bytes:
    """Serialize luma frames as a C420 YUV4MPEG2 stream (chroma planes
    neutral 128)."""
    chroma = bytes([128]) * (2 * (width // 2) * (height // 2))
    out = [b"YUV4MPEG2 W%d H%d F25:1 Ip A1:1 C420\n" % (width, height)]
    for y in frames_y:
        out.append(b"FRAME\n")
        out.append(np.ascontiguousarray(y, dtype=np.uint8).tobytes())
        out.append(chroma)
    return b"".join(out)


def synth_video(seed: int, width: int, height: int, n_frames: int) -> list[np.ndarray]:
    """Deterministic luma frames: frame f pixel (y, x) =
    (5x + 3y + 11f + 7·(seed % 83)) % 256 — ANSI-SQL-expressible."""
    x = np.arange(width)[None, :]
    y = np.arange(height)[:, None]
    return [
        ((5 * x + 3 * y + 11 * f + 7 * (seed % 83)) % 256).astype(np.uint8)
        for f in range(n_frames)
    ]


def attach_synth_y4m(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Media table of REAL Y4M bytes: per row 2 + id%4 frames of
    (8 + 2·(id%3)) × (6 + 2·(id%2)) video from synth_video(id)."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf["media_id"].astype("int64")
            payloads = []
            for i in ids:
                w, h, nf = 8 + 2 * (i % 3), 6 + 2 * (i % 2), 2 + i % 4
                payloads.append(encode_y4m(synth_video(i, w, h, nf), w, h))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    return df.select(F.col(id_col).cast("long").alias("media_id")).mapInPandas(
        batches, out_schema
    )


def video_frame_stats(df: DataFrame, every_n: int = 2) -> DataFrame:
    """REAL video pipeline: Y4M payload → spec-based decode → sample
    every ``every_n``-th frame → per-frame mean luma. One output row
    per sampled frame — the decode-and-frame-sample scan a video
    training pipeline runs. Narrow Arrow map, zero shuffles;
    undecodable payloads yield a single NULL row."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
            T.StructField("n_frames", T.LongType(), True),
            T.StructField("frame_no", T.LongType(), True),
            T.StructField("mean_y", T.DoubleType(), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    w, h, frames = _decode_y4m(bytes(payload))
                    for f in range(0, len(frames), every_n):
                        mean_y = float(frames[f].astype(np.int64).sum()) / (w * h)
                        rows.append((mid, w, h, len(frames), f, mean_y))
                except ValueError:
                    rows.append((mid, None, None, None, None, None))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height", "n_frames", "frame_no", "mean_y"],
            )

    return df.select("media_id", "payload").mapInPandas(batches, out_schema)


def attach_synth_ppm(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Media table of REAL PPM bytes, one synthetic image per row:
    size (4 + id%5) × (4 + id%3), pixels from synth_image(id). The
    payload is a genuine P6 file that any netpbm tool would open."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf["media_id"].astype("int64")
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "payload": [
                        encode_ppm(synth_image(i, 4 + i % 5, 4 + i % 3))
                        for i in ids
                    ],
                }
            )

    return df.select(F.col(id_col).cast("long").alias("media_id")).mapInPandas(
        batches, out_schema
    )


def _fake_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for a learned feature extractor: 8 floats
    from the md5 digest, in [0, 1)."""
    dig = hashlib.md5(payload).digest()
    return [int.from_bytes(dig[2 * i: 2 * i + 2], "big") / 65536.0 for i in range(FEATURE_DIM)]


def extract_features(df: DataFrame, batch_size: int = 256) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow-batched; yields the same rows plus a features array. The
    fake extractor is deterministic so tests (and re-runs on retries —
    important for speculative execution at scale) are stable.
    """

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("n_bytes", T.LongType(), True),
            T.StructField("features", T.ArrayType(T.DoubleType()), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for start in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[start: start + batch_size]
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"].astype("int64"),
                        "n_bytes": chunk["payload"].map(len).astype("int64"),
                        "features": chunk["payload"].map(_fake_features),
                    }
                )

    return df.select("media_id", "payload").mapInPandas(batches, out_schema)


def resize_media(df: DataFrame, width: int = 16, height: int = 16) -> DataFrame:
    """mapInPandas resize plumbing: payload → fixed (width*height)-byte
    "pixel buffer" + updated meta.

    A real implementation would decode_image() then interpolate; no
    codec exists in this container, so the resample step is a
    DETERMINISTIC FAKE (stride-sampled payload bytes, zero-padded).
    The Spark-side contract — Arrow batches in, binary out, meta struct
    updated, narrow map with zero shuffles — is the real, tested part.
    """
    target = width * height

    def _fake_resize(payload: bytes) -> bytes:
        if len(payload) >= target:
            stride = len(payload) / target
            return bytes(payload[int(i * stride)] for i in range(target))
        return payload + b"\x00" * (target - len(payload))

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), True),
            T.StructField("meta", MEDIA_SCHEMA["meta"].dataType, True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            resized = pdf["payload"].map(_fake_resize)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "payload": resized,
                    "meta": [
                        {
                            "format": "raw/fake",
                            "n_bytes": len(p),
                            "width": width,
                            "height": height,
                        }
                        for p in resized
                    ],
                }
            )

    return df.select("media_id", "payload").mapInPandas(batches, out_schema)


def frame_sample(df: DataFrame, every_n_bytes: int = 64, max_frames: int = 8) -> DataFrame:
    """'Frame sampling' plumbing demo: slice fixed-stride byte windows
    from each payload (stand-in for video frame extraction) — pure
    Column ops, one row per (media_id, frame_no)."""
    frames = F.transform(
        F.sequence(
            F.lit(0),
            F.least(
                F.floor((F.length("payload") - 1) / every_n_bytes).cast("int"),
                F.lit(max_frames - 1),
            ),
        ),
        lambda i: F.struct(
            i.cast("int").alias("frame_no"),
            F.substring(F.col("payload"), i * every_n_bytes + 1, every_n_bytes).alias("frame"),
        ),
    )
    return (
        df.filter(F.length("payload") > 0)
        .select("media_id", F.explode(frames).alias("f"))
        .select("media_id", F.col("f.frame_no").alias("frame_no"), F.col("f.frame").alias("frame"))
    )


def audio_spectrum(df: DataFrame) -> DataFrame:
    """REAL frequency-domain audio features: WAV payload → decode →
    real FFT → [media_id, n_samples, energy, dominant_bin,
    dominant_hz, parseval_ok]. Narrow Arrow-batched map like
    audio_features — zero shuffles; undecodable payloads → NULL row.

    ``energy`` is the exact integer Σs² (≤ 2³⁷ at bench clip lengths —
    exact in the BIGINT output). ``parseval_ok`` asserts Parseval's
    identity Σ|X|²/N = Σs² to 1e-9 relative — a transform that was
    skipped, windowed wrong, or truncated cannot satisfy it, so an
    exact-SQL oracle can verify the FFT ran correctly without being
    able to compute the spectrum itself. ``dominant_bin`` excludes DC
    (bin 0): synthetic integer signals carry most energy at DC, and
    real pitch features always mask it.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("n_samples", T.LongType(), True),
            T.StructField("energy", T.LongType(), True),
            T.StructField("dominant_bin", T.LongType(), True),
            T.StructField("dominant_hz", T.DoubleType(), True),
            T.StructField("parseval_ok", T.BooleanType(), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    rate, _, s = _decode_wav(bytes(payload))
                    v = s.astype(np.float64)
                    n = len(v)
                    if n == 0:
                        rows.append((mid, 0, 0, None, None, None))
                        continue
                    energy = int((s.astype(np.int64) ** 2).sum())
                    spec = np.fft.rfft(v)
                    # Σ|X|²/N over the full symmetric spectrum: non-DC,
                    # non-Nyquist rfft bins count twice.
                    mag2 = np.abs(spec) ** 2
                    w = np.full(len(mag2), 2.0)
                    w[0] = 1.0
                    if n % 2 == 0:
                        w[-1] = 1.0
                    total = float((mag2 * w).sum()) / n
                    ok = abs(total - energy) <= 1e-9 * max(energy, 1)
                    bin_ = int(np.argmax(mag2[1:]) + 1) if len(mag2) > 1 else None
                    rows.append(
                        (
                            mid,
                            n,
                            energy,
                            bin_,
                            (bin_ * rate / n) if bin_ is not None else None,
                            bool(ok),
                        )
                    )
                except ValueError:
                    rows.append((mid, None, None, None, None, None))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "n_samples", "energy",
                    "dominant_bin", "dominant_hz", "parseval_ok",
                ],
            )

    return df.select("media_id", "payload").mapInPandas(batches, out_schema)


def image_edge_features(df: DataFrame) -> DataFrame:
    """REAL 2-D image processing: payload → decode → integer Sobel
    gradients over the channel-sum grayscale → [media_id, width,
    height, n_interior, edge_energy]. Arrow narrow map, zero shuffles;
    undecodable payloads degrade to NULL rows.

    edge_energy = Σ over interior pixels of |Gx| + |Gy| with the
    standard 3×3 Sobel kernels, computed in pure integer arithmetic
    (gray = r+g+b, no luma weights) so the statistic is EXACT — an
    oracle can replay the convolution symbolically and any decode /
    indexing / border bug changes the hash. The per-image cost is
    O(pixels); at corpus scale this pipelines into the payload scan.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
            T.StructField("n_interior", T.LongType(), True),
            T.StructField("edge_energy", T.LongType(), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    img = decode_image(bytes(payload))
                    h, w = img.shape[:2]
                    g = img.astype(np.int64).sum(axis=2)
                    if h < 3 or w < 3:
                        rows.append((mid, w, h, 0, 0))
                        continue
                    gx = (
                        (g[:-2, 2:] + 2 * g[1:-1, 2:] + g[2:, 2:])
                        - (g[:-2, :-2] + 2 * g[1:-1, :-2] + g[2:, :-2])
                    )
                    gy = (
                        (g[2:, :-2] + 2 * g[2:, 1:-1] + g[2:, 2:])
                        - (g[:-2, :-2] + 2 * g[:-2, 1:-1] + g[:-2, 2:])
                    )
                    rows.append(
                        (
                            mid,
                            w,
                            h,
                            int(gx.size),
                            int((np.abs(gx) + np.abs(gy)).sum()),
                        )
                    )
                except ValueError:
                    rows.append((mid, None, None, None, None))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height", "n_interior", "edge_energy"],
            )

    return df.select("media_id", "payload").mapInPandas(batches, out_schema)


def video_motion_energy(df: DataFrame) -> DataFrame:
    """REAL temporal video feature: Y4M payload → decode → sum of
    absolute luma differences between adjacent frames (the classic
    motion/scene-change statistic) → [media_id, width, height,
    n_frames, n_pairs, motion_energy]. Arrow narrow map, zero
    shuffles; undecodable payloads degrade to NULL rows. All integer
    arithmetic — exact, so an oracle can replay it symbolically.
    Single-frame clips report 0 pairs / 0 energy.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
            T.StructField("n_frames", T.LongType(), True),
            T.StructField("n_pairs", T.LongType(), True),
            T.StructField("motion_energy", T.LongType(), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    w, h, frames = _decode_y4m(bytes(payload))
                    energy = 0
                    for a, b in zip(frames, frames[1:]):
                        energy += int(
                            np.abs(a.astype(np.int64) - b.astype(np.int64)).sum()
                        )
                    rows.append(
                        (mid, w, h, len(frames), max(len(frames) - 1, 0), energy)
                    )
                except ValueError:
                    rows.append((mid, None, None, None, None, None))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height",
                    "n_frames", "n_pairs", "motion_energy",
                ],
            )

    return df.select("media_id", "payload").mapInPandas(batches, out_schema)


# ---------------------------------------------------------------------------
# Perceptual image hashing (aHash / dHash) + near-duplicate fixtures.
#
# Image dedup is a first-class curation step in multimodal training
# pipelines (LAION-style dedup runs on perceptual hashes before any
# embedding model touches the corpus). aHash/dHash are the public
# imagehash-library constructions (average hash: bit = cell >= mean;
# difference hash: bit = cell < right neighbor), computed here over the
# REAL byte path — decode → nearest-neighbor resample → integer
# comparisons — so the whole hash is exact integer arithmetic that an
# SQL oracle can replay symbolically (same device as the Sobel
# edge-energy oracle above). Mean comparison is cross-multiplied
# (gray*64 >= total) to stay in integers; classic aHash's float mean
# would differ in the last bit across engines.
# ---------------------------------------------------------------------------


def synth_image_varied(seed: int, width: int, height: int) -> np.ndarray:
    """Deterministic synthetic RGB image with seed-dependent spatial
    frequencies: pixel[y, x, c] =
    ((3 + seed%5)·x + (5 + seed%7)·y + (seed%11)·x·y + 11·seed + 29·c) % 256.
    Unlike synth_image (whose seeds differ only by an additive offset,
    so perceptual hashes collide heavily), varying the x/y/xy
    coefficients gives each seed a distinct texture. Pure integer
    arithmetic — expressible in ANSI SQL for oracles."""
    x = np.arange(width)[None, :, None]
    y = np.arange(height)[:, None, None]
    c = np.arange(3)[None, None, :]
    return (
        ((3 + seed % 5) * x + (5 + seed % 7) * y + (seed % 11) * x * y
         + 11 * seed + 29 * c) % 256
    ).astype(np.uint8)


def invert_corner_block(img: np.ndarray) -> np.ndarray:
    """Near-duplicate perturbation: invert the top-left h//4 × w//4
    pixel block (pixel → 255 − pixel per channel). A small localized
    edit — the canonical 'same image, small retouch' near-dup case."""
    out = img.copy()
    h, w = out.shape[:2]
    out[: h // 4, : w // 4] = 255 - out[: h // 4, : w // 4]
    return out


def attach_phash_media(
    df: DataFrame, id_col: str = "doc_id", n_images: int = 40,
    fmt: str = "ppm",
) -> DataFrame:
    """Media table of REAL image bytes for the perceptual-hash queries:
    image content repeats with period ``n_images`` (seed = id %
    n_images, size (8 + seed%5) × (8 + seed%3)) so exact duplicate
    groups exist by construction, and every id % 4 == 0 row carries
    the corner-inverted variant of its seed image — a near-duplicate
    of the base, not an exact one. ``fmt``: "ppm" (P6), "png"
    (zlib-compressed, filter type = seed % 5 so every un-filter path
    in the decoder is exercised by the oracle-checked rows), or "gif"
    (palette + LZW) — all three decode losslessly, so the perceptual
    hashes are format-independent by construction."""
    if fmt not in ("ppm", "png", "gif"):
        raise ValueError(f"unknown media fmt {fmt!r}")
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Payload depends only on (id % n_images, id % 4 == 0) — a
        # BOUNDED domain of 2*n_images entries — so synth+encode runs
        # once per distinct image per task instead of once per row
        # (guide-§4.5 per-task amortization; the cache bound is the
        # n_images parameter, not the data).
        cache: dict[tuple[int, bool], bytes] = {}
        for pdf in it:
            ids = pdf["media_id"].astype("int64")
            payloads = []
            for i in ids:
                key = (int(i) % n_images, int(i) % 4 == 0)
                p = cache.get(key)
                if p is None:
                    seed, inv = key
                    img = synth_image_varied(seed, 8 + seed % 5, 8 + seed % 3)
                    if inv:
                        img = invert_corner_block(img)
                    if fmt == "png":
                        p = encode_png(img, filter_type=seed % 5)
                    elif fmt == "gif":
                        p = encode_gif(img)
                    else:
                        p = encode_ppm(img)
                    cache[key] = p
                payloads.append(p)
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    return df.select(F.col(id_col).cast("long").alias("media_id")).mapInPandas(
        batches, out_schema
    )


def _pack_bits_signed(bits: np.ndarray) -> int:
    """64 bits (MSB first) → signed two's-complement int64."""
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return v - (1 << 64) if v >= (1 << 63) else v


def ahash64(img: np.ndarray) -> int:
    """Average hash: NN-resample to 8×8, gray = r+g+b (0..765), bit =
    gray·64 >= Σgray (integer cross-multiplied mean), packed row-major
    MSB-first into a signed int64."""
    g = resize_image(img, 8, 8).astype(np.int64).sum(axis=2)
    return _pack_bits_signed((g.flatten() * 64 >= g.sum()).astype(np.uint8))


def dhash64(img: np.ndarray) -> int:
    """Difference hash: NN-resample to 9×8, bit = gray[r,c] <
    gray[r,c+1] (8 gradient bits × 8 rows), packed like ahash64."""
    g = resize_image(img, 9, 8).astype(np.int64).sum(axis=2)
    return _pack_bits_signed((g[:, :-1] < g[:, 1:]).flatten().astype(np.uint8))


def image_hashes(df: DataFrame) -> DataFrame:
    """Perceptual hashes over the real byte path: payload → decode
    (PPM/BMP) → aHash + dHash. Narrow Arrow-batched map, zero
    shuffles; undecodable payloads yield NULL hashes (corrupt-sample
    policy), so a bad file can't fail a 100 TB dedup scan."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("ahash", T.LongType(), True),
            T.StructField("dhash", T.LongType(), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    img = decode_image(bytes(payload))
                    rows.append((mid, ahash64(img), dhash64(img)))
                except (ValueError, NotImplementedError):
                    rows.append((mid, None, None))
            yield pd.DataFrame(rows, columns=["media_id", "ahash", "dhash"])

    return df.select("media_id", "payload").mapInPandas(batches, out_schema)


def with_hash_bands(
    df: DataFrame, hash_col: str, max_hamming: int = 7
) -> DataFrame:
    """Explode a 64-bit hash column into ``max_hamming + 1`` equal
    bands [band_id, band_val] (pigeonhole: any pair within max_hamming
    bits agrees exactly on at least one band). Shared by the batch
    near-dup join and the streaming image-dedup index."""
    n_bands = max_hamming + 1
    if 64 % n_bands:
        raise ValueError(f"64 not divisible by {n_bands} bands")
    width = 64 // n_bands
    mask = (1 << width) - 1
    return df.select(
        "*",
        F.posexplode(
            F.array(*[
                F.expr(f"shiftrightunsigned({hash_col}, {width * b}) & {mask}")
                for b in range(n_bands)
            ])
        ).alias("band_id", "band_val"),
    )


def phash_near_dup_pairs(
    hashes: DataFrame,
    hash_col: str = "ahash",
    max_hamming: int = 7,
) -> DataFrame:
    """Banded Hamming self-join at the DISTINCT-HASH grain: pairs of
    hash values within ``max_hamming`` bits of each other.

    Scale shape (the LSH-for-Hamming classic): split the 64-bit hash
    into ``max_hamming + 1`` equal bands — by pigeonhole, any pair
    within max_hamming MUST agree exactly on at least one band, so
    band-equality equi-joins produce a complete candidate set and
    bit_count(xor) filters it exactly. No CartesianProduct at any
    corpus size, and the join runs over distinct hash values (each
    with its doc count), not over documents — the signature-grain
    trick every dedup operator in this repo uses. 64 must be
    divisible by the band count: max_hamming=7 → 8 bands of 8 bits.

    Returns [hash_a, hash_b, hamming, n_docs_a, n_docs_b, rep_a,
    rep_b] with hash_a < hash_b."""
    if 64 % (max_hamming + 1):
        raise ValueError(f"64 not divisible by {max_hamming + 1} bands")
    sigs = hashes.filter(F.col(hash_col).isNotNull()).groupBy(
        F.col(hash_col).alias("h")
    ).agg(
        F.count("*").alias("n_docs"),
        F.min("media_id").alias("rep"),
    )
    banded = with_hash_bands(sigs, "h", max_hamming)
    a = banded.select(
        F.col("h").alias("hash_a"), F.col("n_docs").alias("n_docs_a"),
        F.col("rep").alias("rep_a"), "band_id", "band_val",
    )
    b = banded.select(
        F.col("h").alias("hash_b"), F.col("n_docs").alias("n_docs_b"),
        F.col("rep").alias("rep_b"), "band_id", "band_val",
    )
    cand = (
        a.join(b, ["band_id", "band_val"])
        .filter(F.col("hash_a") < F.col("hash_b"))
        .select("hash_a", "hash_b", "n_docs_a", "n_docs_b", "rep_a", "rep_b")
        .distinct()
    )
    return cand.withColumn(
        "hamming", F.bit_count(F.expr("hash_a ^ hash_b")).cast("long")
    ).filter(
        (F.col("hamming") >= 1) & (F.col("hamming") <= max_hamming)
    ).select(
        "hash_a", "hash_b", "hamming",
        "n_docs_a", "n_docs_b", "rep_a", "rep_b",
    )


# ---------------------------------------------------------------------------
# Audio fingerprint dedup — completes the modality triple (text winnowing,
# image aHash/dHash, audio fingerprint). Chromaprint-style construction:
# frame the clip, compare adjacent frames' spectral-proxy statistics, pack
# the comparison bits. Real chromaprint uses an FFT filterbank; to stay
# integer-exact (and therefore SQL-replayable bit for bit) the three
# per-frame statistics here are time-domain proxies: energy Σ|s| (overall
# level), roughness Σ|s_k − s_{k−1}| (first-difference energy ≈
# high-frequency content), and zero crossings (dominant-frequency proxy).
# Frames have unequal lengths, so comparisons cross-multiply by frame
# sample counts instead of dividing — the same integer-mean device as
# ahash64.
# ---------------------------------------------------------------------------

AUDIO_FP_FRAMES = 16  # 15 adjacent pairs × 3 stats = 45 fingerprint bits


def audio_fingerprint45(samples: np.ndarray) -> int | None:
    """45-bit audio fingerprint (non-negative, fits int64 without sign
    wrap): for each adjacent frame pair t→t+1 and each statistic
    (energy, roughness, zero crossings), bit = stat_t·cnt_{t+1} >
    stat_{t+1}·cnt_t, packed MSB-first in (t, stat) order. Clips
    shorter than 2·AUDIO_FP_FRAMES samples return None (no frame may
    be empty)."""
    n = len(samples)
    if n < 2 * AUDIO_FP_FRAMES:
        return None
    v = samples.astype(np.int64)
    stats = []
    for t in range(AUDIO_FP_FRAMES):
        lo = (t * n) // AUDIO_FP_FRAMES
        hi = ((t + 1) * n) // AUDIO_FP_FRAMES
        f = v[lo:hi]
        stats.append((
            hi - lo,
            int(np.abs(f).sum()),
            int(np.abs(np.diff(f)).sum()),
            int(((f[1:] < 0) != (f[:-1] < 0)).sum()),
        ))
    fp = 0
    for t in range(AUDIO_FP_FRAMES - 1):
        c0, e0, d0, z0 = stats[t]
        c1, e1, d1, z1 = stats[t + 1]
        for a, b in ((e0, e1), (d0, d1), (z0, z1)):
            fp = (fp << 1) | (1 if a * c1 > b * c0 else 0)
    return fp


def attach_audio_fp_media(
    df: DataFrame, id_col: str = "doc_id", n_clips: int = 32
) -> DataFrame:
    """Media table of REAL WAV bytes for the fingerprint-dedup query:
    clip content repeats with period ``n_clips`` (seed = id % n_clips,
    64 + seed%37 samples at 8000 + (seed%3)·4000 Hz) so duplicate
    groups exist by construction — the 'same recording uploaded many
    times' case."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf["media_id"].astype("int64")
            payloads = []
            for i in ids:
                seed = int(i) % n_clips
                payloads.append(
                    encode_wav(
                        synth_audio(seed, 64 + seed % 37),
                        8000 + (seed % 3) * 4000,
                    )
                )
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    return df.select(F.col(id_col).cast("long").alias("media_id")).mapInPandas(
        batches, out_schema
    )


def audio_fingerprints(df: DataFrame) -> DataFrame:
    """Fingerprints over the real byte path: WAV payload → spec-based
    decode → audio_fingerprint45. Narrow Arrow-batched map, zero
    shuffles; undecodable or too-short payloads yield NULL."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("fp", T.LongType(), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    _, _, s = _decode_wav(bytes(payload))
                    rows.append((mid, audio_fingerprint45(s)))
                except ValueError:
                    rows.append((mid, None))
            yield pd.DataFrame(rows, columns=["media_id", "fp"])

    return df.select("media_id", "payload").mapInPandas(batches, out_schema)


# ---------------------------------------------------------------------------
# Video fingerprint dedup — the fourth modality (text winnowing, image
# aHash/dHash, audio fingerprint, video spatio-temporal signature). Per
# frame a 16-bit spatial average-hash (4×4 NN grid, cross-multiplied mean
# comparison — the ahash64 device at clip scale); the clip fingerprint
# packs the frame count with the first three frames' spatial hashes, so
# both content and duration participate. All integer arithmetic over the
# decoded luma plane — SQL-replayable bit for bit.
# ---------------------------------------------------------------------------


def _frame_spatial16(frame: np.ndarray) -> int:
    """16-bit average-hash of one luma frame: NN-sample a 4×4 grid,
    bit = v·16 >= Σv, packed row-major MSB-first."""
    h, w = frame.shape[:2]
    ys = (np.arange(4) * h) // 4
    xs = (np.arange(4) * w) // 4
    g = frame[np.ix_(ys, xs)].astype(np.int64)
    bits = (g.flatten() * 16 >= g.sum()).astype(np.uint8)
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return v


def video_fingerprint(frames: list[np.ndarray]) -> int | None:
    """Spatio-temporal clip fingerprint (non-negative, < 2⁶³):
    (n_frames << 48) | s₀ << 32 | s₁ << 16 | s₂, where s_f is frame
    f's 16-bit spatial hash and s₂ = 0 for 2-frame clips. Empty clips
    return None."""
    if not frames:
        return None
    fp = len(frames) << 48
    for f in range(min(3, len(frames))):
        fp |= _frame_spatial16(frames[f]) << (32 - 16 * f)
    return fp


def synth_video_varied(
    seed: int, width: int, height: int, n_frames: int
) -> list[np.ndarray]:
    """Deterministic luma frames with seed-dependent spatial texture
    (the synth_image_varied device — synth_video's seeds differ only
    by an additive offset, which mean-comparison hashes cancel):
    frame f pixel (y, x) =
    ((3 + seed%5)·x + (5 + seed%7)·y + (seed%11)·x·y + 11f + 7·seed) % 256."""
    x = np.arange(width)[None, :]
    y = np.arange(height)[:, None]
    return [
        (((3 + seed % 5) * x + (5 + seed % 7) * y + (seed % 11) * x * y
          + 11 * f + 7 * seed) % 256).astype(np.uint8)
        for f in range(n_frames)
    ]


def attach_video_fp_media(
    df: DataFrame, id_col: str = "doc_id", n_clips: int = 24
) -> DataFrame:
    """Media table of REAL Y4M bytes for the fingerprint-dedup query:
    clip content repeats with period ``n_clips`` (seed = id % n_clips,
    (8 + 2·(seed%3)) × (6 + 2·(seed%2)) seed-textured luma,
    2 + seed%4 frames). The 24 fixture clips map to 24 distinct
    fingerprints (unit-tested)."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf["media_id"].astype("int64")
            payloads = []
            for i in ids:
                seed = int(i) % n_clips
                w, h = 8 + 2 * (seed % 3), 6 + 2 * (seed % 2)
                payloads.append(
                    encode_y4m(synth_video_varied(seed, w, h, 2 + seed % 4), w, h)
                )
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    return df.select(F.col(id_col).cast("long").alias("media_id")).mapInPandas(
        batches, out_schema
    )


def video_fingerprints(df: DataFrame) -> DataFrame:
    """Fingerprints over the real byte path: Y4M payload → spec-based
    decode → video_fingerprint. Narrow Arrow-batched map; undecodable
    payloads yield NULL."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("fp", T.LongType(), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    _, _, frames = _decode_y4m(bytes(payload))
                    rows.append((mid, video_fingerprint(frames)))
                except ValueError:
                    rows.append((mid, None))
            yield pd.DataFrame(rows, columns=["media_id", "fp"])

    return df.select("media_id", "payload").mapInPandas(batches, out_schema)
