"""Minimal pure-Python PNG codec (stdlib zlib + struct only).

De-stubs the multimodal decode path (VERDICT.md "What's missing" #1):
the container has no image libraries, but PNG's format is public and
simple — chunked container, zlib-compressed scanlines, five per-row
predictor filters. This module implements

  encode_png(arr, filters)  -> bytes   (8-bit gray / RGB / RGBA)
  decode_png(data)          -> np.ndarray (h, w, channels) uint8

Both sides handle all five filter types (None/Sub/Up/Average/Paeth), so
an encode with per-row filter variety exercises every decoder branch.
Interlacing and sub-byte bit depths are out of scope (raise).

The per-pixel unfilter loop is sequential by the format's definition
(each byte's predictor reads the already-reconstructed left/up bytes);
it runs inside Arrow-batched ``mapInPandas`` workers over small media
payloads, never as a row-at-a-time Spark UDF.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type -> samples per pixel
_COLOR_TYPE = {1: 0, 3: 2, 4: 6}      # channels -> color type for encode


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png(arr: np.ndarray, filters=None) -> bytes:
    """Encode an (h, w) or (h, w, channels) uint8 array.

    ``filters``: optional per-row filter types (0-4); an int applies to
    every row; default 0 (None). Exposing the filter choice lets tests
    force every decoder branch deterministically.
    """
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    if ch not in _COLOR_TYPE:
        raise ValueError(f"unsupported channel count {ch}")
    if filters is None:
        filters = [0] * h
    elif isinstance(filters, int):
        filters = [filters] * h
    if len(filters) != h:
        raise ValueError("filters must have one entry per row")

    stride = w * ch
    flat = a.reshape(h, stride).astype(np.int16)
    out = bytearray()
    prev = np.zeros(stride, dtype=np.int16)
    for y in range(h):
        row = flat[y]
        ft = int(filters[y])
        left = np.concatenate([np.zeros(ch, dtype=np.int16), row[:-ch]]) \
            if stride > ch else np.zeros(stride, dtype=np.int16)
        upleft = np.concatenate([np.zeros(ch, dtype=np.int16), prev[:-ch]]) \
            if stride > ch else np.zeros(stride, dtype=np.int16)
        if ft == 0:
            filt = row
        elif ft == 1:
            filt = row - left
        elif ft == 2:
            filt = row - prev
        elif ft == 3:
            filt = row - (left + prev) // 2
        elif ft == 4:
            pred = np.fromiter(
                (_paeth(int(left[i]), int(prev[i]), int(upleft[i]))
                 for i in range(stride)),
                dtype=np.int16, count=stride)
            filt = row - pred
        else:
            raise ValueError(f"unknown filter type {ft}")
        out.append(ft)
        out.extend((filt % 256).astype(np.uint8).tobytes())
        prev = row

    ihdr = struct.pack(">IIBBBBB", w, h, 8, _COLOR_TYPE[ch], 0, 0, 0)
    return (PNG_SIGNATURE
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(out), 6))
            + _chunk(b"IEND", b""))


def decode_png(data: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG to (h, w, channels) uint8."""
    if data[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    channels = None
    idat = bytearray()
    while pos < len(data):
        if pos + 8 > len(data):
            raise ValueError("truncated chunk header")
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        typ = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated chunk body")
        if pos + 12 + length > len(data):
            # keep the ValueError contract: a PNG truncated inside the
            # 4-byte CRC field must not surface as struct.error
            raise ValueError("truncated chunk CRC")
        (crc,) = struct.unpack(">I", data[pos + 8 + length:pos + 12 + length])
        if zlib.crc32(typ + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {typ!r} chunk")
        pos += 12 + length
        if typ == b"IHDR":
            width, height, depth, ctype, comp, filt, interlace = \
                struct.unpack(">IIBBBBB", body)
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth}")
            if ctype == 3:
                raise ValueError("palette PNGs not supported")
            if ctype not in _CHANNELS:
                raise ValueError(f"unsupported color type {ctype}")
            if interlace != 0:
                raise ValueError("interlaced PNGs not supported")
            channels = _CHANNELS[ctype]
        elif typ == b"IDAT":
            idat.extend(body)
        elif typ == b"IEND":
            break
    if width is None or channels is None:
        raise ValueError("missing IHDR")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        # keep the ValueError contract: corrupt-but-CRC-valid streams
        # (or multi-flip corruption that repairs the CRC) must not leak
        # zlib.error to callers
        raise ValueError(f"corrupt IDAT stream: {e}") from e
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("decompressed size mismatch")

    out = bytearray(height * stride)
    bpp = channels
    pos = 0
    for y in range(height):
        ft = raw[pos]
        pos += 1
        base = y * stride
        row = raw[pos:pos + stride]
        pos += stride
        if ft == 0:
            out[base:base + stride] = row
        elif ft == 2 and y > 0:
            pr = base - stride
            for i in range(stride):
                out[base + i] = (row[i] + out[pr + i]) & 0xFF
        elif ft == 2:
            out[base:base + stride] = row
        else:
            for i in range(stride):
                a = out[base + i - bpp] if i >= bpp else 0
                b = out[base - stride + i] if y > 0 else 0
                if ft == 1:
                    r = row[i] + a
                elif ft == 3:
                    r = row[i] + (a + b) // 2
                elif ft == 4:
                    c = out[base - stride + i - bpp] \
                        if (y > 0 and i >= bpp) else 0
                    r = row[i] + _paeth(a, b, c)
                else:
                    raise ValueError(f"unknown filter type {ft}")
                out[base + i] = r & 0xFF
    return np.frombuffer(bytes(out), dtype=np.uint8).reshape(
        height, width, channels)
