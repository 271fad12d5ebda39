"""Minimal pure-Python WAV (RIFF/PCM) codec — stdlib struct only.

Companion to png.py: upgrades the audio modality from a declared stub to
a real decoder. Scope: canonical RIFF/WAVE files with an uncompressed
PCM ``fmt `` chunk (format tag 1), 8/16/24/32-bit samples, any channel
count/rate. Compressed formats (ADPCM, float, MP3-in-WAV) raise.

  encode_wav(samples, rate)  -> bytes   (int16 numpy array, (n,) or (n, ch))
  decode_wav(data)           -> (np.ndarray int32 (n, ch), rate)

Like the PNG path, decode runs inside Arrow-batched ``mapInPandas``
workers over small media payloads — never a row-at-a-time UDF.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Encode int16 samples ((n,) mono or (n, channels)) to PCM WAV."""
    a = np.asarray(samples, dtype=np.int16)
    if a.ndim == 1:
        a = a[:, None]
    n, ch = a.shape
    data = a.astype("<i2").tobytes()
    byte_rate = rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, rate, byte_rate, ch * 2, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes):
    """Decode PCM WAV -> (samples int32 (n, channels), sample_rate).

    8-bit samples are unsigned per the spec (recentred to signed);
    16/24/32-bit are little-endian signed.
    """
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    (riff_size,) = struct.unpack("<I", data[4:8])
    if riff_size + 8 > len(data):
        raise ValueError("truncated RIFF payload")
    pos = 12
    fmt = None
    pcm = None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + size]
        if len(body) != size:
            raise ValueError(f"truncated {cid!r} chunk")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too short")
            tag, ch, rate, _br, _ba, bits = struct.unpack("<HHIIHH",
                                                          body[:16])
            if tag != 1:
                raise ValueError(f"unsupported format tag {tag} (PCM only)")
            if bits not in (8, 16, 24, 32):
                raise ValueError(f"unsupported bit depth {bits}")
            fmt = (ch, rate, bits)
        elif cid == b"data":
            pcm = body
        pos += 8 + size + (size & 1)   # chunks are word-aligned
    if fmt is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    ch, rate, bits = fmt
    if bits == 8:
        arr = np.frombuffer(pcm, dtype=np.uint8).astype(np.int32) - 128
    elif bits == 16:
        arr = np.frombuffer(pcm, dtype="<i2").astype(np.int32)
    elif bits == 32:
        arr = np.frombuffer(pcm, dtype="<i4").astype(np.int32)
    else:  # 24-bit: sign-extend 3-byte little-endian
        raw = np.frombuffer(pcm[: len(pcm) - len(pcm) % 3], dtype=np.uint8)
        raw = raw.reshape(-1, 3).astype(np.int32)
        arr = raw[:, 0] | (raw[:, 1] << 8) | (raw[:, 2] << 16)
        arr = np.where(arr >= 1 << 23, arr - (1 << 24), arr)
    n = len(arr) // ch
    return arr[: n * ch].reshape(n, ch), rate
