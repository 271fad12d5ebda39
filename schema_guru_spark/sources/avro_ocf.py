"""Minimal pure-Python Avro Object Container File codec.

Implements the subset of the Avro 1.12 specification
(https://avro.apache.org/docs/1.12.0/specification/) that Apache
Iceberg's metadata files use: records, unions, arrays, maps, fixed,
enums, and the primitive types, with the ``null``, ``deflate`` and
``snappy`` block codecs (snappy being what default-configured JVM
writers emit for manifests; both the raw-format decompressor and a
spec-valid greedy compressor live below, JVM-interop-tested in both
directions). This exists because the sandbox has no fastavro /
pyiceberg and no network to fetch the iceberg-spark runtime jar —
but the *format* is public and small, so the Iceberg metadata layer
(`iceberg_meta.py`) can still be exercised end-to-end.

Correctness is NOT self-certified: tests/test_iceberg_meta.py
round-trips files against the JVM Avro implementation that ships
inside the Spark distribution (avro-1.12.1.jar, via py4j), in both
directions — files we write are read by Java Avro, files Java Avro
writes are read by us.

Driver-side metadata only. Data files are parquet read by Spark; a
manifest is a few thousand records at most per the Iceberg spec's
manifest-targeting (8 MB default target size), so a Python decode
loop here is not on any per-row hot path.
"""

from __future__ import annotations

import io
import json
import struct
import zlib
from typing import Any, Iterable

MAGIC = b"Obj\x01"
SYNC = b"\x53\x47\x53\x50" * 4  # deterministic marker (no Math.random)


# ---------------------------------------------------------------- decode

class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def read(self, n: int) -> bytes:
        b = self.buf[self.pos:self.pos + n]
        if len(b) != n:
            raise EOFError("truncated avro data")
        self.pos += n
        return b

    def read_long(self) -> int:
        shift = 0
        accum = 0
        while True:
            if self.pos >= len(self.buf):
                raise EOFError("truncated avro data (varint)")
            byte = self.buf[self.pos]
            self.pos += 1
            accum |= (byte & 0x7F) << shift
            if not byte & 0x80:
                break
            shift += 7
        return (accum >> 1) ^ -(accum & 1)  # zigzag

    def read_bytes(self) -> bytes:
        return self.read(self.read_long())


def _parse_schema(schema: Any, named: dict[str, Any]) -> Any:
    """Normalize a schema node, registering named types for reuse."""
    if isinstance(schema, str):
        if schema in named:
            return named[schema]
        return schema  # primitive
    if isinstance(schema, list):
        return [_parse_schema(s, named) for s in schema]
    typ = schema["type"]
    if typ in ("record", "error"):
        named[schema["name"]] = schema
        for f in schema["fields"]:
            f["type"] = _parse_schema(f["type"], named)
        return schema
    if typ in ("enum", "fixed"):
        named[schema["name"]] = schema
        return schema
    if typ == "array":
        schema["items"] = _parse_schema(schema["items"], named)
        return schema
    if typ == "map":
        schema["values"] = _parse_schema(schema["values"], named)
        return schema
    return _parse_schema(typ, named) if isinstance(typ, (dict, list)) \
        else schema


def _decode(r: _Reader, schema: Any) -> Any:
    if isinstance(schema, list):  # union
        i = r.read_long()
        if not 0 <= i < len(schema):
            # a negative index would silently wrap via Python list
            # indexing and mis-decode instead of failing loudly
            raise ValueError(f"union branch {i} out of range "
                             f"(union has {len(schema)} branches)")
        return _decode(r, schema[i])
    if isinstance(schema, dict):
        typ = schema["type"]
        if typ in ("record", "error"):
            return {f["name"]: _decode(r, f["type"])
                    for f in schema["fields"]}
        if typ == "array":
            out = []
            while True:
                n = r.read_long()
                if n == 0:
                    break
                if n < 0:
                    r.read_long()  # byte size of block, unused
                    n = -n
                # a legitimate item consumes >= 1 byte here (no
                # zero-field records / bare nulls in our schemas), so
                # a count beyond the remaining bytes is corruption —
                # reject it instead of allocating n placeholders
                if n > len(r.buf) - r.pos:
                    raise ValueError("array block count exceeds "
                                     "remaining data")
                for _ in range(n):
                    out.append(_decode(r, schema["items"]))
            return out
        if typ == "map":
            out = {}
            while True:
                n = r.read_long()
                if n == 0:
                    break
                if n < 0:
                    r.read_long()
                    n = -n
                if n > len(r.buf) - r.pos:
                    raise ValueError("map block count exceeds "
                                     "remaining data")
                for _ in range(n):
                    k = r.read_bytes().decode("utf-8")
                    out[k] = _decode(r, schema["values"])
            return out
        if typ == "fixed":
            return r.read(schema["size"])
        if typ == "enum":
            i = r.read_long()
            if not 0 <= i < len(schema["symbols"]):
                raise ValueError(f"enum index {i} out of range")
            return schema["symbols"][i]
        typ_name = typ  # {"type": "string", ...} wrapper
    else:
        typ_name = schema
    if typ_name == "null":
        return None
    if typ_name == "boolean":
        return r.read(1) == b"\x01"
    if typ_name in ("int", "long"):
        return r.read_long()
    if typ_name == "float":
        return struct.unpack("<f", r.read(4))[0]
    if typ_name == "double":
        return struct.unpack("<d", r.read(8))[0]
    if typ_name == "bytes":
        return r.read_bytes()
    if typ_name == "string":
        return r.read_bytes().decode("utf-8")
    raise ValueError(f"unsupported avro type: {typ_name!r}")


# ---------------------------------------------------------------------------
# Snappy raw-block codec (public format:
# https://github.com/google/snappy/blob/main/format_description.txt).
# Default-configured JVM Avro writers emit snappy manifests, so the
# metadata layer must read them; the decompressor is complete, the
# compressor is spec-valid greedy matching (any conformant reader —
# snappy-java included — decodes it; ratios are not the point here,
# manifests are KB-scale).
# ---------------------------------------------------------------------------

def _read_uvarint(data: bytes, pos: int) -> tuple[int, int]:
    val = shift = 0
    while True:
        if pos >= len(data):
            raise ValueError("snappy: truncated varint")
        b = data[pos]
        pos += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, pos
        shift += 7
        if shift > 35:
            raise ValueError("snappy: varint overflow")


def _snappy_decompress(data: bytes) -> bytes:
    total, pos = _read_uvarint(data, 0)
    out = bytearray()
    n = len(data)
    while pos < n:
        tag = data[pos]
        pos += 1
        kind = tag & 0x03
        if kind == 0:  # literal
            ln = tag >> 2
            if ln >= 60:  # 60-63: length in the next 1-4 bytes, LE
                nb = ln - 59
                if pos + nb > n:
                    raise ValueError("snappy: truncated literal length")
                ln = int.from_bytes(data[pos:pos + nb], "little")
                pos += nb
            ln += 1
            if pos + ln > n:
                raise ValueError("snappy: truncated literal")
            out += data[pos:pos + ln]
            pos += ln
            continue
        if kind == 1:  # copy, 1-byte offset
            ln = ((tag >> 2) & 0x07) + 4
            if pos >= n:
                raise ValueError("snappy: truncated copy-1")
            off = ((tag >> 5) << 8) | data[pos]
            pos += 1
        elif kind == 2:  # copy, 2-byte offset
            ln = (tag >> 2) + 1
            if pos + 2 > n:
                raise ValueError("snappy: truncated copy-2")
            off = int.from_bytes(data[pos:pos + 2], "little")
            pos += 2
        else:  # copy, 4-byte offset
            ln = (tag >> 2) + 1
            if pos + 4 > n:
                raise ValueError("snappy: truncated copy-4")
            off = int.from_bytes(data[pos:pos + 4], "little")
            pos += 4
        if off == 0 or off > len(out):
            raise ValueError("snappy: copy offset out of range")
        # overlapping copies are legal and byte-at-a-time by definition
        start = len(out) - off
        for i in range(ln):
            out.append(out[start + i])
    if len(out) != total:
        raise ValueError(
            f"snappy: expected {total} decompressed bytes, got {len(out)}")
    return bytes(out)


def _snappy_compress(data: bytes) -> bytes:
    """Greedy hash-match compressor. Emits a conformant stream: 4-byte
    matches at 2-byte offsets plus literals; long literals use the
    60-62 extended-length forms; matches > 64 bytes split (copy-2 max
    length is 64)."""
    out = bytearray()
    n = len(data)
    # uvarint of uncompressed length
    v = n
    while v >= 0x80:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)

    def emit_literal(lo: int, hi: int) -> None:
        while lo < hi:
            ln = min(hi - lo, 1 << 16)  # 2-byte extended form max 65536
            if ln <= 60:
                out.append((ln - 1) << 2)
            elif ln <= 256:
                out.append(60 << 2)
                out.append(ln - 1)
            else:
                out.append(61 << 2)
                out.extend((ln - 1).to_bytes(2, "little"))
            out.extend(data[lo:lo + ln])
            lo += ln

    table: dict[bytes, int] = {}
    i = lit_start = 0
    while i + 4 <= n:
        key = data[i:i + 4]
        j = table.get(key)
        table[key] = i
        if j is not None and i - j <= 0xFFFF:
            # extend the match forward
            ln = 4
            while i + ln < n and ln < (1 << 20) and \
                    data[j + ln] == data[i + ln]:
                ln += 1
            emit_literal(lit_start, i)
            off = i - j
            rem = ln
            while rem > 0:
                step = min(rem, 64)
                if step < 4:  # tail shorter than min copy: literal it
                    break
                out.append(((step - 1) << 2) | 0x02)
                out += off.to_bytes(2, "little")
                rem -= step
            i += ln - rem
            lit_start = i
        else:
            i += 1
    emit_literal(lit_start, n)
    return bytes(out)


def read_ocf(path: str) -> tuple[dict, list]:
    """Read an Avro OCF file → (file-metadata dict, list of records).

    The ``avro.schema`` metadata entry is returned parsed under key
    ``"schema"``; other metadata values stay raw bytes.

    Corruption contract (same as the image/audio codecs,
    tests/test_multimodal.py fuzz suite): a damaged file raises
    ``ValueError`` or ``EOFError`` — never zlib/unicode/json/struct
    internals leaking to the caller.
    """
    with open(path, "rb") as fh:
        data = fh.read()
    try:
        return _read_ocf_bytes(path, data)
    except (EOFError, ValueError):
        raise
    except (IndexError, KeyError, TypeError, OverflowError,
            UnicodeDecodeError, zlib.error, struct.error,
            json.JSONDecodeError, RecursionError) as e:
        raise ValueError(f"{path}: corrupt avro container "
                         f"({e.__class__.__name__}: {e})") from e


def _read_ocf_bytes(path: str, data: bytes) -> tuple[dict, list]:
    r = _Reader(data)
    if r.read(4) != MAGIC:
        raise ValueError(f"{path}: not an Avro object container file")
    meta_schema = {"type": "map", "values": "bytes"}
    meta = _decode(r, meta_schema)
    sync = r.read(16)
    if "avro.schema" not in meta:
        raise ValueError(f"{path}: header missing avro.schema")
    schema = _parse_schema(json.loads(meta["avro.schema"]), {})
    codec = meta.get("avro.codec", b"null").decode()
    records = []
    while r.pos < len(data):
        count = r.read_long()
        size = r.read_long()
        if count < 0 or size < 0:
            raise ValueError(f"{path}: negative block header")
        block = r.read(size)
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec == "snappy":
            # Avro spec: snappy blocks carry a 4-byte big-endian CRC32
            # of the UNCOMPRESSED data after the compressed bytes
            if size < 4:
                raise ValueError(f"{path}: snappy block too short")
            block, crc = block[:-4], block[-4:]
            block = _snappy_decompress(block)
            if zlib.crc32(block) & 0xFFFFFFFF != int.from_bytes(crc, "big"):
                raise ValueError(f"{path}: snappy block CRC mismatch")
        elif codec != "null":
            raise ValueError(f"unsupported avro codec: {codec}")
        if count > len(block):
            # every record consumes >= 1 decoded byte in our schemas
            # (no zero-field records), so a count past the decoded
            # block length is corruption, not data
            raise ValueError(f"{path}: block count {count} exceeds "
                             f"decoded block length {len(block)}")
        br = _Reader(block)
        for _ in range(count):
            records.append(_decode(br, schema))
        if r.read(16) != sync:
            raise ValueError(f"{path}: sync marker mismatch")
    out_meta = {k: v for k, v in meta.items()}
    out_meta["schema"] = schema
    return out_meta, records


# ---------------------------------------------------------------- encode

class _Writer:
    def __init__(self):
        self.out = io.BytesIO()

    def write(self, b: bytes):
        self.out.write(b)

    def write_long(self, n: int):
        n = (n << 1) ^ (n >> 63)  # zigzag (arbitrary-precision-safe)
        if n < 0:
            n &= (1 << 64) - 1
        while True:
            b = n & 0x7F
            n >>= 7
            if n:
                self.out.write(bytes((b | 0x80,)))
            else:
                self.out.write(bytes((b,)))
                break

    def write_bytes(self, b: bytes):
        self.write_long(len(b))
        self.out.write(b)


def _union_branch(schema: list, value: Any) -> int:
    """Pick the union branch for a value (None→null, else first match)."""
    def name(s):
        if isinstance(s, dict):
            return s["type"]
        return s
    for i, s in enumerate(schema):
        n = name(s)
        if value is None and n == "null":
            return i
        if value is not None and n != "null":
            if isinstance(value, bool) and n == "boolean":
                return i
            if isinstance(value, int) and not isinstance(value, bool) \
                    and n in ("int", "long"):
                return i
            if isinstance(value, float) and n in ("float", "double"):
                return i
            if isinstance(value, str) and n in ("string", "enum"):
                return i
            if isinstance(value, bytes) and n in ("bytes", "fixed"):
                return i
            if isinstance(value, dict) and n in ("record", "map", "error"):
                return i
            if isinstance(value, list) and n == "array":
                return i
    raise ValueError(f"no union branch in {schema!r} for {value!r}")


def _encode(w: _Writer, schema: Any, value: Any):
    if isinstance(schema, list):
        i = _union_branch(schema, value)
        w.write_long(i)
        return _encode(w, schema[i], value)
    if isinstance(schema, dict):
        typ = schema["type"]
        if typ in ("record", "error"):
            for f in schema["fields"]:
                if f["name"] not in value and "default" in f:
                    _encode(w, f["type"], f["default"])
                else:
                    _encode(w, f["type"], value[f["name"]])
            return
        if typ == "array":
            if value:
                w.write_long(len(value))
                for item in value:
                    _encode(w, schema["items"], item)
            w.write_long(0)
            return
        if typ == "map":
            if value:
                w.write_long(len(value))
                for k, v in value.items():
                    w.write_bytes(k.encode("utf-8"))
                    _encode(w, schema["values"], v)
            w.write_long(0)
            return
        if typ == "fixed":
            if len(value) != schema["size"]:
                raise ValueError("fixed size mismatch")
            w.write(value)
            return
        if typ == "enum":
            w.write_long(schema["symbols"].index(value))
            return
        typ_name = typ
    else:
        typ_name = schema
    if typ_name == "null":
        return
    if typ_name == "boolean":
        w.write(b"\x01" if value else b"\x00")
    elif typ_name in ("int", "long"):
        w.write_long(value)
    elif typ_name == "float":
        w.write(struct.pack("<f", value))
    elif typ_name == "double":
        w.write(struct.pack("<d", value))
    elif typ_name == "bytes":
        w.write_bytes(value)
    elif typ_name == "string":
        w.write_bytes(value.encode("utf-8"))
    else:
        raise ValueError(f"unsupported avro type: {typ_name!r}")


def write_ocf(path: str, schema: dict, records: Iterable[dict],
              codec: str = "deflate",
              extra_meta: dict[str, bytes] | None = None) -> None:
    """Write records as a single-block Avro OCF file."""
    schema_parsed = _parse_schema(json.loads(json.dumps(schema)), {})
    body = _Writer()
    n = 0
    for rec in records:
        _encode(body, schema_parsed, rec)
        n += 1
    block = body.out.getvalue()
    if codec == "deflate":
        comp = zlib.compressobj(6, zlib.DEFLATED, -15)
        block = comp.compress(block) + comp.flush()
    elif codec == "snappy":
        crc = (zlib.crc32(block) & 0xFFFFFFFF).to_bytes(4, "big")
        block = _snappy_compress(block) + crc
    elif codec != "null":
        raise ValueError(f"unsupported avro codec: {codec}")

    head = _Writer()
    head.write(MAGIC)
    meta = {"avro.schema": json.dumps(schema).encode("utf-8"),
            "avro.codec": codec.encode("utf-8")}
    meta.update(extra_meta or {})
    head.write_long(len(meta))
    for k, v in meta.items():
        head.write_bytes(k.encode("utf-8"))
        head.write_bytes(v)
    head.write_long(0)
    head.write(SYNC)
    head.write_long(n)
    head.write_long(len(block))
    head.write(block)
    head.write(SYNC)
    with open(path, "wb") as fh:
        fh.write(head.out.getvalue())
