"""Property-based roundtrip for the pure-Python Avro OCF codec.

hypothesis drives arbitrary records through write_ocf -> read_ocf for
a schema that exercises every supported shape (primitives, optional
union, nested record, array, map, fixed, enum) and both codecs. The
JVM-Avro interop tests in test_iceberg_meta.py anchor the format to
the reference implementation; this suite hunts value-space edges
(zigzag boundaries, empty/huge strings, NaN-free doubles, unicode
keys) the example-based tests don't reach.
"""

import math

from hypothesis import given, settings, strategies as st

from schema_guru_spark.sources.avro_ocf import read_ocf, write_ocf

SCHEMA = {
    "type": "record", "name": "t", "fields": [
        {"name": "s", "type": "string"},
        {"name": "n", "type": "long"},
        {"name": "i", "type": "int"},
        {"name": "o", "type": ["null", "long"], "default": None},
        {"name": "d", "type": "double"},
        {"name": "bl", "type": "boolean"},
        {"name": "by", "type": "bytes"},
        {"name": "fx", "type": {"type": "fixed", "name": "f4",
                                "size": 4}},
        {"name": "e", "type": {"type": "enum", "name": "c",
                               "symbols": ["A", "B", "C"]}},
        {"name": "arr", "type": {"type": "array", "items": {
            "type": "record", "name": "sub", "fields": [
                {"name": "x", "type": "long"}]}}},
        {"name": "m", "type": {"type": "map", "values": "string"}},
    ]}

# doubles: exclude NaN only (NaN != NaN breaks equality, and Avro
# roundtrips it bit-exactly anyway); +/-inf and -0.0 stay in
_doubles = st.floats(allow_nan=False, width=64)
_longs = st.integers(min_value=-(2 ** 63), max_value=2 ** 63 - 1)

_records = st.fixed_dictionaries({
    "s": st.text(max_size=64),
    "n": _longs,
    "i": st.integers(min_value=-(2 ** 31), max_value=2 ** 31 - 1),
    "o": st.none() | _longs,
    "d": _doubles,
    "bl": st.booleans(),
    "by": st.binary(max_size=64),
    "fx": st.binary(min_size=4, max_size=4),
    "e": st.sampled_from(["A", "B", "C"]),
    "arr": st.lists(st.fixed_dictionaries({"x": _longs}), max_size=8),
    "m": st.dictionaries(st.text(max_size=16), st.text(max_size=16),
                         max_size=8),
})


@settings(max_examples=150, deadline=None)
@given(recs=st.lists(_records, max_size=10),
       codec=st.sampled_from(["deflate", "null"]))
def test_ocf_roundtrip_property(tmp_path_factory, recs, codec):
    p = str(tmp_path_factory.mktemp("avro") / "t.avro")
    write_ocf(p, SCHEMA, recs, codec=codec)
    _, back = read_ocf(p)
    assert len(back) == len(recs)
    for got, want in zip(back, recs):
        for k, v in want.items():
            g = got[k]
            if isinstance(v, float):
                assert (g == v) or (math.isinf(v) and g == v) or \
                    (v == 0.0 and g == 0.0)
            else:
                assert g == v, (k, g, v)


@settings(max_examples=60, deadline=None)
@given(n=_longs)
def test_zigzag_long_extremes(tmp_path_factory, n):
    sch = {"type": "record", "name": "z",
           "fields": [{"name": "n", "type": "long"}]}
    p = str(tmp_path_factory.mktemp("avro") / "z.avro")
    write_ocf(p, sch, [{"n": n}], codec="null")
    _, back = read_ocf(p)
    assert back[0]["n"] == n


# ------------------------------------------------ corruption contract

def _write_sample(tmp, codec):
    p = str(tmp / f"c_{codec}.avro")
    recs = [{"s": f"doc{i}", "n": i * 7 - 3, "i": i, "o": None if i % 3
             else i, "d": i / 3.0, "bl": bool(i % 2),
             "by": bytes([i % 256, 255 - i % 256]),
             "fx": b"fxd" + bytes([i % 256]),
             "e": "ABC"[i % 3],
             "arr": [{"x": i}, {"x": -i}],
             "m": {f"k{i}": f"v{i}"}} for i in range(40)]
    write_ocf(p, SCHEMA, recs, codec=codec)
    return p


def test_corruption_contract_truncation(tmp_path):
    """Every truncation either reads fine (header-only damage can be
    benign) or raises ValueError/EOFError — never zlib/unicode/json/
    struct internals, never an unbounded allocation."""
    for codec in ("deflate", "null"):
        p = _write_sample(tmp_path, codec)
        blob = open(p, "rb").read()
        q = str(tmp_path / "trunc.avro")
        for cut in range(len(blob)):
            with open(q, "wb") as fh:
                fh.write(blob[:cut])
            try:
                read_ocf(q)
            except (ValueError, EOFError):
                pass


def test_corruption_contract_bitflips(tmp_path):
    for codec in ("deflate", "null"):
        p = _write_sample(tmp_path, codec)
        blob = bytearray(open(p, "rb").read())
        q = str(tmp_path / "flip.avro")
        for off in range(len(blob)):
            for bit in (0x01, 0x80):
                blob[off] ^= bit
                with open(q, "wb") as fh:
                    fh.write(blob)
                try:
                    read_ocf(q)
                except (ValueError, EOFError):
                    pass
                blob[off] ^= bit


def test_truncated_varint_is_eoferror(tmp_path):
    q = str(tmp_path / "varint.avro")
    # magic + a map count varint with its continuation bit set, then EOF
    with open(q, "wb") as fh:
        fh.write(b"Obj\x01" + b"\x81")
    try:
        read_ocf(q)
        assert False, "expected EOFError"
    except EOFError:
        pass


def test_negative_union_and_enum_index_fail_loudly(tmp_path):
    """A corrupted union/enum index that decodes negative must raise
    ValueError, not silently wrap via Python negative list indexing
    and mis-decode the rest of the stream."""
    import pytest
    from schema_guru_spark.sources.avro_ocf import _Reader, _decode

    # zigzag(-1) = 0x01; union ["null","long"] with branch index -1
    r = _Reader(b"\x01\x04")
    with pytest.raises(ValueError, match="union branch -1"):
        _decode(r, ["null", "long"])
    r = _Reader(b"\x01")
    with pytest.raises(ValueError, match="enum index -1"):
        _decode(r, {"type": "enum", "name": "e", "symbols": ["A", "B"]})


# ---------------------------------------------------------------------------
# snappy codec (r04 verdict #5)
# ---------------------------------------------------------------------------

def test_snappy_raw_roundtrip_property():
    from hypothesis import given, settings, strategies as st
    from schema_guru_spark.sources.avro_ocf import (_snappy_compress,
                                                    _snappy_decompress)

    @settings(max_examples=300, deadline=None)
    @given(st.binary(max_size=5000))
    def _inner(data):
        assert _snappy_decompress(_snappy_compress(data)) == data

    _inner()


def test_snappy_compresses_repetitive_data():
    from schema_guru_spark.sources.avro_ocf import (_snappy_compress,
                                                    _snappy_decompress)
    data = b"manifest-entry-" * 1000
    comp = _snappy_compress(data)
    assert len(comp) < len(data) // 4
    assert _snappy_decompress(comp) == data


def test_snappy_decompress_rejects_corruption():
    import pytest
    from schema_guru_spark.sources.avro_ocf import (_snappy_compress,
                                                    _snappy_decompress)
    good = _snappy_compress(b"hello world, hello world, hello world")
    with pytest.raises(ValueError):
        _snappy_decompress(good[:-3])  # truncated
    with pytest.raises(ValueError):
        # copy before stream start: offset out of range
        _snappy_decompress(bytes([10]) + bytes([0x02, 0xFF, 0xFF]))
