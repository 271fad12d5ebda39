"""Multimodal plumbing: typed binary columns, Arrow batch shapes,
stubbed decode."""

import pytest
from pyspark.sql import functions as F

from schema_guru_spark.operators import multimodal as MM


@pytest.fixture(scope="module")
def media_df(spark):
    return MM.attach_fake_media(spark.range(20), "id")


def test_media_schema(media_df):
    f = dict(media_df.dtypes)["media"]
    assert "data:binary" in f.replace(" ", "")
    assert "width:int" in f.replace(" ", "")


def test_decode_stub_raises_without_fake(media_df):
    from py4j.protocol import Py4JJavaError
    with pytest.raises(Exception) as ei:
        MM.decode_and_featurize(media_df, fake=False).collect()
    assert "NotImplementedError" in str(ei.value) or "codecs" in str(ei.value)


def test_fake_decode_shapes(media_df):
    out = MM.decode_and_featurize(media_df, fake=True, resize_to=8)
    rows = out.collect()
    assert len(rows) == 20
    for r in rows:
        assert len(r["thumb"]) == 64
        assert 0.0 <= r["mean_r"] <= 255.0
    # deterministic across partitionings
    rows2 = MM.decode_and_featurize(
        MM.attach_fake_media(
            media_df.sparkSession.range(20).repartition(5), "id"),
        fake=True, resize_to=8).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))


def test_frame_sample_plan(spark):
    df = spark.createDataFrame(
        [(1, b"xx", "video", "mp4", 320, 240, 3500),
         (2, b"yy", "image", "png", 64, 64, None)],
        "id long, data binary, kind string, format string, "
        "width int, height int, duration_ms int")
    df = df.select("id", F.struct(
        "data",
        F.struct("kind", "format", "width", "height", "duration_ms").alias("meta"),
    ).alias("media"))
    out = MM.frame_sample_plan(df, every_ms=1000)
    ms = [r["frame_ms"] for r in out.collect()]
    assert ms == [0, 1000, 2000, 3000]


def test_real_png_decode_roundtrip(spark):
    # attach REAL PNGs (all 5 filter types across rows) and check the
    # decoded channel means against the analytic pattern formula
    import numpy as np

    ids = spark.range(12).select(F.col("id").alias("doc_id"))
    feats = MM.decode_and_featurize(
        MM.attach_png_media(ids, "doc_id"), id_col="doc_id", fake=False)
    rows = {r["id"]: r for r in feats.collect()}
    assert len(rows) == 12
    for rid in range(12):
        w, h = rid % 16 + 8, rid % 12 + 8
        r = rows[rid]
        assert (r["width"], r["height"]) == (w, h)
        exp = MM._png_pixels(rid, w, h).astype(np.float64)
        assert r["mean_r"] == pytest.approx(exp[:, :, 0].mean())
        assert r["mean_g"] == pytest.approx(exp[:, :, 1].mean())
        assert r["mean_b"] == pytest.approx(exp[:, :, 2].mean())


def test_png_codec_rejects_corruption():
    import numpy as np
    from schema_guru_spark.operators.png import decode_png, encode_png

    arr = np.arange(5 * 4 * 3, dtype=np.uint8).reshape(5, 4, 3)
    data = bytearray(encode_png(arr, 3))
    with pytest.raises(ValueError):
        decode_png(bytes(data[:20]))          # truncated
    data[40] ^= 0xFF                          # flip a byte inside IDAT
    with pytest.raises(ValueError):
        decode_png(bytes(data))               # CRC must catch it
    # truncation INSIDE a chunk's 4-byte CRC field must keep the
    # ValueError contract (not leak struct.error to callers)
    full = bytes(encode_png(arr, 3))
    with pytest.raises(ValueError):
        decode_png(full[:-2])


def test_wav_codec_roundtrip_pure():
    import numpy as np
    from schema_guru_spark.operators.wav import decode_wav, encode_wav

    rng = np.random.RandomState(3)
    for shape in [(100,), (257, 2)]:
        a = rng.randint(-32768, 32767, size=shape).astype(np.int16)
        back, rate = decode_wav(encode_wav(a, 44100))
        assert rate == 44100
        exp = a[:, None] if a.ndim == 1 else a
        assert np.array_equal(back, exp)
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxNOPE")
    with pytest.raises(ValueError):
        decode_wav(encode_wav(np.zeros(10, np.int16))[:20])


def test_wav_decode_bit_depths():
    import struct
    import numpy as np
    from schema_guru_spark.operators.wav import decode_wav

    def raw_wav(bits, payload, ch=1, rate=8000):
        fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * bits // 8,
                          ch * bits // 8, bits)
        body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(payload)) + payload)
        return b"RIFF" + struct.pack("<I", len(body)) + body

    # 8-bit unsigned recentres to signed
    s, _ = decode_wav(raw_wav(8, bytes([0, 128, 255])))
    assert s[:, 0].tolist() == [-128, 0, 127]
    # 24-bit sign-extends
    pay = (b"\x00\x00\x80"     # -2^23
           + b"\xff\xff\x7f")  # 2^23 - 1
    s, _ = decode_wav(raw_wav(24, pay))
    assert s[:, 0].tolist() == [-(1 << 23), (1 << 23) - 1]
    # 32-bit little-endian signed
    pay = struct.pack("<ii", -7, 40000)
    s, _ = decode_wav(raw_wav(32, pay))
    assert s[:, 0].tolist() == [-7, 40000]


def test_real_wav_decode_features(spark):
    import numpy as np

    ids = spark.range(10).select(F.col("id").alias("doc_id"))
    feats = MM.decode_audio_features(MM.attach_wav_media(ids, "doc_id"),
                                     id_col="doc_id")
    rows = {r["id"]: r for r in feats.collect()}
    assert len(rows) == 10
    for rid in range(10):
        s = MM._wav_samples(rid).astype(np.float64)
        r = rows[rid]
        assert r["n_samples"] == len(s) and r["sample_rate"] == 8000
        assert r["mean_abs"] == pytest.approx(np.abs(s).mean())
        assert r["rms"] == pytest.approx(np.sqrt((s * s).mean()))


# property-based codec roundtrips (no Spark)

from hypothesis import given, settings, strategies as st


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 12), w=st.integers(1, 12),
    ch=st.sampled_from([1, 3, 4]),
    seed=st.integers(0, 2**31 - 1),
    ft=st.one_of(st.integers(0, 4), st.none()),
)
def test_png_roundtrip_property(h, w, ch, seed, ft):
    import numpy as np
    from schema_guru_spark.operators.png import decode_png, encode_png

    rng = np.random.RandomState(seed)
    arr = rng.randint(0, 256, size=(h, w, ch)).astype(np.uint8)
    filters = ft if ft is not None else [
        rng.randint(0, 5) for _ in range(h)]
    assert np.array_equal(decode_png(encode_png(arr, filters)), arr)


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(1, 300), ch=st.integers(1, 3),
    rate=st.sampled_from([8000, 22050, 44100]),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_roundtrip_property(n, ch, rate, seed):
    import numpy as np
    from schema_guru_spark.operators.wav import decode_wav, encode_wav

    rng = np.random.RandomState(seed)
    a = rng.randint(-32768, 32767, size=(n, ch)).astype(np.int16)
    back, got_rate = decode_wav(encode_wav(a, rate))
    assert got_rate == rate
    assert np.array_equal(back, a)


def test_avi_codec_roundtrip_pure():
    import numpy as np
    from schema_guru_spark.operators.avi import (
        decode_avi_rgb, encode_avi_rgb)

    rng = np.random.RandomState(9)
    # odd widths exercise the 4-byte row-stride padding
    for (n, h, w) in [(1, 4, 4), (3, 5, 7), (2, 9, 11)]:
        fr = rng.randint(0, 256, size=(n, h, w, 3)).astype(np.uint8)
        back, fps = decode_avi_rgb(encode_avi_rgb(fr, fps=12))
        assert fps == 12 and np.array_equal(back, fr)
    with pytest.raises(ValueError):
        decode_avi_rgb(b"RIFFxxxxNOPE")
    with pytest.raises(ValueError):
        decode_avi_rgb(encode_avi_rgb(
            np.zeros((1, 2, 2, 3), np.uint8))[:30])   # truncated


@settings(max_examples=25, deadline=None)
@given(n=st.integers(1, 4), h=st.integers(1, 10), w=st.integers(1, 10),
       seed=st.integers(0, 2**31 - 1))
def test_avi_roundtrip_property(n, h, w, seed):
    import numpy as np
    from schema_guru_spark.operators.avi import (
        decode_avi_rgb, encode_avi_rgb)

    rng = np.random.RandomState(seed)
    fr = rng.randint(0, 256, size=(n, h, w, 3)).astype(np.uint8)
    back, _ = decode_avi_rgb(encode_avi_rgb(fr))
    assert np.array_equal(back, fr)


def test_real_avi_decode_frame_features(spark):
    import numpy as np

    ids = spark.range(8).select(F.col("id").alias("doc_id"))
    feats = MM.decode_video_features(MM.attach_avi_media(ids, "doc_id"),
                                     id_col="doc_id", every_n=2)
    rows = feats.collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["id"], []).append(r)
    for rid in range(8):
        fr = MM._avi_frames(rid)
        n = fr.shape[0]
        sampled = sorted(by_id[rid], key=lambda r: r["frame_idx"])
        assert [r["frame_idx"] for r in sampled] == list(range(0, n, 2))
        for r in sampled:
            f = fr[r["frame_idx"]].astype(np.float64)
            assert r["mean_g"] == pytest.approx(f[:, :, 1].mean())


def test_avi_and_video_guards(spark):
    import struct
    import numpy as np
    from schema_guru_spark.operators.avi import (
        decode_avi_rgb, encode_avi_rgb)

    fr = np.zeros((1, 2, 2, 3), np.uint8)
    with pytest.raises(ValueError, match="fps"):
        encode_avi_rgb(fr, fps=0)
    # undersized avih header chunk must be a ValueError, not garbage
    good = encode_avi_rgb(fr)
    i = good.index(b"avih")
    bad = bytearray(good)
    bad[i + 4:i + 8] = struct.pack("<I", 16)
    with pytest.raises(ValueError):
        decode_avi_rgb(bytes(bad))
    with pytest.raises(ValueError, match="every_n"):
        MM.decode_video_features(
            MM.attach_avi_media(
                spark.range(1).select(F.col("id").alias("doc_id")),
                "doc_id"),
            id_col="doc_id", every_n=0)


def test_mjpeg_flat_block_frames_bit_exact():
    import numpy as np
    from schema_guru_spark.operators.avi import (
        decode_avi_rgb, encode_avi_mjpeg)

    for rid in range(12):
        fr = MM._mjpeg_frames(rid)
        back, fps = decode_avi_rgb(encode_avi_mjpeg(fr, fps=10))
        assert fps == 10 and np.array_equal(back, fr), rid


def test_mjpeg_roundtrip_tolerance_on_arbitrary_frames():
    # arbitrary (non-flat-block) content: baseline JPEG with the flat
    # quant table is near-lossless — coefficient rounding allows +/-1
    import numpy as np
    from schema_guru_spark.operators.avi import (
        decode_avi_rgb, encode_avi_mjpeg)

    rng = np.random.RandomState(3)
    fr = rng.randint(0, 256, size=(3, 9, 7, 3)).astype(np.uint8)
    back, _ = decode_avi_rgb(encode_avi_mjpeg(fr))
    assert back.shape == fr.shape
    assert np.abs(back.astype(int) - fr.astype(int)).max() <= 1


def test_mjpeg_frame_header_mismatch_is_valueerror():
    # an MJPG frame whose decoded dims disagree with the AVI header must
    # raise the contract error, not silently mis-shape downstream numpy
    import struct
    import numpy as np
    from schema_guru_spark.operators.avi import (
        decode_avi_rgb, encode_avi_mjpeg)

    fr = MM._mjpeg_frames(1)
    data = bytearray(encode_avi_mjpeg(fr, fps=10))
    i = data.index(b"avih")
    # avih dwWidth/dwHeight are the 9th/10th u32 of the body
    struct.pack_into("<II", data, i + 8 + 32, 999, 999)
    with pytest.raises(ValueError, match="header says"):
        decode_avi_rgb(bytes(data))


def test_real_mjpeg_decode_frame_features(spark):
    import numpy as np

    ids = spark.range(8).select(F.col("id").alias("doc_id"))
    feats = MM.decode_video_features(MM.attach_mjpeg_media(ids, "doc_id"),
                                     id_col="doc_id", every_n=2)
    rows = feats.collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["id"], []).append(r)
    for rid in range(8):
        fr = MM._mjpeg_frames(rid)
        n = fr.shape[0]
        sampled = sorted(by_id[rid], key=lambda r: r["frame_idx"])
        assert [r["frame_idx"] for r in sampled] == list(range(0, n, 2))
        for r in sampled:
            f = fr[r["frame_idx"]].astype(np.float64)
            # flat blocks -> bit-exact decode -> exact means
            assert r["mean_r"] == f[:, :, 0].mean()
            assert r["mean_b"] == f[:, :, 2].mean()
            assert (r["width"], r["height"]) == (fr.shape[2], fr.shape[1])


# -- JPEG codec (removes the last declared image stub) ----------------------


def test_jpeg_flat_blocks_bit_exact():
    """Flat 8x8-aligned blocks + unit quant table round-trip EXACTLY —
    the property the analytic oracle of jpeg_decode_features relies on
    (operators/jpeg.py docstring: DC is a power-of-two-exact float, AC
    quantizes to zero)."""
    import numpy as np
    from schema_guru_spark.operators.jpeg import (
        FLAT_QUANT, decode_jpeg, encode_jpeg)

    rng = np.random.RandomState(3)
    for _ in range(5):
        bh, bw = rng.randint(1, 4), rng.randint(1, 5)
        blocks = rng.randint(0, 256, (bh, bw, 3)).astype(np.uint8)
        img = np.repeat(np.repeat(blocks, 8, 0), 8, 1)
        assert np.array_equal(decode_jpeg(encode_jpeg(img, FLAT_QUANT)),
                              img)
    # grayscale too (1 component, no APP14)
    img = np.repeat(np.repeat(
        rng.randint(0, 256, (2, 3)).astype(np.uint8), 8, 0), 8, 1)
    out = decode_jpeg(encode_jpeg(img, FLAT_QUANT))
    assert out.shape == (16, 24, 1) and np.array_equal(out[:, :, 0], img)


@settings(max_examples=25, deadline=None)
@given(h=st.integers(1, 20), w=st.integers(1, 20),
       ch=st.sampled_from([1, 3]), seed=st.integers(0, 2**31 - 1))
def test_jpeg_roundtrip_property_tolerance(h, w, ch, seed):
    """Arbitrary content is LOSSY (coefficient rounding) but bounded:
    with the unit quant table every pixel lands within a few levels of
    the original, at any (including non-multiple-of-8) geometry."""
    import numpy as np
    from schema_guru_spark.operators.jpeg import (
        FLAT_QUANT, decode_jpeg, encode_jpeg)

    rng = np.random.RandomState(seed)
    arr = rng.randint(0, 256, size=(h, w, ch)).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(arr if ch == 3 else arr[:, :, 0],
                                  FLAT_QUANT))
    assert out.shape == (h, w, ch)
    assert np.abs(out.astype(int) - arr.astype(int)).max() <= 4


@settings(max_examples=40, deadline=None)
@given(h=st.integers(1, 24), w=st.integers(1, 24),
       ch=st.sampled_from([1, 3]), seed=st.integers(0, 2**31 - 1),
       flat=st.booleans())
def test_progressive_equals_baseline_property(h, w, ch, seed, flat):
    """Progressive (SOF2) is a different SERIALIZATION of the same
    quantized coefficients: decoding the six-scan progressive stream
    must give bit-identical pixels to decoding the baseline stream of
    the same image+quant — pins all four Annex G scan kinds (DC
    first/refine, AC first/refine, EOB-run coding) against the
    sequential path."""
    import numpy as np
    from schema_guru_spark.operators.jpeg import (
        FLAT_QUANT, STD_QUANT, decode_jpeg, encode_jpeg,
        encode_jpeg_progressive)

    rng = np.random.RandomState(seed)
    quant = FLAT_QUANT if flat else STD_QUANT
    img = rng.randint(0, 256, size=(h, w, ch)).astype(np.uint8)
    if ch == 1:
        img = img[:, :, 0]
    base = decode_jpeg(encode_jpeg(img, quant))
    prog = decode_jpeg(encode_jpeg_progressive(img, quant))
    assert np.array_equal(base, prog)


def test_progressive_flat_blocks_bit_exact():
    import numpy as np
    from schema_guru_spark.operators.jpeg import (
        FLAT_QUANT, decode_jpeg, encode_jpeg_progressive)

    for rid in range(12):
        img = MM._jpeg_pixels(rid)
        out = decode_jpeg(encode_jpeg_progressive(img, FLAT_QUANT))
        assert np.array_equal(out, img), rid


def test_progressive_scan_guards():
    import numpy as np
    import pytest as _pt
    from schema_guru_spark.operators.jpeg import (
        FLAT_QUANT, decode_jpeg, encode_jpeg_progressive)

    data = encode_jpeg_progressive(
        np.arange(64, dtype=np.uint8).reshape(8, 8), FLAT_QUANT)
    with _pt.raises(ValueError):
        decode_jpeg(data[:-3])            # truncated final scan
    # corrupt a scan's spectral band: SOS layout is marker(2) len(2)
    # ns(1) comps(2*ns) Ss Se AhAl
    i = data.index(b"\xff\xda")
    ns = data[i + 4]
    bad = bytearray(data)
    bad[i + 5 + 2 * ns] = 64              # Ss=64 > 63
    with _pt.raises(ValueError):
        decode_jpeg(bytes(bad))


def test_real_progressive_jpeg_decode_features(spark):
    import numpy as np

    ids = spark.range(8).select(F.col("id").alias("doc_id"))
    feats = MM.decode_and_featurize(
        MM.attach_progressive_jpeg_media(ids, "doc_id"), id_col="doc_id")
    rows = {r["id"]: r for r in feats.collect()}
    for rid in range(8):
        img = MM._jpeg_pixels(rid).astype(np.float64)
        r = rows[rid]
        assert (r["width"], r["height"]) == (img.shape[1], img.shape[0])
        # flat blocks -> lossless progressive decode -> exact means
        assert r["mean_r"] == img[:, :, 0].mean()
        assert r["mean_g"] == img[:, :, 1].mean()


def test_jpeg_codec_rejects_corruption_and_scope():
    import numpy as np
    import pytest as _pt
    from schema_guru_spark.operators.jpeg import (
        STD_QUANT, decode_jpeg, encode_jpeg)

    arr = np.arange(16 * 8 * 3, dtype=np.uint8).reshape(16, 8, 3)
    data = encode_jpeg(arr, STD_QUANT)
    with _pt.raises(ValueError):
        decode_jpeg(b"\x00\x01\x02")          # not a JPEG
    with _pt.raises(ValueError):
        decode_jpeg(data[:25])                # truncated in a segment
    with _pt.raises(ValueError):
        decode_jpeg(data[:-4])                # truncated entropy stream
    # progressive is now IN scope, but a baseline stream with the SOF
    # marker flipped to SOF2 is an INVALID progressive file (its scan
    # says Ss=0..Se=63, illegal for progressive) — ValueError, not a
    # silent mis-decode
    prog = bytearray(data)
    sof = prog.find(b"\xff\xc0")
    prog[sof + 1] = 0xC2
    with _pt.raises(ValueError, match="mixing DC and AC"):
        decode_jpeg(bytes(prog))
    # still-declared out-of-scope SOFs raise loudly
    lossless = bytearray(data)
    lossless[sof + 1] = 0xC3
    with _pt.raises(NotImplementedError, match="SOF3"):
        decode_jpeg(bytes(lossless))
    # truncation INSIDE a DHT segment's bits table must keep the
    # ValueError contract (was IndexError — r03 review finding)
    import struct
    cut = bytearray(data)
    i = bytes(cut).find(b"\xff\xc4")
    cut[i + 2:i + 4] = struct.pack(">H", 10)
    with _pt.raises(ValueError, match="DHT"):
        decode_jpeg(bytes(cut))


def test_real_jpeg_decode_features(spark):
    """End-to-end through the media column: attach real baseline JPEGs
    of the flat-block pattern, decode with the Spark operator, compare
    to the analytically computed channel means."""
    import numpy as np
    from schema_guru_spark.operators import multimodal as MM

    ids = spark.range(12).select(F.col("id").alias("doc_id"))
    feats = MM.decode_and_featurize(
        MM.attach_jpeg_media(ids, "doc_id"), id_col="doc_id").collect()
    assert len(feats) == 12
    for r in feats:
        rid = r["id"]
        wb, hb = MM.jpeg_dims(rid)
        assert (r["width"], r["height"]) == (wb * 8, hb * 8)
        bx = np.arange(wb)[None, :]
        by = np.arange(hb)[:, None]
        for ci, col in enumerate(["mean_r", "mean_g", "mean_b"]):
            want = ((7 * bx + 13 * by + 29 * ci + 31 * rid) % 256).mean()
            assert abs(r[col] - want) < 1e-9, (rid, col)


@settings(max_examples=60, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), n_flips=st.integers(1, 8))
def test_codec_fuzz_contract(seed, n_flips):
    """Robustness contract under arbitrary corruption: every decoder
    either succeeds or raises ValueError / NotImplementedError — never
    IndexError / struct.error / KeyError / numpy errors. (The media
    column feeds decoders bytes sniffed only by magic prefix, so a
    corrupt payload must not kill an executor with an uncontracted
    exception.)"""
    import numpy as np
    from schema_guru_spark.operators.avi import (
        decode_avi_rgb, encode_avi_mjpeg, encode_avi_rgb)
    from schema_guru_spark.operators.jpeg import (
        FLAT_QUANT, decode_jpeg, encode_jpeg, encode_jpeg_progressive)
    from schema_guru_spark.operators.png import decode_png, encode_png
    from schema_guru_spark.operators.wav import decode_wav, encode_wav

    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, (9, 7, 3)).astype(np.uint8)
    frames = rng.randint(0, 256, (2, 5, 6, 3)).astype(np.uint8)
    samples = rng.randint(-1000, 1000, 300).astype(np.int16)
    payloads = [
        (decode_png, encode_png(img, 2)),
        (decode_jpeg, encode_jpeg(img, FLAT_QUANT)),
        (decode_wav, encode_wav(samples, 8000)),
        (decode_avi_rgb, encode_avi_rgb(frames, fps=10)),
        (decode_avi_rgb, encode_avi_mjpeg(frames, fps=10)),
        (decode_jpeg, encode_jpeg_progressive(img, FLAT_QUANT)),
    ]
    for decode, data in payloads:
        buf = bytearray(data)
        for _ in range(n_flips):
            op = rng.randint(3)
            if op == 0 and len(buf) > 4:          # flip a byte
                buf[rng.randint(len(buf))] ^= 1 << rng.randint(8)
            elif op == 1 and len(buf) > 8:        # truncate
                del buf[rng.randint(4, len(buf)):]
            else:                                 # append noise
                buf.extend(rng.bytes(rng.randint(1, 16)))
        try:
            decode(bytes(buf))
        except (ValueError, NotImplementedError):
            pass   # the contract


def test_decode_image_smaller_than_thumb_grid(spark):
    """A decoded image smaller than resize_to must thumb via pixel
    replication, not crash: linspace repeats bin edges on tiny images
    and the empty cell's mean is NaN (int(NaN) raised)."""
    import numpy as np
    from schema_guru_spark.operators.png import encode_png

    img = (np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3))
    data = encode_png(img)
    df = spark.createDataFrame(
        [(1, {"data": bytearray(data),
              "meta": {"width": 4, "height": 4}})],
        "id bigint, media struct<data binary, "
        "meta struct<width int, height int>>")
    row = MM.decode_and_featurize(df, resize_to=8).collect()[0]
    assert (row["width"], row["height"]) == (4, 4)
    assert len(row["thumb"]) == 64
    gray = img.mean(axis=2)
    # corner cells replicate the corner pixels exactly
    assert row["thumb"][0] == int(gray[0, 0])
    assert row["thumb"][-1] == int(gray[3, 3])
