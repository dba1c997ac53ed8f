"""Native (Java ImageIO) media tier — round-10 verdict #1.

Parity contract: on lossless content (DC-only solid-block JPEGs, any
PNG) the native tier is BYTE-IDENTICAL to the pure-Python tier — same
digests, same metadata — and on lossy real-world JPEG the two tiers
agree to IDCT rounding (PSNR > 45 dB). The executed native plan
contains no Python evaluation node at all.
"""

import hashlib
import os

import pytest

from pyspark.sql import functions as F

from lagoon_spark.operators import multimodal as mm
from lagoon_spark.operators import native_media as nm
from lagoon_spark.operators.jpeg import decode_jpeg, encode_jpeg

_KITTEN_JPG = (
    "/opt/spark-4.1.2-bin-hadoop3/data/mllib/images/origin/kittens/"
    "54893.jpg"
)


def _solid_jpeg(doc_id: int, nb: int) -> "tuple[bytes, bytes]":
    """m09's corpus shape: nb solid 8x8 grayscale blocks at q75 —
    lossless by construction (DC quantizer is exactly 8)."""
    px = bytearray()
    for _row in range(8):
        for b in range(nb):
            px += bytes([(doc_id * 31 + b * 17) % 256]) * 8
    return encode_jpeg(8 * nb, 8, bytes(px), quality=75, restart_interval=2), bytes(px)


def test_jar_builds_and_registers(spark):
    assert os.path.exists(nm.ensure_jar())
    assert nm.register(spark) is True
    # memoized: second call is a no-op returning the cached outcome
    assert nm.register(spark) is True


def test_native_jpeg_bitexact_on_lossless_corpus(spark):
    """DC-only solid blocks: native and stdlib tiers produce identical
    digests — the invariant that keeps the m09/m11 oracles green when
    auto routes to the JVM."""
    rows = [(i, _solid_jpeg(i, i % 6 + 1)[0]) for i in range(1, 13)]
    df = spark.createDataFrame(rows, "id long, content binary")
    got_native = {
        r["id"]: (r["width"], r["height"], r["payload_bytes"], r["payload_digest"])
        for r in mm.decode_images(df, "id", "content", "image/jpeg", tier="native").collect()
    }
    got_stdlib = {
        r["id"]: (r["width"], r["height"], r["payload_bytes"], r["payload_digest"])
        for r in mm.decode_images(df, "id", "content", "image/jpeg", tier="stdlib").collect()
    }
    assert got_native == got_stdlib
    # and both match the closed-form pixels
    for i, (_blob, px) in ((i, _solid_jpeg(i, i % 6 + 1)) for i in range(1, 13)):
        assert got_native[i][3] == hashlib.md5(px.hex().upper().encode()).hexdigest()


def test_native_png_bitexact(spark):
    """PNG is lossless: the committed real fixture (filters 0-4)
    digests identically through both tiers."""
    fixture = os.path.join(os.path.dirname(__file__), "fixtures", "tiny_rgb.png")
    blob = open(fixture, "rb").read()
    df = spark.createDataFrame([(1, blob)], "id long, content binary")
    nat = mm.decode_images(df, "id", "content", "image/png", tier="native").collect()[0]
    std = mm.decode_images(df, "id", "content", "image/png", tier="stdlib").collect()[0]
    assert (nat["width"], nat["height"]) == (std["width"], std["height"]) == (5, 5)
    assert nat["payload_bytes"] == std["payload_bytes"] == 75
    assert nat["payload_digest"] == std["payload_digest"]


def test_native_real_jpeg_psnr_vs_stdlib(spark):
    """Real camera JPEG (4:2:0, non-multiple-of-16): the two tiers are
    independent decoders, so parity is PSNR-bounded, not bit-exact."""
    import numpy as np

    if not os.path.exists(_KITTEN_JPG):
        pytest.skip("Spark sample images not installed")
    blob = open(_KITTEN_JPG, "rb").read()
    W, H, std = decode_jpeg(blob)
    df = spark.createDataFrame([(1, blob)], "id long, content binary")
    nat = df.select(
        F.call_udf(nm.IMAGE_DECODE_FN, F.col("content")).alias("d")
    ).select("d.*").collect()[0]
    assert nm.register(spark)
    assert (nat["width"], nat["height"], nat["channels"]) == (W, H, 3)
    a = np.frombuffer(bytes(nat["data"]), np.uint8).astype(float)
    b = np.frombuffer(std, np.uint8).astype(float)
    diff = np.abs(a - b)
    psnr = 10 * np.log10(255**2 / max((diff**2).mean(), 1e-9))
    assert psnr > 45 and diff.mean() < 1.0


def test_native_avi_sampling_matches_stdlib(spark):
    """AVI/MJPEG walk: frame counts, dims and the sampled-frames
    digest are identical across tiers on the m11 corpus shape."""
    frames = [_solid_jpeg(7 + f, 2)[0] for f in range(5)]
    avi = mm.encode_avi_mjpeg(16, 8, frames)
    df = spark.createDataFrame([(1, avi)], "id long, content binary")
    for every in (1, 2, 3):
        nat = mm.decode_video_frames(df, "id", "content", every=every, tier="native").collect()[0]
        std = mm.decode_video_frames(df, "id", "content", every=every, tier="stdlib").collect()[0]
        assert nat.asDict() == std.asDict()


def test_native_plan_is_python_free(spark):
    """The native decode's executed plan has NO Python evaluation node
    (no BatchEvalPython / ArrowEvalPython / mapInPandas) — decode,
    digest and metadata all run JVM-side."""
    blob, _ = _solid_jpeg(3, 2)
    df = spark.createDataFrame([(1, blob)], "id long, content binary")
    out = mm.decode_images(df, "id", "content", "image/jpeg", tier="native")
    plan = out._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "PythonMapInArrow"):
        assert marker not in plan, plan
    assert out.count() == 1


def test_auto_keeps_gif_on_stdlib(spark):
    """GIF payload semantics differ (palette indices vs RGB), so auto
    must NOT route GIF natively: the payload is w*h*1 bytes."""
    from lagoon_spark.multimodal_queries import _encode_gif

    gif = _encode_gif(4, 3, [bytes(range(12))])
    df = spark.createDataFrame([(1, gif)], "id long, content binary")
    out = mm.decode_images(df, "id", "content", "image/gif").collect()[0]
    assert out["payload_bytes"] == 12  # palette indices, stdlib tier


def test_env_override_forces_stdlib(spark, monkeypatch):
    """LAGOON_MEDIA_TIER=stdlib wins over tier='native' — the global
    escape hatch when a deployment must pin the Python codecs."""
    monkeypatch.setenv("LAGOON_MEDIA_TIER", "stdlib")
    blob, _ = _solid_jpeg(3, 2)
    df = spark.createDataFrame([(1, blob)], "id long, content binary")
    out = mm.decode_images(df, "id", "content", "image/jpeg", tier="native")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan or "mapInPandas" in plan.lower()
    monkeypatch.setenv("LAGOON_MEDIA_TIER", "bogus")
    with pytest.raises(ValueError, match="auto\\|stdlib\\|native"):
        mm.decode_images(df, "id", "content", "image/jpeg")


def test_native_rejects_garbage_bytes(spark):
    """Undecodable bytes fail the task loudly (same contract as the
    stdlib tier's ValueError), not silently."""
    df = spark.createDataFrame([(1, b"not an image")], "id long, content binary")
    with pytest.raises(Exception, match="(?i)could not decode|SparkException"):
        mm.decode_images(df, "id", "content", "image/jpeg", tier="native").collect()


def _png(color_type: int, w: int, h: int, raw_scanlines: bytes,
         plte: bytes = b"") -> bytes:
    """Minimal PNG writer for parity fixtures (filter 0 rows)."""
    import struct
    import zlib

    def chunk(ctype: bytes, data: bytes) -> bytes:
        c = ctype + data
        return struct.pack(">I", len(data)) + c + struct.pack(
            ">I", zlib.crc32(c) & 0xFFFFFFFF
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if plte:
        out += chunk(b"PLTE", plte)
    out += chunk(b"IDAT", zlib.compress(raw_scanlines)) + chunk(b"IEND", b"")
    return out


def test_native_png_palette_and_grayalpha_parity(spark):
    """PNG color types 3 (palette -> INDEX bytes) and 4 (gray+alpha ->
    2 interleaved bands): the native tier must return the stdlib
    tier's exact payload layout, not a getRGB expansion."""
    # type 3: 4x2, indices 0..3 into a 4-entry palette
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 7, 7, 7])
    idx_rows = b"\x00" + bytes([0, 1, 2, 3]) + b"\x00" + bytes([3, 2, 1, 0])
    pal_png = _png(3, 4, 2, idx_rows, plte=plte)
    # type 4: 3x2 gray+alpha pairs
    ga_rows = (
        b"\x00" + bytes([10, 255, 20, 128, 30, 0])
        + b"\x00" + bytes([40, 1, 50, 2, 60, 3])
    )
    ga_png = _png(4, 3, 2, ga_rows)
    df = spark.createDataFrame(
        [(1, pal_png), (2, ga_png)], "id long, content binary"
    )
    nat = {
        r["id"]: r.asDict()
        for r in mm.decode_images(df, "id", "content", "image/png", tier="native").collect()
    }
    std = {
        r["id"]: r.asDict()
        for r in mm.decode_images(df, "id", "content", "image/png", tier="stdlib").collect()
    }
    assert nat == std
    assert nat[1]["payload_bytes"] == 8   # indices, not RGB
    assert nat[2]["payload_bytes"] == 12  # 2 bands, not RGBA


def test_native_gif_frames_bitexact(spark):
    """Multi-frame GIF: the native ImageIO reader hands frames back as
    indexed rasters, so both tiers digest the SAME raw palette-index
    byte stream — metadata and digests identical on the m08 corpus
    shape (greyscale global palette, 1-4 full-rect frames)."""
    from lagoon_spark.multimodal_queries import _encode_gif

    rows = []
    for i in range(12):
        nf, w, h = i % 4 + 1, i % 8 + 2, i % 6 + 2
        frames = [
            bytes((i * 7 + k * 13 + j) % 256 for j in range(w * h))
            for k in range(nf)
        ]
        rows.append((i, _encode_gif(w, h, frames)))
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    nat = [
        r.asDict()
        for r in mm.decode_gif_frames(df, "doc_id", "content", tier="native")
        .orderBy("id")
        .collect()
    ]
    std = [
        r.asDict()
        for r in mm.decode_gif_frames(df, "doc_id", "content", tier="stdlib")
        .orderBy("id")
        .collect()
    ]
    assert nat == std
    assert {r["n_frames"] for r in nat} == {1, 2, 3, 4}


def test_native_gif_plan_is_python_free(spark):
    """decode_gif_frames under auto routes natively: no Python node in
    the executed plan (decode, frame concat and digest all JVM-side)."""
    from lagoon_spark.multimodal_queries import _encode_gif

    gif = _encode_gif(4, 3, [bytes(range(12)), bytes(range(12, 24))])
    df = spark.createDataFrame([(1, gif)], "id long, content binary")
    out = mm.decode_gif_frames(df, "id", "content")
    plan = out._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "PythonMapInArrow"):
        assert marker not in plan, plan
    row = out.collect()[0]
    assert (row["n_frames"], row["width"], row["height"]) == (2, 4, 3)


@pytest.mark.slow  # parity/diagnostic soak (round-12 verdict #3)


def test_resize_pixels_tiers_bit_identical(spark):
    """Box downsample: the Java UDF and the numpy tier share one
    integer floor-division rule, so they are byte-identical on random
    buffers — including non-divisible dims (partial boxes truncated)
    and multi-channel layouts."""
    import hashlib
    import random

    rng = random.Random(13)
    rows = []
    for i, (w, h, c) in enumerate([(8, 8, 1), (13, 7, 1), (9, 10, 3), (4, 4, 4)]):
        rows.append((i, w, h, c, bytes(rng.randrange(256) for _ in range(w * h * c))))
    for factor in (1, 2, 3):
        for i, w, h, c, buf in rows:
            df = spark.createDataFrame(
                [(i, w, h, buf)], "id long, width int, height int, data binary"
            )
            nat = mm.resize_pixels(
                df, "id", "width", "height", "data",
                factor=factor, channels=c, tier="native",
            ).collect()[0]
            std = mm.resize_pixels(
                df, "id", "width", "height", "data",
                factor=factor, channels=c, tier="stdlib",
            ).collect()[0]
            assert nat.asDict() == std.asDict(), (i, w, h, c, factor)
            # the stdlib rule itself, pinned against a naive reference loop
            ow, oh = w // factor, h // factor
            exp = bytearray()
            for oy in range(oh):
                for ox in range(ow):
                    for ch in range(c):
                        s = sum(
                            buf[((oy * factor + fy) * w + ox * factor + fx) * c + ch]
                            for fy in range(factor)
                            for fx in range(factor)
                        )
                        exp.append(s // (factor * factor))
            dig = hashlib.md5(bytes(exp).hex().upper().encode()).hexdigest()
            assert std["payload_digest"] == dig
            assert (std["width"], std["height"]) == (ow, oh)
            assert std["payload_bytes"] == len(exp)


def test_resize_pixels_rejects_bad_buffer(spark):
    df = spark.createDataFrame(
        [(1, 4, 4, b"\x00" * 15)], "id long, width int, height int, data binary"
    )
    with pytest.raises(Exception, match="width\\*height\\*channels"):
        mm.resize_pixels(df, "id", "width", "height", "data", factor=2).collect()
    with pytest.raises(ValueError, match="factor"):
        mm.resize_pixels(df, "id", "width", "height", "data", factor=0)
    # negative dims whose product matches the buffer length must refuse
    # in BOTH tiers (the tiers-identical contract includes errors)
    neg = spark.createDataFrame(
        [(1, -1, -1, b"\x00")], "id long, width int, height int, data binary"
    )
    for tier in ("native", "stdlib"):
        with pytest.raises(Exception, match="width/height"):
            mm.resize_pixels(
                neg, "id", "width", "height", "data", factor=4, tier=tier
            ).collect()


def test_native_wav_samples_bitexact(spark):
    """Round-10 verdict #5: the JVM WAV tier decodes the identical
    sample values as the stdlib tier — PCM is lossless, so parity is
    LIST EQUALITY, not a tolerance — and auto routes WAV natively."""
    import struct

    from lagoon_spark.multimodal_queries import _encode_wav_pcm16

    rows = []
    for i in range(4):
        pcm = struct.pack(
            "<16h", *[(j * 257 - 2000 * i) % 32768 - 16384 for j in range(16)]
        )
        rows.append((i, _encode_wav_pcm16(8000 + i, pcm)))
    rows.append((9, _encode_wav_pcm16(44100, struct.pack("<5h", 1, -2, 3, -4, 5))))
    df = spark.createDataFrame(rows, "doc_id long, content binary")

    native = {
        r["id"]: (r["sample_rate"], list(r["samples"]))
        for r in mm.decode_audio_samples(
            df, "doc_id", "content", tier="native"
        ).collect()
    }
    stdlib = {
        r["id"]: (r["sample_rate"], list(r["samples"]))
        for r in mm.decode_audio_samples(
            df, "doc_id", "content", tier="stdlib"
        ).collect()
    }
    assert native == stdlib and len(native) == 5

    # auto routes natively when the JDK is present: no Python node
    auto = mm.decode_audio_samples(df, "doc_id", "content")
    plan = auto._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan, plan


def test_native_wav_rejects_non_pcm(spark):
    """Compressed WAV (format != 1) refuses loudly in BOTH tiers —
    the stdlib NotImplementedError contract."""
    import struct

    blob = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 40, b"WAVE",
        b"fmt ", 16, 2, 1, 8000, 8000, 1, 4,  # ADPCM (format 2)
        b"data", 4,
    ) + b"\x00\x00\x00\x00"
    df = spark.createDataFrame([(1, blob)], "doc_id long, content binary")
    with pytest.raises(Exception, match="format 2|only PCM"):
        mm.decode_audio_samples(df, "doc_id", "content", tier="native").collect()
    with pytest.raises(Exception, match="format 2|only PCM"):
        mm.decode_audio_samples(df, "doc_id", "content", tier="stdlib").collect()


def test_native_wav_malformed_chunk_length_fails_loudly(spark):
    """A corrupt chunk length of 0xFFFFFFF8 wrapped to -8 under 32-bit
    arithmetic in the first JVM chunk walk, pinning ``pos`` in place —
    an executor task spinning forever on attacker-controlled bytes.
    The walk now advances in 64-bit math, so the oversized chunk falls
    out of the loop and BOTH tiers raise the same loud error the
    stdlib tier always produced (ADVICE r11, WavSamples.java:56)."""
    import struct

    def wav_with_chunk_len(length: int) -> bytes:
        return (
            struct.pack("<4sI4s", b"RIFF", 0, b"WAVE")
            + struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, 8000, 16000, 2, 16)
            + struct.pack("<4sI", b"data", length)
            + b"\x00\x00\x00"  # odd length: not a whole int16 frame
        )

    for bad_len in (0xFFFFFFF8, 0xFFFFFFF7):
        blob = wav_with_chunk_len(bad_len)
        df = spark.createDataFrame([(1, blob)], "doc_id long, content binary")
        for tier in ("native", "stdlib"):
            with pytest.raises(Exception, match="truncated WAV PCM data"):
                mm.decode_audio_samples(
                    df, "doc_id", "content", tier=tier
                ).collect()
