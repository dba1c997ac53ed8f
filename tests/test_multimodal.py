"""Multimodal operator plumbing: schemas, batching, codec seams."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from lagoon_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def assets(spark):
    rows = [
        (1, b"\xff\xd8\xff\xe0" + b"jpegdata"),
        (2, b"\x89PNG\r\n\x1a\n" + b"pngdata"),
        (3, b"RIFF\x00\x00\x00\x00WAVE"),
        (4, b"plain text bytes"),
        (5, mm.encode_fake_image(8, 6, b"payloadpayload")),
    ]
    return spark.createDataFrame(rows, "id long, content binary")


def test_asset_metadata(assets):
    out = {r["id"]: r for r in mm.asset_metadata(assets, "content").collect()}
    assert out[1]["media_type"] == "image/jpeg"
    assert out[2]["media_type"] == "image/png"
    assert out[3]["media_type"] == "audio/wav"
    assert out[4]["media_type"] == "application/octet-stream"
    assert out[5]["media_type"] == "image/fakeimg"
    assert out[4]["byte_len"] == len(b"plain text bytes")
    expect = hashlib.md5(b"plain text bytes".hex().upper().encode()).hexdigest()
    assert out[4]["digest"] == expect


def test_metadata_is_jvm_only(assets):
    """No Python evaluation in the metadata plan (scales as a pure scan)."""
    plan = mm.asset_metadata(assets, "content")._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_decode_fake_images(spark):
    rows = [(i, mm.encode_fake_image(i * 10, i * 5, b"x" * i)) for i in range(1, 6)]
    df = spark.createDataFrame(rows, "id long, content binary")
    out = {r["id"]: r for r in mm.decode_images(df, "id", "content").collect()}
    assert out[3]["width"] == 30 and out[3]["height"] == 15
    assert out[3]["payload_bytes"] == 3
    assert out[2]["payload_digest"] == hashlib.md5(b"xx".hex().upper().encode()).hexdigest()


def test_decode_unknown_codec_raises(spark):
    # video/webm has no decoder in any environment here (av absent);
    # image formats now all have stdlib fallbacks, so they don't refuse
    df = spark.createDataFrame(
        [(1, b"\x1a\x45\xdf\xa3")], "id long, content binary"
    )
    with pytest.raises(NotImplementedError, match="no codec"):
        mm.decode_images(df, "id", "content", media_type="video/webm")


def test_fake_image_col_roundtrip(spark):
    """JVM-side container assembly decodes identically to the Python one."""
    df = spark.createDataFrame([(7, "hello")], "id long, s string").select(
        "id",
        mm.fake_image_col(F.lit(320), F.lit(200), F.encode("s", "UTF-8")).alias(
            "content"
        ),
    )
    blob = bytes(df.collect()[0]["content"])
    assert blob == mm.encode_fake_image(320, 200, b"hello")
    out = mm.decode_images(df, "id", "content").collect()[0]
    assert (out["width"], out["height"], out["payload_bytes"]) == (320, 200, 5)


def test_resize_fake_images(spark):
    df = spark.createDataFrame(
        [(1, mm.encode_fake_image(100, 60, b"p" * 100))], "id long, content binary"
    )
    out = mm.resize_fake_images(df, "id", "content", 1, 2).collect()[0]
    w, h, payload = mm._decode_fake_image(bytes(out["content"]))
    assert (w, h) == (50, 30)
    assert len(payload) == 25  # area ratio 1/4


def test_sample_frames(spark):
    content = bytes(range(64))  # 4 frames of 16
    df = spark.createDataFrame([(1, content)], "id long, content binary")
    rows = mm.sample_frames(df, "id", "content", frame_size=16, every_k=2).collect()
    assert [r["frame_idx"] for r in rows] == [0, 2]
    assert rows[0]["frame_hex"] == content[:16].hex().upper()
    assert rows[1]["frame_hex"] == content[32:48].hex().upper()


def test_byte_histogram_features_batching(spark):
    """Featurizer is correct across multiple partitions/batches."""
    rows = [(i, f"abc{'d' * i}".encode()) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, content binary").repartition(4)
    out = {r["id"]: r for r in mm.byte_histogram_features(df, "id", "content").collect()}
    assert len(out) == 200
    assert out[5]["n_a"] == 1 and out[5]["n_d"] == 5 and out[5]["n_h"] == 0


def test_pil_codec_lane(spark):
    """Codec-present lane: with Pillow installed, _load_codec routes
    image/* to a real PIL decode and decode_images works end-to-end on
    a genuine PNG. Skipped where PIL is absent (this container) — green
    the day the environment grows Pillow."""
    import pytest

    PIL = pytest.importorskip("PIL")
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (12, 7), color=(1, 2, 3)).save(buf, format="PNG")
    png = buf.getvalue()

    w, h, payload = mm._decode_pil(png)
    assert (w, h) == (12, 7) and len(payload) == 12 * 7 * 3

    df = spark.createDataFrame([(1, png)], "id long, content binary")
    out = mm.decode_images(df, "id", "content", media_type="image/png").collect()[0]
    assert (out["width"], out["height"]) == (12, 7)
    assert out["payload_bytes"] == 12 * 7 * 3


def test_missing_codec_still_raises():
    import pytest

    with pytest.raises(NotImplementedError, match="no codec"):
        mm._load_codec("video/mp4")


# -- round-7 verdict #5: real-bytes PNG decode with NO third-party codec ------

_TINY_PNG = __file__.rsplit("/", 1)[0] + "/fixtures/tiny_rgb.png"
#: md5 of the reconstructed 5×5 RGB pixel stream (the fixture's rows
#: are forward-filtered with types 0,1,2,3,4 — every filter exercised)
_TINY_PIXEL_MD5 = "c0ccd4a7aec39d65fe24b410a26e573c"


def test_decode_png_stdlib_real_bytes(spark):
    """A committed, genuine PNG (filters 0–4 across its five rows)
    decodes with the pure-stdlib fallback — hash-gated pixels, end to
    end through decode_images in THIS container, no PIL."""
    blob = open(_TINY_PNG, "rb").read()
    w, h, payload = mm._decode_png(blob)
    assert (w, h) == (5, 5) and len(payload) == 5 * 5 * 3
    assert hashlib.md5(payload).hexdigest() == _TINY_PIXEL_MD5

    df = spark.createDataFrame([(1, blob)], "id long, content binary")
    out = mm.decode_images(df, "id", "content", media_type="image/png").collect()[0]
    assert (out["width"], out["height"]) == (5, 5)
    assert out["payload_bytes"] == 75
    assert out["payload_digest"] == hashlib.md5(
        payload.hex().upper().encode()
    ).hexdigest()


def test_decode_wav_stdlib_real_bytes(spark):
    """Real RIFF/PCM bytes decode with the stdlib chunk walk: frame
    count, sample rate, and payload pinned; word-aligned odd chunks
    handled; compressed formats refused loudly."""
    import struct as _struct

    from lagoon_spark.multimodal_queries import _encode_wav_pcm16

    pcm = bytes(range(32)) * 2  # 32 16-bit mono frames
    wav = _encode_wav_pcm16(11025, pcm)
    assert mm.sniff_media_type(F.lit(wav)) is not None  # RIFF magic
    assert mm._decode_wav(wav) == (32, 11025, pcm)

    # an extra odd-length chunk before data must word-align correctly
    extra = b"LIST" + _struct.pack("<I", 3) + b"abc" + b"\x00"
    padded = wav[:36] + extra + wav[36:]
    padded = padded[:4] + _struct.pack("<I", len(padded) - 8) + padded[8:]
    assert mm._decode_wav(padded) == (32, 11025, pcm)

    df = spark.createDataFrame([(1, wav)], "id long, content binary")
    out = mm.decode_audio(df, "id", "content").collect()[0]
    assert (out["n_frames"], out["sample_rate"], out["pcm_bytes"]) == (32, 11025, 64)

    # float/ADPCM formats refuse rather than mis-decode
    bad = bytearray(wav)
    bad[20:22] = _struct.pack("<H", 3)  # IEEE float
    with pytest.raises(NotImplementedError, match="only PCM"):
        mm._decode_wav(bytes(bad))
    with pytest.raises(ValueError, match="not a RIFF"):
        mm._decode_wav(b"OggS....")


def test_decode_gif_stdlib_real_bytes(spark):
    """Animated-GIF round-trip on real container bytes: stdlib LZW
    both directions, multi-frame, extensions skipped, and a
    spec-exemplar GIF authored by neither side decodes correctly."""
    import random

    from lagoon_spark.multimodal_queries import _encode_gif

    rng = random.Random(11)
    frames = [bytes(rng.randrange(256) for _ in range(6 * 4)) for _ in range(3)]
    blob = _encode_gif(6, 4, frames)
    assert mm._decode_gif(blob) == (6, 4, frames)

    # LZW budget edge: a frame large enough to force mid-stream CLEARs
    big = [bytes(rng.randrange(256) for _ in range(40 * 30))]
    assert mm._decode_gif(_encode_gif(40, 30, big)) == (40, 30, big)

    # the classic 1x1 spec exemplar (independent encoder)
    known = bytes.fromhex(
        "474946383761" "01000100" "800000" "000000ffffff"
        "2c000000000100010000" "02" "024401" "00" "3b"
    )
    assert mm._decode_gif(known) == (1, 1, [b"\x00"])

    # end-to-end through the Arrow-batched operator
    df = spark.createDataFrame([(1, blob)], "id long, content binary")
    out = mm.decode_gif_frames(df, "id", "content").collect()[0]
    assert (out["n_frames"], out["width"], out["height"]) == (3, 6, 4)
    import hashlib

    assert out["frames_digest"] == hashlib.md5(
        b"".join(frames).hex().upper().encode()
    ).hexdigest()

    with pytest.raises(ValueError, match="not a GIF"):
        mm._decode_gif(b"PNG?....")

    # the generic decode seam serves GIF too (first frame, the bytes
    # PIL's mode-P tobytes() would yield)
    out1 = mm.decode_images(df, "id", "content", media_type="image/gif").collect()[0]
    assert (out1["width"], out1["height"]) == (6, 4)
    assert out1["payload_bytes"] == 24
    assert out1["payload_digest"] == hashlib.md5(
        frames[0].hex().upper().encode()
    ).hexdigest()


def test_decode_png_random_filters_property():
    """Property: for random pixel data and RANDOM per-row filter
    choices, forward-filter + deflate → _decode_png recovers the exact
    pixels (greyscale and RGB, many sizes). Exercises every filter
    arithmetic path, not just the fixture's fixed sequence."""
    import binascii
    import random
    import struct as _struct
    import zlib

    rng = random.Random(20260814)

    def chunk(ctype, data):
        return (
            _struct.pack(">I", len(data))
            + ctype
            + data
            + _struct.pack(">I", binascii.crc32(ctype + data) & 0xFFFFFFFF)
        )

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    for _ in range(25):
        w, hgt = rng.randint(1, 9), rng.randint(1, 7)
        color_type, ch = rng.choice([(0, 1), (2, 3), (6, 4)])
        stride = w * ch
        pix = bytes(rng.randrange(256) for _ in range(stride * hgt))
        raw = bytearray()
        for y in range(hgt):
            f = rng.randrange(5)
            raw.append(f)
            for x in range(stride):
                cur = pix[y * stride + x]
                a = pix[y * stride + x - ch] if x >= ch else 0
                b = pix[(y - 1) * stride + x] if y else 0
                c = pix[(y - 1) * stride + x - ch] if (y and x >= ch) else 0
                v = (cur, cur - a, cur - b, cur - ((a + b) >> 1),
                     cur - paeth(a, b, c))[f] & 0xFF
                raw.append(v)
        ihdr = _struct.pack(">IIBBBBB", w, hgt, 8, color_type, 0, 0, 0)
        png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
               + chunk(b"IDAT", zlib.compress(bytes(raw)))
               + chunk(b"IEND", b""))
        assert mm._decode_png(png) == (w, hgt, pix)


def test_decode_png_matches_pil_if_present():
    """Where Pillow exists the stdlib decoder must agree with it
    byte-for-byte on 8-bit RGB (PIL's tobytes() is the same
    reconstructed scanline stream)."""
    pytest.importorskip("PIL")
    blob = open(_TINY_PNG, "rb").read()
    assert mm._decode_png(blob) == mm._decode_pil(blob)


def test_decode_png_shapes_and_refusals():
    """Greyscale and RGBA decode; 16-bit and interlaced refuse with
    NotImplementedError (PIL territory); junk refuses with ValueError."""
    import binascii
    import struct as _struct
    import zlib

    def chunk(ctype, data):
        return (
            _struct.pack(">I", len(data))
            + ctype
            + data
            + _struct.pack(">I", binascii.crc32(ctype + data) & 0xFFFFFFFF)
        )

    def make(w, h, color_type, channels, bit_depth=8, interlace=0):
        pix = bytes((x * 31 + 7) % 256 for x in range(w * h * channels))
        raw = b"".join(
            b"\x00" + pix[y * w * channels : (y + 1) * w * channels]
            for y in range(h)
        )
        ihdr = _struct.pack(">IIBBBBB", w, h, bit_depth, color_type, 0, 0, interlace)
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b"")
        ), pix

    grey, gpix = make(4, 3, 0, 1)
    assert mm._decode_png(grey) == (4, 3, gpix)
    rgba, apix = make(2, 2, 6, 4)
    assert mm._decode_png(rgba) == (2, 2, apix)

    with pytest.raises(NotImplementedError, match="bit depth"):
        mm._decode_png(make(2, 2, 0, 1, bit_depth=16)[0])
    with pytest.raises(NotImplementedError, match="interlaced"):
        mm._decode_png(make(2, 2, 0, 1, interlace=1)[0])
    with pytest.raises(ValueError, match="not a PNG"):
        mm._decode_png(b"GIF89a...")


def test_perceptual_hash_identical_payloads_collide(spark):
    from lagoon_spark.operators.multimodal import (
        encode_fake_image,
        perceptual_hash_images,
    )

    same = b"abcdefgh" * 10
    other = bytes(range(64, 0, -1))
    rows = [
        (1, encode_fake_image(4, 4, same)),
        (2, encode_fake_image(9, 9, same)),  # same pixels, other dims
        (3, encode_fake_image(4, 4, other)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    got = {
        r["id"]: r["phash"]
        for r in perceptual_hash_images(df, "doc_id", "content").collect()
    }
    assert got[1] == got[2]  # identical payload -> identical hash
    assert got[1] != got[3]
    # strictly descending bytes: every comparison is >, all 63 bits set
    assert got[3] == (1 << 63) - 1


# ---------------------------------------------------------------------------
# baseline JPEG codec (operators/jpeg.py)
# ---------------------------------------------------------------------------

_KITTEN_JPG = (
    "/opt/spark-4.1.2-bin-hadoop3/data/mllib/images/origin/kittens/DP802813.jpg"
)
_PROGRESSIVE_JPG = "/usr/share/doc/nodejs/thin-white-stripe.jpg"


def test_jpeg_roundtrip_psnr():
    """Gradient images survive encode→decode at sane fidelity in all
    three carrier shapes (gray, RGB 4:4:4, RGB 4:2:0), including
    non-multiple-of-8 dimensions (pad-then-crop paths)."""
    import numpy as np

    from lagoon_spark.operators.jpeg import decode_jpeg, encode_jpeg

    def psnr(a, b):
        mse = ((a.astype(float) - b.astype(float)) ** 2).mean()
        return 10 * np.log10(255**2 / max(mse, 1e-9))

    h, w = 45, 61  # deliberately not 8-multiples
    grad = (np.add.outer(np.arange(h) * 2, np.arange(w) * 3) % 256).astype(
        np.uint8
    )
    W, H, out = decode_jpeg(encode_jpeg(w, h, grad.tobytes(), quality=90))
    assert (W, H) == (w, h)
    assert psnr(np.frombuffer(out, np.uint8).reshape(h, w), grad) > 40

    rgb = np.stack([grad, 255 - grad, np.full_like(grad, 96)], axis=-1)
    for sub, floor in (("444", 32), ("420", 24)):
        W, H, out = decode_jpeg(
            encode_jpeg(w, h, rgb.tobytes(), quality=90, subsampling=sub)
        )
        assert (W, H) == (w, h)
        got = np.frombuffer(out, np.uint8).reshape(h, w, 3)
        assert psnr(got, rgb) > floor, sub


def test_jpeg_solid_blocks_lossless_at_q75():
    """At quality 75 the luminance DC quantizer is exactly 8, so solid
    8x8 blocks round-trip bit-exactly — the invariant the m09 oracle's
    closed form stands on."""
    from lagoon_spark.operators.jpeg import decode_jpeg, encode_jpeg

    for vals in ([0], [255], [1, 254], [7, 129, 200, 63]):
        nb = len(vals)
        px = bytearray()
        for _row in range(8):
            for v in vals:
                px += bytes([v]) * 8
        W, H, out = decode_jpeg(encode_jpeg(8 * nb, 8, bytes(px), quality=75))
        assert (W, H) == (8 * nb, 8) and out == bytes(px)


def test_jpeg_restart_interval_roundtrip():
    """DRI + RSTn markers decode to the identical pixels as the
    marker-free stream, and really appear on the wire."""
    import numpy as np

    from lagoon_spark.operators.jpeg import decode_jpeg, encode_jpeg

    h, w = 24, 40
    img = (np.add.outer(np.arange(h) * 7, np.arange(w) * 5) % 256).astype(
        np.uint8
    )
    plain = encode_jpeg(w, h, img.tobytes(), quality=80)
    rst = encode_jpeg(w, h, img.tobytes(), quality=80, restart_interval=2)
    assert b"\xff\xdd" in rst and b"\xff\xd0" in rst
    assert b"\xff\xdd" not in plain
    assert decode_jpeg(plain) == decode_jpeg(rst)


def test_jpeg_fuzz_roundtrip_decodes():
    """Seeded fuzz: random sizes and pixels (noise is JPEG's worst
    case) always decode to the right dimensions with bounded error and
    a preserved mean — the codec never crashes or drifts."""
    import random

    import numpy as np

    from lagoon_spark.operators.jpeg import decode_jpeg, encode_jpeg

    rng = random.Random(1234)
    for _ in range(12):
        w, h = rng.randint(1, 25), rng.randint(1, 25)
        ncomp = rng.choice((1, 3))
        sub = rng.choice(("444", "420")) if ncomp == 3 else "444"
        q = rng.choice((50, 75, 90))
        px = bytes(rng.randrange(256) for _ in range(w * h * ncomp))
        W, H, out = decode_jpeg(
            encode_jpeg(w, h, px, quality=q, subsampling=sub)
        )
        assert (W, H) == (w, h) and len(out) == len(px)
        a = np.frombuffer(px, np.uint8).astype(float)
        b = np.frombuffer(out, np.uint8).astype(float)
        assert abs(a.mean() - b.mean()) < 8.0
        # noise is incompressible; q50 + 4:2:0 chroma legitimately
        # lands near 50 mean-abs — this bounds "decoded garbage", not
        # fidelity (the PSNR tests above do that on realistic content)
        assert np.abs(a - b).mean() < 64.0


def test_jpeg_foreign_real_bytes_vs_imageio(spark):
    """A real camera JPEG (4:2:0, non-multiple-of-16 dims, shipped
    with Spark) decodes within a fraction of a gray level of Java
    ImageIO — an INDEPENDENT reference decoder, so this pins absolute
    correctness, not just self-consistency."""
    import os

    import numpy as np

    from lagoon_spark.operators.jpeg import decode_jpeg

    if not os.path.exists(_KITTEN_JPG):
        pytest.skip("Spark sample images not installed")
    W, H, out = decode_jpeg(open(_KITTEN_JPG, "rb").read())
    assert (W, H) == (199, 313)
    mine = np.frombuffer(out, np.uint8).reshape(H, W, 3).astype(float)

    row = spark.read.format("image").load(_KITTEN_JPG).select("image.*").first()
    assert (row.width, row.height, row.nChannels) == (199, 313, 3)
    ref = (
        np.frombuffer(bytes(row.data), np.uint8)
        .reshape(H, W, 3)[..., ::-1]  # ImageIO hands back BGR
        .astype(float)
    )
    diff = np.abs(mine - ref)
    psnr = 10 * np.log10(255**2 / max((diff**2).mean(), 1e-9))
    assert psnr > 45 and diff.mean() < 1.0


def test_jpeg_progressive_real_bytes_vs_imageio(spark):
    """Real progressive (SOF2) JPEGs — successive approximation, EOB
    runs, non-interleaved AC scans — decode within rounding error of
    Java ImageIO on every progressive sample in this container."""
    import os

    import numpy as np

    from lagoon_spark.operators.jpeg import decode_jpeg

    candidates = [
        _PROGRESSIVE_JPG,
        "/usr/share/doc/nodejs/full-white-stripe.jpg",
        "/opt/spark-4.1.2-bin-hadoop3/data/mllib/images/origin/"
        "multi-channel/grayscale.jpg",
    ]
    present = [p for p in candidates if os.path.exists(p)]
    if not present:
        pytest.skip("no progressive JPEG samples installed")
    for p in present:
        W, H, out = decode_jpeg(open(p, "rb").read())
        row = spark.read.format("image").load(p).select("image.*").first()
        assert (row.width, row.height) == (W, H)
        ref = (
            np.frombuffer(bytes(row.data), np.uint8)
            .reshape(H, W, row.nChannels)
            .astype(float)
        )
        if row.nChannels == 3:
            ref = ref[..., ::-1]  # BGR -> RGB
        mine = np.frombuffer(out, np.uint8).astype(float).reshape(H, W, -1)
        if mine.shape[-1] != ref.shape[-1]:  # gray-vs-color container mix
            mine, ref = mine.mean(-1), ref.mean(-1)
        diff = np.abs(mine - ref)
        psnr = 10 * np.log10(255**2 / max((diff**2).mean(), 1e-9))
        assert psnr > 50 and diff.max() <= 4, p


def test_jpeg_refusals():
    """Arithmetic-coded, truncated, and non-JPEG bytes all refuse
    loudly instead of mis-decoding."""
    import struct

    from lagoon_spark.operators.jpeg import decode_jpeg, encode_jpeg

    # splice an arithmetic-coded SOF (SOF9) over a valid stream's SOF0
    blob = bytearray(encode_jpeg(8, 8, bytes(64), quality=75))
    blob[blob.index(b"\xff\xc0") + 1] = 0xC9
    with pytest.raises(NotImplementedError, match="SOF9"):
        decode_jpeg(bytes(blob))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"not a jpeg at all")
    with pytest.raises((ValueError, struct.error, IndexError)):
        decode_jpeg(encode_jpeg(8, 8, bytes(64), quality=75)[:40])


def test_jpeg_codec_seam(spark):
    """image/jpeg routes through the seam: PIL when installed, the
    stdlib decoder otherwise — decode_images works on real JPEG bytes
    either way."""
    from lagoon_spark.operators.jpeg import encode_jpeg

    blob = encode_jpeg(16, 8, bytes(range(128)), quality=75)
    df = spark.createDataFrame([(7, blob)], "id long, content binary")
    out = mm.decode_images(df, "id", "content", media_type="image/jpeg").collect()[0]
    assert (out["width"], out["height"]) == (16, 8)
    assert out["payload_bytes"] == 128


def test_avi_mjpeg_roundtrip_and_sampling(spark):
    """AVI/MJPEG: container round-trip is lossless on solid-block
    frames, the sampler takes every k-th frame, and malformed
    containers refuse loudly."""
    import pytest as _pytest

    from lagoon_spark.operators.jpeg import encode_jpeg
    from lagoon_spark.operators.multimodal import (
        _decode_avi_mjpeg,
        encode_avi_mjpeg,
    )

    def frame(val, nb=2):
        px = bytearray()
        for _row in range(8):
            for b in range(nb):
                px += bytes([(val + b * 17) % 256]) * 8
        return encode_jpeg(8 * nb, 8, bytes(px), quality=75)

    frames = [frame(v) for v in (10, 60, 110, 160, 210)]
    avi = encode_avi_mjpeg(16, 8, frames, fps=5)
    w, h, total, decoded = _decode_avi_mjpeg(avi)
    assert (w, h, total, len(decoded)) == (16, 8, 5, 5)
    for v, px in zip((10, 60, 110, 160, 210), decoded):
        exp = bytes()
        for _row in range(8):
            for b in range(2):
                exp += bytes([(v + b * 17) % 256]) * 8
        assert px == exp  # losslessly recovered through the container

    # skip-decode sampling: unsampled frames are counted, never decoded
    w2, h2, total2, sampled2 = _decode_avi_mjpeg(avi, every=2)
    assert (w2, h2, total2) == (16, 8, 5)
    assert sampled2 == decoded[::2]

    with _pytest.raises(ValueError, match="RIFF/AVI"):
        _decode_avi_mjpeg(b"RIFF\x00\x00\x00\x00WAVE")
    with _pytest.raises(ValueError, match="avih"):
        _decode_avi_mjpeg(b"RIFF\x04\x00\x00\x00AVI ")


def _tiny_png_bytes(w=3, h=2):
    """Minimal valid 8-bit RGB PNG with filter-0 rows."""
    import binascii
    import struct as _struct
    import zlib

    def chunk(ctype, data):
        return (
            _struct.pack(">I", len(data))
            + ctype
            + data
            + _struct.pack(">I", binascii.crc32(ctype + data) & 0xFFFFFFFF)
        )

    pix = bytes((x * 7 + y * 31 + c * 13) % 256
                for y in range(h) for x in range(w) for c in range(3))
    raw = b"".join(
        b"\x00" + pix[y * w * 3:(y + 1) * w * 3] for y in range(h)
    )
    ihdr = _struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    ), pix


def test_codec_seam_prefers_native_and_dispatches(spark, monkeypatch):
    """Seam conformance (round-8 verdict #7, no native codec in this
    container): (a) when a 'native' image library is importable the
    seam dispatches to it in preference to the stdlib decoders; (b) a
    codec injected through the seam is what the Arrow-batched
    decode_images plumbing actually executes; (c) its output is
    schema- and parity-identical to the stdlib path on the same
    bytes."""
    import sys
    import types

    png, pix = _tiny_png_bytes()

    # (a) dispatch preference: a fake PIL module makes _load_codec
    # return the native-codec branch for every image/* type
    class _FakeImg:
        width, height = 3, 2

        def load(self):
            pass

        def tobytes(self):
            return pix

    fake_image_mod = types.SimpleNamespace(open=lambda fh: _FakeImg())
    fake_pil = types.ModuleType("PIL")
    fake_pil.Image = fake_image_mod
    monkeypatch.setitem(sys.modules, "PIL", fake_pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", fake_image_mod)
    assert mm._load_codec("image/png") is mm._decode_pil
    assert mm._load_codec("image/jpeg") is mm._decode_pil
    # ...and the native branch produces the stdlib decoder's exact
    # (w, h, payload) contract on the same bytes (parity)
    assert mm._decode_pil(png) == mm._decode_png(png)
    # drop the fake module BEFORE any Spark work: executor workers are
    # separate processes that cannot import the driver's fake PIL
    monkeypatch.undo()

    # (b)+(c): inject a marker codec through the seam and prove the
    # executor-side plumbing ran IT (not a fallback): same schema,
    # same metadata as the stdlib run, dispatched via _load_codec
    stdlib_rows = None
    df = spark.createDataFrame([(1, bytearray(png))], "id long, content binary")
    stdlib_rows = {
        r["id"]: (r["width"], r["height"], r["payload_bytes"], r["payload_digest"])
        for r in mm.decode_images(
            df, "id", "content", "image/png", tier="stdlib"
        ).collect()
    }

    def marker_codec(blob):
        w, h, payload = mm._decode_png(blob)
        return w + 1000, h, payload  # distinguishable width

    monkeypatch.setattr(mm, "_load_codec", lambda mt: marker_codec)
    native_rows = {
        r["id"]: (r["width"], r["height"], r["payload_bytes"], r["payload_digest"])
        for r in mm.decode_images(
            df, "id", "content", "image/png", tier="stdlib"
        ).collect()
    }
    assert native_rows[1][0] == stdlib_rows[1][0] + 1000  # seam dispatched
    assert native_rows[1][1:] == stdlib_rows[1][1:]  # parity elsewhere
    monkeypatch.undo()

    # (d) round-10: the DEFAULT tier (auto -> Java ImageIO) is
    # digest-identical to the stdlib tier on lossless PNG bytes
    auto_rows = {
        r["id"]: (r["width"], r["height"], r["payload_bytes"], r["payload_digest"])
        for r in mm.decode_images(df, "id", "content", "image/png").collect()
    }
    assert auto_rows == stdlib_rows
