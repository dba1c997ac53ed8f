"""Multimodal pipeline queries: binary asset columns over the documents
table.

The synthetic tables carry no binary columns, so each query first
materializes one deterministically from ``documents.text`` (utf-8
encode, optionally wrapped in a magic-byte container) — both engines
build byte-identical blobs, so metadata/decode results hash-match.

The Spark side exercises the real multimodal plumbing
(BinaryType columns, JVM magic-byte sniffing, Arrow-batched
``mapInPandas`` decode/featurize); the DuckDB oracle computes the same
functions from the text/arithmetic definition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lagoon_spark.operators import multimodal as mm
from lagoon_spark.queries import df_query
from lagoon_spark.session import register_views


# ---------------------------------------------------------------------------
# m01 — asset metadata: byte length, digest, magic-byte media sniffing
# ---------------------------------------------------------------------------

# deterministic per-row container: jpeg / png / bare text by doc_id % 3
_M01_ORACLE = """
WITH assets AS (
  SELECT doc_id,
         CASE doc_id % 3
           WHEN 0 THEN unhex('FFD8FF') || encode(text)
           WHEN 1 THEN unhex('89504E47') || encode(text)
           ELSE encode(text)
         END AS content
  FROM documents
)
SELECT doc_id,
       octet_length(content) AS byte_len,
       CASE doc_id % 3
         WHEN 0 THEN 'image/jpeg'
         WHEN 1 THEN 'image/png'
         ELSE 'application/octet-stream'
       END AS media_type,
       md5(hex(content)) AS digest
FROM assets
"""


@df_query(
    "m01_asset_metadata",
    "Binary asset metadata: byte length, md5-over-hex digest, magic-byte media sniffing.",
    _M01_ORACLE,
)
def m01(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    assets = spark.table("documents").select(
        "doc_id",
        F.concat(
            F.when(F.col("doc_id") % 3 == 0, F.unhex(F.lit("FFD8FF")))
            .when(F.col("doc_id") % 3 == 1, F.unhex(F.lit("89504E47")))
            .otherwise(F.unhex(F.lit(""))),
            F.encode("text", "UTF-8"),
        ).alias("content"),
    )
    out = mm.asset_metadata(assets, "content")
    return out.select("doc_id", "byte_len", "media_type", "digest")


# ---------------------------------------------------------------------------
# m02 — Arrow-batched byte-histogram feature extraction (mapInPandas)
# ---------------------------------------------------------------------------

_M02_ORACLE = "SELECT doc_id AS id, " + ", ".join(
    f"CAST(length(text) - length(replace(text, '{chr(b)}', '')) AS BIGINT) AS n_{chr(b)}"
    for b in mm.FEATURE_ALPHABET
) + " FROM documents"


@df_query(
    "m02_byte_features",
    "Byte-histogram feature extraction over binary assets (Arrow-batched mapInPandas).",
    _M02_ORACLE,
)
def m02(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    assets = spark.table("documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("content")
    )
    return mm.byte_histogram_features(assets, "doc_id", "content")


# ---------------------------------------------------------------------------
# m03 — frame sampling over a binary stream (JVM-side explode/substring)
# ---------------------------------------------------------------------------

_M03_ORACLE = """
WITH h AS (
  SELECT doc_id, hex(encode(text)) AS hx FROM documents
),
idx AS (
  SELECT doc_id, hx, unnest(range(0, length(hx) // 32)) AS frame_idx
  FROM h
)
SELECT doc_id, frame_idx, substr(hx, CAST(frame_idx * 32 + 1 AS BIGINT), 32) AS frame_hex
FROM idx WHERE frame_idx % 2 = 0
"""


@df_query(
    "m03_frame_sample",
    "Every-2nd 16-byte frame sampled from binary payloads (keyframe-sampling shape).",
    _M03_ORACLE,
)
def m03(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    assets = spark.table("documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("content")
    )
    return mm.sample_frames(assets, "doc_id", "content", frame_size=16, every_k=2)


# ---------------------------------------------------------------------------
# m04 — FAKEIMG container decode (mapInPandas round-trip)
# ---------------------------------------------------------------------------

_M04_ORACLE = """
SELECT doc_id AS id,
       CAST(doc_id % 64 + 1 AS INTEGER) AS width,
       CAST(doc_id % 48 + 1 AS INTEGER) AS height,
       CAST(length(text) AS BIGINT) AS payload_bytes,
       md5(hex(encode(text))) AS payload_digest
FROM documents
"""


@df_query(
    "m04_image_decode",
    "Binary image container decode via Arrow-batched Python (FAKEIMG codec round-trip).",
    _M04_ORACLE,
)
def m04(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    imgs = spark.table("documents").select(
        "doc_id",
        mm.fake_image_col(
            F.col("doc_id") % 64 + 1,
            F.col("doc_id") % 48 + 1,
            F.encode("text", "UTF-8"),
        ).alias("content"),
    )
    return mm.decode_images(imgs, "doc_id", "content")


# ---------------------------------------------------------------------------
# m05 — perceptual (difference) hash: visual-dedup blocking key
# ---------------------------------------------------------------------------

_HEXD = "0123456789ABCDEF"

# byte j of the payload, from its hex dump (0 past the end)
_M05_BYTE = (
    f"CASE WHEN length(hx) >= 2 * {{j}} + 2 THEN "
    f"(strpos('{_HEXD}', substr(hx, 2 * {{j}} + 1, 1)) - 1) * 16 "
    f"+ strpos('{_HEXD}', substr(hx, 2 * {{j}} + 2, 1)) - 1 ELSE 0 END"
)

_M05_ORACLE = f"""
WITH h AS (
  SELECT doc_id, hex(encode(text)) AS hx FROM documents
)
SELECT doc_id AS id,
       CAST(doc_id % 64 + 1 AS INTEGER) AS width,
       CAST(doc_id % 48 + 1 AS INTEGER) AS height,
       list_reduce(list_prepend(CAST(0 AS BIGINT),
         list_transform(range(0, 63), j ->
           CASE WHEN ({_M05_BYTE.format(j='j')}) > ({_M05_BYTE.format(j='(j + 1)')})
                THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END)),
         (a, x) -> a + x) AS phash
FROM h
"""


@df_query(
    "m05_perceptual_hash",
    "63-bit difference hash per decoded image (Arrow-batched decode seam) — "
    "the visual-dedup blocking key: near-identical images collide, exact "
    "groupBy on the hash clusters them; map-only.",
    _M05_ORACLE,
)
def m05(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    imgs = spark.table("documents").select(
        "doc_id",
        mm.fake_image_col(
            F.col("doc_id") % 64 + 1,
            F.col("doc_id") % 48 + 1,
            F.encode("text", "UTF-8"),
        ).alias("content"),
    )
    return mm.perceptual_hash_images(imgs, "doc_id", "content")


# ---------------------------------------------------------------------------
# m06 — REAL PNG round-trip: stdlib encode → stdlib decode (no PIL)
# ---------------------------------------------------------------------------
#
# Each document becomes a genuine 8-bit greyscale PNG (zlib IDAT,
# per-row filter type y % 5 so all five spec filters are exercised)
# whose pixels are the text's utf-8 bytes truncated/zero-padded to
# w*h. The decode outputs depend only on the PIXELS, never the
# compressed stream, so the DuckDB twin predicts them from the text
# directly — real container bytes, fully oracle-gated, in a container
# with no image library (round-7 verdict ask #5).

_M06_ORACLE = """
SELECT doc_id AS id,
       CAST(doc_id % 16 + 1 AS INTEGER) AS width,
       CAST(doc_id % 12 + 1 AS INTEGER) AS height,
       CAST((doc_id % 16 + 1) * (doc_id % 12 + 1) AS BIGINT) AS payload_bytes,
       md5(rpad(substr(hex(encode(text)),
                       1,
                       CAST(2 * (doc_id % 16 + 1) * (doc_id % 12 + 1) AS BIGINT)),
                CAST(2 * (doc_id % 16 + 1) * (doc_id % 12 + 1) AS INTEGER),
                '0')) AS payload_digest
FROM documents
"""


def _encode_png_grey(width: int, height: int, pixels: bytes) -> bytes:
    """Minimal stdlib PNG encoder (8-bit greyscale, filter y % 5):
    the data-gen half of the m06 round-trip; also a real encoder —
    any PNG reader accepts its output."""
    import binascii
    import struct as _struct
    import zlib

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            _struct.pack(">I", len(data))
            + ctype
            + data
            + _struct.pack(">I", binascii.crc32(ctype + data) & 0xFFFFFFFF)
        )

    def paeth(a: int, b: int, c: int) -> int:
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    raw = bytearray()
    for y in range(height):
        f = y % 5
        raw.append(f)
        for x in range(width):
            cur = pixels[y * width + x]
            a = pixels[y * width + x - 1] if x else 0
            b = pixels[(y - 1) * width + x] if y else 0
            c = pixels[(y - 1) * width + x - 1] if (y and x) else 0
            if f == 0:
                v = cur
            elif f == 1:
                v = (cur - a) & 0xFF
            elif f == 2:
                v = (cur - b) & 0xFF
            elif f == 3:
                v = (cur - ((a + b) >> 1)) & 0xFF
            else:
                v = (cur - paeth(a, b, c)) & 0xFF
            raw.append(v)
    ihdr = _struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# m07 — REAL WAV (RIFF/PCM) round-trip: stdlib encode → stdlib decode
# ---------------------------------------------------------------------------
#
# Mono 16-bit PCM whose sample bytes are the text's utf-8 bytes
# truncated/zero-padded to 2*n_frames — decode outputs depend only on
# the PCM payload, so the DuckDB twin predicts them from the text.

_M07_ORACLE = """
SELECT doc_id AS id,
       CAST(doc_id % 50 + 4 AS INTEGER) AS n_frames,
       CAST(8000 + (doc_id % 8) * 1000 AS INTEGER) AS sample_rate,
       CAST(2 * (doc_id % 50 + 4) AS BIGINT) AS pcm_bytes,
       md5(rpad(substr(hex(encode(text)),
                       1,
                       CAST(4 * (doc_id % 50 + 4) AS BIGINT)),
                CAST(4 * (doc_id % 50 + 4) AS INTEGER),
                '0')) AS pcm_digest
FROM documents
"""


def _encode_wav_pcm16(rate: int, pcm: bytes) -> bytes:
    """Minimal stdlib WAV encoder (mono 16-bit PCM): the data-gen half
    of the m07 round-trip; any audio tool accepts its output.

    PARITY INVARIANT (m07): the caller plants ``text.encode('utf-8')``
    bytes as PCM and the DuckDB twin predicts them with
    ``hex(encode(text))`` — byte-for-byte identical only while the
    text is ASCII (true of the generated corpora; verified in the m10
    lane, which additionally forces ascii-replace so its *sample-value*
    oracle stays exact even on non-ASCII input)."""
    import struct as _struct

    hdr = _struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(pcm), b"WAVE",
        b"fmt ", 16, 1, 1, rate, rate * 2, 2, 16,
        b"data", len(pcm),
    )
    return hdr + pcm


@df_query(
    "m07_wav_decode",
    "Real WAV (RIFF/PCM) round-trip: stdlib encode, pure-stdlib chunk-walk "
    "decode, Arrow-batched — no audio library.",
    _M07_ORACLE,
)
def m07(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    register_views(spark, sf_dir)

    def encode(batches):
        for pdf in batches:
            blobs = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                n = int(doc_id) % 50 + 4  # frames
                rate = 8000 + int(doc_id) % 8 * 1000
                pcm = (text or "").encode("utf-8")[: 2 * n].ljust(2 * n, b"\x00")
                blobs.append(_encode_wav_pcm16(rate, pcm))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "content": blobs})

    wavs = (
        spark.table("documents")
        .select("doc_id", "text")
        .mapInPandas(encode, "doc_id long, content binary")
    )
    return mm.decode_audio(wavs, "doc_id", "content")


# ---------------------------------------------------------------------------
# m08 — REAL animated GIF round-trip: stdlib LZW encode → stdlib decode
# ---------------------------------------------------------------------------
#
# Multi-frame GIFs whose frame pixels (palette indices) are slices of
# the text's utf-8 bytes — the frame-sampling/"video" shape on REAL
# container bytes. The encoder uses the classic uncompressed-GIF
# technique (every pixel its own LZW code, CLEAR emitted before the
# decoder's table would grow), so any GIF reader accepts the output;
# digests depend only on the indices, never the palette or the code
# stream.

_M08_ORACLE = """
SELECT doc_id AS id,
       CAST(doc_id % 4 + 1 AS INTEGER) AS n_frames,
       CAST(doc_id % 8 + 2 AS INTEGER) AS width,
       CAST(doc_id % 6 + 2 AS INTEGER) AS height,
       md5(rpad(substr(hex(encode(text)),
                       1,
                       CAST(2 * (doc_id % 4 + 1) * (doc_id % 8 + 2) * (doc_id % 6 + 2) AS BIGINT)),
                CAST(2 * (doc_id % 4 + 1) * (doc_id % 8 + 2) * (doc_id % 6 + 2) AS INTEGER),
                '0')) AS frames_digest
FROM documents
"""


def _lzw_encode_uncompressed(indices: bytes, min_code_size: int = 8) -> bytes:
    """GIF LZW 'uncompressed' encoding: emit every pixel as a literal
    code and a CLEAR before the decoder's table would force a code-size
    bump — valid output for any decoder, no string table needed."""
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    acc = 0
    nbits = 0
    out = bytearray()

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    # after a CLEAR the decoder adds an entry per code except the
    # first; stay below 2^min - 2 additions so code_size never grows
    budget = clear - 2
    for i, px in enumerate(indices):
        if i and budget == 0:
            emit(clear)
            budget = clear - 2
        emit(px)
        budget -= 1
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _encode_gif(width: int, height: int, frames: "list[bytes]") -> bytes:
    """Minimal stdlib animated-GIF writer (GIF89a, global greyscale
    palette, one image block per frame)."""
    import struct as _struct

    out = bytearray(b"GIF89a")
    out += _struct.pack("<HHBBB", width, height, 0xF7, 0, 0)  # GCT 256
    for i in range(256):
        out += bytes((i, i, i))
    for fr in frames:
        out += b"\x2c" + _struct.pack("<HHHHB", 0, 0, width, height, 0)
        out.append(8)  # LZW min code size
        data = _lzw_encode_uncompressed(fr, 8)
        for off in range(0, len(data), 255):
            chunk = data[off : off + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)  # block terminator
    out.append(0x3B)  # trailer
    return bytes(out)


@df_query(
    "m08_gif_frames",
    "Real animated-GIF round-trip: stdlib LZW encode, pure-stdlib multi-frame "
    "decode, Arrow-batched — frame sampling on real container bytes.",
    _M08_ORACLE,
)
def m08(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    register_views(spark, sf_dir)

    def encode(batches):
        for pdf in batches:
            blobs = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                nf = int(doc_id) % 4 + 1
                w = int(doc_id) % 8 + 2
                h = int(doc_id) % 6 + 2
                raw = (text or "").encode("utf-8")[: nf * w * h].ljust(
                    nf * w * h, b"\x00"
                )
                frames = [raw[k * w * h : (k + 1) * w * h] for k in range(nf)]
                blobs.append(_encode_gif(w, h, frames))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "content": blobs})

    gifs = (
        spark.table("documents")
        .select("doc_id", "text")
        .mapInPandas(encode, "doc_id long, content binary")
    )
    return mm.decode_gif_frames(gifs, "doc_id", "content")


@df_query(
    "m06_png_decode",
    "Real PNG container round-trip: stdlib zlib+filter encode, pure-stdlib "
    "decode (all 5 scanline filters), Arrow-batched — no image library.",
    _M06_ORACLE,
)
def m06(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    register_views(spark, sf_dir)

    def encode(batches):
        for pdf in batches:
            blobs = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                w = int(doc_id) % 16 + 1
                h = int(doc_id) % 12 + 1
                pix = (text or "").encode("utf-8")[: w * h].ljust(w * h, b"\x00")
                blobs.append(_encode_png_grey(w, h, pix))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "content": blobs})

    imgs = (
        spark.table("documents")
        .select("doc_id", "text")
        .mapInPandas(encode, "doc_id long, content binary")
    )
    return mm.decode_images(imgs, "doc_id", "content", media_type="image/png")


# ---------------------------------------------------------------------------
# m09 — REAL baseline JPEG round-trip: stdlib(+numpy) encode → decode
# ---------------------------------------------------------------------------
#
# Each document becomes a grayscale JPEG of nb solid 8x8 blocks (block
# b's value is (doc_id*31 + b*17) % 256), encoded at quality 75 with a
# restart interval so the decoder's DRI/RSTn path runs in the hot
# query. At quality 75 the luminance DC quantizer is exactly 8 and a
# solid block's only nonzero coefficient is DC = 8*(v-128), so the
# round-trip is LOSSLESS by construction — real Huffman/DCT work on
# the wire, yet the DuckDB twin predicts the decoded pixel stream (and
# its md5-of-upper-hex digest, decode_images' digest convention) in
# closed form. Arrow-batched both directions: one map stage, no
# shuffle.

_M09_ORACLE = """
SELECT doc_id AS id,
       CAST(8 * (doc_id % 6 + 1) AS INTEGER) AS width,
       CAST(8 AS INTEGER) AS height,
       CAST(64 * (doc_id % 6 + 1) AS BIGINT) AS payload_bytes,
       md5(repeat(
         array_to_string(
           list_transform(range(0, doc_id % 6 + 1),
             b -> repeat(lpad(upper(hex((doc_id * 31 + b * 17) % 256)), 2, '0'), 8)),
           ''),
         8)) AS payload_digest
FROM documents
"""


@df_query(
    "m09_jpeg_decode",
    "Real baseline JPEG round-trip: stdlib(+numpy) DCT/Huffman encode with "
    "restart markers, pure-stdlib decode — lossless-by-construction solid "
    "blocks make the lossy codec oracle-checkable end to end.",
    _M09_ORACLE,
)
def m09(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    register_views(spark, sf_dir)

    def encode(batches):
        from lagoon_spark.operators.jpeg import encode_jpeg

        # the synthetic pixels depend on doc_id only through mod 256
        # (pixel bytes) and mod 6 (width) → mod 768 keys the whole
        # blob. Memoizing the pure-Python ENCODE (test-data synthesis,
        # not the operator under test) leaves the measured decode
        # per-row and the bytes identical.
        cache: dict = {}
        for pdf in batches:
            blobs = []
            for doc_id in pdf["doc_id"]:
                key = int(doc_id) % 768
                blob = cache.get(key)
                if blob is None:
                    nb = int(doc_id) % 6 + 1
                    px = bytearray()
                    for _row in range(8):
                        for b in range(nb):
                            px += bytes(
                                [(int(doc_id) * 31 + b * 17) % 256]
                            ) * 8
                    blob = encode_jpeg(8 * nb, 8, bytes(px), quality=75,
                                       restart_interval=2)
                    cache[key] = blob
                blobs.append(blob)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "content": blobs})

    imgs = (
        spark.table("documents")
        .select("doc_id")
        .mapInPandas(encode, "doc_id long, content binary")
    )
    return mm.decode_images(imgs, "doc_id", "content", media_type="image/jpeg")


# ---------------------------------------------------------------------------
# m10 — audio frame features over REAL decoded WAV samples
# ---------------------------------------------------------------------------
#
# Beyond m07's container metadata: decode the planted PCM back to the
# SAMPLE VALUES and compute per-8-sample-frame RMS / peak / mean-|x|
# with exact integer energy sums — the oracle predicts every feature
# from the text characters. The planting encoder uses
# ``text.encode('ascii', 'replace')`` (one '?' byte per non-ASCII
# character), so byte k == character k always, and the oracle clamps
# codepoints > 127 to 63 ('?') to match — parity holds even if the
# corpus ever grows non-ASCII text. Sample k = b_2k + 256*b_2k+1,
# zero-padded. This checks the decoded WAVEFORM itself, not digests.

_M10_FRAME = 8

# ascii codepoint of character j (1-based), with the encoder's
# 'replace' rule applied: non-ASCII → '?' (63); past-the-end → 0
_M10_BYTE = (
    "(CASE WHEN {j} > length(text) THEN 0 "
    "WHEN ascii(substr(text, CAST({j} AS INT), 1)) > 127 THEN 63 "
    "WHEN ascii(substr(text, CAST({j} AS INT), 1)) < 0 THEN 63 "
    "ELSE ascii(substr(text, CAST({j} AS INT), 1)) END)"
)

_M10_ORACLE = f"""
WITH p AS (
  SELECT doc_id, doc_id % 50 + 4 AS n, text FROM documents
),
s AS (
  SELECT doc_id,
         list_transform(range(0, n), k ->
           {_M10_BYTE.format(j='2*k+1')}
           + 256 * {_M10_BYTE.format(j='2*k+2')}
         ) AS samples
  FROM p
),
w AS (
  SELECT doc_id, f.i AS frame_no,
         samples[f.i*{_M10_FRAME}+1 :
                 least((f.i+1)*{_M10_FRAME}, len(samples))] AS win
  FROM s, UNNEST(range(0, CAST(ceil(len(samples) / {float(_M10_FRAME)})
                               AS BIGINT))) AS f(i)
)
SELECT doc_id AS id, CAST(frame_no AS INT) AS frame_no,
       CAST(len(win) AS INT) AS n_samples,
       round(sqrt(list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(win, x -> CAST(x AS BIGINT) * x)),
             (a, b) -> a + b) / len(win)), 6) AS rms,
       CAST(list_aggregate(list_transform(win, x -> abs(x)), 'max')
            AS INT) AS peak,
       round(list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(win, x -> CAST(abs(x) AS BIGINT))),
             (a, b) -> a + b) / len(win), 6) AS mean_abs
FROM w
"""


@df_query(
    "m10_audio_frame_features",
    "Per-frame RMS/peak/mean-amplitude over REAL decoded WAV samples: "
    "stdlib PCM decode to sample arrays (Arrow seam), then pure-JVM "
    "exact-integer frame energy math — the waveform itself is "
    "oracle-checked, not a digest.",
    _M10_ORACLE,
)
def m10(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    register_views(spark, sf_dir)

    def encode(batches):
        for pdf in batches:
            blobs = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                n = int(doc_id) % 50 + 4
                rate = 8000 + int(doc_id) % 8 * 1000
                # ascii-replace (not utf-8): keeps byte k == char k so
                # the oracle's per-character clamp predicts every byte
                pcm = (text or "").encode("ascii", "replace")[: 2 * n]
                pcm = pcm.ljust(2 * n, b"\x00")
                blobs.append(_encode_wav_pcm16(rate, pcm))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "content": blobs})

    wavs = (
        spark.table("documents")
        .select("doc_id", "text")
        .mapInPandas(encode, "doc_id long, content binary")
    )
    samples = mm.decode_audio_samples(wavs, "doc_id", "content")
    return mm.audio_frame_features(samples, frame=_M10_FRAME)


# ---------------------------------------------------------------------------
# m11 — REAL video (AVI/MJPEG) frame sampling
# ---------------------------------------------------------------------------
#
# The video plane on real container bytes with zero codec libraries:
# each document becomes an AVI whose MJPEG frames are m09's lossless
# solid-block JPEGs (frame f, block b pixel = (doc_id*31+b*17+f*7)%256),
# decode walks the RIFF tree and runs the stdlib JPEG codec per '00dc'
# chunk, and the operator samples every 2nd frame — so the DuckDB twin
# predicts the sampled pixel stream in closed form. Arrow-batched pure
# map both directions.

_M11_ORACLE = """
SELECT doc_id AS id,
       CAST(doc_id % 4 + 2 AS INTEGER) AS n_frames,
       CAST(ceil((doc_id % 4 + 2) / 2.0) AS INTEGER) AS n_sampled,
       CAST(8 * (doc_id % 3 + 1) AS INTEGER) AS width,
       CAST(8 AS INTEGER) AS height,
       md5(array_to_string(
         list_transform(
           list_filter(range(0, doc_id % 4 + 2), f -> f % 2 = 0),
           f -> repeat(
                  array_to_string(
                    list_transform(range(0, doc_id % 3 + 1),
                      b -> repeat(lpad(upper(hex(
                             (doc_id * 31 + b * 17 + f * 7) % 256)),
                           2, '0'), 8)),
                    ''),
                  8)),
         '')) AS frames_digest
FROM documents
"""


@df_query(
    "m11_video_frames",
    "Real video frame sampling: AVI/MJPEG containers built from lossless "
    "solid-block JPEGs, RIFF walk + stdlib JPEG decode per frame, every "
    "2nd frame sampled — the multimodal video stage on real bytes, "
    "closed-form oracle.",
    _M11_ORACLE,
)
def m11(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    register_views(spark, sf_dir)

    def encode(batches):
        from lagoon_spark.operators.jpeg import encode_jpeg

        # blob = f(doc_id mod 256 [pixel bytes], mod 3 [width],
        # mod 4 [frames]) → mod 768 keys it. Memoized synthesis (the
        # measured RIFF walk + per-frame decode stays per-row).
        cache: dict = {}
        for pdf in batches:
            blobs = []
            for doc_id in pdf["doc_id"]:
                key = int(doc_id) % 768
                blob = cache.get(key)
                if blob is None:
                    nb = int(doc_id) % 3 + 1
                    nf = int(doc_id) % 4 + 2
                    frames = []
                    for f in range(nf):
                        px = bytearray()
                        for _row in range(8):
                            for b in range(nb):
                                px += bytes(
                                    [
                                        (int(doc_id) * 31 + b * 17 + f * 7)
                                        % 256
                                    ]
                                ) * 8
                        frames.append(
                            encode_jpeg(8 * nb, 8, bytes(px), quality=75,
                                        restart_interval=2)
                        )
                    blob = mm.encode_avi_mjpeg(8 * nb, 8, frames)
                    cache[key] = blob
                blobs.append(blob)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "content": blobs})

    vids = (
        spark.table("documents")
        .select("doc_id")
        .mapInPandas(encode, "doc_id long, content binary")
    )
    return mm.decode_video_frames(vids, "doc_id", "content", every=2)


# ---------------------------------------------------------------------------
# m12 — visual near-dup pairs: phash + banded hamming LSH
# ---------------------------------------------------------------------------
#
# The image twin of MinHash banding (d06): m05's difference hash per
# image, 4 bands of 16 bits as equi-join buckets over DISTINCT hashes,
# bit_count hamming verify — candidate set fully deterministic, so the
# DuckDB twin reproduces it bit-for-bit (DISTINCT pair dedup there ==
# first-band dedup here: same set, one row per unordered pair).

_M12_ORACLE = f"""
WITH h AS (
  SELECT doc_id, hex(encode(text)) AS hx FROM documents
),
p AS (
  SELECT doc_id,
         list_reduce(list_prepend(CAST(0 AS BIGINT),
           list_transform(range(0, 63), j ->
             CASE WHEN ({_M05_BYTE.format(j='j')}) > ({_M05_BYTE.format(j='(j + 1)')})
                  THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END)),
           (a, x) -> a + x) AS phash
  FROM h
),
g AS (SELECT DISTINCT phash FROM p),
bd AS (
  SELECT phash, b, (phash >> (16 * b)) & 65535 AS key
  FROM g, range(0, 4) t(b)
),
hp AS (
  SELECT DISTINCT a.phash AS ha, c.phash AS hb
  FROM bd a JOIN bd c ON a.b = c.b AND a.key = c.key AND a.phash < c.phash
),
hv AS (
  SELECT ha, hb, CAST(bit_count(xor(ha::BIT, hb::BIT)) AS INTEGER) AS hamming
  FROM hp
  WHERE bit_count(xor(ha::BIT, hb::BIT)) <= 8
)
SELECT x.doc_id AS id_a, y.doc_id AS id_b, CAST(0 AS INTEGER) AS hamming
FROM p x JOIN p y ON x.phash = y.phash AND x.doc_id < y.doc_id
UNION ALL
SELECT least(x.doc_id, y.doc_id) AS id_a,
       greatest(x.doc_id, y.doc_id) AS id_b,
       hv.hamming
FROM hv JOIN p x ON x.phash = hv.ha JOIN p y ON y.phash = hv.hb
"""


@df_query(
    "m12_phash_neardup",
    "Visual near-duplicate pairs: difference hash per image, banded hamming "
    "LSH (4x16-bit bands over distinct hashes), bit_count verify <= 8 — the "
    "image twin of MinHash banding; never all-pairs.",
    _M12_ORACLE,
)
def m12(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lagoon_spark.operators.dedup import phash_neardup_pairs

    register_views(spark, sf_dir)
    imgs = spark.table("documents").select(
        "doc_id",
        mm.fake_image_col(
            F.col("doc_id") % 64 + 1,
            F.col("doc_id") % 48 + 1,
            F.encode("text", "UTF-8"),
        ).alias("content"),
    )
    hashed = mm.perceptual_hash_images(imgs, "doc_id", "content")
    return phash_neardup_pairs(
        hashed, "id", "phash", bands=4, band_bits=16, max_hamming=8
    )


# ---------------------------------------------------------------------------
# m13 — REAL pixel resize: box downsample over decoded buffers
# ---------------------------------------------------------------------------
#
# Each document becomes a grayscale pixel buffer of nb (= doc_id%6+1)
# 8x8 blocks; within block b the pixels checker between
# base = (doc_id*31 + b*17) % 224 and base+16 on (x+y) parity. A
# factor-4 box then holds exactly 8 of each value, so the integer box
# mean is base+8 EXACTLY (sum = 16*base+128, //16) — the checker makes
# any "pick a corner pixel" shortcut fail while keeping the oracle in
# closed form. Output layout is row-major: 2 rows of (2 pixels per
# block), hence repeat(per-block-hex, 2) twice. Resize runs native
# (Java UDF, zero Python) when the JDK is present, numpy otherwise —
# identical bytes either way (integer floor-division rule).

_M13_ORACLE = """
SELECT doc_id AS id,
       CAST(2 * (doc_id % 6 + 1) AS INTEGER) AS width,
       CAST(2 AS INTEGER) AS height,
       CAST(4 * (doc_id % 6 + 1) AS BIGINT) AS payload_bytes,
       md5(repeat(
         array_to_string(
           list_transform(range(0, doc_id % 6 + 1),
             b -> repeat(lpad(upper(hex((doc_id * 31 + b * 17) % 224 + 8)), 2, '0'), 2)),
           ''),
         2)) AS payload_digest
FROM documents
"""


@df_query(
    "m13_pixel_resize",
    "Real box-downsample resize over decoded pixel buffers (factor 4, "
    "integer box mean): native Java UDF when a JDK is present, vectorized "
    "numpy otherwise — byte-identical tiers, closed-form oracle.",
    _M13_ORACLE,
)
def m13(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    register_views(spark, sf_dir)

    def synth(batches):
        # synthetic-pixel generation (test data, not the operator under
        # test): base pattern depends on doc_id via %224 (pixel values)
        # and %6 (width) → %672 keys the whole buffer; memoize like m09
        cache: dict = {}
        for pdf in batches:
            ws, hs, bufs = [], [], []
            for doc_id in pdf["doc_id"]:
                key = int(doc_id) % 672
                buf = cache.get(key)
                if buf is None:
                    nb = key % 6 + 1
                    w = 8 * nb
                    x = np.arange(w)
                    base = (key * 31 + (x // 8) * 17) % 224
                    y = np.arange(8)[:, None]
                    buf = (base[None, :] + 16 * ((x[None, :] + y) % 2)).astype(
                        np.uint8
                    ).tobytes()
                    cache[key] = buf
                ws.append(8 * (key % 6 + 1))
                hs.append(8)
                bufs.append(buf)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "width": ws, "height": hs, "data": bufs}
            )

    imgs = (
        spark.table("documents")
        .select("doc_id")
        .mapInPandas(synth, "doc_id long, width int, height int, data binary")
    )
    return mm.resize_pixels(imgs, "doc_id", "width", "height", "data", factor=4)
