"""Multimodal column plumbing: opaque binary assets + typed metadata.

The reference has no multimodal support (it is a CSV/JSON→Postgres
engine); this module is part of the training-data-pipeline extension
plane. The design treats image/audio/video payloads as opaque
``binary`` columns with typed metadata alongside, exactly as a 100 TB
lakehouse would store them (parquet BYTE_ARRAY pages, metadata columns
prunable without touching the blobs).

Scale story:

* Metadata extraction (byte length, digest, magic-byte sniffing) is
  pure built-in-function work — JVM-side, whole-stage-codegen, no
  Python in the loop. A scan computing only these never deserializes
  the blob into Python.
* Decode / feature-extraction run as **Arrow-batched** ``mapInPandas``
  transformations: one Python worker per input split, blobs streamed
  in Arrow record batches, no driver collect, no shuffle. Output
  schemas are fixed up-front so Catalyst can prune/push around them.
* Real codec work (PIL/librosa/av) is unavailable in this container;
  the codec seams are isolated behind ``_load_codec`` which raises
  ``NotImplementedError`` with a clear message, and every pipeline is
  exercised end-to-end with the deterministic FAKEIMG codec below, so
  the Spark plumbing (schema, batching, partitioning) is real and
  tested even though the pixel math is stubbed.

FAKEIMG container format (deterministic stand-in for a real codec):
``b"FAKEIMG\\0" + width:u32be + height:u32be + payload bytes``.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FAKE_MAGIC = b"FAKEIMG\x00"
_HEADER_LEN = len(FAKE_MAGIC) + 8

# magic-byte prefixes → media type (hex, uppercase — matches F.hex)
MAGIC_PREFIXES: tuple[tuple[str, str], ...] = (
    ("FFD8FF", "image/jpeg"),
    ("89504E47", "image/png"),
    ("47494638", "image/gif"),
    ("52494646", "audio/wav"),  # RIFF (WAV/AVI family)
    ("1A45DFA3", "video/webm"),
    (FAKE_MAGIC.hex().upper(), "image/fakeimg"),
)
DEFAULT_MEDIA_TYPE = "application/octet-stream"


# ---------------------------------------------------------------------------
# JVM-side metadata (no Python in the loop)
# ---------------------------------------------------------------------------

def byte_length(col: str | Column) -> Column:
    """Payload size in bytes (``length`` on BinaryType counts bytes)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c).cast("long")


def content_hex_digest(col: str | Column) -> Column:
    """md5 over the uppercase hex rendering of the bytes.

    Going through hex makes the digest reproducible in engines whose
    md5 only accepts strings (e.g. DuckDB) — same bytes → same hex →
    same digest everywhere.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.hex(c))


def sniff_media_type(col: str | Column) -> Column:
    """Magic-byte container sniffing, fully JVM-side.

    A when-chain over hex prefixes of the first 8 bytes; constant-folded
    by Catalyst into one codegen'd expression. Unknown → octet-stream.
    """
    c = F.col(col) if isinstance(col, str) else col
    head = F.hex(F.substring(c, 1, 8))
    expr: Column | None = None
    for prefix, mt in MAGIC_PREFIXES:
        cond = head.startswith(prefix)
        expr = F.when(cond, mt) if expr is None else expr.when(cond, mt)
    assert expr is not None
    return expr.otherwise(DEFAULT_MEDIA_TYPE)


def asset_metadata(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Attach typed metadata columns next to an opaque binary column.

    The added columns are scalar, so downstream filters on them prune
    parquet row groups without reading the blob pages at all.
    """
    return (
        df.withColumn("byte_len", byte_length(content_col))
        .withColumn("media_type", sniff_media_type(content_col))
        .withColumn("digest", content_hex_digest(content_col))
    )


def sample_frames(
    df: DataFrame,
    id_col: str,
    content_col: str,
    frame_size: int = 16,
    every_k: int = 2,
) -> DataFrame:
    """Frame sampling over a binary stream, JVM-side.

    Treats the payload as ``frame_size``-byte frames and keeps every
    ``every_k``-th one (a video keyframe-sampling stand-in). Built from
    ``sequence`` + ``posexplode`` + ``substring`` — distributed, no
    Python, output rows stay on the executor that held the blob (no
    shuffle; explode is a map-side operator).
    """
    c = F.col(content_col)
    n_frames = (F.length(c) / F.lit(frame_size)).cast("int")
    idx = F.explode(F.sequence(F.lit(0), n_frames - 1))
    frames = df.select(
        F.col(id_col), c.alias("__content"), idx.alias("frame_idx")
    ).filter((F.col("frame_idx") % every_k) == 0)
    return frames.select(
        id_col,
        "frame_idx",
        F.hex(
            F.expr(f"substring(__content, frame_idx * {frame_size} + 1, {frame_size})")
        ).alias("frame_hex"),
    )


# ---------------------------------------------------------------------------
# FAKEIMG codec (deterministic stand-in; real codecs stubbed)
# ---------------------------------------------------------------------------

def encode_fake_image(width: int, height: int, payload: bytes) -> bytes:
    """Build a FAKEIMG container (test/data-gen helper, driver-side)."""
    return FAKE_MAGIC + struct.pack(">II", width, height) + payload


def fake_image_col(width: Column, height: Column, payload: Column) -> Column:
    """Build FAKEIMG containers JVM-side from (width, height, payload).

    Uses hex assembly (``unhex`` of concatenated hex parts) so the whole
    construction is codegen'd — this is how the tests and the oracle
    queries materialize binary assets from the synthetic tables.
    """
    def u32be(c: Column) -> Column:
        return F.lpad(F.hex(c.cast("bigint")), 8, "0")

    return F.unhex(
        F.concat(
            F.lit(FAKE_MAGIC.hex().upper()),
            u32be(width),
            u32be(height),
            F.hex(payload),
        )
    )


def _load_codec(media_type: str):
    """Seam for real decoders. librosa/av are not in this container;
    image formats route through PIL when it is installed (the
    codec-present lane in tests/test_multimodal.py exercises this on a
    real PNG and skips where PIL is absent). PNG, baseline JPEG and
    GIF additionally have pure-stdlib(+numpy) fallbacks
    (:func:`_decode_png`, :func:`lagoon_spark.operators.jpeg.decode_jpeg`,
    :func:`_decode_gif`), so real image bytes decode in THIS container
    with no third-party codec."""
    if media_type == "image/fakeimg":
        return _decode_fake_image
    if media_type.startswith("image/"):
        try:
            import PIL.Image  # noqa: F401

            return _decode_pil
        except ImportError:
            if media_type == "image/png":
                return _decode_png
            if media_type in ("image/jpeg", "image/jpg"):
                from lagoon_spark.operators.jpeg import decode_jpeg

                return decode_jpeg
            if media_type == "image/gif":
                # first frame as palette indices — the same bytes
                # PIL's mode-P tobytes() yields
                return lambda blob: (lambda w, h, fr: (w, h, fr[0]))(
                    *_decode_gif(blob)
                )
    if media_type == "audio/wav":
        # PCM WAV needs no codec library at all
        return _decode_wav
    raise NotImplementedError(
        f"no codec for {media_type!r} in this environment "
        "(install Pillow/librosa/av and extend _load_codec)"
    )


def _decode_pil(blob: bytes) -> tuple[int, int, bytes]:
    """Real image decode via Pillow — runs inside the Arrow batch on
    the executor; returns the same (width, height, raw_payload) shape
    as the FAKEIMG codec so decode_images is codec-agnostic."""
    import io

    import PIL.Image

    img = PIL.Image.open(io.BytesIO(blob))
    img.load()
    return img.width, img.height, img.tobytes()


def _lzw_decode(data: bytes, min_code_size: int) -> bytes:
    """GIF-flavor LZW decompression (LSB-first bit packing, CLEAR/END
    codes, 12-bit cap) — pure stdlib, the only nontrivial piece of the
    GIF spec."""
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    table: dict[int, bytes] = {i: bytes([i]) for i in range(clear)}
    next_code = end + 1
    out = bytearray()
    prev: bytes | None = None
    bitpos, total_bits = 0, len(data) * 8
    while bitpos + code_size <= total_bits:
        byte_i = bitpos // 8
        chunk = int.from_bytes(data[byte_i : byte_i + 3], "little")
        code = (chunk >> (bitpos % 8)) & ((1 << code_size) - 1)
        bitpos += code_size
        if code == clear:
            table = {i: bytes([i]) for i in range(clear)}
            next_code = end + 1
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table[code]
        else:
            if code in table:
                entry = table[code]
            elif code == next_code:
                entry = prev + prev[:1]
            else:
                raise ValueError(f"bad LZW code {code}")
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
        out += entry
        prev = entry
    return bytes(out)


def _decode_gif(blob: bytes) -> tuple[int, int, list[bytes]]:
    """Pure-stdlib GIF decode (GIF87a/89a spec): returns
    ``(width, height, [frame indices...])`` — one palette-index
    bytestring per frame, the multi-frame 'video' twin of
    :func:`_decode_png`. Extensions are skipped; interlaced frames
    raise ``NotImplementedError`` (PIL territory); color tables are
    parsed but frames return INDICES, so pixel identity is
    palette-independent."""
    if blob[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    width, height = struct.unpack("<HH", blob[6:10])
    packed = blob[10]
    pos = 13
    if packed & 0x80:  # global color table
        pos += 3 * (2 << (packed & 0x07))
    frames: list[bytes] = []
    while pos < len(blob):
        b = blob[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < len(blob) and blob[pos]:
                pos += 1 + blob[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            fw, fh = struct.unpack("<HH", blob[pos + 5 : pos + 9])
            fpacked = blob[pos + 9]
            pos += 10
            if fpacked & 0x80:  # local color table
                pos += 3 * (2 << (fpacked & 0x07))
            if fpacked & 0x40:
                raise NotImplementedError("interlaced GIF frame")
            min_code = blob[pos]
            pos += 1
            data = bytearray()
            while pos < len(blob) and blob[pos]:
                n = blob[pos]
                data += blob[pos + 1 : pos + 1 + n]
                pos += 1 + n
            pos += 1
            indices = _lzw_decode(bytes(data), min_code)
            if len(indices) < fw * fh:
                raise ValueError("truncated GIF frame")
            frames.append(indices[: fw * fh])
        else:
            raise ValueError(f"bad GIF block 0x{b:02x}")
    if not frames:
        raise ValueError("GIF with no image data")
    return width, height, frames


def _decode_wav(blob: bytes) -> tuple[int, int, bytes]:
    """Pure-stdlib WAV (RIFF/PCM) decode — the audio twin of
    :func:`_decode_png`: RIFF chunk walk + PCM extraction, no codec
    library. Returns ``(n_frames, sample_rate, pcm_bytes)`` shaped
    like the image codecs' (width, height, payload) triple so the
    decode plumbing is media-agnostic. Supports PCM (format 1) at any
    bit depth / channel count; compressed formats (ADPCM, float,
    mp3-in-RIFF) raise ``NotImplementedError`` — route those through a
    real audio library."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    pos = 12
    rate = channels = bits = fmt = None
    pcm = None
    while pos + 8 <= len(blob):
        ctype = blob[pos : pos + 4]
        (length,) = struct.unpack("<I", blob[pos + 4 : pos + 8])
        data = blob[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)  # chunks are word-aligned
        if ctype == b"fmt ":
            fmt, channels, rate = struct.unpack("<HHI", data[:8])
            (bits,) = struct.unpack("<H", data[14:16])
        elif ctype == b"data":
            pcm = data
    if fmt is None or pcm is None:
        raise ValueError("WAV missing fmt/data chunk")
    if fmt != 1:
        raise NotImplementedError(f"WAV format {fmt} (only PCM=1)")
    bytes_per_frame = channels * (bits // 8)
    if bytes_per_frame == 0 or len(pcm) % bytes_per_frame:
        raise ValueError("truncated WAV PCM data")
    return len(pcm) // bytes_per_frame, rate, pcm


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _decode_png(blob: bytes) -> tuple[int, int, bytes]:
    """Pure-stdlib PNG decode — the W3C PNG spec's two moving parts
    are zlib inflate (stdlib) and per-scanline filter reconstruction
    (this function), so no third-party codec is required. Returns the
    same ``(width, height, raw_pixel_bytes)`` shape as
    :func:`_decode_pil` (for 8-bit images PIL's ``tobytes()`` is the
    identical reconstructed scanline stream, parity-tested where PIL
    exists).

    Supports the dominant web shape: 8-bit depth, color types 0/2/3/4/6
    (grey, RGB, palette-indexed, grey+alpha, RGBA), filters 0–4,
    non-interlaced. 16-bit and Adam7 raise ``NotImplementedError`` —
    route those through PIL.

    Pure-Python per-byte loops: this is the correctness fallback, not
    the throughput path — at scale install a real codec and the seam
    prefers it automatically.
    """
    import zlib

    if blob[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG")
    pos = 8
    width = height = bit_depth = color_type = interlace = None
    idat = bytearray()
    while pos + 8 <= len(blob):
        (length,) = struct.unpack(">I", blob[pos : pos + 4])
        ctype = blob[pos + 4 : pos + 8]
        data = blob[pos + 8 : pos + 8 + length]
        pos += 12 + length  # 4 len + 4 type + data + 4 crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _c, _f, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8:
        raise NotImplementedError(f"PNG bit depth {bit_depth} (only 8)")
    if interlace:
        raise NotImplementedError("Adam7-interlaced PNG")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
    if channels is None:
        raise ValueError(f"bad PNG color type {color_type}")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise ValueError("truncated PNG pixel data")
    out = bytearray(stride * height)
    for y in range(height):
        f = raw[y * (stride + 1)]
        line = raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)]
        o = y * stride
        if f == 0:  # None
            out[o : o + stride] = line
        elif f == 1:  # Sub
            for x in range(stride):
                a = out[o + x - channels] if x >= channels else 0
                out[o + x] = (line[x] + a) & 0xFF
        elif f == 2:  # Up
            for x in range(stride):
                b = out[o - stride + x] if y else 0
                out[o + x] = (line[x] + b) & 0xFF
        elif f == 3:  # Average
            for x in range(stride):
                a = out[o + x - channels] if x >= channels else 0
                b = out[o - stride + x] if y else 0
                out[o + x] = (line[x] + ((a + b) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                a = out[o + x - channels] if x >= channels else 0
                b = out[o - stride + x] if y else 0
                c = (
                    out[o - stride + x - channels]
                    if (y and x >= channels)
                    else 0
                )
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                out[o + x] = (line[x] + pr) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {f}")
    return width, height, bytes(out)


def _decode_fake_image(blob: bytes) -> tuple[int, int, bytes]:
    if blob[: len(FAKE_MAGIC)] != FAKE_MAGIC:
        raise ValueError("not a FAKEIMG container")
    width, height = struct.unpack(">II", blob[len(FAKE_MAGIC) : _HEADER_LEN])
    return width, height, blob[_HEADER_LEN:]


DECODED_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("payload_bytes", LongType()),
        StructField("payload_digest", StringType()),
    ]
)


def decode_images(
    df: DataFrame,
    id_col: str,
    content_col: str,
    media_type: str = "image/fakeimg",
    *,
    tier: str = "auto",
) -> DataFrame:
    """Decode binary images to typed metadata.

    Two tiers behind one signature (round-10 verdict #1):

    * **native** — a Java ImageIO UDF compiled on first use and run
      entirely JVM-side (no Python worker, no Arrow transfer); see
      :mod:`lagoon_spark.operators.native_media`.
    * **stdlib** — Arrow-batched ``mapInPandas`` over the pure-Python
      codecs: each Arrow batch of blobs is decoded in one Python call
      per batch (not per row); partitioning is inherited from the
      input, so at 100 TB this runs as a pure map stage. The codec
      seam raises ``NotImplementedError`` for formats without a
      decoder.

    ``tier="auto"`` (default) picks native for JPEG/PNG when the JDK
    toolchain is available, stdlib otherwise. GIF always decodes
    stdlib under auto (palette-index payload semantics differ from
    ImageIO's RGB expansion). On lossless content the two tiers are
    byte-identical (digest-stable); on lossy real-world JPEG they
    differ by IDCT rounding only. ``LAGOON_MEDIA_TIER`` forces a tier
    globally.
    """
    from lagoon_spark.operators import native_media as nm

    if tier not in ("auto", "stdlib", "native"):
        raise ValueError(f"tier must be auto|stdlib|native, got {tier!r}")
    env = nm.media_tier()
    eff = env if env != "auto" else tier
    if eff == "native" or (
        eff == "auto"
        and media_type in nm.NATIVE_AUTO_TYPES
        and nm.register(df.sparkSession)
    ):
        if eff == "native" and not nm.register(df.sparkSession):
            raise RuntimeError(
                "native media tier requested but unavailable (no JDK?)"
            )
        return nm.decode_images_native(df, id_col, content_col)
    codec = _load_codec(media_type)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            ids, ws, hs, ns, digs = [], [], [], [], []
            for i, blob in zip(pdf[id_col], pdf[content_col]):
                w, h, payload = codec(bytes(blob))
                ids.append(i)
                ws.append(w)
                hs.append(h)
                ns.append(len(payload))
                digs.append(hashlib.md5(payload.hex().upper().encode()).hexdigest())
            yield pd.DataFrame(
                {
                    "id": ids,
                    "width": ws,
                    "height": hs,
                    "payload_bytes": ns,
                    "payload_digest": digs,
                }
            )

    return df.select(id_col, content_col).mapInPandas(decode, DECODED_SCHEMA)


AUDIO_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("n_frames", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("pcm_bytes", LongType()),
        StructField("pcm_digest", StringType()),
    ]
)


def decode_audio(
    df: DataFrame, id_col: str, content_col: str, media_type: str = "audio/wav"
) -> DataFrame:
    """Decode binary audio to typed metadata via Arrow-batched Python —
    the audio twin of :func:`decode_images`: one Python call per Arrow
    batch, partitioning inherited (a pure map stage at 100 TB). PCM
    WAV decodes with the stdlib codec; other formats raise through the
    codec seam."""
    codec = _load_codec(media_type)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            ids, frames, rates, ns, digs = [], [], [], [], []
            for i, blob in zip(pdf[id_col], pdf[content_col]):
                nf, rate, pcm = codec(bytes(blob))
                ids.append(i)
                frames.append(nf)
                rates.append(rate)
                ns.append(len(pcm))
                digs.append(hashlib.md5(pcm.hex().upper().encode()).hexdigest())
            yield pd.DataFrame(
                {
                    "id": ids,
                    "n_frames": frames,
                    "sample_rate": rates,
                    "pcm_bytes": ns,
                    "pcm_digest": digs,
                }
            )

    return df.select(id_col, content_col).mapInPandas(decode, AUDIO_SCHEMA)


def decode_audio_samples(
    df: DataFrame, id_col: str, content_col: str, *, tier: str = "auto"
) -> DataFrame:
    """Decode 16-bit mono PCM WAV to the SAMPLE VALUES themselves
    (``array<int>``), not just metadata — the input to signal-level
    feature extraction.

    Two tiers behind one signature (round-10 verdict #5, the last
    stdlib-only codec): ``tier="auto"`` (default) routes through the
    JVM ``WavSamples`` UDF when the JDK toolchain is available — PCM
    is lossless and both tiers read the raw stream as little-endian
    int16, so the tiers are BIT-EXACT (parity-asserted as equality) —
    and falls back to the Arrow-batched stdlib codec otherwise. All
    downstream feature math stays JVM-side either way
    (:func:`audio_frame_features`). Other bit depths / channel layouts
    should route through a real audio library behind the same
    signature. ``LAGOON_MEDIA_TIER`` forces a tier globally."""
    from lagoon_spark.operators import native_media as nm

    if tier not in ("auto", "stdlib", "native"):
        raise ValueError(f"tier must be auto|stdlib|native, got {tier!r}")
    env = nm.media_tier()
    eff = env if env != "auto" else tier
    if eff == "native" or (eff == "auto" and nm.register(df.sparkSession)):
        if eff == "native" and not nm.register(df.sparkSession):
            raise RuntimeError(
                "native media tier requested but unavailable (no JDK?)"
            )
        return nm.decode_audio_samples_native(df, id_col, content_col)
    import numpy as np

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, rates, sams = [], [], []
            for i, blob in zip(pdf[id_col], pdf[content_col]):
                _nf, rate, pcm = _decode_wav(bytes(blob))
                n = len(pcm) // 2
                # vectorized: one frombuffer per blob, no per-sample
                # Python objects — Arrow serializes the int32 ndarray
                # directly into the list column
                sams.append(
                    np.frombuffer(pcm[: 2 * n], dtype="<i2").astype(np.int32)
                )
                ids.append(i)
                rates.append(rate)
            yield pd.DataFrame(
                {"id": ids, "sample_rate": rates, "samples": sams}
            )

    return df.select(id_col, content_col).mapInPandas(
        decode, "id long, sample_rate int, samples array<int>"
    )


def audio_frame_features(
    samples_df: DataFrame,
    *,
    frame: int = 8,
    id_col: str = "id",
    samples_col: str = "samples",
) -> DataFrame:
    """Per-frame RMS / peak / mean-absolute-amplitude over a decoded
    sample array — the first stage of any audio quality/VAD filter.

    Pure JVM array math (no Python): windows come from a
    transform+slice, the energy sums accumulate exact BIGINT squares
    (16-bit samples → each square < 2^30, any frame length fits), and
    the only doubles are one division and one sqrt per frame — so the
    values are engine-exact and the whole stage is a row-local map
    that explodes to (row × frames)."""
    s = F.col(samples_col)
    nwin = F.ceil(F.size(s) / F.lit(float(frame))).cast("int")
    # sequence(0, -1) counts DOWN in Spark ([0, -1], not empty) — an
    # empty sample array would otherwise emit two garbage NaN frames
    windows = F.when(nwin <= 0, F.array().cast("array<array<int>>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), nwin - 1),
            lambda f: F.slice(s, f * frame + 1, frame),
        )
    )
    exploded = samples_df.select(
        F.col(id_col), F.posexplode(windows).alias("frame_no", "__w")
    )
    w = F.col("__w")
    n = F.size(w)
    sumsq = F.aggregate(
        w, F.lit(0).cast("long"), lambda a, x: a + x.cast("long") * x
    )
    sumabs = F.aggregate(
        w, F.lit(0).cast("long"), lambda a, x: a + F.abs(x).cast("long")
    )
    return exploded.select(
        id_col,
        F.col("frame_no").cast("int").alias("frame_no"),
        n.cast("int").alias("n_samples"),
        F.round(F.sqrt(sumsq / n), 6).alias("rms"),
        F.aggregate(
            w, F.lit(0), lambda a, x: F.greatest(a, F.abs(x))
        ).cast("int").alias("peak"),
        F.round(sumabs / n, 6).alias("mean_abs"),
    )


GIF_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("n_frames", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("frames_digest", StringType()),
    ]
)


def decode_gif_frames(
    df: DataFrame, id_col: str, content_col: str, *, tier: str = "auto"
) -> DataFrame:
    """Decode animated GIFs to per-asset frame metadata — the
    real-bytes version of the frame-sampling shape. Two tiers behind
    one signature: the native Java ImageIO reader (pure JVM — GIF
    frames come back as indexed rasters, so both tiers digest the SAME
    raw palette-index bytes) and the Arrow-batched stdlib LZW decoder.
    Both are pure map stages, partitioning inherited (100 TB =
    row-local). The digest covers the concatenated frame indices, so
    it pins every frame's pixels at once. Divergence note: interlaced
    frames raise in the stdlib tier but deinterlace natively — the
    native tier accepts strictly more inputs, never different answers
    on shared ones."""
    from lagoon_spark.operators import native_media as nm

    if tier not in ("auto", "stdlib", "native"):
        raise ValueError(f"tier must be auto|stdlib|native, got {tier!r}")
    env = nm.media_tier()
    eff = env if env != "auto" else tier
    if eff == "native" and not nm.register(df.sparkSession):
        raise RuntimeError("native media tier requested but unavailable (no JDK?)")
    if eff != "stdlib" and nm.register(df.sparkSession):
        return nm.decode_gif_frames_native(df, id_col, content_col)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            ids, nf, ws, hs, digs = [], [], [], [], []
            for i, blob in zip(pdf[id_col], pdf[content_col]):
                w, h, frames = _decode_gif(bytes(blob))
                ids.append(i)
                nf.append(len(frames))
                ws.append(w)
                hs.append(h)
                digs.append(
                    hashlib.md5(b"".join(frames).hex().upper().encode()).hexdigest()
                )
            yield pd.DataFrame(
                {
                    "id": ids,
                    "n_frames": nf,
                    "width": ws,
                    "height": hs,
                    "frames_digest": digs,
                }
            )

    return df.select(id_col, content_col).mapInPandas(decode, GIF_SCHEMA)


def encode_avi_mjpeg(
    width: int, height: int, frames: "list[bytes]", fps: int = 10
) -> bytes:
    """Minimal AVI (RIFF) writer for an MJPEG stream: one '00dc' chunk
    per JPEG frame, standard avih/strh/strf headers and an idx1 index
    so any AVI reader accepts the output — the video twin of the GIF/
    WAV/PNG fixture encoders (container per the public AVI RIFF spec;
    no codec library)."""
    import struct as _struct

    def chunk(cc: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) & 1 else b""
        return cc + _struct.pack("<I", len(data)) + data + pad

    def lst(cc: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", cc + data)

    max_sz = max((len(f) for f in frames), default=0)
    avih = _struct.pack(
        "<10I",
        1_000_000 // fps,  # microseconds per frame
        max_sz * fps,      # max bytes/sec (approximate)
        0, 0x10,           # padding, flags (HASINDEX)
        len(frames), 0, 1, max_sz, width, height,
    ) + b"\x00" * 16
    strh = (
        b"vids" + b"MJPG"
        + _struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0,
                       len(frames), max_sz, 0xFFFFFFFF, 0)
        + _struct.pack("<4H", 0, 0, width, height)
    )
    strf = _struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_chunks = []
    offsets = []
    pos = 4  # after 'movi' fourcc
    for f in frames:
        offsets.append(pos)
        c = chunk(b"00dc", f)
        movi_chunks.append(c)
        pos += len(c)
    movi = lst(b"movi", b"".join(movi_chunks))
    idx1 = chunk(
        b"idx1",
        b"".join(
            b"00dc" + _struct.pack("<III", 0x10, off, len(f))
            for off, f in zip(offsets, frames)
        ),
    )
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + _struct.pack("<I", len(body)) + body


def _decode_avi_mjpeg(
    blob: bytes, every: int = 1
) -> "tuple[int, int, int, list[bytes]]":
    """Parse an AVI container and decode every ``every``-th MJPEG frame
    through the stdlib JPEG codec. MJPEG frames are independent, so
    unsampled frames are COUNTED but never decoded — with every=30
    (typical keyframe sampling) that is a ~30× decode-cost cut, the
    difference between feasible and not at video-corpus scale.
    Returns (width, height, n_frames_total, [sampled_frame_pixels...])."""
    import struct as _struct

    from lagoon_spark.operators.jpeg import decode_jpeg

    if blob[:4] != b"RIFF" or blob[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI container")
    width = height = None
    n_frames = 0
    frames: "list[bytes]" = []

    def walk(data: bytes) -> None:
        nonlocal width, height, n_frames
        pos = 0
        while pos + 8 <= len(data):
            cc = data[pos : pos + 4]
            (length,) = _struct.unpack("<I", data[pos + 4 : pos + 8])
            payload = data[pos + 8 : pos + 8 + length]
            pos += 8 + length + (length & 1)
            if cc == b"LIST":
                walk(payload[4:])
            elif cc == b"avih":
                width, height = _struct.unpack("<II", payload[32:40])
            elif cc in (b"00dc", b"00db") and payload:
                idx = n_frames
                n_frames += 1
                if idx % every == 0:
                    w, h, px = decode_jpeg(payload)
                    frames.append(px)

    walk(blob[12:])
    if width is None:
        raise ValueError("AVI missing avih header")
    return int(width), int(height), n_frames, frames


def decode_video_frames(
    df: DataFrame,
    id_col: str,
    content_col: str,
    *,
    every: int = 1,
    tier: str = "auto",
) -> DataFrame:
    """Decode real AVI/MJPEG video bytes and sample every ``every``-th
    frame — the frame-sampling stage of a multimodal training pipeline
    on REAL container bytes. Two tiers behind one signature: the
    native Java ImageIO walk (pure JVM, default when a JDK is present
    — see :mod:`lagoon_spark.operators.native_media`) and the
    Arrow-batched stdlib walk (RIFF parse + stdlib JPEG codec; a
    production deployment swaps in PyAV behind the same signature).
    Both are pure map stages; the digest covers the sampled frames'
    concatenated pixels, so it pins the decode end to end — and the
    m11 corpus (DC-only solid blocks) is bit-exact across tiers."""
    from lagoon_spark.operators import native_media as nm

    if every < 1:
        raise ValueError(f"every must be >= 1, got {every}")
    if tier not in ("auto", "stdlib", "native"):
        raise ValueError(f"tier must be auto|stdlib|native, got {tier!r}")
    env = nm.media_tier()
    eff = env if env != "auto" else tier
    if eff == "native" and not nm.register(df.sparkSession):
        raise RuntimeError("native media tier requested but unavailable (no JDK?)")
    if eff != "stdlib" and nm.register(df.sparkSession):
        return nm.decode_video_frames_native(df, id_col, content_col, every=every)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            ids, nf, ns, ws, hs, digs = [], [], [], [], [], []
            for i, blob in zip(pdf[id_col], pdf[content_col]):
                w, h, total, sampled = _decode_avi_mjpeg(bytes(blob), every)
                ids.append(i)
                nf.append(total)
                ns.append(len(sampled))
                ws.append(w)
                hs.append(h)
                digs.append(
                    hashlib.md5(
                        b"".join(sampled).hex().upper().encode()
                    ).hexdigest()
                )
            yield pd.DataFrame(
                {
                    "id": ids,
                    "n_frames": nf,
                    "n_sampled": ns,
                    "width": ws,
                    "height": hs,
                    "frames_digest": digs,
                }
            )

    return df.select(id_col, content_col).mapInPandas(
        decode,
        "id long, n_frames int, n_sampled int, width int, height int,"
        " frames_digest string",
    )


def resize_fake_images(
    df: DataFrame, id_col: str, content_col: str, scale_num: int, scale_den: int
) -> DataFrame:
    """Deterministic 'resize': rescale header dims, truncate payload
    proportionally (area ratio). A real implementation swaps the inner
    function for PIL's resize; the Spark plumbing (Arrow batches, fixed
    output schema, map-only plan) is identical either way.
    """
    out_schema = StructType(
        [StructField("id", LongType()), StructField("content", BinaryType())]
    )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for i, blob in zip(pdf[id_col], pdf[content_col]):
                w, h, payload = _decode_fake_image(bytes(blob))
                nw = max(1, w * scale_num // scale_den)
                nh = max(1, h * scale_num // scale_den)
                keep = max(1, len(payload) * scale_num * scale_num // (scale_den * scale_den))
                blobs.append(encode_fake_image(nw, nh, payload[:keep]))
                ids.append(i)
            yield pd.DataFrame({"id": ids, "content": blobs})

    return df.select(id_col, content_col).mapInPandas(resize, out_schema)


def resize_pixels(
    df: DataFrame,
    id_col: str,
    width_col: str,
    height_col: str,
    data_col: str,
    *,
    factor: int,
    channels: int = 1,
    tier: str = "auto",
) -> DataFrame:
    """REAL box downsample over decoded pixel buffers — the resize
    stage of a multimodal training pipeline (after decode, before
    feature extraction / phash). Each output pixel is the integer box
    mean of a ``factor``×``factor`` input box, per channel, with FLOOR
    division (``sum // factor²``); trailing rows/cols that don't fill a
    whole box are truncated (standard stride semantics).

    Two tiers behind one signature: **native** (a Java UDF doing the
    loop JVM-side, zero Python in the plan — default when the JDK
    toolchain is available) and **stdlib** (Arrow-batched numpy
    reshape-sum, one vectorized reduction per image, no per-pixel
    Python). Integer math means the tiers are byte-identical on EVERY
    input, so ``tier`` never changes answers.

    Output: ``id, width, height, payload_bytes, payload_digest`` with
    the module's digest convention (md5 over uppercase hex). Scale
    shape: a row-local map stage either way — partitioning inherited,
    no shuffle.
    """
    from lagoon_spark.operators import native_media as nm

    if factor < 1:
        raise ValueError(f"factor must be >= 1, got {factor}")
    if channels < 1:
        raise ValueError(f"channels must be >= 1, got {channels}")
    if tier not in ("auto", "stdlib", "native"):
        raise ValueError(f"tier must be auto|stdlib|native, got {tier!r}")
    env = nm.media_tier()
    eff = env if env != "auto" else tier
    if eff == "native" and not nm.register(df.sparkSession):
        raise RuntimeError("native media tier requested but unavailable (no JDK?)")
    if eff != "stdlib" and nm.register(df.sparkSession):
        return nm.resize_pixels_native(
            df, id_col, width_col, height_col, data_col,
            factor=factor, channels=channels,
        )
    import numpy as np

    f, c = int(factor), int(channels)

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            ids, ws, hs, ns, digs = [], [], [], [], []
            for i, w, h, data in zip(
                pdf[id_col], pdf[width_col], pdf[height_col], pdf[data_col]
            ):
                w, h = int(w), int(h)
                buf = bytes(data)
                if w < 0 or h < 0:
                    raise ValueError("width/height must be >= 0")
                if w * h * c != len(buf):
                    raise ValueError(
                        "pixel buffer length != width*height*channels"
                    )
                ow, oh = w // f, h // f
                arr = np.frombuffer(buf, dtype=np.uint8).reshape(h, w, c)
                # trim partial boxes, then one vectorized box-sum
                boxed = (
                    arr[: oh * f, : ow * f]
                    .reshape(oh, f, ow, f, c)
                    .astype(np.uint32)
                    .sum(axis=(1, 3))
                )
                out = (boxed // (f * f)).astype(np.uint8).tobytes()
                ids.append(i)
                ws.append(ow)
                hs.append(oh)
                ns.append(len(out))
                digs.append(hashlib.md5(out.hex().upper().encode()).hexdigest())
            yield pd.DataFrame(
                {
                    "id": ids,
                    "width": ws,
                    "height": hs,
                    "payload_bytes": ns,
                    "payload_digest": digs,
                }
            )

    return df.select(id_col, width_col, height_col, data_col).mapInPandas(
        resize,
        "id long, width int, height int, payload_bytes long, payload_digest string",
    )


# ---------------------------------------------------------------------------
# Byte-histogram features (Arrow-batched, vectorized in numpy)
# ---------------------------------------------------------------------------

FEATURE_ALPHABET = b"abcdefgh"


def byte_histogram_features(
    df: DataFrame, id_col: str, content_col: str, alphabet: bytes = FEATURE_ALPHABET
) -> DataFrame:
    """Per-asset counts of each byte in ``alphabet`` — a stand-in for a
    real feature extractor with the same execution shape (binary in,
    fixed-width numeric vector out, Arrow batches, map-only)."""
    import numpy as np

    fields = [StructField("id", LongType())] + [
        StructField(f"n_{chr(b)}", LongType()) for b in alphabet
    ]
    out_schema = StructType(fields)

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # fully vectorized per batch: concatenate all blobs into one
        # uint8 array and build a per-segment 256-bin histogram with ONE
        # bincount pass (segment_id*256 + byte) — independent of
        # alphabet size, where a per-letter cumsum would re-scan the
        # payload |alphabet| times
        for pdf in batches:
            blobs = [bytes(b) for b in pdf[content_col]]
            lens = np.fromiter((len(b) for b in blobs), dtype=np.int64, count=len(blobs))
            flat = np.frombuffer(b"".join(blobs), dtype=np.uint8)
            seg = np.repeat(np.arange(len(blobs), dtype=np.int64), lens)
            hist = np.bincount(
                seg * 256 + flat, minlength=len(blobs) * 256
            ).reshape(len(blobs), 256)
            cols: dict[str, object] = {"id": pdf[id_col].to_numpy()}
            for b in alphabet:
                cols[f"n_{chr(b)}"] = hist[:, b]
            yield pd.DataFrame(cols)

    return df.select(id_col, content_col).mapInPandas(featurize, out_schema)


PHASH_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("phash", LongType()),
    ]
)


def perceptual_hash_images(
    df: DataFrame, id_col: str, content_col: str, media_type: str = "image/fakeimg"
) -> DataFrame:
    """63-bit difference hash (dHash) per decoded image: bit j is 1 iff
    pixel byte j > byte j+1 of the decoded payload (zero-padded past
    the end) — near-identical images collide, so an exact groupBy on
    the hash is the visual-dedup blocking key (public technique; a
    real pipeline swaps the codec seam for PIL and resamples to the
    canonical 9x8 grid first, same plumbing).

    Arrow-batched ``mapInPandas`` over the codec seam — map-only, the
    same 100 TB shape as :func:`decode_images`.
    """
    codec = _load_codec(media_type)

    def phash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, hv = [], [], [], []
            for i, blob in zip(pdf[id_col], pdf[content_col]):
                w, h, payload = codec(bytes(blob))
                p = payload[:64] + b"\x00" * max(0, 64 - len(payload))
                acc = 0  # 63 bits: bit 63 would overflow signed int64
                for j in range(63):
                    if p[j] > p[j + 1]:
                        acc |= 1 << j
                ids.append(i)
                ws.append(w)
                hs.append(h)
                hv.append(acc)
            yield pd.DataFrame(
                {"id": ids, "width": ws, "height": hs, "phash": hv}
            )

    return df.select(id_col, content_col).mapInPandas(phash, PHASH_SCHEMA)
