"""Pure-stdlib(+numpy) baseline JPEG codec.

Implements ITU-T T.81 / ISO 10918-1 Huffman DCT decoding for both
baseline sequential (SOF0/1) and progressive (SOF2) streams: marker
parse, DQT/DHT tables, entropy decode with byte unstuffing and
restart intervals, spectral selection + successive approximation
(EOB runs, AC refinement correction bits, non-interleaved scans),
dequantize + zigzag + batched 8x8 IDCT, chroma upsampling, JFIF
YCbCr->RGB. The encoder side covers what the tests and registry
queries need: 8-bit grayscale or RGB, 4:4:4 or 4:2:0, Annex K tables
scaled by the usual libjpeg quality formula, standard Annex K Huffman
tables (always emitted in DHT, so any reader accepts the stream and
table exactness only affects foreign abbreviated streams, which
always carry their own DHT in practice).

Arithmetic coding, lossless/hierarchical SOFs, 12-bit precision and
CMYK refuse loudly with ``NotImplementedError`` -- route those
through PIL via the
:func:`lagoon_spark.operators.multimodal._load_codec` seam, which
prefers a real codec whenever one is installed.

Like the PNG/GIF/WAV codecs this is the correctness fallback, not the
throughput path: bit-level work is Python loops, only the DCT is
vectorized (numpy, batched over all blocks of a component). The
reference engine (tweag/lagoon) has no media plane at all; this
module exists for the training-data-pipeline extension ops (m01-m09).
"""
from __future__ import annotations

import struct

import numpy as np

# -- tables (T.81 Annex K) ---------------------------------------------------

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

QUANT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]

QUANT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

# (BITS[1..16], HUFFVAL) -- Annex K.3
DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# orthonormal 8x8 DCT-II basis: F = M @ f @ M.T, f = M.T @ F @ M
_M = np.array(
    [
        [
            (np.sqrt(1 / 8) if u == 0 else 0.5)
            * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def _huff_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical code assignment (T.81 Annex C): value -> (length, code)."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decoder(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> value, for the bit-at-a-time decoder."""
    return {(ln, code): v for v, (ln, code) in _huff_codes(bits, values).items()}


def _extend(v: int, s: int) -> int:
    """T.81 EXTEND: map the s received bits back to a signed value."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


# -- decoder -----------------------------------------------------------------


class _BitReader:
    """MSB-first reader over an unstuffed entropy segment."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG entropy data")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_huff(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            v = table.get((length, code))
            if v is not None:
                return v
        raise ValueError("invalid JPEG Huffman code")


def _split_entropy(blob: bytes, start: int) -> tuple[list[bytes], int]:
    """Unstuff the scan's entropy bytes, splitting on restart markers.

    Returns the list of restart segments (DC predictors reset at each
    boundary) and the offset of the terminating marker.
    """
    segs, cur, i = [], bytearray(), start
    while i < len(blob):
        b = blob[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        nxt = blob[i + 1] if i + 1 < len(blob) else 0xD9
        if nxt == 0x00:  # stuffed 0xFF data byte
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= nxt <= 0xD7:  # RSTn
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:  # next real marker ends the scan
            break
    segs.append(bytes(cur))
    return segs, i


def decode_jpeg(blob: bytes) -> tuple[int, int, bytes]:
    """Decode baseline (SOF0/1) or progressive (SOF2) JPEG bytes to
    ``(width, height, pixels)``.

    Pixels are 8-bit, grayscale for 1-component streams and
    interleaved RGB for 3-component YCbCr (the PIL ``tobytes()``
    layout, like the other stdlib codecs). All scans accumulate into
    per-component coefficient grids (a baseline stream is the
    one-scan special case: interleaved, Ss=0..63, Ah=Al=0), then one
    batched dequantize + IDCT reconstructs the image.
    """
    if blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    frame = None  # (H, W, [(cid, h, v, tq)])
    grids: list[np.ndarray] | None = None
    restart_interval = 0
    scans = 0
    i = 2
    while i + 4 <= len(blob):
        if blob[i] != 0xFF:
            raise ValueError(f"bad JPEG marker alignment at {i}")
        m = blob[i + 1]
        if m == 0xD9:  # EOI
            break
        if m == 0x01 or 0xD0 <= m <= 0xD7:  # standalone markers
            i += 2
            continue
        (ln,) = struct.unpack(">H", blob[i + 2 : i + 4])
        seg = blob[i + 4 : i + 2 + ln]
        i += 2 + ln
        if m == 0xDB:  # DQT (possibly several tables per segment)
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 15
                p += 1
                if prec:  # 16-bit table
                    tab = np.array(
                        struct.unpack(">64H", seg[p : p + 128]), dtype=np.float64
                    )
                    p += 128
                else:
                    tab = np.frombuffer(seg[p : p + 64], np.uint8).astype(np.float64)
                    p += 64
                z = np.zeros(64)
                z[ZIGZAG] = tab  # de-zigzag into natural order
                qt[tid] = z.reshape(8, 8)
        elif m == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = list(seg[p + 17 : p + 17 + n])
                (ac_tabs if cls else dc_tabs)[tid] = _huff_decoder(bits, vals)
                p += 17 + n
        elif m in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            prec = seg[0]
            if prec != 8:
                raise NotImplementedError(f"JPEG precision {prec} (only 8)")
            h, w, nc = (
                struct.unpack(">H", seg[1:3])[0],
                struct.unpack(">H", seg[3:5])[0],
                seg[5],
            )
            if nc not in (1, 3):
                raise NotImplementedError(f"{nc}-component JPEG (CMYK?)")
            comps = [
                (seg[6 + 3 * c], seg[7 + 3 * c] >> 4, seg[7 + 3 * c] & 15, seg[8 + 3 * c])
                for c in range(nc)
            ]
            frame = (h, w, comps)
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcus_x = -(-w // (8 * hmax))
            mcus_y = -(-h // (8 * vmax))
            # natural-order int coefficient store, MCU-padded; int so
            # successive-approximation refinement can use the same
            # two's-complement bit ops the spec (and libjpeg) define
            grids = [
                np.zeros((mcus_y * cv, mcus_x * ch, 64), dtype=np.int32)
                for _cid, ch, cv, _tq in comps
            ]
        elif m in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-DCT-Huffman JPEG (SOF{m - 0xC0}); use PIL for "
                "arithmetic/lossless/hierarchical streams"
            )
        elif m == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif m == 0xDA:  # SOS
            if frame is None or grids is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            cid_to_ci = {c[0]: ci for ci, c in enumerate(frame[2])}
            sel = [
                (
                    cid_to_ci[seg[1 + 2 * c]],
                    seg[2 + 2 * c] >> 4,
                    seg[2 + 2 * c] & 15,
                )
                for c in range(ns)
            ]
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah, al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 15
            i = _decode_scan_into(
                blob, i, frame, sel, ss, se, ah, al, grids, dc_tabs,
                ac_tabs, restart_interval,
            )
            scans += 1
        # APPn/COM and the rest: skipped
    if not scans:
        raise ValueError("JPEG ended without a scan")
    return _reconstruct(frame, grids, qt)


def _decode_block(reader, blk, zz0, ss, se, ah, al, dct, act, pred, state):
    """Decode one block's contribution from the current scan into the
    flat natural-order int array ``blk`` (T.81 F.2 sequential + G.2
    progressive; the successive-approximation control flow follows
    libjpeg's decode_mcu_AC_first/_refine, the de-facto reading of
    the spec)."""
    if ss == 0:  # DC band
        if ah == 0:
            s = reader.read_huff(dct)
            diff = _extend(reader.read_bits(s), s) if s else 0
            pred += diff
            blk[zz0] = pred << al
        elif reader.read_bit():
            blk[zz0] = int(blk[zz0]) | (1 << al)
    if se >= max(ss, 1):  # AC band
        k = max(ss, 1)
        if ah == 0:
            if state["eobrun"] > 0:
                state["eobrun"] -= 1
            else:
                while k <= se:
                    rs = reader.read_huff(act)
                    r, s = rs >> 4, rs & 15
                    if s == 0:
                        if r < 15:  # EOBn (r=0 is plain EOB)
                            state["eobrun"] = (1 << r) - 1
                            if r:
                                state["eobrun"] += reader.read_bits(r)
                            break
                        k += 16  # ZRL
                    else:
                        k += r
                        if k > se:
                            raise ValueError("JPEG AC coefficient overrun")
                        blk[ZIGZAG[k]] = _extend(reader.read_bits(s), s) << al
                        k += 1
        else:
            _refine_ac(reader, blk, k, se, 1 << al, act, state)
    return pred


def _refine_ac(reader, blk, k, se, p1, act, state):
    """AC successive-approximation refinement: pass correction bits to
    already-nonzero coefficients, insert +-p1 at newly nonzero ones.
    ``state['eobrun']`` counts blocks remaining in the EOB run
    INCLUDING the current one (libjpeg's convention for this path)."""
    m1 = -p1
    if state["eobrun"] == 0:
        while k <= se:
            rs = reader.read_huff(act)
            r, s = rs >> 4, rs & 15
            val = 0
            if s == 0:
                if r < 15:
                    state["eobrun"] = 1 << r
                    if r:
                        state["eobrun"] += reader.read_bits(r)
                    break
                # r == 15: pass over 16 zero-history coefficients
            else:  # s is 1 by construction in refinement scans
                val = p1 if reader.read_bit() else m1
            while k <= se:
                z = ZIGZAG[k]
                cur = int(blk[z])
                if cur != 0:
                    if reader.read_bit() and (cur & p1) == 0:
                        blk[z] = cur + (p1 if cur >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                blk[ZIGZAG[k]] = val
            k += 1
    if state["eobrun"] > 0:
        while k <= se:
            z = ZIGZAG[k]
            cur = int(blk[z])
            if cur != 0 and reader.read_bit() and (cur & p1) == 0:
                blk[z] = cur + (p1 if cur >= 0 else m1)
            k += 1
        state["eobrun"] -= 1


def _decode_scan_into(blob, start, frame, sel, ss, se, ah, al, grids,
                      dc_tabs, ac_tabs, dri):
    """Decode one scan's entropy data into the coefficient grids and
    return the offset of the scan-terminating marker."""
    H, W, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    segs, end = _split_entropy(blob, start)
    seg_iter = iter(segs)
    reader = _BitReader(next(seg_iter))
    preds = {ci: 0 for ci, *_ in sel}
    state = {"eobrun": 0}

    interleaved = len(sel) > 1
    if interleaved:
        mcus_x = -(-W // (8 * hmax))
        total = mcus_x * (-(-H // (8 * vmax)))
    else:
        ci0, _dt, _at = sel[0]
        _cid, ch0, cv0, _tq = comps[ci0]
        # non-interleaved scans traverse the component's OWN block
        # grid (no MCU padding) row-major — T.81 A.2.2
        cw = -(-W * ch0 // hmax)
        chh = -(-H * cv0 // vmax)
        bw = -(-cw // 8)
        bh = -(-chh // 8)
        total = bw * bh
    per_seg = dri if dri else total
    for u in range(total):
        if u and dri and u % per_seg == 0:
            reader = _BitReader(next(seg_iter))
            preds = {ci: 0 for ci, *_ in sel}
            state["eobrun"] = 0
        if interleaved:
            my, mx = divmod(u, mcus_x)
            for ci, dc_tid, ac_tid in sel:
                _cid, ch, cv, _tq = comps[ci]
                for by in range(cv):
                    for bx in range(ch):
                        blk = grids[ci][my * cv + by, mx * ch + bx]
                        preds[ci] = _decode_block(
                            reader, blk, 0, ss, se, ah, al,
                            dc_tabs.get(dc_tid), ac_tabs.get(ac_tid),
                            preds[ci], state,
                        )
        else:
            ci, dc_tid, ac_tid = sel[0]
            by, bx = divmod(u, bw)
            blk = grids[ci][by, bx]
            preds[ci] = _decode_block(
                reader, blk, 0, ss, se, ah, al,
                dc_tabs.get(dc_tid), ac_tabs.get(ac_tid), preds[ci], state,
            )
    return end


def _reconstruct(frame, grids, qt):
    H, W, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    planes = []
    for ci, (cid, ch, cv, tq) in enumerate(comps):
        by, bx = grids[ci].shape[:2]
        g = grids[ci].astype(np.float64).reshape(by, bx, 8, 8) * qt[tq]
        # batched IDCT over every block: f = M.T @ F @ M
        f = np.einsum("ux,rcuv,vy->rcxy", _M, g, _M) + 128.0
        by, bx = g.shape[:2]
        plane = f.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        plane = np.clip(np.floor(plane + 0.5), 0, 255)
        # crop to the component's true size, then upsample to full frame
        cw = -(-W * ch // hmax)
        chh = -(-H * cv // vmax)
        plane = plane[:chh, :cw]
        if ch != hmax or cv != vmax:
            plane = np.repeat(np.repeat(plane, vmax // cv, 0), hmax // ch, 1)
        planes.append(plane[:H, :W])

    if len(planes) == 1:
        return W, H, planes[0].astype(np.uint8).tobytes()
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    rgb = np.clip(np.floor(rgb + 0.5), 0, 255).astype(np.uint8)
    return W, H, rgb.tobytes()


# -- encoder -----------------------------------------------------------------


def _scaled_quant(base: list[int], quality: int) -> np.ndarray:
    """The usual libjpeg quality->table scaling (public formula)."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    t = [(q * scale + 50) // 100 for q in base]
    return np.array([min(255, max(1, q)) for q in t], dtype=np.float64)


def _quantize(x: np.ndarray) -> np.ndarray:
    """Round-half-away-from-zero (C-style), elementwise."""
    return np.sign(x) * np.floor(np.abs(x) + 0.5)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            self.write(0xFF, 8 - self.nbits)  # pad with 1s
        return bytes(self.out)


def _size_cat(v: int) -> int:
    return int(v).bit_length() if v else 0


def _encode_block(w: _BitWriter, zz: np.ndarray, pred: int,
                  dc_codes: dict, ac_codes: dict) -> int:
    dc = int(zz[0])
    diff = dc - pred
    s = _size_cat(abs(diff))
    ln, code = dc_codes[s]
    w.write(code, ln)
    if s:
        w.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last = 63
    while last and zz[last] == 0:
        last -= 1
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            ln, code = ac_codes[0xF0]  # ZRL
            w.write(code, ln)
            run -= 16
        s = _size_cat(abs(v))
        ln, code = ac_codes[(run << 4) | s]
        w.write(code, ln)
        w.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        ln, code = ac_codes[0x00]  # EOB
        w.write(code, ln)
    return dc


def _plane_blocks(plane: np.ndarray) -> np.ndarray:
    """Pad a plane to 8-multiples by edge replication and cut into
    (by, bx, 8, 8) blocks."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    p = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    return p.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3)


def encode_jpeg(
    width: int,
    height: int,
    pixels: bytes,
    *,
    quality: int = 75,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Baseline JPEG encode of 8-bit grayscale (``len == w*h``) or
    interleaved RGB (``len == w*h*3``) pixels. ``subsampling`` is
    ``"444"`` or ``"420"`` (RGB only). A non-zero ``restart_interval``
    emits DRI + RSTn markers every that many MCUs (and resets the DC
    predictors), exercising the decoder's restart path."""
    n = len(pixels)
    if n == width * height:
        ncomp = 1
    elif n == width * height * 3:
        ncomp = 3
    else:
        raise ValueError("pixel buffer is neither grayscale nor RGB")
    if subsampling not in ("444", "420"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    if ncomp == 1:
        subsampling = "444"

    arr = np.frombuffer(pixels, np.uint8).astype(np.float64)
    if ncomp == 1:
        planes = [arr.reshape(height, width)]
    else:
        rgb = arr.reshape(height, width, 3)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsampling == "420":
            # box-average 2x2 for chroma (pad odd dims by edge first)
            def down(p):
                ph, pw = -(-p.shape[0] // 2) * 2, -(-p.shape[1] // 2) * 2
                p = np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
                           mode="edge")
                return (p[0::2, 0::2] + p[0::2, 1::2]
                        + p[1::2, 0::2] + p[1::2, 1::2]) / 4.0
            planes = [y, down(cb), down(cr)]
        else:
            planes = [y, cb, cr]

    qluma = _scaled_quant(QUANT_LUMA, quality)
    qchroma = _scaled_quant(QUANT_CHROMA, quality)
    qnat = []
    for q in (qluma, qchroma):
        z = np.zeros(64)
        z[ZIGZAG] = q
        qnat.append(z.reshape(8, 8))

    out = bytearray(b"\xff\xd8")  # SOI
    # JFIF APP0
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    for tid, q in ((0, qluma), (1, qchroma))[: (2 if ncomp == 3 else 1)]:
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid])
        out += bytes(int(v) for v in q)
    # SOF0
    hv = (0x22 if subsampling == "420" else 0x11, 0x11, 0x11)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, height, width,
                                     ncomp)
    for c in range(ncomp):
        out += bytes([c + 1, hv[c] if ncomp == 3 else 0x11, 0 if c == 0 else 1])
    # DHT (standard tables)
    tabs = [(0x00, DC_LUMA), (0x10, AC_LUMA)]
    if ncomp == 3:
        tabs += [(0x01, DC_CHROMA), (0x11, AC_CHROMA)]
    for tc, (bits, vals) in tabs:
        out += b"\xff\xc4" + struct.pack(">H", 3 + 16 + len(vals)) + bytes([tc])
        out += bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for c in range(ncomp):
        out += bytes([c + 1, 0x00 if c == 0 else 0x11])
    out += b"\x00\x3f\x00"

    # entropy-coded data: interleaved MCUs
    hmax = 2 if subsampling == "420" else 1
    comp_info = []
    for ci, plane in enumerate(planes):
        ch = cv = hmax if ci == 0 else 1
        blocks = _plane_blocks(plane)
        # coefficients: F = M @ (f-128) @ M.T, quantized
        coeffs = np.einsum("ux,rcxy,vy->rcuv", _M, blocks - 128.0, _M)
        coeffs = _quantize(coeffs / qnat[0 if ci == 0 else 1])
        comp_info.append((ch, cv, coeffs))

    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * hmax))
    w = _BitWriter()
    dc_codes = [_huff_codes(*DC_LUMA), _huff_codes(*DC_CHROMA)]
    ac_codes = [_huff_codes(*AC_LUMA), _huff_codes(*AC_CHROMA)]
    preds = [0] * ncomp
    mcu = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu and mcu % restart_interval == 0:
                out += w.flush() + bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                w = _BitWriter()
                preds = [0] * ncomp
            mcu += 1
            for ci, (ch, cv, coeffs) in enumerate(comp_info):
                t = 0 if ci == 0 else 1
                for by in range(cv):
                    for bx in range(ch):
                        ry = min(my * cv + by, coeffs.shape[0] - 1)
                        rx = min(mx * ch + bx, coeffs.shape[1] - 1)
                        blk = coeffs[ry, rx]
                        zz = blk.reshape(64)[ZIGZAG_INV]
                        preds[ci] = _encode_block(
                            w, zz, preds[ci], dc_codes[t], ac_codes[t]
                        )
    out += w.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# natural-order index for each zigzag position's inverse: zz[k] = blk[ZIGZAG[k]]
ZIGZAG_INV = np.array(ZIGZAG)
