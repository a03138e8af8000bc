"""Baseline JPEG codec (ITU-T T.81 / ISO 10918-1, SOF0 sequential,
Huffman, 8-bit) in numpy + stdlib — the last image format the multimodal
tier stubbed. Scope: grayscale and YCbCr 4:4:4 / 4:2:2 / 4:2:0 decode
with byte stuffing and restart markers; progressive (SOF2) and
arithmetic coding return labeled unsupported errors.

The encoder exists for two honest reasons: fixtures for the decoder
tests (round-trip within quantization error), and the resize path's
re-encode. Decoder correctness is additionally anchored WITHOUT the
encoder: a flat-color image's blocks are DC-only, so the expected
reconstruction is computable by hand through the same quantizer math
(tests/test_jpeg.py).

JPEG is lossy: parity contracts are tolerance-based (per-pixel bounds on
flat content, mean-error bounds on smooth content), never bit-exact.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# Tables (Annex K of the spec — the "typical" tables everyone ships)
# ---------------------------------------------------------------------------

STD_LUMA_Q = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.int32)

STD_CHROMA_Q = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.int32)

# (bits counts per length 1..16, symbol values) — Annex K.3
STD_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
STD_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
STD_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
     0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
     0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
     0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
     0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
     0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
     0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
     0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
     0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
     0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
     0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
STD_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
     0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
     0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
     0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
     0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
     0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
     0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
     0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
     0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
     0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
     0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

# orthonormal DCT-II matrix — IDCT is D.T @ B @ D, forward is D @ b @ D.T
_C = np.array([
    [np.sqrt(1 / 8)] * 8 if i == 0 else
    [np.sqrt(2 / 8) * np.cos((2 * j + 1) * i * np.pi / 16) for j in range(8)]
    for i in range(8)
])


class JpegUnsupported(ValueError):
    pass


# ---------------------------------------------------------------------------
# Huffman machinery (canonical codes from BITS/HUFFVAL — spec §C.2)
# ---------------------------------------------------------------------------


def _build_codes(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """{(length, code): symbol} — decode walks lengths 1..16."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _build_encode(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    return {sym: (length, code) for (length, code), sym in _build_codes(bits, values).items()}


class _BitReader:
    """MSB-first entropy-segment reader: un-stuffs FF00, stops at markers
    (restart markers are consumed by the caller)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.bits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                raise EOFError("marker inside entropy data")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.bits += 8

    def read(self, n: int) -> int:
        while self.bits < n:
            self._fill()
        self.bits -= n
        v = (self.acc >> self.bits) & ((1 << n) - 1)
        return v

    def align_restart(self) -> None:
        """Drop partial byte and consume the RSTn marker."""
        self.acc = 0
        self.bits = 0
        assert self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        self.pos += 2

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read(1)
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("bad huffman code")


class _RestartMarker(Exception):
    def __init__(self, marker: int):
        self.marker = marker


def _extend(v: int, size: int) -> int:
    """DC/AC value extension (spec F.2.2.1): size-bit magnitude to signed."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def decode_jpeg(blob: bytes) -> "np.ndarray":
    """(H, W, 3) uint8 from a baseline JPEG (grayscale replicates)."""
    if blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> decode table
    frame = None
    restart_interval = 0
    i = 2
    while i < len(blob):
        if blob[i] != 0xFF:
            i += 1
            continue
        marker = blob[i + 1]
        if marker == 0xFF:  # T.81 B.1.1.2: optional fill bytes before a marker
            i += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:  # EOI
            break
        ln = int.from_bytes(blob[i + 2 : i + 4], "big")
        seg = blob[i + 4 : i + 2 + ln]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                if pq != 0:
                    raise JpegUnsupported("Unsupported16BitQuantTable")
                tbl = np.zeros(64, np.int32)
                tbl[ZIGZAG] = np.frombuffer(seg, np.uint8, 64, p + 1)
                qt[tq] = tbl.reshape(8, 8)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = list(seg[p + 17 : p + 17 + n])
                huff[(tc, th)] = _build_codes(bits, vals)
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, samp, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 0x0F, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise JpegUnsupported("UnsupportedJpegProcess")
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = seg[0]
            scan = {}
            for c in range(ns):
                cid, tables = seg[1 + 2 * c], seg[2 + 2 * c]
                scan[cid] = (tables >> 4, tables & 0x0F)
            return _decode_scan(
                blob, i + 2 + ln, frame, scan, qt, huff, restart_interval
            )
        i += 2 + ln
    raise ValueError("no scan data")


def _decode_scan(blob, pos, frame, scan, qt, huff, restart_interval):
    if frame is None:
        raise ValueError("SOS before SOF0")
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    planes = []
    for c in comps:
        planes.append(np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), np.float64))

    reader = _BitReader(blob, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.align_restart()
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                dc_tbl = huff[(0, scan[c["id"]][0])]
                ac_tbl = huff[(1, scan[c["id"]][1])]
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        block = _decode_block(reader, dc_tbl, ac_tbl, pred, ci)
                        pix = _C.T @ (block * q) @ _C + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = pix
            mcu_count += 1

    # upsample subsampled planes to full resolution (nearest), crop, convert
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        # round like the color path — truncation would skew fractional
        # pixels one level dark vs a reference decoder
        y = np.clip(full[0], 0, 255).round()
        return np.repeat(y[:, :, None], 3, axis=2).astype(np.uint8)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=2), 0, 255).round().astype(np.uint8)


def _decode_block(reader, dc_tbl, ac_tbl, pred, ci):
    coeffs = np.zeros(64, np.float64)
    size = reader.decode_symbol(dc_tbl)
    diff = _extend(reader.read(size), size) if size else 0
    pred[ci] += diff
    coeffs[0] = pred[ci]
    k = 1
    while k < 64:
        rs = reader.decode_symbol(ac_tbl)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("AC run overflow")
        coeffs[ZIGZAG[k]] = _extend(reader.read(size), size)
        k += 1
    block = np.zeros((8, 8), np.float64)
    block.flat[:] = coeffs
    return block


# ---------------------------------------------------------------------------
# Encoder (standard tables; quality scales the Annex-K matrices the way
# libjpeg's quality knob does)
# ---------------------------------------------------------------------------


def _scaled_q(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * s + 50) // 100, 1, 255).astype(np.int32)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.bits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | code
        self.bits += length
        while self.bits >= 8:
            self.bits -= 8
            b = (self.acc >> self.bits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.bits:
            pad = 8 - self.bits
            self.write((1 << pad) - 1, pad)  # 1-fill


def _encode_block(writer, block, q, dc_enc, ac_enc, pred, ci):
    coef = _C @ block @ _C.T
    qc = np.round(coef / q).astype(np.int64)
    zz = qc.flatten()[ZIGZAG]
    diff = int(zz[0]) - pred[ci]
    pred[ci] = int(zz[0])
    size = int(diff).bit_length() if diff else 0
    length, code = dc_enc[size]
    writer.write(code, length)
    if size:
        writer.write(diff if diff > 0 else diff + (1 << size) - 1, size)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            length, code = ac_enc[0xF0]
            writer.write(code, length)
            run -= 16
        size = abs(v).bit_length()
        length, code = ac_enc[(run << 4) | size]
        writer.write(code, length)
        writer.write(v if v > 0 else v + (1 << size) - 1, size)
        run = 0
    if run:
        length, code = ac_enc[0x00]  # EOB
        writer.write(code, length)


def encode_jpeg(arr: "np.ndarray", quality: int = 85, subsample: bool = False) -> bytes:
    """(H, W, 3) uint8 -> baseline JPEG bytes (standard tables; 4:2:0
    when ``subsample``, else 4:4:4)."""
    h, w = arr.shape[:2]
    ql = _scaled_q(STD_LUMA_Q, quality)
    qc = _scaled_q(STD_CHROMA_Q, quality)

    rgb = arr.astype(np.float64)
    y = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
    cb = -0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1] + 0.5 * rgb[:, :, 2] + 128
    cr = 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1] - 0.081312 * rgb[:, :, 2] + 128

    sampling = (2, 2) if subsample else (1, 1)
    sh, sv = sampling
    mcu_w, mcu_h = 8 * sh, 8 * sv
    pw = (w + mcu_w - 1) // mcu_w * mcu_w
    ph = (h + mcu_h - 1) // mcu_h * mcu_h

    def pad(p):
        return np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")

    y, cb, cr = pad(y), pad(cb), pad(cr)
    if subsample:
        cb = cb.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        cr = cr.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))

    out = bytearray(b"\xff\xd8")  # SOI

    def seg(marker, payload):
        out.extend(bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload)

    for tq, q in ((0, ql), (1, qc)):
        seg(0xDB, bytes([tq]) + bytes(q.flatten()[ZIGZAG].astype(np.uint8)))
    comps = bytes()
    for cid, samp, tq in ((1, (sh << 4) | sv, 0), (2, 0x11, 1), (3, 0x11, 1)):
        comps += bytes([cid, samp, tq])
    seg(0xC0, bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([3]) + comps)
    for tc, th, (bits, vals) in (
        (0, 0, STD_DC_LUMA), (1, 0, STD_AC_LUMA),
        (0, 1, STD_DC_CHROMA), (1, 1, STD_AC_CHROMA),
    ):
        seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))
    seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))

    dc0, ac0 = _build_encode(*STD_DC_LUMA), _build_encode(*STD_AC_LUMA)
    dc1, ac1 = _build_encode(*STD_DC_CHROMA), _build_encode(*STD_AC_CHROMA)
    writer = _BitWriter()
    pred = [0, 0, 0]
    for my in range(ph // mcu_h):
        for mx in range(pw // mcu_w):
            for by in range(sv):
                for bx in range(sh):
                    y0, x0 = (my * sv + by) * 8, (mx * sh + bx) * 8
                    _encode_block(
                        writer, y[y0 : y0 + 8, x0 : x0 + 8] - 128.0, ql,
                        dc0, ac0, pred, 0,
                    )
            cy0, cx0 = my * 8, mx * 8
            _encode_block(
                writer, cb[cy0 : cy0 + 8, cx0 : cx0 + 8] - 128.0, qc,
                dc1, ac1, pred, 1,
            )
            _encode_block(
                writer, cr[cy0 : cy0 + 8, cx0 : cx0 + 8] - 128.0, qc,
                dc1, ac1, pred, 2,
            )
    writer.flush()
    out.extend(writer.out)
    out.extend(b"\xff\xd9")
    return bytes(out)
