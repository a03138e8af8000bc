"""Multimodal columns for training-data pipelines: image/audio/video as
opaque ``binary`` columns + typed metadata, with decode / feature-extract /
resize / frame-sample as Arrow-batched ``mapInPandas`` stages.

The decode kernels are REAL for the formats the stdlib + numpy can carry:
PPM-P6 / BMP-24 / PNG (zlib IDAT, all five scanline filters,
gray/alpha/palette normalization) / GIF (LZW, interlace, local color
tables — first frame) / baseline JPEG (huffman + IDCT + 4:2:0,
operators/jpeg.py) images, WAV-PCM audio, and YUV4MPEG2 video frame
sampling. Only progressive JPEG and compressed audio/video still route
to deterministic fakes clearly marked for replacement (swap
``_decode_image_stub`` → Pillow, ``_sample_frames_stub`` → pyav). The
Spark-side contract — schemas, batch iteration, partitioning, output
shapes — is identical either way.

Scale: every stage is map-side (no shuffle); binary payloads stay in Arrow
record batches end-to-end; `spark.sql.execution.arrow.maxRecordsPerBatch`
and `maxPartitionBytes` bound per-task memory against large blobs. Partition
by (modality, shard) at write so downstream stages prune by modality.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, modality string, content binary, media_type string, "
    "width int, height int, duration_ms long"
)

IMAGE_FEATURES_SCHEMA = (
    "media_id long, width int, height int, n_channels int, "
    "mean_luma double, phash string, decode_error string"
)

FRAME_SAMPLE_SCHEMA = "media_id long, frame_index int, ts_ms long, frame binary"

RESIZE_SCHEMA = "media_id long, width int, height int, content binary"


def _stable_u32(blob: bytes, salt: str) -> int:
    return int(hashlib.sha256(salt.encode() + blob).hexdigest()[:8], 16)


def synthesize_media(docs: DataFrame, modality: str = "image") -> DataFrame:
    """Deterministic fake media table from the documents corpus (no media in
    the driver's testdata): content = utf-8 text bytes, metadata derived by
    hash — stable inputs for exercising the pipeline plumbing."""
    blob = F.encode(F.col("text"), "UTF-8")
    h = F.conv(F.substring(F.sha2(F.col("text"), 256), 1, 8), 16, 10).cast("bigint")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(modality).alias("modality"),
        blob.alias("content"),
        F.lit(f"{modality}/x-stub").alias("media_type"),
        (h % 1920 + 64).cast("int").alias("width"),
        (h % 1080 + 64).cast("int").alias("height"),
        (h % 600000).alias("duration_ms"),
    )




# ---------------------------------------------------------------------------
# REAL codecs (numpy + stdlib only — no image libraries needed): PPM P6,
# 24-bit BMP, PNG (zlib IDAT + the five scanline filters; 8-bit
# gray / gray+alpha / RGB / RGBA / palette, non-interlaced), and GIF
# (variable-width LSB-first LZW with clear/KwKwK handling, 4-pass
# interlace, local color tables; first frame), and baseline JPEG
# (operators/jpeg.py — huffman, dequant, IDCT, 4:2:0; progressive/SOF2
# returns a labeled unsupported error).
# ---------------------------------------------------------------------------


def decode_image_array(blob: bytes):
    """(H, W, 3) uint8 array for PPM-P6 / PNG / GIF / JPEG / BMP-24 payloads, else
    (None, err). err is None on success, 'UnsupportedFormat' for unknown
    magics, or a parse/unsupported-variant string for payloads of a
    supported format."""
    import numpy as np

    if blob[:2] == b"P6":
        try:
            # header: P6 <ws> width <ws> height <ws> maxval <single ws> data
            parts, i, vals = [], 2, []
            while len(vals) < 3:
                while i < len(blob) and blob[i : i + 1].isspace():
                    i += 1
                if blob[i : i + 1] == b"#":  # comment line
                    while i < len(blob) and blob[i : i + 1] != b"\n":
                        i += 1
                    continue
                j = i
                while j < len(blob) and not blob[j : j + 1].isspace():
                    j += 1
                vals.append(int(blob[i:j]))
                i = j
            i += 1  # the single whitespace after maxval
            w, h, maxval = vals
            if maxval != 255:
                return None, "UnsupportedMaxval"
            need = w * h * 3
            data = np.frombuffer(blob, np.uint8, count=need, offset=i)
            return data.reshape(h, w, 3), None
        except Exception as e:  # corrupt header/short payload
            return None, f"PpmParseError:{type(e).__name__}"
    if blob[:8] == b"\x89PNG\r\n\x1a\n":
        try:
            return _decode_png(blob), None
        except _PngUnsupported as e:
            return None, str(e)
        except Exception as e:
            return None, f"PngParseError:{type(e).__name__}"
    if blob[:3] == b"\xff\xd8\xff":
        try:
            from connapse_spark.operators.jpeg import JpegUnsupported, decode_jpeg

            return decode_jpeg(blob), None
        except JpegUnsupported as e:
            return None, str(e)
        except Exception as e:
            return None, f"JpegParseError:{type(e).__name__}"
    if blob[:6] in (b"GIF87a", b"GIF89a"):
        try:
            return _decode_gif(blob), None
        except _PngUnsupported as e:  # same labeled-unsupported channel
            return None, str(e)
        except Exception as e:
            return None, f"GifParseError:{type(e).__name__}"
    if blob[:2] == b"BM":
        try:
            off = int.from_bytes(blob[10:14], "little")
            w = int.from_bytes(blob[18:22], "little", signed=True)
            h = int.from_bytes(blob[22:26], "little", signed=True)
            bpp = int.from_bytes(blob[28:30], "little")
            if bpp != 24:
                return None, "UnsupportedBitDepth"
            row_bytes = (w * 3 + 3) & ~3  # rows padded to 4 bytes
            rows = []
            for r in range(abs(h)):
                start = off + r * row_bytes
                row = np.frombuffer(blob, np.uint8, count=w * 3, offset=start)
                rows.append(row.reshape(w, 3)[:, ::-1])  # BGR -> RGB
            arr = np.stack(rows)
            if h > 0:
                arr = arr[::-1]  # bottom-up storage
            return arr, None
        except Exception as e:
            return None, f"BmpParseError:{type(e).__name__}"
    return None, "UnsupportedFormat"


class _PngUnsupported(ValueError):
    pass


def _png_unfilter(raw, h: int, w: int, ch: int):
    """Undo the per-scanline filters (PNG spec §9): none/sub/up are
    vectorized (uint8 addition wraps mod 256 natively); average and paeth
    are inherently sequential per pixel, so those rows fall back to a
    per-byte loop."""
    import numpy as np

    stride = w * ch
    out = np.zeros((h, stride), np.uint8)
    pos = 0
    zero_row = np.zeros(stride, np.uint8)
    for y in range(h):
        ft = raw[pos]
        pos += 1
        row = np.frombuffer(raw, np.uint8, count=stride, offset=pos).copy()
        pos += stride
        prev = out[y - 1] if y else zero_row
        if ft == 0:
            out[y] = row
        elif ft == 2:  # up
            out[y] = row + prev
        elif ft == 1:  # sub
            for x in range(ch, stride):
                row[x] = (int(row[x]) + int(row[x - ch])) & 0xFF
            out[y] = row
        elif ft == 3:  # average
            for x in range(stride):
                a = int(row[x - ch]) if x >= ch else 0
                row[x] = (int(row[x]) + ((a + int(prev[x])) >> 1)) & 0xFF
            out[y] = row
        elif ft == 4:  # paeth
            for x in range(stride):
                a = int(row[x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[x] = (int(row[x]) + pr) & 0xFF
            out[y] = row
        else:
            raise ValueError(f"bad filter byte {ft}")
    return out


def _decode_png(blob: bytes):
    """(H, W, 3) uint8 from a PNG: chunk walk, zlib-inflated IDAT,
    unfilter, color-type normalization (alpha dropped, gray replicated,
    palette resolved)."""
    import zlib

    import numpy as np

    i, idat, plte, ihdr = 8, [], None, None
    while i + 8 <= len(blob):
        ln = int.from_bytes(blob[i : i + 4], "big")
        typ = blob[i + 4 : i + 8]
        data = blob[i + 8 : i + 8 + ln]
        i += 12 + ln
        if typ == b"IHDR":
            ihdr = data
        elif typ == b"PLTE":
            plte = data
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    bit_depth, color_type, interlace = ihdr[8], ihdr[9], ihdr[12]
    if bit_depth != 8:
        raise _PngUnsupported("UnsupportedBitDepth")
    if interlace:
        raise _PngUnsupported("UnsupportedInterlace")
    ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
    if ch is None:
        raise _PngUnsupported("UnsupportedColorType")
    raw = zlib.decompress(b"".join(idat))
    px = _png_unfilter(np.frombuffer(raw, np.uint8), h, w, ch).reshape(h, w, ch)
    if color_type == 2:
        return px
    if color_type == 6:
        return np.ascontiguousarray(px[:, :, :3])
    if color_type == 0:
        return np.repeat(px, 3, axis=2)
    if color_type == 4:
        return np.repeat(px[:, :, :1], 3, axis=2)
    pal = np.frombuffer(plte, np.uint8).reshape(-1, 3)
    return pal[px[:, :, 0]]


def _gif_lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> list[int]:
    """GIF-variant LZW (GIF89a spec appendix F): variable code width
    starting at min+1 bits, LSB-first bit packing, CLEAR resets the
    table, the deferred-clear quirk is honored by simply growing until
    reset."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out: list[int] = []

    def fresh_table():
        return {i: [i] for i in range(clear)}

    table = fresh_table()
    next_code = eoi + 1
    width = min_code_size + 1
    acc = bits = 0
    prev: list[int] | None = None
    for byte in data:
        acc |= byte << bits
        bits += 8
        while bits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            bits -= width
            if code == clear:
                table = fresh_table()
                next_code = eoi + 1
                width = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                return out
            if prev is None:
                entry = table[code]
            elif code in table:
                entry = table[code]
                table[next_code] = prev + [entry[0]]
                next_code += 1
            else:  # the KwKwK case
                entry = prev + [prev[0]]
                table[next_code] = entry
                next_code += 1
            out.extend(entry)
            prev = entry
            if next_code == (1 << width) and width < 12:
                width += 1
            if len(out) >= n_pixels:
                return out
    return out


def _decode_gif(blob: bytes):
    """(H, W, 3) uint8 from the FIRST frame of a GIF: logical screen +
    color tables, extension-block skipping, LZW-inflated indices,
    4-pass interlace reorder."""
    import numpy as np

    gct = None
    packed = blob[10]
    i = 13
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(blob, np.uint8, count=n * 3, offset=i).reshape(-1, 3)
        i += n * 3
    while i < len(blob):
        b = blob[i]
        if b == 0x21:  # extension: label + sub-blocks
            i += 2
            while blob[i] != 0:
                i += 1 + blob[i]
            i += 1
        elif b == 0x2C:  # image descriptor
            w = int.from_bytes(blob[i + 5 : i + 7], "little")
            h = int.from_bytes(blob[i + 7 : i + 9], "little")
            ipacked = blob[i + 9]
            i += 10
            table = gct
            if ipacked & 0x80:  # local color table
                n = 2 << (ipacked & 0x07)
                table = np.frombuffer(blob, np.uint8, count=n * 3, offset=i).reshape(-1, 3)
                i += n * 3
            if table is None:
                raise _PngUnsupported("MissingColorTable")
            min_code = blob[i]
            i += 1
            chunks = []
            while blob[i] != 0:
                ln = blob[i]
                chunks.append(blob[i + 1 : i + 1 + ln])
                i += 1 + ln
            idx = _gif_lzw_decode(b"".join(chunks), min_code, w * h)
            if len(idx) < w * h:
                raise ValueError("short pixel stream")
            px = np.array(idx[: w * h], dtype=np.uint16).reshape(h, w)
            if ipacked & 0x40:  # interlaced: rows arrive in 4 passes
                order = (
                    list(range(0, h, 8)) + list(range(4, h, 8))
                    + list(range(2, h, 4)) + list(range(1, h, 2))
                )
                de = np.empty_like(px)
                de[order] = px
                px = de
            return table[np.minimum(px, len(table) - 1)].astype(np.uint8)
        elif b == 0x3B:  # trailer
            break
        else:
            i += 1
    raise ValueError("no image descriptor")


def encode_png(arr) -> bytes:
    """(H, W, 3) uint8 -> PNG bytes (filter-0 scanlines, one IDAT) — the
    stdlib-only re-encode twin of encode_ppm, also the fixture generator
    for the decoder tests."""
    import zlib

    import numpy as np

    h, w = arr.shape[:2]

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            len(data).to_bytes(4, "big") + typ + data
            + zlib.crc32(typ + data).to_bytes(4, "big")
        )

    ihdr = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + bytes([8, 2, 0, 0, 0])  # 8-bit RGB, deflate, adaptive, no interlace
    )
    raw = b"".join(b"\x00" + arr[y].astype(np.uint8).tobytes() for y in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 9))
        + chunk(b"IEND", b"")
    )


def encode_ppm(arr) -> bytes:
    """(H, W, 3) uint8 -> PPM P6 bytes — the stdlib-only re-encode for the
    real resize path."""
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def _gray_ahash(luma) -> str:
    """64-bit average hash of a 2D luma plane: 8x8 block-mean downsample,
    threshold at its mean, bits packed row-major to hex. Planes narrower
    than 8 px are pixel-repeated up to 8 first — without it the empty
    block slices go NaN and every tiny image hashes to the constant 0x0
    (r8 review). Zero-variance (flat) images still all hash 0x0 — that
    is inherent to the hash family, not a defect: screen by dims or
    variance upstream if icon floods matter."""
    import numpy as np

    h, w = luma.shape
    if h < 8 or w < 8:
        luma = np.repeat(
            np.repeat(luma, -(-8 // max(h, 1)), axis=0), -(-8 // max(w, 1)), axis=1
        )
        h, w = luma.shape
    ys = (np.arange(8) * h) // 8
    xs = (np.arange(8) * w) // 8
    ye = np.append(ys[1:], h)
    xe = np.append(xs[1:], w)
    small = np.array(
        [[luma[ys[i]:ye[i], xs[j]:xe[j]].mean() for j in range(8)] for i in range(8)]
    )
    bits = (small > small.mean()).flatten()
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return f"{v:016x}"


def _average_hash(arr) -> str:
    """Real 64-bit average hash of an RGB array (luma via BT.601 weights,
    then :func:`_gray_ahash`)."""
    return _gray_ahash(
        0.299 * arr[:, :, 0] + 0.587 * arr[:, :, 1] + 0.114 * arr[:, :, 2]
    )


def extract_image_features(media: DataFrame) -> DataFrame:
    """Decode + feature-extract via mapInPandas. REAL decode for PPM-P6,
    BMP-24, PNG, GIF, and baseline JPEG (decode_image_array — numpy +
    stdlib zlib, no codec libs): true dims, mean luma, and a real 8x8
    average-hash. Unknown magics AND labeled unsupported variants of
    supported formats (progressive JPEG, interlaced/16-bit PNG, …) route
    to the deterministic stub — fake-but-stable dims so downstream
    classification keeps working; BOTH keep their Unsupported* label in
    decode_error (r8: unknown magics too, so perceptual consumers can
    filter the stub tier out on decode_error IS NULL). Corrupt payloads
    of a supported format get zero dims + the parse error. Same output
    schema in every tier."""

    def _decode_image_stub(blob: bytes) -> tuple[int, int, int, float, str, str | None]:
        if not blob:
            return 0, 0, 0, 0.0, "", "EmptyPayload"
        w = _stable_u32(blob, "w") % 1920 + 64
        h = _stable_u32(blob, "h") % 1080 + 64
        luma = (_stable_u32(blob, "l") % 256) / 255.0
        phash = hashlib.sha256(b"phash" + blob).hexdigest()[:16]
        return w, h, 3, luma, phash, None

    def _decode(blob: bytes):
        arr, err = decode_image_array(blob) if blob else (None, "EmptyPayload")
        if arr is not None:
            h, w = arr.shape[:2]
            luma = float(
                (0.299 * arr[:, :, 0] + 0.587 * arr[:, :, 1] + 0.114 * arr[:, :, 2]).mean()
                / 255.0
            )
            return w, h, 3, luma, _average_hash(arr), None
        if err == "UnsupportedFormat":
            # unknown magic: stub tier — label KEPT (r8) so consumers that
            # must not see fake features (image_neardup_pairs' perceptual
            # join) can filter on decode_error IS NULL
            stub = _decode_image_stub(blob)
            return (*stub[:5], err)
        if err and err.startswith("Unsupported"):
            # labeled variant of a supported format (progressive JPEG,
            # interlaced/16-bit PNG, …): stub features, label kept so
            # the row is both classifiable and diagnosable
            stub = _decode_image_stub(blob)
            return (*stub[:5], err)
        return 0, 0, 0, 0.0, "", err  # corrupt payload: parse error row

    def _extract(batches):
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                w, h, c, luma, phash, err = _decode(bytes(blob or b""))
                rows.append((mid, w, h, c, luma, phash, err))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height", "n_channels",
                    "mean_luma", "phash", "decode_error",
                ],
            )

    return media.select("media_id", "content").mapInPandas(_extract, IMAGE_FEATURES_SCHEMA)


import functools


@functools.lru_cache(maxsize=4)
def _dct_matrix(n: int):
    """Orthonormal DCT-II basis matrix (float64, explicit construction —
    no scipy). Cached: the basis is a constant, and the hot mapInPandas
    path hashes one image per call (r8 review)."""
    import math

    import numpy as np

    C = np.zeros((n, n))
    for u in range(n):
        for x in range(n):
            C[u, x] = math.sqrt((1 if u == 0 else 2) / n) * math.cos(
                math.pi * (2 * x + 1) * u / (2 * n)
            )
    return C


def _perceptual_hash_dct(arr) -> str:
    """64-bit DCT pHash: luma → 16×16 block means → orthonormal 2D
    DCT-II → the 8×8 low-frequency block with the DC slot replaced by
    coefficient (8,8) (DC always clears the median, wasting a bit) →
    bits = coef > lower median (sorted index 31 — integer-indexed, no
    midpoint average to drift). Robust to the global-brightness and
    local-noise edits aHash is blind to; the two hashes are independent
    tiers over the same banded-Hamming kernel."""
    import numpy as np

    luma = 0.299 * arr[:, :, 0] + 0.587 * arr[:, :, 1] + 0.114 * arr[:, :, 2]
    h, w = luma.shape
    n = 16
    if h < n or w < n:
        # pixel-repeat tiny images up to the block grid — empty block
        # slices would go NaN and hash every small image to 0x0 (r8
        # review: favicons/tracking pixels false-pairing at Hamming 0)
        luma = np.repeat(
            np.repeat(luma, -(-n // max(h, 1)), axis=0), -(-n // max(w, 1)), axis=1
        )
        h, w = luma.shape
    ys = (np.arange(n) * h) // n
    xs = (np.arange(n) * w) // n
    ye = np.append(ys[1:], h)
    xe = np.append(xs[1:], w)
    small = np.array(
        [[luma[ys[i]:ye[i], xs[j]:xe[j]].mean() for j in range(n)] for i in range(n)]
    )
    C = _dct_matrix(n)
    D = C @ small @ C.T
    coefs = D[:8, :8].flatten().copy()
    coefs[0] = D[8, 8]
    med = np.sort(coefs, kind="stable")[31]
    v = 0
    for b in coefs > med:
        v = (v << 1) | int(b)
    return f"{v:016x}"


IMAGE_PHASH_SCHEMA = "media_id long, phash string, decode_error string"


def image_phash_dct(media: DataFrame) -> DataFrame:
    """DCT pHash per image (r8): real decode → :func:`_perceptual_hash_dct`;
    stub-tier rows (unknown magic / Unsupported* variants) keep their
    label and an EMPTY phash — a fake hash must never enter a perceptual
    join. Map-side Arrow pass, same plumbing as extract_image_features."""

    def _extract(batches):
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                arr, err = (
                    decode_image_array(bytes(blob)) if blob else (None, "EmptyPayload")
                )
                if arr is not None:
                    rows.append((mid, _perceptual_hash_dct(arr), None))
                else:
                    rows.append((mid, "", err))
            yield pd.DataFrame(rows, columns=["media_id", "phash", "decode_error"])

    return media.select("media_id", "content").mapInPandas(_extract, IMAGE_PHASH_SCHEMA)


def image_neardup_pairs(
    media: DataFrame,
    max_hamming: int = 6,
    id_col: str = "media_id",
    method: str = "ahash",
) -> DataFrame:
    """Perceptual near-duplicate image pairs (r8 — the multimodal twin of
    ``dedup.simhash_neardup_pairs``, closing the image half of the dedup
    story): decode → real 64-bit perceptual hash (``method="ahash"`` =
    block-mean average hash via :func:`extract_image_features`;
    ``"phash"`` = the DCT tier via :func:`image_phash_dct`, robust to
    brightness/noise edits at wider Hamming spreads — pick max_hamming
    per tier, e.g. 6 for ahash, 14 for phash) → banded Hamming candidate
    join →
    XOR/bit_count verify (``dedup.hash_neardup_pairs``). Only REAL
    decodes band: rows whose decode errored (empty phash) AND the stub
    tier (unknown magics / Unsupported* variants, whose phash is a
    sha256-derived fake — classifiable but NOT perceptual, so pairing on
    it would be noise) drop first — the `decode_error IS NULL` filter is
    exactly the real-codec tier since r8 labels the unknown-magic stub
    rows. The decode is the expensive half, so the fingerprint frame
    persists; past it the plan is integer-only — at 100 TB the pair
    search never touches pixels again, exactly the simhash discipline.
    Output: (id_a, id_b, hamming).
    """
    from connapse_spark.operators.dedup import hash_neardup_pairs, scoped_fp_pairs

    if method == "phash":
        feats = image_phash_dct(media).filter(
            F.col("decode_error").isNull() & (F.col("phash") != "")
        )
    elif method == "ahash":
        feats = extract_image_features(media).filter(
            F.col("decode_error").isNull() & (F.col("phash") != "")
        )
    else:
        raise ValueError(f"unknown method {method!r} (ahash or phash)")
    hi = F.conv(F.substring("phash", 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring("phash", 9, 8), 16, 10).cast("long")
    fp = feats.select(
        F.col(id_col), F.shiftleft(hi, 32).bitwiseOR(lo).alias("ahash")
    )
    # scoped persist (ADVICE r8): decode cache released once pairs materialize
    return scoped_fp_pairs(
        fp,
        lambda f: hash_neardup_pairs(
            f, "ahash", bits=64, max_hamming=max_hamming, id_col=id_col
        ),
    )


def fixture_near_dup_images(n_base: int = 10, n_variant: int = 6) -> list[tuple[int, bytes]]:
    """Deterministic PNG corpus with PLANTED near-duplicates for the
    image_neardup oracle: each base ``i`` is an 8×8 grid of clearly
    dark/bright 4×4 blocks (so every aHash bit is decided by its own
    block, far from the mean), variant ``100 + j`` copies base ``j`` with
    exactly ``j+1`` blocks flipped to the other side — aHash Hamming
    distance exactly j+1 — and distinct bases differ in ~32 bits, far
    past any sane threshold. Ids are ints (the media table's key type)."""
    import numpy as np

    rng = np.random.default_rng(7)
    out, bases = [], []

    def _png(blocks) -> bytes:
        arr = np.kron(blocks, np.ones((4, 4))).astype(np.uint8)
        return encode_png(np.stack([arr, arr, arr], axis=-1))

    for i in range(n_base):
        blocks = rng.choice(np.array([40, 215]), size=(8, 8))
        bases.append(blocks)
        out.append((i, _png(blocks)))
    for j in range(n_variant):
        blocks = bases[j % n_base].copy()
        for k in range(j + 1):  # flip exactly j+1 distinct blocks
            y, x = divmod((5 * k + 3) % 64, 8)
            blocks[y, x] = 40 if blocks[y, x] == 215 else 215
        out.append((100 + j, _png(blocks)))
    return out


def resize_images(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize stage (PNG inputs decode real and re-encode PPM too).
    REAL nearest-neighbor resize + PPM re-encode for
    decodable payloads (numpy index slicing — the thumbnail kernel);
    the size-proportional stub remains for compressed formats."""

    def _resize(batches):
        import numpy as np

        for pdf in batches:
            rows = []
            for mid, w, h, blob in zip(
                pdf["media_id"], pdf["width"], pdf["height"], pdf["content"]
            ):
                blob = bytes(blob or b"")
                arr, _err = decode_image_array(blob) if blob else (None, "EmptyPayload")
                if arr is not None:
                    ah, aw = arr.shape[:2]
                    scale = min(1.0, max_side / max(1, max(aw, ah)))
                    nw, nh = max(1, int(aw * scale)), max(1, int(ah * scale))
                    yi = (np.arange(nh) * ah) // nh
                    xi = (np.arange(nw) * aw) // nw
                    rows.append((mid, nw, nh, encode_ppm(arr[yi][:, xi])))
                    continue
                scale = min(1.0, max_side / max(1, max(w, h)))
                nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
                keep = max(1, int(len(blob) * (nw * nh) / max(1, w * h)))
                rows.append((mid, nw, nh, blob[:keep]))
            yield pd.DataFrame(rows, columns=["media_id", "width", "height", "content"])

    return media.select("media_id", "width", "height", "content").mapInPandas(
        _resize, RESIZE_SCHEMA
    )


def parse_y4m(blob: bytes):
    """(frames, fps, err) for an uncompressed YUV4MPEG2 stream (4:2:0) —
    thin wrapper over :func:`parse_y4m_full` for callers that don't need
    the dimensions."""
    frames, fps, _w, _h, err = parse_y4m_full(blob)
    return frames, fps, err


def parse_y4m_full(blob: bytes):
    """(frames, fps, width, height, err) for an uncompressed YUV4MPEG2
    stream (4:2:0): raw YUV frame payloads plus the header frame rate and
    dimensions. (None, 0.0, 0, 0, err) otherwise — the pyav slot for
    compressed containers."""
    if not blob.startswith(b"YUV4MPEG2"):
        return None, 0.0, 0, 0, "UnsupportedFormat"
    try:
        nl = blob.index(b"\n")
        header = blob[:nl].decode("ascii", "replace").split(" ")
        w = h = 0
        num, den = 30, 1
        for tok in header[1:]:
            if tok.startswith("W"):
                w = int(tok[1:])
            elif tok.startswith("H"):
                h = int(tok[1:])
            elif tok.startswith("F"):
                num, den = (int(x) for x in tok[1:].split(":"))
        if w <= 0 or h <= 0:
            # a dimensionless stream would emit zero-byte "frames" that
            # every consumer downstream hashes identically (r8 review)
            return None, 0.0, 0, 0, "Y4mParseError:BadDimensions"
        frame_bytes = w * h * 3 // 2  # 4:2:0
        frames, i = [], nl + 1
        while i < len(blob):
            if not blob[i:].startswith(b"FRAME"):
                return None, 0.0, 0, 0, "Y4mParseError:BadFrameMarker"
            j = blob.index(b"\n", i)
            if len(blob) - (j + 1) < frame_bytes:
                break  # truncated final frame: keep the good prefix
            frames.append(blob[j + 1 : j + 1 + frame_bytes])
            i = j + 1 + frame_bytes
        return frames, num / den, w, h, None
    except Exception as e:
        return None, 0.0, 0, 0, f"Y4mParseError:{type(e).__name__}"


def _sample_instants(
    n_frames: int, fps: float, every_ms: int, max_frames: int
) -> list[tuple[int, int, int]]:
    """The sampling-instant selection shared by :func:`sample_frames` and
    :func:`video_frame_hashes` (one copy — the two MUST agree on which
    frames downstream models see vs which frames the dedup hashes):
    ``(sample_index, ts_ms, frame_index)`` per instant, instants strictly
    inside [0, total) since the stream has no frame AT its end
    timestamp."""
    total_ms = n_frames * 1000 / fps
    n = min(max_frames, max(1, -(-int(total_ms) // every_ms)))
    return [
        (i, i * every_ms, min(n_frames - 1, int(i * every_ms * fps / 1000)))
        for i in range(n)
    ]


def sample_frames(media: DataFrame, every_ms: int = 1000, max_frames: int = 8) -> DataFrame:
    """Frame sampling for video rows. REAL tier for uncompressed YUV4MPEG2
    (parse_y4m — stdlib only): frames at the true timestamps nearest each
    sampling instant, raw YUV payloads out. Compressed containers use the
    labeled size-proportional stub until pyav lands. Output: one row per
    sampled frame — the explode shape downstream vision models consume."""

    def _sample(batches):
        for pdf in batches:
            rows = []
            for mid, dur, blob in zip(pdf["media_id"], pdf["duration_ms"], pdf["content"]):
                blob = bytes(blob or b"")
                frames, fps, err = parse_y4m(blob) if blob else (None, 0.0, "EmptyPayload")
                if frames is not None and fps > 0 and frames:
                    for i, ts, fi in _sample_instants(
                        len(frames), fps, every_ms, max_frames
                    ):
                        rows.append((mid, i, ts, frames[fi]))
                    continue
                n = min(max_frames, max(1, int(dur) // every_ms + 1))
                step = max(1, len(blob) // n)
                for i in range(n):
                    rows.append((mid, i, i * every_ms, blob[i * step : (i + 1) * step]))
            yield pd.DataFrame(rows, columns=["media_id", "frame_index", "ts_ms", "frame"])

    return media.select("media_id", "duration_ms", "content").mapInPandas(
        _sample, FRAME_SAMPLE_SCHEMA
    )


def media_stats(media: DataFrame) -> DataFrame:
    """Modality-level aggregate (bytes, dims) — the browse/stats query over a
    media lake; pure relational, oracle-checkable."""
    return (
        media.groupBy("modality", "media_type")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.length("content")).alias("total_bytes"),
            F.avg("width").alias("avg_width"),
            F.avg("height").alias("avg_height"),
        )
        .orderBy("modality", "media_type")
    )


# ---------------------------------------------------------------------------
# REAL audio features: RIFF/WAV PCM via the stdlib ``wave`` module — the
# audio twin of the PPM/BMP image tier (no external codec libraries).
# ---------------------------------------------------------------------------

AUDIO_FEATURES_SCHEMA = (
    "media_id long, sample_rate int, n_channels int, n_frames long, "
    "duration_ms long, rms double, zero_cross_rate double, decode_error string"
)


def decode_wav_array(blob: bytes):
    """(mono float32 array in [-1,1], sample_rate) for 16-bit PCM WAV,
    else (None, 0, err)."""
    import io
    import wave

    import numpy as np

    try:
        with wave.open(io.BytesIO(blob)) as w:
            if w.getsampwidth() != 2:
                return None, 0, "UnsupportedSampleWidth"
            n = w.getnframes()
            raw = np.frombuffer(w.readframes(n), np.int16)
            ch = w.getnchannels()
            mono = raw.reshape(-1, ch).mean(axis=1) / 32768.0
            return mono, w.getframerate(), None
    except wave.Error:
        return None, 0, "UnsupportedFormat"
    except Exception as e:
        return None, 0, f"WavParseError:{type(e).__name__}"


def encode_wav(mono, sample_rate: int) -> bytes:
    """float array in [-1,1] → 16-bit PCM mono WAV bytes (test fixture +
    re-encode path)."""
    import io
    import wave

    import numpy as np

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes((np.clip(mono, -1, 1) * 32767).astype(np.int16).tobytes())
    return buf.getvalue()


def audio_fingerprint(mono) -> str:
    """64-bit energy-delta audio fingerprint (Haitsma-Kalker 2002's bit
    derivation simplified to the time domain, integer-exact — no FFT, no
    float drift): the mono stream splits into 65 equal windows; window
    energy = Σ|round(s·2¹⁶)| — samples re-quantize to integer 2⁻¹⁶ units
    FIRST (identity for mono/stereo sources, where decode_wav_array's
    channel mean is already exact; load-bearing for ≥3 channels, whose
    /3 mean is not representable — r8 review), so the sum is EXACT in
    any summation order below 2³⁸ samples and the hash is a pure
    function of the PCM bytes; bit w = E[w+1] > E[w]. Captures the
    clip's energy envelope shape — robust to global gain (monotone
    transforms preserve all deltas), blind to pitch (use a spectral tier
    when that matters).

    Degeneracy caveat (the :func:`_gray_ahash` flat-image twin): any clip
    whose energy envelope is FLAT across the 65 windows — digital
    silence, constant tones, zero-length decodes — hashes to the same
    constant 0x0 (no delta is ever >), so such clips would all pair at
    Hamming 0. :func:`audio_neardup_pairs` drops all-zero fingerprints
    for exactly this reason; screen by RMS/duration upstream
    (:func:`extract_audio_features`) if silence floods matter."""
    import numpy as np

    n = len(mono)
    W = 65
    bounds = [(w * n) // W for w in range(W + 1)]
    q = np.abs(np.round(np.asarray(mono) * 65536.0))
    E = [int(q[bounds[w]:bounds[w + 1]].sum()) for w in range(W)]
    v = 0
    for w in range(64):
        v = (v << 1) | (1 if E[w + 1] > E[w] else 0)
    return f"{v:016x}"


AUDIO_FP_SCHEMA = "media_id long, afp string, decode_error string"


def audio_fingerprints(media: DataFrame) -> DataFrame:
    """Per-clip fingerprints via the same map-side Arrow plumbing as the
    image extractors; undecodable rows keep their label and an empty
    fingerprint (never a fake one)."""

    def _extract(batches):
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                mono, _sr, err = (
                    decode_wav_array(bytes(blob)) if blob else (None, 0, "EmptyPayload")
                )
                if mono is not None:
                    rows.append((mid, audio_fingerprint(mono), None))
                else:
                    rows.append((mid, "", err))
            yield pd.DataFrame(rows, columns=["media_id", "afp", "decode_error"])

    return media.select("media_id", "content").mapInPandas(_extract, AUDIO_FP_SCHEMA)


def audio_neardup_pairs(
    media: DataFrame, max_hamming: int = 5, id_col: str = "media_id"
) -> DataFrame:
    """Near-duplicate audio pairs: decode → energy-delta fingerprint →
    the shared banded-Hamming kernel (``dedup.hash_neardup_pairs``) —
    the audio leg of the multimodal dedup story, same discipline as
    :func:`image_neardup_pairs` (samples touched once, the pair search
    integer-only). All-zero fingerprints drop alongside empty ones
    (ADVICE r8): every flat-envelope clip — digital silence, constant
    tones — hashes to the constant 0x0 and would otherwise false-pair
    the whole silence tier at Hamming 0."""
    from connapse_spark.operators.dedup import hash_neardup_pairs, scoped_fp_pairs

    feats = audio_fingerprints(media).filter(
        F.col("decode_error").isNull()
        & (F.col("afp") != "")
        & (F.col("afp") != "0" * 16)
    )
    hi = F.conv(F.substring("afp", 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring("afp", 9, 8), 16, 10).cast("long")
    fp = feats.select(
        F.col(id_col), F.shiftleft(hi, 32).bitwiseOR(lo).alias("afp")
    )
    return scoped_fp_pairs(
        fp,
        lambda f: hash_neardup_pairs(
            f, "afp", bits=64, max_hamming=max_hamming, id_col=id_col
        ),
    )


def fixture_near_dup_audio(n_base: int = 8, n_variant: int = 5) -> list[tuple[int, bytes]]:
    """Deterministic WAV corpus with planted near-duplicates: each base
    is a 440 Hz tone whose per-window amplitude follows a seeded
    loud/quiet pattern over the fingerprint's 65 windows; variant
    ``100 + j`` flips ``j + 1`` windows of base ``j`` to the other
    level — each flipped window perturbs at most its two adjacent
    energy-delta bits, so variants land within Hamming ``2(j+1)`` while
    distinct bases differ in ~32 bits."""
    import math

    import numpy as np

    rng = np.random.default_rng(11)
    sr, spw = 8000, 64  # samples per window; 65 windows per clip
    t = np.arange(65 * spw) / sr
    tone = np.sin(2 * math.pi * 440.0 * t)
    out, bases = [], []

    def _wav(levels) -> bytes:
        amp = np.repeat(levels, spw)
        return encode_wav(tone * amp, sr)

    for i in range(n_base):
        levels = rng.choice(np.array([0.1, 0.8]), size=65)
        bases.append(levels)
        out.append((i, _wav(levels)))
    for j in range(n_variant):
        levels = bases[j % n_base].copy()
        for k in range(j + 1):
            w = (7 * k + 3) % 65
            # cross BOTH base levels so the edit provably reorders the
            # window against its neighbors (a same-family flip can leave
            # every adjacent comparison's sign intact — measured)
            levels[w] = 0.02 if levels[w] == 0.8 else 0.95
        out.append((100 + j, _wav(levels)))
    return out


VIDEO_FP_SCHEMA = "media_id long, frame_index int, fhash string, decode_error string"


def video_frame_hashes(
    media: DataFrame, every_ms: int = 1000, max_frames: int = 8
) -> DataFrame:
    """Per-sampled-frame perceptual hashes for video rows (r8 — the video
    leg of the multimodal dedup story): Y4M streams sample frames at the
    same instants as :func:`sample_frames`' real tier and hash each
    frame's Y plane with the 8×8 average hash (the Y plane IS the luma —
    no color conversion). Non-Y4M/corrupt rows keep their label and NO
    hash rows — a stub hash must never enter a perceptual join. One
    labeled row with frame_index −1 preserves the error for audits."""
    import numpy as np

    def _extract(batches):
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                blob = bytes(blob or b"")
                frames, fps, w, h, err = (
                    parse_y4m_full(blob) if blob else (None, 0.0, 0, 0, "EmptyPayload")
                )
                if frames is None or fps <= 0 or not frames:
                    rows.append((mid, -1, "", err or "EmptyStream"))
                    continue
                for i, _ts, fi in _sample_instants(
                    len(frames), fps, every_ms, max_frames
                ):
                    y = (
                        np.frombuffer(frames[fi][: w * h], np.uint8)
                        .astype(np.float64)
                        .reshape(h, w)
                    )
                    rows.append((mid, i, _gray_ahash(y), None))
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_index", "fhash", "decode_error"]
            )

    return media.select("media_id", "content").mapInPandas(_extract, VIDEO_FP_SCHEMA)


def video_neardup_pairs(
    media: DataFrame,
    max_hamming: int = 6,
    min_matching_frames: int = 2,
    every_ms: int = 1000,
    max_frames: int = 8,
    id_col: str = "media_id",
) -> DataFrame:
    """Near-duplicate video pairs: frame-sampled Y-plane hashes → the
    banded Hamming kernel ALIGNED on frame position (two clips' hashes
    only compare at the same sampled instant — ``match_cols``) → clips
    pair when ≥ ``min_matching_frames`` sampled positions match within
    ``max_hamming``. A re-encoded/slightly-edited copy matches on most
    positions; unrelated clips virtually never align twice. Decode
    touched once; the pair search is integer-only; the final aggregate
    is one (id_a, id_b)-keyed shuffle bounded by the candidate pairs.
    Output: (id_a, id_b, n_matching)."""
    from connapse_spark.operators.dedup import hash_neardup_pairs, scoped_fp_pairs

    feats = video_frame_hashes(media, every_ms, max_frames).filter(
        F.col("decode_error").isNull() & (F.col("fhash") != "")
    )
    hi = F.conv(F.substring("fhash", 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring("fhash", 9, 8), 16, 10).cast("long")
    fp = feats.select(
        F.col(id_col), "frame_index", F.shiftleft(hi, 32).bitwiseOR(lo).alias("fh")
    )
    frame_pairs = scoped_fp_pairs(
        fp,
        lambda f: hash_neardup_pairs(
            f, "fh", bits=64, max_hamming=max_hamming, id_col=id_col,
            match_cols=["frame_index"],
        ),
    )
    return (
        frame_pairs.groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_matching"))
        .filter(F.col("n_matching") >= min_matching_frames)
        .orderBy("id_a", "id_b")
    )


def fixture_near_dup_videos(n_base: int = 6, n_variant: int = 4) -> list[tuple[int, bytes]]:
    """Deterministic Y4M corpus with planted near-duplicates: 32×32
    clips, 6 frames at 1 fps, each frame an 8×8 grid of dark/bright 4×4
    blocks (every Y-plane aHash bit decided by its own block); variant
    ``100 + j`` copies base ``j`` and REPLACES ``j + 1`` frames with
    fresh random patterns — the remaining ``5 − j`` aligned frames match
    at Hamming 0 while replaced positions differ in ~32 bits."""
    import numpy as np

    rng = np.random.default_rng(13)
    w = h = 32

    def _frame(blocks):
        y = np.kron(blocks, np.ones((4, 4))).astype(np.uint8).tobytes()
        uv = bytes(w * h // 2)  # flat chroma, 4:2:0
        return b"FRAME\n" + y + uv

    def _clip(frames) -> bytes:
        head = f"YUV4MPEG2 W{w} H{h} F1:1 Ip A1:1 C420\n".encode()
        return head + b"".join(_frame(b) for b in frames)

    def _blocks():
        return rng.choice(np.array([40, 215]), size=(8, 8))

    out, bases = [], []
    for i in range(n_base):
        frames = [_blocks() for _ in range(6)]
        bases.append(frames)
        out.append((i, _clip(frames)))
    for j in range(n_variant):
        frames = [b.copy() for b in bases[j % n_base]]
        for k in range(j + 1):
            frames[(2 * k + 1) % 6] = _blocks()  # replace j+1 frames
        out.append((100 + j, _clip(frames)))
    return out


def extract_audio_features(media: DataFrame) -> DataFrame:
    """Real WAV decode + the standard cheap audio-quality features a
    speech-corpus pipeline filters on: duration, RMS energy (silence /
    clipping screens), zero-crossing rate (speech-vs-noise heuristic).
    Non-WAV payloads report UnsupportedFormat (the Pillow-style slot for
    pyav/soundfile when installable) — schema stays fixed."""
    import numpy as np

    def _extract(batches):
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                blob = bytes(blob or b"")
                mono, sr, err = decode_wav_array(blob) if blob else (None, 0, "EmptyPayload")
                if mono is None or sr <= 0 or len(mono) == 0:
                    rows.append((mid, 0, 0, 0, 0, 0.0, 0.0, err or "EmptyAudio"))
                    continue
                rms = float(np.sqrt((mono * mono).mean()))
                zc = float((np.signbit(mono[1:]) != np.signbit(mono[:-1])).mean())
                rows.append(
                    (mid, sr, 1, len(mono), int(len(mono) * 1000 / sr), rms, zc, None)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "sample_rate", "n_channels", "n_frames",
                    "duration_ms", "rms", "zero_cross_rate", "decode_error",
                ],
            )

    return media.select("media_id", "content").mapInPandas(
        _extract, AUDIO_FEATURES_SCHEMA
    )
