"""Multimodal column plumbing: opaque binary payloads with typed metadata,
decoded/feature-extracted via Arrow-batched ``mapInPandas``.

The decode step is REAL for images: ``decode_image_batch`` uses Pillow
when the deployment image carries it, and otherwise falls back to a
pure-stdlib PNG decoder (zlib inflate + all five scanline filters;
8-bit gray/RGB/RGBA, non-interlaced) that decodes the checked-in test
fixtures byte-for-byte.  Non-PNG formats without Pillow raise the
declared NotImplementedError.  The deterministic fake decoder remains
the ORACLE basis for the synthetic text-byte corpus (whose payloads are
not images); both paths run through the identical Arrow ``mapInPandas``
plan — schema, partitioning, UDF signature, batch shape."""

from __future__ import annotations

import functools as _functools
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..session import tracked_persist
from ..sources.tables import load_table
from .dedup import first_agreeing_band


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Attach an opaque binary column + typed metadata struct, the storage
    model for image/audio/video payloads (binary blob + mime/size)."""
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.length(payload).cast("long").alias("n_bytes"),
            F.lit("utf-8").alias("source_encoding"),
        ).alias("media_meta"),
    )


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata projection over the binary column (byte sizes per doc) —
    runs without ever deserializing the payload in Python."""
    docs = load_table(spark, sf_dir, "documents")
    bin_df = with_binary_payload(docs)
    return bin_df.select(
        "doc_id",
        F.col("media_meta.mime").alias("mime"),
        F.col("media_meta.n_bytes").alias("n_bytes"),
    )


MULTIMODAL_META_SQL = """
SELECT doc_id,
       'application/octet-stream' AS mime,
       octet_length(encode(text)) AS n_bytes
FROM documents
"""


FEATURE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("n_bytes", LongType()),
    StructField("head_hex", StringType()),
    StructField("features", ArrayType(FloatType())),
    # byte_mean ALSO as float64: the float32 features array is the
    # realistic embedding payload, but the oracle-checked scalar must not
    # round-trip through float32
    StructField("byte_mean", DoubleType()),
])


try:  # Pillow when the deployment image carries it (detected at import)
    from PIL import Image as _PILImage  # type: ignore
except ImportError:  # this container: stdlib PNG path below
    _PILImage = None

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_unfilter_scanline(ftype, line, prev, bpp):
    """Reverse one PNG scanline filter in place (spec §9: None/Sub/Up/
    Average/Paeth).  Left-dependent filters are inherently sequential
    per scanline — fine: scanlines are short and rows parallelize across
    the Arrow batch / executors, not within one image."""
    if ftype == 0:
        return line
    if ftype == 2:
        for i in range(len(line)):
            line[i] = (line[i] + prev[i]) & 0xFF
        return line
    for i in range(len(line)):
        a = line[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ftype == 1:
            line[i] = (line[i] + a) & 0xFF
        elif ftype == 3:
            line[i] = (line[i] + (a + b) // 2) & 0xFF
        else:  # 4: Paeth
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            line[i] = (line[i] + pred) & 0xFF
    return line


def _decode_png_stdlib(data: bytes):
    """Pure-stdlib PNG decode -> (width, height, HxWxC uint8 array).
    Supports bit depth 8, color types 0 (gray) / 2 (RGB) / 6 (RGBA),
    non-interlaced — the common case and everything the fixtures use."""
    import struct
    import zlib

    import numpy as np

    if data[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = len(_PNG_SIG)
    idat = bytearray()
    width = height = None
    channels = None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", chunk
            )
            if depth != 8 or interlace != 0 or color not in (0, 2, 6):
                raise NotImplementedError(
                    f"stdlib PNG path supports 8-bit gray/RGB/RGBA "
                    f"non-interlaced (got depth={depth} color={color} "
                    f"interlace={interlace}); install Pillow for the rest "
                    f"(README.md: 'Image decoding')"
                )
            channels = {0: 1, 2: 3, 6: 4}[color]
        elif ctype == b"IDAT":
            idat += chunk
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if width is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    px = np.empty((height, stride), dtype=np.uint8)
    prev = bytearray(stride)
    ptr = 0
    for y in range(height):
        ftype = raw[ptr]
        line = bytearray(raw[ptr + 1 : ptr + 1 + stride])
        ptr += 1 + stride
        prev = _png_unfilter_scanline(ftype, line, prev, channels)
        px[y] = np.frombuffer(bytes(prev), dtype=np.uint8)
    return width, height, px.reshape(height, width, channels)


_JPEG_SIG = b"\xff\xd8"


def _zigzag_order():
    """The JPEG zigzag scan as (row, col) pairs, generated (not typed)."""
    order = []
    for s in range(15):
        diag = [(i, s - i) for i in range(s + 1) if i < 8 and 0 <= s - i < 8]
        order.extend(diag[::-1] if s % 2 == 0 else diag)
    return order


_ZIGZAG = _zigzag_order()


def _dct_matrix():
    """Orthonormal 8-point DCT-II matrix M: forward F = M f M^T, inverse
    f = M^T F M — the separable form both the stdlib decoder and the
    test-fixture encoder share."""
    import math

    import numpy as np

    m = np.empty((8, 8))
    for k in range(8):
        c = math.sqrt(0.125) if k == 0 else 0.5
        for n in range(8):
            m[k, n] = c * math.cos((2 * n + 1) * k * math.pi / 16)
    return m


def _build_huffman(counts, symbols):
    """Canonical JPEG Huffman table -> {(length, code): symbol}."""
    lut = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            lut[(length, code)] = symbols[k]
            k += 1
            code += 1
        code <<= 1
    return lut


class _BitReader:
    def __init__(self, buf):
        self.buf = buf
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.buf):
            raise ValueError("JPEG entropy stream exhausted mid-block")
        v = (self.buf[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return v

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _huff_decode(br: _BitReader, lut) -> int:
    length = 0
    code = 0
    while length < 16:
        code = (code << 1) | br.read_bit()
        length += 1
        sym = lut.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, s: int) -> int:
    """Amplitude decode (spec F.2.2.1): s low bits v -> signed value."""
    return v - (1 << s) + 1 if v < (1 << (s - 1)) else v


def _decode_jpeg_stdlib(data: bytes):
    """Pure-stdlib baseline JPEG decode -> (width, height, HxWxC uint8).

    Supports sequential baseline (SOF0), 8-bit, grayscale or YCbCr with
    sampling factors 1-2 (4:4:4 / 4:2:2 / 4:2:0), tables from the file,
    restart markers, byte stuffing.  Progressive (SOF2) / arithmetic /
    12-bit keep the declared NotImplementedError — install Pillow for
    those.  Mirrors the stdlib PNG path: real decode of the checked-in
    fixtures, honest boundary for the rest."""
    import struct

    import numpy as np

    if data[:2] != _JPEG_SIG:
        raise ValueError("not a JPEG payload")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    scan = None
    pos = 2
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        marker = data[pos + 1]
        pos += 2
        if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        seg = data[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                i += 1
                if pq != 0:
                    raise NotImplementedError("16-bit JPEG quant tables")
                qt[tq] = np.frombuffer(seg[i : i + 64], dtype=np.uint8).astype(
                    np.int32
                )
                i += 64
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                i += 1
                counts = list(seg[i : i + 16])
                i += 16
                n = sum(counts)
                huff[(tc, th)] = _build_huffman(counts, list(seg[i : i + n]))
                i += n
        elif marker == 0xC0:  # SOF0 baseline sequential
            if seg[0] != 8:
                raise NotImplementedError("only 8-bit JPEG")
            h, w = struct.unpack(">HH", seg[1:5])
            comps = []
            for c in range(seg[5]):
                o = 6 + 3 * c
                comps.append(
                    {"h": seg[o + 1] >> 4, "v": seg[o + 1] & 15, "tq": seg[o + 2]}
                )
            if len(comps) not in (1, 3) or any(
                c["h"] not in (1, 2) or c["v"] not in (1, 2) for c in comps
            ):
                raise NotImplementedError(
                    "stdlib JPEG path supports gray / YCbCr with sampling "
                    "factors 1-2; install Pillow for the rest "
                    "(README.md: 'Image decoding')"
                )
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline sequential JPEG (SOF0) without Pillow "
                "(README.md: 'Image decoding')"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan = [
                (seg[2 + 2 * c] >> 4, seg[2 + 2 * c] & 15) for c in range(ns)
            ]
            break
        # APPn / COM / DNL etc.: skipped
    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF0/SOS")
    h, w, comps = frame

    # entropy-coded segments, unstuffed, split at restart markers
    segments: list[bytearray] = []
    cur = bytearray()
    i = pos
    while i < len(data):
        b = data[i]
        if b == 0xFF and i + 1 < len(data):
            nxt = data[i + 1]
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                segments.append(cur)
                cur = bytearray()
                i += 2
                continue
            break  # EOI or next marker
        cur.append(b)
        i += 1
    segments.append(cur)

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = [
        np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.uint8)
        for c in comps
    ]
    M = _dct_matrix()
    preds = [0] * len(comps)
    seg_idx = 0
    br = _BitReader(segments[0])
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                seg_idx += 1
                br = _BitReader(segments[seg_idx])
                preds = [0] * len(comps)
            for ci, comp in enumerate(comps):
                dclut = huff[(0, scan[ci][0])]
                aclut = huff[(1, scan[ci][1])]
                q = qt[comp["tq"]]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        coeffs = np.zeros(64, dtype=np.int64)
                        s = _huff_decode(br, dclut)
                        preds[ci] += _extend(br.read_bits(s), s) if s else 0
                        coeffs[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(br, aclut)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            coeffs[k] = _extend(br.read_bits(s), s)
                            k += 1
                        blk = np.zeros((8, 8))
                        dq = coeffs * q
                        for zi, (r_, c_) in enumerate(_ZIGZAG):
                            blk[r_, c_] = dq[zi]
                        px = np.clip(np.round(M.T @ blk @ M + 128), 0, 255)
                        y0 = (my * comp["v"] + by) * 8
                        x0 = (mx * comp["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = px.astype(
                            np.uint8
                        )
            n_mcu += 1

    # chroma upsample by pixel replication to the padded luma grid, crop
    full = []
    for ci, comp in enumerate(comps):
        p = planes[ci]
        if comp["h"] != hmax or comp["v"] != vmax:
            p = np.repeat(
                np.repeat(p, vmax // comp["v"], axis=0), hmax // comp["h"], axis=1
            )
        full.append(p[:h, :w].astype(np.float64))
    if len(full) == 1:
        return w, h, full[0].astype(np.uint8)[:, :, None]
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)
    return w, h, rgb


def decode_image_batch(payloads):
    """REAL image decode for a batch of payloads -> list of
    (width, height, HxWxC uint8 pixels).  Pillow when installed (any
    format it reads); else the stdlib PNG decoder above or the stdlib
    baseline-JPEG decoder.  Other formats without Pillow keep the
    declared NotImplementedError — the honest boundary of what this
    container can decode."""
    out = []
    for payload in payloads:
        raw = bytes(payload)
        if _PILImage is not None:
            import io

            import numpy as np

            im = _PILImage.open(io.BytesIO(raw))
            arr = np.asarray(im.convert(im.mode if im.mode in ("L", "RGB", "RGBA") else "RGB"))
            if arr.ndim == 2:
                arr = arr[:, :, None]
            out.append((arr.shape[1], arr.shape[0], arr.astype("uint8")))
        elif raw[: len(_PNG_SIG)] == _PNG_SIG:
            out.append(_decode_png_stdlib(raw))
        elif raw[:2] == _JPEG_SIG:
            out.append(_decode_jpeg_stdlib(raw))
        else:
            raise NotImplementedError(
                "only PNG and baseline JPEG are decodable without Pillow; "
                "install Pillow for WebP/progressive-JPEG/…, or use the "
                "deterministic fake decoder"
            )
    return out


def extract_features(bin_df: DataFrame, *, deterministic_fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    ``mapInPandas`` receives pandas DataFrames with the raw bytes.  With
    ``deterministic_fake`` (the oracle basis for the synthetic text-byte
    corpus) the moments come from the first 256 payload bytes; with the
    REAL path they come from the decoded pixel array
    (``decode_image_batch``).  Both run the identical Arrow plan."""

    def _extract(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        def moments(arr):
            # moments accumulate in float64: integer-valued sums stay
            # exact, so the mean is engine-reproducible
            a = arr.astype(np.float32)
            return [
                float(a.mean(dtype=np.float64)),
                float(a.std(dtype=np.float64)),
                float(a.min()),
                float(a.max()),
            ]

        for pdf in batches:
            decoded = (
                None
                if deterministic_fake
                else decode_image_batch(pdf["payload"])
            )
            rows = []
            for i, (doc_id, payload) in enumerate(zip(pdf["doc_id"], pdf["payload"])):
                raw = bytes(payload)
                if deterministic_fake:
                    feats = moments(np.frombuffer(raw[:256], dtype=np.uint8))
                else:
                    _w, _h, px = decoded[i]
                    feats = moments(px.reshape(-1))
                rows.append((int(doc_id), len(raw), raw[:4].hex(), feats, feats[0]))
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_bytes", "head_hex", "features", "byte_mean"]
            )

    return bin_df.mapInPandas(_extract, FEATURE_SCHEMA)


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal path: binary attach -> repartition (decode is
    CPU-bound; spread batches) -> Arrow-batched extract."""
    docs = load_table(spark, sf_dir, "documents")
    bin_df = with_binary_payload(docs).repartition("doc_id")
    feats = extract_features(bin_df)
    # no rounding: the mean is an exact integer sum over one IEEE division,
    # bit-identical in every engine — rounding would ADD divergence at
    # decimal half-way points (BigDecimal vs C rounding)
    return feats.select("doc_id", "n_bytes", "head_hex", "byte_mean")


RESIZE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("width", LongType()),
    StructField("height", LongType()),
    StructField("resized_bytes", LongType()),
    StructField("resized_head_hex", StringType()),
])


def resize_images(
    bin_df: DataFrame, width: int = 16, height: int = 16, *,
    deterministic_fake: bool = True,
) -> DataFrame:
    """Arrow-batched resize.  The REAL path decodes to pixels and
    nearest-neighbor-resamples the 2-D grid to width x height; the
    deterministic fake (the oracle basis) nearest-neighbor-samples the
    payload BYTES to exactly width*height bytes.  Same batch shape,
    output schema, partitioning and plan either way."""

    def _resize(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        target = width * height
        for pdf in batches:
            decoded = (
                None
                if deterministic_fake
                else decode_image_batch(pdf["payload"])
            )
            rows = []
            for i, (doc_id, payload) in enumerate(zip(pdf["doc_id"], pdf["payload"])):
                if deterministic_fake:
                    buf = np.frombuffer(bytes(payload), dtype=np.uint8)
                    idx = (np.arange(target) * len(buf) // target) % max(len(buf), 1)
                    out = buf[idx] if len(buf) else np.zeros(target, dtype=np.uint8)
                else:
                    sw, sh, px = decoded[i]
                    ys = (np.arange(height) * sh // height).clip(0, sh - 1)
                    xs = (np.arange(width) * sw // width).clip(0, sw - 1)
                    out = px[ys][:, xs].reshape(-1)
                rows.append(
                    (int(doc_id), width, height, int(out.size), out[:4].tobytes().hex())
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "resized_bytes", "resized_head_hex"],
            )

    return bin_df.mapInPandas(_resize, RESIZE_SCHEMA)


FRAME_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("frame_idx", LongType()),
    StructField("frame_bytes", LongType()),
    StructField("frame_head_hex", StringType()),
])

FRAME_SIZE = 64  # fake codec: fixed-size frames
FRAME_STRIDE = 4  # sample every 4th frame


def sample_frames(
    bin_df: DataFrame, *, frame_size: int = FRAME_SIZE, stride: int = FRAME_STRIDE,
    deterministic_fake: bool = True,
) -> DataFrame:
    """Video frame sampling: 1 input row -> N frame rows (the row-expanding
    mapInPandas shape).  The fake codec treats the payload as fixed-size
    frames and emits every ``stride``-th one; a real decoder slots into the
    same generator."""

    def _frames(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if not deterministic_fake:
                decode_image_batch(pdf["payload"])
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                n_frames = max((len(raw) + frame_size - 1) // frame_size, 1)
                for f in range(0, n_frames, stride):
                    chunk = raw[f * frame_size : (f + 1) * frame_size]
                    rows.append((int(doc_id), f, len(chunk), chunk[:4].hex()))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_bytes", "frame_head_hex"]
            )

    return bin_df.mapInPandas(_frames, FRAME_SCHEMA)


def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sample the corpus then aggregate per doc (frames sampled,
    bytes covered) — exercises the 1->N Arrow expansion plus a downstream
    shuffle over the expanded rows."""
    docs = load_table(spark, sf_dir, "documents")
    frames = sample_frames(with_binary_payload(docs).repartition("doc_id"))
    return frames.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_frames_sampled"),
        F.sum("frame_bytes").alias("bytes_sampled"),
        F.min("frame_head_hex").alias("min_head_hex"),
    )


# oracle for the Pandas-UDF feature path: the corpus is pure ASCII, so
# byte values == character code points and DuckDB can recompute the fake
# decoder's first-256-byte mean + head hex without blob support
MULTIMODAL_FEATURES_SQL = """
WITH heads AS (
  SELECT doc_id, substr(text, 1, 256) AS head,
         octet_length(encode(text)) AS n_bytes,
         lower(hex(encode(substr(text, 1, 4)))) AS head_hex
  FROM documents
),
chars AS (
  SELECT doc_id, unicode(substr(head, i.i + 1, 1)) AS code
  FROM heads, (SELECT unnest(range(256)) AS i) i
  WHERE i.i < length(head)
)
SELECT h.doc_id, h.n_bytes, h.head_hex,
       avg(c.code) AS byte_mean
FROM heads h JOIN chars c ON h.doc_id = c.doc_id
GROUP BY h.doc_id, h.n_bytes, h.head_hex
"""


# oracle for the frame-sampling path: the fake codec's frame geometry is
# pure arithmetic over the (ASCII) payload length, and frame head bytes
# are substrings — DuckDB replays the sampled-frame aggregate exactly
MULTIMODAL_FRAMES_SQL = f"""
WITH docs AS (
  SELECT doc_id, text, octet_length(encode(text)) AS n_bytes,
         greatest(CAST(ceil(octet_length(encode(text)) / {FRAME_SIZE}.0) AS BIGINT), 1) AS n_frames
  FROM documents
),
frames AS (
  SELECT doc_id,
         unnest(range(0, n_frames, {FRAME_STRIDE})) AS f,
         n_bytes
  FROM docs
),
sized AS (
  SELECT d.doc_id, f.f,
         least({FRAME_SIZE}, f.n_bytes - f.f * {FRAME_SIZE}) AS frame_bytes,
         lower(hex(encode(substr(d.text, f.f * {FRAME_SIZE} + 1, 4)))) AS frame_head_hex
  FROM frames f JOIN docs d ON f.doc_id = d.doc_id
)
SELECT doc_id,
       count(*) AS n_frames_sampled,
       CAST(sum(frame_bytes) AS BIGINT) AS bytes_sampled,
       min(frame_head_hex) AS min_head_hex
FROM sized
GROUP BY doc_id
"""


# --------------------------------------------------------------------- #
# Audio: real RIFF/WAV container round-trip through the binary column
# --------------------------------------------------------------------- #
# The audio twin of the PNG/JPEG path: payloads are REAL WAV files
# (RIFF header + 16-bit little-endian mono PCM) built with the stdlib
# ``wave`` writer in one Arrow pass and parsed back with the stdlib
# ``wave`` reader in another — container parsing, sample decode, and the
# 1-row->1-row Arrow plumbing are all genuinely exercised.  The PCM
# content is a deterministic integer waveform of the doc_id, so the
# DuckDB oracle replays the feature arithmetic exactly WITHOUT blob
# support (the same synth-then-verify trick as the fake image decoder).
AUDIO_RATE = 8000
AUDIO_BASE_SAMPLES = 64
AUDIO_MOD_SAMPLES = 64  # n_samples = 64 + doc_id % 64


def _wav_samples(doc_id: int, n: int) -> list[int]:
    """The deterministic 16-bit PCM waveform: pure integer arithmetic,
    replayed verbatim by the oracle."""
    return [((doc_id * 31 + i * 7919) % 2048) - 1024 for i in range(n)]


AUDIO_PAYLOAD_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("payload", BinaryType()),
])

AUDIO_FEATURE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("sample_rate", LongType()),
    StructField("n_samples", LongType()),
    StructField("peak", LongType()),
    StructField("sum_sq", LongType()),
    StructField("zero_crossings", LongType()),
])


def synth_wav_batch(ids: Iterator) -> Iterator:
    """mapInPandas body: doc_id -> a complete WAV file as bytes."""
    import io
    import wave

    import numpy as np
    import pandas as pd

    for pdf in ids:
        payloads = []
        for doc_id in pdf["doc_id"]:
            d = int(doc_id)
            n = AUDIO_BASE_SAMPLES + d % AUDIO_MOD_SAMPLES
            # vectorized waveform synth; ``_wav_samples`` stays the
            # scalar reference the tests pin this against, and
            # astype('<i2').tobytes() == struct.pack('<nh', *samples)
            samples = (
                (d * 31 + np.arange(n, dtype=np.int64) * 7919) % 2048 - 1024
            ).astype("<i2")
            buf = io.BytesIO()
            with wave.open(buf, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(AUDIO_RATE)
                w.writeframes(samples.tobytes())
            payloads.append(buf.getvalue())
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})


def decode_audio_batch(batches: Iterator) -> Iterator:
    """mapInPandas body: WAV bytes -> integer sample features.  The
    parse is the real stdlib ``wave`` reader over the RIFF container;
    features stay integers so the oracle hash is arithmetic, not float
    folklore."""
    import io
    import wave

    import numpy as np
    import pandas as pd

    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
                rate = w.getframerate()
                n = w.getnframes()
                raw = w.readframes(n)
            s = np.frombuffer(raw, dtype="<i2").astype(np.int64)
            rows.append(
                (
                    int(doc_id),
                    rate,
                    n,
                    int(np.abs(s).max()),
                    int((s * s).sum()),
                    int((s[:-1] * s[1:] < 0).sum()),
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id", "sample_rate", "n_samples",
                "peak", "sum_sq", "zero_crossings",
            ],
        )


def multimodal_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio decode + feature extraction over the binary column: synth a
    real WAV per doc (Arrow pass 1), then parse it back and extract
    integer PCM features (Arrow pass 2) — the full opaque-binary-column
    story for the audio modality, exact-oracled because the waveform is
    deterministic integer arithmetic."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    wav = docs.mapInPandas(synth_wav_batch, AUDIO_PAYLOAD_SCHEMA)
    return wav.mapInPandas(decode_audio_batch, AUDIO_FEATURE_SCHEMA)


MULTIMODAL_AUDIO_SQL = f"""
WITH d AS (
  SELECT doc_id, {AUDIO_BASE_SAMPLES} + doc_id % {AUDIO_MOD_SAMPLES} AS n
  FROM documents
),
s AS (
  SELECT d.doc_id, i.i AS i,
         ((d.doc_id * 31 + i.i * 7919) % 2048) - 1024 AS v
  FROM d, (SELECT unnest(range({AUDIO_BASE_SAMPLES + AUDIO_MOD_SAMPLES})) AS i) i
  WHERE i.i < d.n
),
s2 AS (
  SELECT doc_id, i, v,
         lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv
  FROM s
)
SELECT doc_id,
       {AUDIO_RATE} AS sample_rate,
       count(*) AS n_samples,
       CAST(max(abs(v)) AS BIGINT) AS peak,
       CAST(sum(v * v) AS BIGINT) AS sum_sq,
       CAST(sum(CASE WHEN pv IS NOT NULL AND pv * v < 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS zero_crossings
FROM s2
GROUP BY doc_id
"""


# --------------------------------------------------------------------- #
# Video: real RIFF/AVI container round-trip + frame sampling
# --------------------------------------------------------------------- #
# The video twin of the WAV path, one level deeper: stdlib has no AVI
# reader, so BOTH sides are hand-rolled over the RIFF spec — the writer
# emits a standard container (RIFF/'AVI ' -> LIST hdrl [avih + LIST strl
# [strh/strf]] -> LIST movi ['00db' frames]) and the parser genuinely
# WALKS the chunk tree (4CC + little-endian sizes, LIST recursion, odd-
# size padding) to recover the avih geometry and the frame chunks.
# Frames are deterministic integer grayscale, so the DuckDB oracle
# replays the frame-SAMPLED feature arithmetic exactly.  Frame sampling
# (every FRAME_SAMPLE_EVERY-th frame) is the brief's video primitive:
# at scale only the sampled frames' bytes are touched per row.
VIDEO_W, VIDEO_H = 8, 6
VIDEO_BASE_FRAMES = 4
VIDEO_MOD_FRAMES = 5  # n_frames = 4 + doc_id % 5
VIDEO_USEC_PER_FRAME = 40_000  # 25 fps
FRAME_SAMPLE_EVERY = 2  # sample frames 0, 2, 4, ...


def _video_pixel(doc_id: int, f: int, i: int) -> int:
    """Deterministic grayscale byte — pure integer arithmetic, replayed
    verbatim by the oracle."""
    return (doc_id * 31 + f * 257 + i * 7919) % 256


def _riff_chunk(fourcc: bytes, payload: bytes) -> bytes:
    import struct

    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


@_functools.lru_cache(maxsize=64)
def _avi_header(n_frames: int) -> bytes:
    """The LIST-hdrl block (avih + strl) — a pure function of the frame
    count (VIDEO_MOD_FRAMES distinct values corpus-wide), so it is built
    once per count instead of per document."""
    import struct

    frame_bytes = VIDEO_W * VIDEO_H
    avih = struct.pack(
        "<14I",
        VIDEO_USEC_PER_FRAME,  # dwMicroSecPerFrame
        frame_bytes * 25,      # dwMaxBytesPerSec
        0,                     # dwPaddingGranularity
        0,                     # dwFlags (no idx1 is emitted, so
                               # AVIF_HASINDEX=0x10 must stay CLEAR)
        n_frames,              # dwTotalFrames
        0,                     # dwInitialFrames
        1,                     # dwStreams
        frame_bytes,           # dwSuggestedBufferSize
        VIDEO_W,
        VIDEO_H,
        0, 0, 0, 0,            # dwReserved[4]
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"DIB ", 0, 0, 0, 0,
        1, 25,                 # dwScale / dwRate -> 25 fps
        0, n_frames, frame_bytes, 0xFFFFFFFF, 0,
        0, 0, VIDEO_W, VIDEO_H,
    )
    # an 8-bpp DIB's strf must carry its RGBQUAD palette after the
    # 40-byte BITMAPINFOHEADER (biClrUsed=256 promises 1024 bytes) —
    # grayscale identity here, so external VfW/ffmpeg readers see a
    # conforming stream
    strf = struct.pack(
        "<IiiHHIIiiII",
        40, VIDEO_W, VIDEO_H, 1, 8, 0, frame_bytes, 0, 0, 256, 0,
    ) + b"".join(bytes((i, i, i, 0)) for i in range(256))
    strl = _riff_chunk(
        b"LIST", b"strl" + _riff_chunk(b"strh", strh) + _riff_chunk(b"strf", strf)
    )
    return _riff_chunk(b"LIST", b"hdrl" + _riff_chunk(b"avih", avih) + strl)


def _avi_bytes(doc_id: int, n_frames: int) -> bytes:
    """A complete standard AVI container for the doc's synthetic frames.
    Pixels come from one vectorized modular-arithmetic grid per doc
    instead of a per-pixel Python generator (guide §4.2); byte-identical
    to the scalar form (``_video_pixel`` stays the tests' reference)."""
    import struct

    import numpy as np

    frame_bytes = VIDEO_W * VIDEO_H
    px = (
        doc_id * 31
        + np.arange(n_frames, dtype=np.int64)[:, None] * 257
        + np.arange(frame_bytes, dtype=np.int64)[None, :] * 7919
    ) % 256
    hdr = b"00db" + struct.pack("<I", frame_bytes)  # even size: no pad byte
    frames = b"".join(hdr + row.tobytes() for row in px.astype(np.uint8))
    movi = _riff_chunk(b"LIST", b"movi" + frames)
    return _riff_chunk(b"RIFF", b"AVI " + _avi_header(n_frames) + movi)


def _walk_riff(payload: bytes):
    """Yield (fourcc, body) for each chunk in a RIFF payload, honoring
    the odd-size pad byte.  A declared size that overruns the buffer is
    a truncated container — raised loudly, never silently clamped (a
    short frame chunk would otherwise pass the frame-count check and
    yield silently wrong features)."""
    import struct

    off = 0
    while off + 8 <= len(payload):
        fourcc = payload[off:off + 4]
        (size,) = struct.unpack("<I", payload[off + 4:off + 8])
        if off + 8 + size > len(payload):
            raise ValueError(
                f"truncated RIFF chunk {fourcc!r}: declares {size} bytes, "
                f"{len(payload) - off - 8} remain"
            )
        yield fourcc, payload[off + 8:off + 8 + size]
        off += 8 + size + (size % 2)


def _parse_avi(data: bytes) -> tuple:
    """(width, height, n_frames, usec_per_frame, frames) from a real
    chunk-tree walk; raises on a malformed container."""
    import struct

    chunks = list(_walk_riff(data))
    if len(chunks) != 1 or chunks[0][0] != b"RIFF" or chunks[0][1][:4] != b"AVI ":
        raise ValueError("not a RIFF/AVI container")
    geom = None
    frames = []
    for fourcc, body in _walk_riff(chunks[0][1][4:]):
        if fourcc != b"LIST":
            continue
        kind, inner = body[:4], body[4:]
        if kind == b"hdrl":
            for cc, b in _walk_riff(inner):
                if cc == b"avih":
                    if len(b) != 56:
                        raise ValueError(
                            f"malformed avih header: {len(b)} bytes, want 56"
                        )
                    h = struct.unpack("<14I", b)
                    geom = (h[8], h[9], h[4], h[0])  # w, h, frames, usec
        elif kind == b"movi":
            frames.extend(b for cc, b in _walk_riff(inner) if cc == b"00db")
    if geom is None or len(frames) != geom[2]:
        raise ValueError("missing avih header or frame-count mismatch")
    return (*geom, frames)


VIDEO_PAYLOAD_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("payload", BinaryType()),
])

VIDEO_FEATURE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("width", LongType()),
    StructField("height", LongType()),
    StructField("n_frames", LongType()),
    StructField("usec_per_frame", LongType()),
    StructField("sampled_frames", LongType()),
    StructField("sum_pix", LongType()),
    StructField("max_pix", LongType()),
])


def synth_avi_batch(ids: Iterator) -> Iterator:
    """mapInPandas body: doc_id -> a complete AVI file as bytes."""
    import pandas as pd

    for pdf in ids:
        payloads = [
            _avi_bytes(
                int(doc_id),
                VIDEO_BASE_FRAMES + int(doc_id) % VIDEO_MOD_FRAMES,
            )
            for doc_id in pdf["doc_id"]
        ]
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})


def decode_video_batch(batches: Iterator) -> Iterator:
    """mapInPandas body: AVI bytes -> frame-sampled integer features via
    the real chunk-tree parse."""
    import pandas as pd

    import numpy as np

    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            w, h, n, usec, frames = _parse_avi(bytes(payload))
            sampled = frames[::FRAME_SAMPLE_EVERY]
            px = np.frombuffer(b"".join(sampled), dtype=np.uint8)
            rows.append(
                (
                    int(doc_id), w, h, n, usec, len(sampled),
                    int(px.astype(np.int64).sum()),
                    int(px.max()),
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id", "width", "height", "n_frames", "usec_per_frame",
                "sampled_frames", "sum_pix", "max_pix",
            ],
        )


def multimodal_video(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video decode + frame-sampled feature extraction over the binary
    column: synth a real AVI per doc (Arrow pass 1), then walk the RIFF
    chunk tree back and extract integer features from every
    FRAME_SAMPLE_EVERY-th frame (Arrow pass 2) — the opaque-binary
    story for the video modality, exact-oracled because frames are
    deterministic integer arithmetic."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    avi = docs.mapInPandas(synth_avi_batch, VIDEO_PAYLOAD_SCHEMA)
    return avi.mapInPandas(decode_video_batch, VIDEO_FEATURE_SCHEMA)


MULTIMODAL_VIDEO_SQL = f"""
WITH d AS (
  SELECT doc_id,
         {VIDEO_BASE_FRAMES} + doc_id % {VIDEO_MOD_FRAMES} AS n_frames
  FROM documents
),
px AS (
  SELECT d.doc_id, f.f AS f, i.i AS i,
         (d.doc_id * 31 + f.f * 257 + i.i * 7919) % 256 AS v
  FROM d,
       (SELECT unnest(range({VIDEO_BASE_FRAMES + VIDEO_MOD_FRAMES})) AS f) f,
       (SELECT unnest(range({VIDEO_W * VIDEO_H})) AS i) i
  WHERE f.f < d.n_frames AND f.f % {FRAME_SAMPLE_EVERY} = 0
)
SELECT p.doc_id,
       {VIDEO_W} AS width,
       {VIDEO_H} AS height,
       d.n_frames,
       {VIDEO_USEC_PER_FRAME} AS usec_per_frame,
       CAST(count(DISTINCT p.f) AS BIGINT) AS sampled_frames,
       CAST(sum(p.v) AS BIGINT) AS sum_pix,
       CAST(max(p.v) AS BIGINT) AS max_pix
FROM px p JOIN d USING (doc_id)
GROUP BY p.doc_id, d.n_frames
"""


# --------------------------------------------------------------------- #
# perceptual-hash image dedup
# --------------------------------------------------------------------- #
# The standard training-data step the text dedup families can't cover:
# near-dup IMAGE removal.  A 64-bit average-hash (aHash) over an 8x8
# downsample of the decoded grayscale — bit c set iff cell c's pixel sum
# exceeds its share of the global sum, integer arithmetic throughout —
# then the dedup_simhash banding: 4x16-bit bands, pigeonhole-complete
# for Hamming <= 3.  The hash is carried as two 32-bit halves (lo, hi)
# so no engine ever shifts into the BIGINT sign bit.
#
# The fixture corpus is deterministic integer arithmetic (the
# multimodal_video pattern): docs in the same PHASH_GROUP share a base
# cell pattern, and member m toggles cells < m — cell values sit at
# 64/192 around the ~128 global mean, so a toggle flips EXACTLY its own
# hash bit (the global-mean drift of <= 3 toggles is far inside the 64
# margin) and within-group Hamming is |m_a - m_b| by construction.  The
# payloads are REAL PNGs round-tripped through the stdlib encoder/
# decoder; the oracle replays the cell formula, never the codec.
#
# Reference parity: the reference has no image pipeline (SURVEY.md §6)
# — beyond-reference machinery for the training-data pipeline, composed
# from driver-verified parts (decode_image_batch, dedup_simhash's
# band-bucket join).
PHASH_GRID = 8          # 8x8 hash grid = 64 bits
PHASH_IMG = 16          # 16x16 px image -> 2x2 px per grid cell
PHASH_GROUP = 4         # doc_id // 4 share a base pattern
PHASH_HAMMING_MAX = 3
PHASH_ON, PHASH_OFF = 192, 64


@_functools.lru_cache(maxsize=65536)
def _phash_base_hex(g: int) -> str:
    """md5 of the group id as a string — the base pattern source.  Any
    ARITHMETIC mix over (g, cell) degenerates here: cell only spans
    0..63, so a linear term in cell is a shifted-interval pattern and
    nearby groups collide into huge band buckets (the first version
    collapsed a large corpus to ~64 distinct images).  md5 is the
    engine-portable true mix — the dedup_simhash oracle precedent.
    Cached: PHASH_GROUP members share one digest."""
    import hashlib

    return hashlib.md5(str(g).encode()).hexdigest()


@_functools.lru_cache(maxsize=65536)
def _phash_digits(g: int):
    """First 16 hex digits of the group digest as an int array — the
    vectorized synth reads digit ``cell // 4`` for all 64 cells at once."""
    import numpy as np

    return np.array(
        [int(c, 16) for c in _phash_base_hex(g)[:16]], dtype=np.int64
    )


def _phash_cell_value(doc_id: int, cell: int, _hex: str | None = None) -> int:
    """Deterministic fixture cell intensity — the formula the DuckDB
    oracle replays (md5 hex digit ``cell//4``, bit ``cell%4``).  Cell
    values sit at 64/192 around the ~128 global mean, so member m's
    toggle of cells < m flips EXACTLY its own m hash bits regardless
    of the base on-set's size k (the bit rule cell*64 > total reduces
    to on/off for every 0 <= k <= 64)."""
    g, m = doc_id // PHASH_GROUP, doc_id % PHASH_GROUP
    digit = int((_hex or _phash_base_hex(g))[cell // 4], 16)
    on = (digit >> (cell % 4)) & 1 == 1
    if cell < m:
        on = not on
    return PHASH_ON if on else PHASH_OFF


def _png_gray_from_raw(w: int, h: int, raw: bytes) -> bytes:
    """8-bit grayscale PNG from pre-built filtered scanlines (one 0x00
    filter byte + w pixel bytes per row) — the shared fast core of
    ``_encode_png_gray``; byte-identical output (zlib is deterministic
    for a given input)."""
    import struct
    import zlib

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + ctype
            + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _encode_png_gray(rows: list[list[int]]) -> bytes:
    """Minimal spec-conformant 8-bit grayscale PNG encoder (filter 0
    scanlines, zlib IDAT, CRC-correct chunks) — the fixture payloads
    are real PNGs so dedup_phash exercises the real decode boundary."""
    raw = b"".join(b"\x00" + bytes(r) for r in rows)
    return _png_gray_from_raw(len(rows[0]), len(rows), raw)


PHASH_PAYLOAD_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("payload", BinaryType()),
])

PHASH_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("lo", LongType()),
    StructField("hi", LongType()),
])


def synth_image_batch(ids: Iterator) -> Iterator:
    """mapInPandas body: doc_id -> a complete grayscale PNG as bytes.
    The 64 cell values come from one vectorized bit-extract over the
    cached group digits instead of 256 per-pixel Python calls (guide
    §4.2); ``_phash_cell_value`` stays the scalar reference the tests
    pin this body against, and the PNG bytes are identical."""
    import numpy as np
    import pandas as pd

    scale = PHASH_IMG // PHASH_GRID
    cells = np.arange(PHASH_GRID * PHASH_GRID, dtype=np.int64)
    digit_idx, bit = cells // 4, cells % 4
    for pdf in ids:
        payloads = []
        raw = np.zeros((PHASH_IMG, PHASH_IMG + 1), dtype=np.uint8)
        for doc_id in pdf["doc_id"]:
            d = int(doc_id)
            g, m = divmod(d, PHASH_GROUP)
            on = ((_phash_digits(g)[digit_idx] >> bit) & 1).astype(bool)
            on ^= cells < m
            grid = np.where(on, PHASH_ON, PHASH_OFF).astype(np.uint8).reshape(
                PHASH_GRID, PHASH_GRID
            )
            raw[:, 1:] = np.repeat(np.repeat(grid, scale, axis=0), scale, axis=1)
            payloads.append(
                _png_gray_from_raw(PHASH_IMG, PHASH_IMG, raw.tobytes())
            )
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})


def phash_batch(batches: Iterator) -> Iterator:
    """mapInPandas body: PNG bytes -> 64-bit average-hash as two 32-bit
    halves, via the REAL image decode (Pillow or the stdlib decoder)."""
    import numpy as np
    import pandas as pd

    scale = PHASH_IMG // PHASH_GRID
    w32 = np.left_shift(np.int64(1), np.arange(32, dtype=np.int64))
    for pdf in batches:
        decoded = decode_image_batch(pdf["payload"])
        rows = []
        for doc_id, (w, h, px) in zip(pdf["doc_id"], decoded):
            gray = np.asarray(px, dtype=np.int64)[:, :, 0]
            cells = gray.reshape(
                PHASH_GRID, scale, PHASH_GRID, scale
            ).sum(axis=(1, 3))
            total = int(cells.sum())
            # integer-exact aHash: cell mean > global mean, cleared of
            # division — cell_sum * n_cells > total
            bits = (cells.reshape(-1) * (PHASH_GRID * PHASH_GRID)) > total
            lo = int((bits[:32] * w32).sum())
            hi = int((bits[32:] * w32).sum())
            rows.append((int(doc_id), lo, hi))
        yield pd.DataFrame(rows, columns=["doc_id", "lo", "hi"])


def phash_signatures(ids: DataFrame) -> DataFrame:
    """(doc_id) -> (doc_id, lo, hi): synth the fixture PNG and hash it
    through the REAL decode — the two Arrow passes shared by the batch
    operator and the streaming twin."""
    imgs = ids.repartition("doc_id").mapInPandas(
        synth_image_batch, PHASH_PAYLOAD_SCHEMA
    )
    return imgs.mapInPandas(phash_batch, PHASH_SCHEMA)


def phash_bands(sigs: DataFrame) -> DataFrame:
    """Explode a (doc_id, lo, hi) frame into its 4x16-bit band rows
    (doc_id, lo, hi, band, key) — 4 rows/doc, JVM-side."""
    return sigs.select(
        "doc_id",
        "lo",
        "hi",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.shiftright(
                        F.col("lo") if b < 2 else F.col("hi"),
                        (b % 2) * 16,
                    )
                    .bitwiseAND(F.lit((1 << 16) - 1))
                    .alias("key"),
                )
                for b in range(4)
            ])
        ).alias("bk"),
    ).select("doc_id", "lo", "hi", "bk.band", "bk.key")


def phash_hamming(a_prefix: str = "a", b_prefix: str = "b"):
    """The 64-bit Hamming distance between two aliased signature sides."""
    return F.bit_count(
        F.col(f"{a_prefix}.lo").bitwiseXOR(F.col(f"{b_prefix}.lo"))
    ) + F.bit_count(F.col(f"{a_prefix}.hi").bitwiseXOR(F.col(f"{b_prefix}.hi")))


def phash_pairs_from(ids: DataFrame) -> DataFrame:
    """Near-dup image pairs with Hamming distance <= PHASH_HAMMING_MAX
    over the 64-bit perceptual hash, via 4x16-bit band buckets
    (pigeonhole: any pair within distance 3 agrees on a whole band),
    from a (doc_id) frame — factored out so the scale probe can drive
    the identical pipeline at any corpus size.

    Scale shape: decode + hash is the declared Arrow ``mapInPandas``
    boundary (two passes, both O(batch)); everything after the 3-column
    (doc_id, lo, hi) projection is JVM-side — the band explode is 4
    rows/doc and the bucket self-join is the dedup_simhash LSH shape
    (band-key hash partitioning, never a corpus cross join)."""
    sigs = tracked_persist(phash_signatures(ids))
    bands = phash_bands(sigs)
    a = bands.alias("a")
    b = bands.alias("b")
    ham = phash_hamming()
    # exactly-once emission via the first agreeing band over the (lo, hi)
    # xor slices (see dedup.first_agreeing_band): bands 0/1 live in lo,
    # 2/3 in hi, mirroring phash_bands' slicing — the trailing distinct
    # and its pair-table exchange are gone
    xlo = F.col("a.lo").bitwiseXOR(F.col("b.lo"))
    xhi = F.col("a.hi").bitwiseXOR(F.col("b.hi"))
    agrees = [
        F.shiftright(xlo if bb < 2 else xhi, (bb % 2) * 16).bitwiseAND(
            F.lit((1 << 16) - 1)
        )
        == 0
        for bb in range(4)
    ]
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.col("a.band") == first_agreeing_band(agrees)),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= PHASH_HAMMING_MAX)
    )


def dedup_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry face of ``phash_pairs_from`` over the documents table."""
    return phash_pairs_from(
        load_table(spark, sf_dir, "documents").select("doc_id")
    )


def dedup_phash_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end IMAGE dedup decision: phash near-dup pairs ->
    connected components -> one canonical keeper per cluster — the
    ``dedup_cluster`` composition applied to the image modality (pairs
    are necessary but not sufficient; transitivity makes "keep one
    copy" well-defined).  Output one row per clustered image:
    (doc_id, cluster_rep, cluster_size, is_rep); the drop-list is
    ``is_rep = false``.  Cluster sizes via a window count on
    cluster_rep, never a broadcast of the derived sizes table (the
    dedup_cluster rule)."""
    from pyspark.sql import Window

    from .dedup import connected_components

    pairs = phash_pairs_from(
        load_table(spark, sf_dir, "documents").select("doc_id")
    ).select("doc_a", "doc_b")
    edges = pairs.selectExpr("doc_a AS src", "doc_b AS dst").union(
        pairs.selectExpr("doc_b AS src", "doc_a AS dst")
    )
    labels = connected_components(edges)
    size_w = F.count(F.lit(1)).over(Window.partitionBy("cluster_rep"))
    return labels.select(
        "doc_id",
        "cluster_rep",
        size_w.alias("cluster_size"),
        (F.col("doc_id") == F.col("cluster_rep")).alias("is_rep"),
    )


# The oracle replays the CELL formula (the codec round-trip is
# pixel-identity by the PNG spec, unit-pinned separately), then the
# identical integer aHash + banding + Hamming pipeline.  The CTE chain
# is shared verbatim with the streaming twin's oracle
# (streaming/verify.stream_phash_verify).
PHASH_SIG_CTES = f"""base AS (
  SELECT doc_id, md5(CAST(doc_id // {PHASH_GROUP} AS VARCHAR)) AS hx
  FROM documents
),
cells AS (
  SELECT d.doc_id, c.c AS cell,
         CASE WHEN xor(
                (CAST(('0x' || substr(d.hx, c.c // 4 + 1, 1)) AS INT)
                 >> (c.c % 4)) & 1,
                CASE WHEN c.c < d.doc_id % {PHASH_GROUP}
                     THEN 1 ELSE 0 END
              ) = 1
              THEN {PHASH_ON} ELSE {PHASH_OFF} END AS v
  FROM base d,
       (SELECT unnest(range({PHASH_GRID * PHASH_GRID})) AS c) c
),
tot AS (SELECT doc_id, sum(v) AS t FROM cells GROUP BY 1),
bits AS (
  SELECT c.doc_id, c.cell,
         CASE WHEN c.v * {PHASH_GRID * PHASH_GRID} > t.t
              THEN 1 ELSE 0 END AS bit
  FROM cells c JOIN tot t USING (doc_id)
),
hashes AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN cell < 32
                       THEN bit * (CAST(1 AS BIGINT) << cell)
                       ELSE 0 END) AS BIGINT) AS lo,
         CAST(sum(CASE WHEN cell >= 32
                       THEN bit * (CAST(1 AS BIGINT) << (cell - 32))
                       ELSE 0 END) AS BIGINT) AS hi
  FROM bits GROUP BY doc_id
),
bands AS (
  SELECT doc_id, lo, hi, p.p AS band,
         (CASE WHEN p.p < 2 THEN lo ELSE hi END >> ((p.p % 2) * 16))
         & 65535 AS key
  FROM hashes, (SELECT unnest(range(4)) AS p) p
),
phash_pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) AS hamming
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
  WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi))
        <= {PHASH_HAMMING_MAX}
)"""

DEDUP_PHASH_SQL = f"""
WITH {PHASH_SIG_CTES}
SELECT doc_a, doc_b, hamming FROM phash_pairs
"""

# Transitive closure of the same pair set (the DEDUP_CLUSTER_SQL shape).
DEDUP_PHASH_CLUSTER_SQL = f"""
WITH RECURSIVE {PHASH_SIG_CTES},
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM phash_pairs
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM phash_pairs
),
reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
),
labels AS (
  SELECT src AS doc_id, least(src, min(dst)) AS cluster_rep
  FROM reach GROUP BY src
),
csizes AS (
  SELECT cluster_rep, count(*) AS cluster_size FROM labels GROUP BY 1
)
SELECT doc_id, cluster_rep, cluster_size, doc_id = cluster_rep AS is_rep
FROM labels JOIN csizes USING (cluster_rep)
"""


# --------------------------------------------------------------------- #
# frame-level video near-dup (shared-scene detection)
# --------------------------------------------------------------------- #
# The video counterpart of dedup_phash: two videos are near-dups when
# they SHARE frames (re-uploads, edits, embedded clips) — the standard
# training-data step for video corpora.  Pipeline: sample every
# FRAME_SAMPLE_EVERY-th frame (the multimodal_frames primitive), hash
# each sampled frame with a per-pixel integer aHash (the fixture frames
# are 8x6 = 48 px, so the hash is 48 bits in one BIGINT — no sign
# exposure; a real decoder would downsample to a grid first, exactly
# like dedup_phash), then work at DISTINCT-HASH grain:
#
# - identical frames collapse to one class row BEFORE any join — a
#   million re-uploads of one intro frame are ONE vertex, not 1e12
#   candidate pairs;
# - frame classes seen in more than FRAME_DF_CAP videos are dropped as
#   boilerplate (network logos, black frames) — the dedup_ngram_jaccard
#   stop-shingle DF-cap precedent, applied to frames: a frame shared by
#   everyone identifies nothing, and the cap bounds the video-pair
#   expansion by DF_CAP^2 per class;
# - banding (4x12-bit, Hamming <= FRAME_HAMMING_MAX pigeonhole) runs
#   over the distinct hashes only, then class pairs expand to video
#   pairs through the capped membership table.
FRAME_HASH_BITS = VIDEO_W * VIDEO_H  # 48
FRAME_BAND_BITS = FRAME_HASH_BITS // 4  # 12
FRAME_HAMMING_MAX = 3
FRAME_DF_CAP = 50

FRAME_MEMBER_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("fh", LongType()),
    StructField("m", LongType()),
])


def frame_phash_batch(batches: Iterator) -> Iterator:
    """mapInPandas body: AVI bytes -> the doc's (frame-hash, multiplicity)
    membership rows, via the real chunk-tree parse.  The per-pixel bit
    rule (pixel*len > total — integer-exact pixel mean > frame mean)
    runs as one vectorized numpy compare+matmul over all sampled frames
    of the doc (guide §4.2), and the (doc, fh) -> m collapse happens
    HERE — every sampled frame of a doc sits in its one payload row, so
    aggregating in the body removes the corpus-scale frame-grain
    exchange + HashAggregate pair the JVM-side groupBy paid."""
    import numpy as np
    import pandas as pd

    weights = np.left_shift(
        np.int64(1), np.arange(VIDEO_W * VIDEO_H, dtype=np.int64)
    )
    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            _w, _h, n, _usec, frames = _parse_avi(bytes(payload))
            idxs = range(0, n, FRAME_SAMPLE_EVERY)
            # all sampled frames of the doc in one (n_sampled, 48) matrix:
            # one vectorized compare + matmul instead of a per-frame loop
            arr = np.frombuffer(
                b"".join(frames[i] for i in idxs), dtype=np.uint8
            ).reshape(len(idxs), -1).astype(np.int64)
            bits = (arr * arr.shape[1] > arr.sum(axis=1)[:, None]) @ weights
            uniq, cnt = np.unique(bits, return_counts=True)
            rows.extend(
                (int(doc_id), int(h), int(c)) for h, c in zip(uniq, cnt)
            )
        yield pd.DataFrame(rows, columns=["doc_id", "fh", "m"])


def video_frame_pairs_from(ids: DataFrame) -> DataFrame:
    """Video pairs sharing near-dup sampled frames: (vid_a, vid_b,
    n_frame_matches = matching frame-instance pairs across all matched
    class pairs, min_hamming), from a (doc_id) frame — factored out so
    the scale probe can drive the identical pipeline at any corpus
    size.  See the header comment for the distinct-hash-grain + DF-cap
    scale design."""
    avi = ids.repartition("doc_id").mapInPandas(
        synth_avi_batch, VIDEO_PAYLOAD_SCHEMA
    )
    # membership grain (doc_id, fh, m) comes straight out of the Arrow
    # body — all sampled frames of a doc live in its one payload row, so
    # the frame-grain exchange + HashAggregate pair the JVM-side groupBy
    # paid is gone; the boilerplate cut still runs at class grain, and
    # over membership rows count(*) IS count(DISTINCT doc_id), so the df
    # aggregate keeps map-side partials (a plain count) instead of the
    # two-exchange distinct-aggregate rewrite
    member0 = tracked_persist(
        avi.mapInPandas(frame_phash_batch, FRAME_MEMBER_SCHEMA)
    )
    ok = (
        member0.groupBy("fh")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= FRAME_DF_CAP)
        .select("fh")
    )
    member = tracked_persist(member0.join(ok.hint("shuffle_hash"), "fh"))
    # banding reads the persisted member (ok itself is single-use: a
    # third cache for it costs an extra build job at toy scale and buys
    # nothing — the distinct below is cache-served)
    bands = member.select("fh").distinct().select(
        "fh",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.shiftright("fh", b * FRAME_BAND_BITS)
                    .bitwiseAND(F.lit((1 << FRAME_BAND_BITS) - 1))
                    .alias("key"),
                )
                for b in range(4)
            ])
        ).alias("bk"),
    ).select("fh", "bk.band", "bk.key")
    a, b = bands.alias("a"), bands.alias("b")
    x = F.col("a.fh").bitwiseXOR(F.col("b.fh"))
    ham = F.bit_count(x)
    # exactly-once emission via the first agreeing band (the identical
    # class pair, fh == fh, agrees everywhere and survives at band 0
    # only); the trailing distinct and its exchange are gone
    agrees = [
        F.shiftright(x, bb * FRAME_BAND_BITS).bitwiseAND(
            F.lit((1 << FRAME_BAND_BITS) - 1)
        )
        == 0
        for bb in range(4)
    ]
    # h_a <= h_b keeps identical-frame classes as self-pairs (two
    # videos sharing the SAME class are the strongest match)
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.fh") <= F.col("b.fh"))
            & (F.col("a.band") == first_agreeing_band(agrees)),
        )
        .select(
            F.col("a.fh").alias("h_a"),
            F.col("b.fh").alias("h_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= FRAME_HAMMING_MAX)
    )
    ma, mb = member.alias("ma"), member.alias("mb")
    expanded = (
        cand.join(ma, F.col("ma.fh") == F.col("h_a"))
        .join(mb.hint("shuffle_hash"), F.col("mb.fh") == F.col("h_b"))
        # h_a < h_b: the two cross terms (X@h_a x Y@h_b, Y@h_a x X@h_b)
        # are DISTINCT instance-pair sets, keep both; h_a == h_b: the
        # ma/mb swap is the SAME set, keep one ordering only
        .filter(
            F.when(
                F.col("h_a") == F.col("h_b"),
                F.col("ma.doc_id") < F.col("mb.doc_id"),
            ).otherwise(F.col("ma.doc_id") != F.col("mb.doc_id"))
        )
        .select(
            F.least("ma.doc_id", "mb.doc_id").alias("vid_a"),
            F.greatest("ma.doc_id", "mb.doc_id").alias("vid_b"),
            (F.col("ma.m") * F.col("mb.m")).alias("mm"),
            "hamming",
        )
    )
    return expanded.groupBy("vid_a", "vid_b").agg(
        F.sum("mm").alias("n_frame_matches"),
        F.min("hamming").alias("min_hamming"),
    )


def dedup_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry face of ``video_frame_pairs_from`` over documents."""
    return video_frame_pairs_from(
        load_table(spark, sf_dir, "documents").select("doc_id")
    )


DEDUP_VIDEO_FRAMES_SQL = f"""
WITH vid AS (
  SELECT doc_id,
         {VIDEO_BASE_FRAMES} + doc_id % {VIDEO_MOD_FRAMES} AS n_frames
  FROM documents
),
fr AS (
  SELECT doc_id, f.f AS f
  FROM vid,
       (SELECT unnest(range({VIDEO_BASE_FRAMES + VIDEO_MOD_FRAMES})) AS f) f
  WHERE f.f < n_frames AND f.f % {FRAME_SAMPLE_EVERY} = 0
),
px AS (
  SELECT doc_id, f, i.i AS i,
         (doc_id * 31 + f * 257 + i.i * 7919) % 256 AS v
  FROM fr, (SELECT unnest(range({FRAME_HASH_BITS})) AS i) i
),
tot AS (SELECT doc_id, f, sum(v) AS t FROM px GROUP BY 1, 2),
sigs AS (
  SELECT p.doc_id, p.f,
         CAST(sum(CASE WHEN p.v * {FRAME_HASH_BITS} > t.t
                       THEN (CAST(1 AS BIGINT) << p.i) ELSE 0 END)
              AS BIGINT) AS fh
  FROM px p JOIN tot t USING (doc_id, f)
  GROUP BY 1, 2
),
ok AS (
  SELECT fh FROM sigs GROUP BY fh
  HAVING count(DISTINCT doc_id) <= {FRAME_DF_CAP}
),
member AS (
  SELECT s.doc_id, s.fh, count(*) AS m
  FROM sigs s JOIN ok USING (fh)
  GROUP BY 1, 2
),
bands AS (
  SELECT fh, p.p AS band,
         (fh >> (p.p * {FRAME_BAND_BITS}))
         & {(1 << FRAME_BAND_BITS) - 1} AS key
  FROM (SELECT DISTINCT fh FROM member),
       (SELECT unnest(range(4)) AS p) p
),
cand AS (
  SELECT DISTINCT a.fh AS h_a, b.fh AS h_b,
         bit_count(xor(a.fh, b.fh)) AS hamming
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.key = b.key AND a.fh <= b.fh
  WHERE bit_count(xor(a.fh, b.fh)) <= {FRAME_HAMMING_MAX}
),
expanded AS (
  SELECT least(ma.doc_id, mb.doc_id) AS vid_a,
         greatest(ma.doc_id, mb.doc_id) AS vid_b,
         ma.m * mb.m AS mm, c.hamming
  FROM cand c
  JOIN member ma ON ma.fh = c.h_a
  JOIN member mb ON mb.fh = c.h_b
  WHERE CASE WHEN c.h_a = c.h_b THEN ma.doc_id < mb.doc_id
             ELSE ma.doc_id <> mb.doc_id END
)
SELECT vid_a, vid_b,
       CAST(sum(mm) AS BIGINT) AS n_frame_matches,
       min(hamming) AS min_hamming
FROM expanded
GROUP BY 1, 2
"""


# --------------------------------------------------------------------- #
# audio fingerprint near-dup
# --------------------------------------------------------------------- #
# Completes the modality set (text / image / video / AUDIO all carry
# exact-oracled near-dup dedup): a 48-bit sign-bit fingerprint over the
# first AUDIO_FP_BITS PCM samples (every fixture clip has >= 64) — the
# zero-crossing-pattern fingerprint, integer-exact and robust to
# uniform gain, the toy form of spectral-peak fingerprinting.  Same
# scale design as dedup_video_frames: distinct-hash grain (identical
# clips collapse BEFORE any join), DF-cap on boilerplate classes
# (jingles, silence), 4x12-bit banding, Hamming <= 3 pigeonhole.  The
# fixture algebra plants near-dups: doc and doc+66 differ by a -2
# waveform shift (31*66 = 2046 = -2 mod 2048), flipping only samples
# sitting in [0, 2) — usually zero of the first 48.
AUDIO_FP_BITS = 48
AUDIO_FP_BAND_BITS = AUDIO_FP_BITS // 4  # 12
AUDIO_FP_HAMMING_MAX = 3
AUDIO_FP_DF_CAP = 50

AUDIO_FP_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("fh", LongType()),
])


def audio_fp_batch(batches: Iterator) -> Iterator:
    """mapInPandas body: WAV bytes -> 48-bit sign fingerprint, via the
    real stdlib ``wave`` parse.  Only the first AUDIO_FP_BITS frames are
    read from the container (the fingerprint never looks past them), and
    the sign-bit pack is one vectorized numpy dot per clip instead of a
    per-sample Python loop (guide §4.2: batch-native work inside the
    Arrow boundary)."""
    import io
    import wave

    import numpy as np
    import pandas as pd

    weights = np.left_shift(
        np.int64(1), np.arange(AUDIO_FP_BITS, dtype=np.int64)
    )
    for pdf in batches:
        fhs = []
        for payload in pdf["payload"]:
            with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
                raw = w.readframes(AUDIO_FP_BITS)
            samples = np.frombuffer(raw, dtype="<i2")[:AUDIO_FP_BITS]
            fhs.append(int(((samples >= 0) * weights[: len(samples)]).sum()))
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "fh": fhs})


def audio_fp_pairs_from(ids: DataFrame) -> DataFrame:
    """Near-dup audio pairs (doc_a, doc_b, hamming) from a (doc_id)
    frame — the dedup_video_frames class-grain pipeline over one
    fingerprint per clip."""
    wav = ids.repartition("doc_id").mapInPandas(
        synth_wav_batch, AUDIO_PAYLOAD_SCHEMA
    )
    sigs = tracked_persist(wav.mapInPandas(audio_fp_batch, AUDIO_FP_SCHEMA))
    # sigs carries exactly one row per doc_id, so count(*) per fh IS
    # count(DISTINCT doc_id): the plain count keeps map-side partial
    # aggregation and one exchange where the distinct-aggregate rewrite
    # paid two
    ok = (
        sigs.groupBy("fh")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= AUDIO_FP_DF_CAP)
        .select("fh")
    )
    member = tracked_persist(
        sigs.join(ok.hint("shuffle_hash"), "fh").select("doc_id", "fh")
    )
    # banding reads the persisted member (ok is single-use; the distinct
    # below is cache-served)
    bands = member.select("fh").distinct().select(
        "fh",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.shiftright("fh", b * AUDIO_FP_BAND_BITS)
                    .bitwiseAND(F.lit((1 << AUDIO_FP_BAND_BITS) - 1))
                    .alias("key"),
                )
                for b in range(4)
            ])
        ).alias("bk"),
    ).select("fh", "bk.band", "bk.key")
    a, b = bands.alias("a"), bands.alias("b")
    x = F.col("a.fh").bitwiseXOR(F.col("b.fh"))
    ham = F.bit_count(x)
    # exactly-once emission via the first agreeing band — the distinct
    # and its class-pair exchange are gone (video_frame_pairs precedent)
    agrees = [
        F.shiftright(x, bb * AUDIO_FP_BAND_BITS).bitwiseAND(
            F.lit((1 << AUDIO_FP_BAND_BITS) - 1)
        )
        == 0
        for bb in range(4)
    ]
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.fh") <= F.col("b.fh"))
            & (F.col("a.band") == first_agreeing_band(agrees)),
        )
        .select(
            F.col("a.fh").alias("h_a"),
            F.col("b.fh").alias("h_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= AUDIO_FP_HAMMING_MAX)
    )
    ma, mb = member.alias("ma"), member.alias("mb")
    # No trailing distinct: each doc carries exactly ONE fh (member is
    # doc-grain) and cand is distinct over (h_a, h_b) with h_a <= h_b, so
    # an unordered doc pair materializes under exactly one class pair —
    # h_a < h_b puts da and db in disjoint classes (one emission), and
    # h_a == h_b is ordered by doc_id (one emission).  The old set-dedup
    # exchange over the output pairs was a no-op.
    return (
        cand.join(ma, F.col("ma.fh") == F.col("h_a"))
        .join(mb.hint("shuffle_hash"), F.col("mb.fh") == F.col("h_b"))
        .filter(
            F.when(
                F.col("h_a") == F.col("h_b"),
                F.col("ma.doc_id") < F.col("mb.doc_id"),
            ).otherwise(F.col("ma.doc_id") != F.col("mb.doc_id"))
        )
        .select(
            F.least("ma.doc_id", "mb.doc_id").alias("doc_a"),
            F.greatest("ma.doc_id", "mb.doc_id").alias("doc_b"),
            "hamming",
        )
    )


def dedup_audio_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry face of ``audio_fp_pairs_from`` over documents."""
    return audio_fp_pairs_from(
        load_table(spark, sf_dir, "documents").select("doc_id")
    )


DEDUP_AUDIO_FP_SQL = f"""
WITH sigs AS (
  SELECT d.doc_id,
         CAST(sum(CASE WHEN ((d.doc_id * 31 + i.i * 7919) % 2048) - 1024
                            >= 0
                       THEN (CAST(1 AS BIGINT) << i.i) ELSE 0 END)
              AS BIGINT) AS fh
  FROM (SELECT doc_id FROM documents) d,
       (SELECT unnest(range({AUDIO_FP_BITS})) AS i) i
  GROUP BY 1
),
ok AS (
  SELECT fh FROM sigs GROUP BY fh
  HAVING count(DISTINCT doc_id) <= {AUDIO_FP_DF_CAP}
),
member AS (SELECT s.doc_id, s.fh FROM sigs s JOIN ok USING (fh)),
bands AS (
  SELECT fh, p.p AS band,
         (fh >> (p.p * {AUDIO_FP_BAND_BITS}))
         & {(1 << AUDIO_FP_BAND_BITS) - 1} AS key
  FROM (SELECT DISTINCT fh FROM member),
       (SELECT unnest(range(4)) AS p) p
),
cand AS (
  SELECT DISTINCT a.fh AS h_a, b.fh AS h_b,
         bit_count(xor(a.fh, b.fh)) AS hamming
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.key = b.key AND a.fh <= b.fh
  WHERE bit_count(xor(a.fh, b.fh)) <= {AUDIO_FP_HAMMING_MAX}
)
SELECT DISTINCT least(ma.doc_id, mb.doc_id) AS doc_a,
       greatest(ma.doc_id, mb.doc_id) AS doc_b,
       c.hamming
FROM cand c
JOIN member ma ON ma.fh = c.h_a
JOIN member mb ON mb.fh = c.h_b
WHERE CASE WHEN c.h_a = c.h_b THEN ma.doc_id < mb.doc_id
           ELSE ma.doc_id <> mb.doc_id END
"""


MULTIMODAL_QUERIES: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    "multimodal_meta": (multimodal_meta, MULTIMODAL_META_SQL),
    "multimodal_features": (multimodal_features, MULTIMODAL_FEATURES_SQL),
    "multimodal_frames": (multimodal_frames, MULTIMODAL_FRAMES_SQL),
    "multimodal_audio": (multimodal_audio, MULTIMODAL_AUDIO_SQL),
    "multimodal_video": (multimodal_video, MULTIMODAL_VIDEO_SQL),
    "dedup_phash": (dedup_phash, DEDUP_PHASH_SQL),
    "dedup_phash_cluster": (dedup_phash_cluster, DEDUP_PHASH_CLUSTER_SQL),
    "dedup_video_frames": (dedup_video_frames, DEDUP_VIDEO_FRAMES_SQL),
    "dedup_audio_fp": (dedup_audio_fp, DEDUP_AUDIO_FP_SQL),
}
