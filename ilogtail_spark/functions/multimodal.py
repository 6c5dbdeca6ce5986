"""Multimodal columns: image/audio/video as binary columns + typed meta.

Image decode/encode/resize are REAL for BMP (24-bit uncompressed BI_RGB
— fixed 54-byte header + raw pixel rows, implemented here in pure
Python/numpy, no codec library needed), and video frame SAMPLING is
real for BMPS (the trivial concatenated-BMP container below):
`synthetic_media` generates genuine BMP/BMPS payloads,
`extract_features(fake=False)` and `resize_media(fake=False)` decode
images for real, `sample_frames(fake=False)` seeks and slices real
frames, and everything is pinned by round-trips plus hand-built
known-answer bytes. Compressed formats (PNG/JPEG images, h264 video)
need libraries absent from this container: PNG/JPEG dispatch to PIL
when `codecs_available()` (PIL or pyvips), anything else raises a clear
error instead of pretending; `fake=True` keeps the deterministic
byte-statistics kernels for plumbing tests.

Pattern: binary payload + typed metadata struct travel together;
kernels are `mapInPandas` over Arrow batches so each Python worker
touches a whole column chunk at once (never row-at-a-time).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


# ---------------------------------------------------------------------
# Pure-Python BMP codec (24-bit uncompressed BI_RGB). BMP's fixed
# 54-byte header + raw bottom-up BGR pixel rows (4-byte-aligned) make it
# decodable without any codec library — which turns the image kernels
# from stubs into real, testable decoders in this container.
# ---------------------------------------------------------------------

_BMP_HEADER_SIZE = 54  # BITMAPFILEHEADER (14) + BITMAPINFOHEADER (40)


def _bmp_row_size(width: int) -> int:
    """Bytes per stored pixel row: 3*width padded up to 4-byte alignment."""
    return (3 * width + 3) & ~3


def encode_bmp(pixels) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a 24-bit BI_RGB BMP
    (bottom-up rows, zero padding) — byte-layout per the public
    BITMAPFILEHEADER/BITMAPINFOHEADER format."""
    import numpy as np

    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"encode_bmp expects (h, w, 3) RGB, got {arr.shape}")
    h, w = arr.shape[:2]
    row = _bmp_row_size(w)
    size = _BMP_HEADER_SIZE + row * h
    header = struct.pack(
        "<2sIHHI", b"BM", size, 0, 0, _BMP_HEADER_SIZE
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, row * h, 2835, 2835, 0, 0
    )
    body = np.zeros((h, row), dtype=np.uint8)
    body[:, : 3 * w] = arr[::-1, :, ::-1].reshape(h, 3 * w)  # bottom-up, BGR
    return header + body.tobytes()


def decode_bmp(payload: bytes):
    """Decode a 24-bit uncompressed BMP into an (h, w, 3) uint8 RGB
    array. Handles bottom-up (positive height) and top-down (negative
    height) row order and per-row 4-byte padding; rejects anything that
    is not plain BI_RGB 24bpp."""
    import numpy as np

    if payload is None or len(payload) < _BMP_HEADER_SIZE or payload[:2] != b"BM":
        raise ValueError("not a BMP payload (missing 'BM' magic)")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h_signed = struct.unpack_from("<Iii", payload, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if bpp != 24 or compression != 0:
        raise ValueError(
            f"unsupported BMP variant (bpp={bpp}, compression={compression}); "
            "only 24-bit uncompressed BI_RGB is implemented"
        )
    top_down = h_signed < 0
    h = -h_signed if top_down else h_signed
    row = _bmp_row_size(w)
    need = data_offset + row * h
    if len(payload) < need:
        raise ValueError(f"truncated BMP: {len(payload)} bytes, need {need}")
    body = np.frombuffer(payload, dtype=np.uint8, count=row * h, offset=data_offset)
    rows = body.reshape(h, row)[:, : 3 * w].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR → RGB


# ---------------------------------------------------------------------
# Pure-Python PNG codec (8-bit RGB/RGBA, non-interlaced). PNG is zlib
# (stdlib) + per-row byte filters over a chunked container — nothing in
# the format needs a codec library for the baseline case, so the
# COMPRESSED-image path becomes real in this container too: the decoder
# handles all five scanline filters (None/Sub/Up/Average/Paeth), both
# RGB and RGBA (alpha dropped), verifies chunk CRCs, and rejects
# interlaced/palette/16-bit variants with a clear error (those dispatch
# to PIL when present). Byte layout per the public PNG specification
# (RFC 2083 / ISO 15948).
# ---------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def encode_png(pixels, *, filter_type: int = 0) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as an 8-bit non-interlaced
    PNG. `filter_type` (0-4) is applied to EVERY scanline — real
    encoders pick per-row, but a uniform choice keeps the stream
    deterministic while still exercising each reconstruction path in
    the decoder (the round-trip tests cover all five)."""
    import zlib

    import numpy as np

    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"encode_png expects (h, w, 3) RGB, got {arr.shape}")
    if not 0 <= filter_type <= 4:
        raise ValueError(f"filter_type must be 0-4, got {filter_type}")
    h, w = arr.shape[:2]
    bpp = 3
    raw = arr.astype(np.int16)
    zeros_row = np.zeros((w, bpp), dtype=np.int16)
    lines = []
    for y in range(h):
        cur = raw[y]
        prior = raw[y - 1] if y > 0 else zeros_row
        left = np.vstack([zeros_row[:1], cur[:-1]])
        ul = np.vstack([zeros_row[:1], prior[:-1]])
        if filter_type == 0:
            filt = cur
        elif filter_type == 1:
            filt = cur - left
        elif filter_type == 2:
            filt = cur - prior
        elif filter_type == 3:
            filt = cur - (left + prior) // 2
        else:  # Paeth
            filt = cur - _paeth(left, prior, ul)
        lines.append(bytes([filter_type]) + (filt % 256).astype(np.uint8).tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + _png_chunk(b"IEND", b"")
    )


def _paeth(a, b, c):
    """The Paeth predictor (PNG spec §6.6), vectorized over int16."""
    import numpy as np

    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def decode_png(payload: bytes):
    """Decode an 8-bit non-interlaced truecolor PNG (color type 2 RGB or
    6 RGBA — alpha dropped) into an (h, w, 3) uint8 RGB array. Verifies
    chunk CRCs; raises ValueError for palette/16-bit/interlaced
    variants (the PIL fallback's territory)."""
    import zlib

    import numpy as np

    if payload is None or bytes(payload[:8]) != _PNG_SIG:
        raise ValueError("not a PNG payload (bad signature)")
    payload = bytes(payload)
    pos = 8
    ihdr = None
    idat = []
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        typ = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {typ!r} CRC mismatch")
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or color not in (2, 6) or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG variant (depth={depth}, color={color}, "
            f"interlace={interlace}); only 8-bit non-interlaced RGB/RGBA "
            "decodes natively — PNG/JPEG beyond that need PIL/pyvips"
        )
    bpp = 3 if color == 2 else 4
    stride = w * bpp
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError(f"PNG data length {len(raw)}, need {h * (stride + 1)}")
    out = np.zeros((h, stride), dtype=np.uint8)
    zeros = np.zeros(stride, dtype=np.int16)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int16)
        prior = out[y - 1].astype(np.int16) if y > 0 else zeros
        if ft == 0:
            rec = line
        elif ft == 2:
            rec = line + prior
        elif ft in (1, 3, 4):
            # left-dependent filters are sequential along the row by
            # construction; recurrence done pixel-group-wise in numpy
            rec = np.empty(stride, dtype=np.int16)
            for x in range(0, stride, bpp):
                a = rec[x - bpp : x] if x else zeros[:bpp]
                b = prior[x : x + bpp]
                if ft == 1:
                    rec[x : x + bpp] = (line[x : x + bpp] + a) % 256
                elif ft == 3:
                    rec[x : x + bpp] = (line[x : x + bpp] + (a + b) // 2) % 256
                else:
                    c = prior[x - bpp : x] if x else zeros[:bpp]
                    rec[x : x + bpp] = (
                        line[x : x + bpp] + _paeth(a, b, c)
                    ) % 256
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        out[y] = rec % 256
    px = out.reshape(h, w, bpp)
    return px[:, :, :3].copy()


# ---------------------------------------------------------------------
# BMPS: a trivial uncompressed video container — concatenated BMP
# frames behind a fixed header (magic, frame count, ms-per-frame, frame
# byte lengths). The codec-free analog of an MJPEG/AVI stream: it makes
# frame SAMPLING (seek + slice + decode) real in this container, which
# is the part of video handling that is Spark-plumbing rather than
# codec work.
# ---------------------------------------------------------------------

_BMPS_MAGIC = b"BMPS"


def encode_bmps(frames: list, frame_ms: int) -> bytes:
    """Pack (h, w, 3) uint8 RGB frames into a BMPS container."""
    blobs = [encode_bmp(f) for f in frames]
    head = _BMPS_MAGIC + struct.pack("<II", len(blobs), frame_ms)
    head += b"".join(struct.pack("<I", len(b)) for b in blobs)
    return head + b"".join(blobs)


def bmps_info(payload: bytes) -> tuple[int, int]:
    """(n_frames, frame_ms) of a BMPS payload."""
    if payload is None or bytes(payload[:4]) != _BMPS_MAGIC:
        raise ValueError("not a BMPS payload (missing 'BMPS' magic)")
    n, frame_ms = struct.unpack_from("<II", payload, 4)
    return n, frame_ms


def bmps_frame(payload: bytes, idx: int) -> bytes:
    """The idx-th frame's BMP bytes (seek via the length table)."""
    n, _ = bmps_info(payload)
    if not 0 <= idx < n:
        raise IndexError(f"frame {idx} out of range (n={n})")
    lengths = struct.unpack_from(f"<{n}I", payload, 12)
    start = 12 + 4 * n + sum(lengths[:idx])
    return bytes(payload[start : start + lengths[idx]])


def _solid_rgb(media_id: int) -> tuple[int, int, int]:
    """The deterministic per-image fill color of `synthetic_media` —
    distinct per channel so a BGR/RGB swap or row-padding misalignment
    corrupts the per-channel means the DuckDB oracle recomputes."""
    return (media_id * 37 % 256, media_id * 59 % 256, media_id * 83 % 256)


def _frame_rgb(media_id: int, frame: int) -> tuple[int, int, int]:
    """Deterministic per-frame fill color of synthetic BMPS videos."""
    return (
        (media_id * 37 + frame * 11) % 256,
        (media_id * 59 + frame * 23) % 256,
        (media_id * 83 + frame * 31) % 256,
    )


def synthetic_media(
    spark: SparkSession, n: int = 64, *, image_codec: str = "bmp"
) -> DataFrame:
    """Deterministic media table. Image rows (id % 3 == 0) carry REAL
    payloads — 24-bit BMP by default, or genuine zlib-compressed PNGs
    with ``image_codec="png"`` (filter type id % 5, so the oracle query
    over a PNG corpus exercises every scanline-filter reconstruction
    path); solid fill from `_solid_rgb`, small dims chosen so some BMP
    rows need 4-byte padding. Video rows (id % 3 == 2) carry REAL BMPS
    containers — one 4x4 `_frame_rgb` frame per second of duration_ms;
    audio payloads stay opaque deterministic bytes (sha2 of the id,
    repeated). All metadata is modular arithmetic on the id, so an
    oracle can recompute it."""
    if image_codec not in ("bmp", "png"):
        raise ValueError(f"image_codec must be 'bmp' or 'png', got {image_codec!r}")

    @F.pandas_udf(T.BinaryType())
    def gen_bmp(media_id, width, height):  # type: ignore[no-untyped-def]
        import numpy as np
        import pandas as pd

        out = []
        for mid, w, h in zip(media_id, width, height):
            arr = np.empty((int(h), int(w), 3), dtype=np.uint8)
            arr[:, :] = _solid_rgb(int(mid))
            if image_codec == "png":
                out.append(encode_png(arr, filter_type=int(mid) % 5))
            else:
                out.append(encode_bmp(arr))
        return pd.Series(out)

    @F.pandas_udf(T.BinaryType())
    def gen_bmps(media_id, duration_ms):  # type: ignore[no-untyped-def]
        import numpy as np
        import pandas as pd

        out = []
        for mid, dur in zip(media_id, duration_ms):
            frames = []
            for f in range(int(dur) // 1000):
                arr = np.empty((4, 4, 3), dtype=np.uint8)
                arr[:, :] = _frame_rgb(int(mid), f)
                frames.append(arr)
            out.append(encode_bmps(frames, 1000))
        return pd.Series(out)

    # image dims: (id div 3) % 3 offsets make a third of the widths
    # non-multiples of 4 — every decode exercises row padding
    img_w = ((F.col("id") % 16 + 1) * 4 + F.expr("id div 3") % 3).cast("int")
    img_h = ((F.col("id") % 9 + 1) * 4 + F.expr("id div 5") % 4).cast("int")
    duration = ((F.col("id") % 30 + 1) * 1000).cast("int")
    is_image = F.col("id") % 3 == 0
    is_video = F.col("id") % 3 == 2
    df = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.when(is_image, gen_bmp(F.col("id"), img_w, img_h))
        .when(is_video, gen_bmps(F.col("id"), duration))
        .otherwise(
            F.to_binary(
                F.repeat(
                    F.sha2(F.col("id").cast("string"), 256),
                    ((F.col("id") % 7) + 1).cast("int"),
                ),
                F.lit("utf-8"),
            )
        )
        .alias("payload"),
        F.struct(
            F.when(is_image, img_w)
            .when(is_video, F.lit(4))
            .otherwise(((F.col("id") % 16 + 1) * 64).cast("int"))
            .alias("width"),
            F.when(is_image, img_h)
            .when(is_video, F.lit(4))
            .otherwise(((F.col("id") % 9 + 1) * 64).cast("int"))
            .alias("height"),
            duration.alias("duration_ms"),
            F.element_at(
                F.array(F.lit(image_codec), F.lit("opus"), F.lit("bmps")),
                (F.col("id") % 3 + 1).cast("int"),
            ).alias("codec"),
        ).alias("meta"),
    )
    return df


def decode_image(payload: bytes):
    """Decode an image payload to an (h, w, 3) uint8 RGB array.
    BMP decodes natively (pure Python); so does baseline PNG (8-bit
    non-interlaced RGB/RGBA — stdlib zlib, `decode_png`). Exotic PNG
    variants and JPEG dispatch to PIL when importable. Unknown formats
    raise ValueError."""
    if payload is not None and len(payload) >= 2 and bytes(payload[:2]) == b"BM":
        return decode_bmp(payload)
    if payload is not None and bytes(payload[:4]) == b"\x89PNG":
        try:
            return decode_png(payload)
        except ValueError:
            if not codecs_available():
                raise
    if payload is not None and (
        bytes(payload[:4]) == b"\x89PNG" or bytes(payload[:2]) == b"\xff\xd8"
    ):
        if not codecs_available():
            raise ValueError(
                "JPEG payload needs PIL or pyvips, neither is importable"
            )
        import io

        import numpy as np
        from PIL import Image

        return np.asarray(Image.open(io.BytesIO(bytes(payload))).convert("RGB"))
    raise ValueError("unrecognized image payload (not BMP/PNG/JPEG)")


def codecs_available() -> bool:
    """True when a compressed-format codec stack (PIL or pyvips) is
    importable on the driver. NOT required for BMP — that codec is
    implemented here in pure Python."""
    for mod in ("PIL", "pyvips"):
        try:
            __import__(mod)
            return True
        except ImportError:
            continue
    return False




def extract_features(df: DataFrame, *, feature_dim: int = 8, fake: bool = False) -> DataFrame:
    """Feature extraction over Arrow batches via mapInPandas.

    `fake=False` (default): image payloads are REALLY decoded
    (`decode_image` — BMP natively, PNG/JPEG via PIL when present) and
    the feature is [width, height, mean_r, mean_g, mean_b, std_lum,
    min_lum, max_lum] (padded/truncated to `feature_dim`). Audio/video
    payloads get deterministic byte statistics — their codecs are not in
    this container, and that fallback is documented, not hidden.

    `fake=True`: byte statistics for every kind — the plumbing kernel
    (UDF signature, batch shape, schema, partitioning all identical).
    """

    def _byte_stats(payload, np):
        arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
        if len(arr) == 0:
            arr = np.zeros(1, dtype=np.float32)
        qs = np.quantile(arr, np.linspace(0, 1, feature_dim - 2))
        return np.concatenate([[arr.mean(), arr.std()], qs]).astype(np.float32).tolist()

    def _fit(vals):
        vals = list(vals)[:feature_dim]
        return vals + [0.0] * (feature_dim - len(vals))

    def _batch(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in it:
            feats = []
            nbytes = []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                payload = payload if payload is not None else b""
                if not fake and kind == "image" and len(payload) > 0:
                    px = decode_image(payload).astype(np.float64)
                    h, w = px.shape[:2]
                    lum = px.mean(axis=2)
                    feats.append(
                        _fit(
                            [
                                float(w),
                                float(h),
                                float(px[:, :, 0].mean()),
                                float(px[:, :, 1].mean()),
                                float(px[:, :, 2].mean()),
                                float(lum.std()),
                                float(lum.min()),
                                float(lum.max()),
                            ]
                        )
                    )
                else:
                    feats.append(_byte_stats(payload, np))
                nbytes.append(len(payload))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pd.Series(nbytes, dtype="int32"),
                    "feature": feats,
                }
            )

    return df.mapInPandas(_batch, FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)


def resize_media(
    df: DataFrame, width: int, height: int, *, fake: bool = True
) -> DataFrame:
    """Resize via mapInPandas: binary in → binary out with rewritten meta.

    `fake=False`: image payloads are REALLY resized — decode
    (`decode_image`), nearest-neighbor sample to (height, width) with
    numpy index arithmetic, re-encode as BMP. Non-image rows pass
    through unchanged (resize is an image op; their meta is untouched).

    `fake=True` (default): deterministic `width*height`-byte payload by
    tiling/truncating the source bytes for EVERY kind — same I/O shape,
    schema, and batch handling, for plumbing tests and non-decodable
    payloads."""

    def _batch(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        target = width * height
        for pdf in it:
            payloads = []
            metas = []
            for payload, meta, kind in zip(pdf["payload"], pdf["meta"], pdf["kind"]):
                m = dict(meta)
                if not fake:
                    if kind == "image" and payload is not None and len(payload) > 0:
                        px = decode_image(payload)
                        ys = (np.arange(height) * px.shape[0]) // height
                        xs = (np.arange(width) * px.shape[1]) // width
                        payloads.append(encode_bmp(px[ys][:, xs]))
                        m["width"], m["height"] = width, height
                    else:
                        payloads.append(
                            bytes(payload) if payload is not None else None
                        )
                else:
                    b = (bytes(payload) if payload is not None else b"") or b"\x00"
                    payloads.append((b * (target // len(b) + 1))[:target])
                    m["width"], m["height"] = width, height
                metas.append(m)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": payloads,
                    "meta": metas,
                }
            )

    return df.mapInPandas(_batch, RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_ts_ms", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame, every_ms: int = 1000, *, frame_bytes: int = 64, fake: bool = False
) -> DataFrame:
    """Frame sampling: the timestamp plan (`frame_sample_plan`) drives
    per-frame extraction over Arrow batches.

    `fake=False` (default): REAL seek+slice on BMPS containers — the
    frame at `frame_ts_ms` is located via the container's length table
    and its complete BMP bytes are emitted (decodable downstream with
    `decode_bmp`). Compressed video (h264 etc.) would need codec
    libraries absent from this container: a non-BMPS payload raises a
    clear ValueError in the kernel rather than pretending.

    `fake=True`: deterministic byte-slice per timestamp — the plumbing
    kernel (same plan shape, schema, and batch handling)."""
    plan = frame_sample_plan(df, every_ms).join(
        df.select("media_id", "payload"), "media_id"
    )

    def _batch(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            frames = []
            for payload, ts in zip(pdf["payload"], pdf["frame_ts_ms"]):
                if not fake:
                    if payload is None or len(payload) == 0:
                        frames.append(None)
                        continue
                    n, frame_ms = bmps_info(payload)  # raises on non-BMPS
                    idx = min(int(ts) // frame_ms, n - 1)
                    frames.append(bmps_frame(payload, idx))
                else:
                    b = (bytes(payload) if payload is not None else b"") or b"\x00"
                    start = ts % max(len(b) - frame_bytes, 1)
                    frames.append((b[start:] + b)[:frame_bytes])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "frame_ts_ms": pdf["frame_ts_ms"].astype("int32"),
                    "frame": frames,
                }
            )

    return plan.mapInPandas(_batch, FRAME_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: computes the frame timestamps to
    decode per video (pure column math — the expensive decode would
    consume this plan). Shows the explode-shape the real kernel needs."""
    return (
        df.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("meta.duration_ms") - 1, F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )
