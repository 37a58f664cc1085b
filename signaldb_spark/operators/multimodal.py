"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns + a typed metadata struct; decode /
feature-extraction / resize / frame-sampling run as Arrow-batched
``mapInPandas`` transforms so heavy per-item work distributes across
executors with vectorized transfer.

Decode: uncompressed formats (24-bit BMP, binary P5/P6 PNM) decode in
PURE PYTHON — real pixel parsing, no libraries, tested in this
container. Compressed formats (PNG/JPEG/...) need a codec: Pillow when
installed, else a clearly marked NotImplementedError. The default
bench path uses a documented deterministic arithmetic fake over the
byte payload so the whole operator sits under the SQL oracle; the
Spark-side plumbing — schema, batch iteration, partitioning — is
identical in all three modes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.StructType([
            T.StructField("mime", T.StringType(), True),
            T.StructField("n_bytes", T.LongType(), True),
        ]), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.LongType(), True),
        T.StructField("height", T.LongType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("brightness", T.DoubleType(), True),
    ]
)


def documents_as_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Adapter: treat document text bytes as an opaque media payload so
    the plumbing is exercisable on the driver tables."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, float]:
    """DETERMINISTIC FAKE decode (no media libs in this container).

    Derives plausible (width, height, brightness) from the payload
    bytes only — arithmetic is documented so an SQL oracle can mirror
    it: width = n%640+32, height = (n//640)%480+32,
    brightness = (first_byte + last_byte) / 510.
    """
    n = len(payload)
    width = n % 640 + 32
    height = (n // 640) % 480 + 32
    brightness = (payload[0] + payload[-1]) / 510 if n else 0.0
    return width, height, brightness


def _decode_bmp(payload: bytes):
    """Pure-Python decode of uncompressed 24-bit BMP (BI_RGB,
    BITMAPINFOHEADER) — real pixels, no libraries. Returns
    (width, height, mean-of-RGB-bytes / 255) or None if the payload is
    not a BMP this decoder handles (other depths/compressions fall
    through to Pillow)."""
    import struct

    if len(payload) < 54 or payload[:2] != b"BM":
        return None
    (pix_off,) = struct.unpack_from("<I", payload, 10)
    (hdr_size,) = struct.unpack_from("<I", payload, 14)
    if hdr_size < 40:
        return None
    width, height = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if bpp != 24 or compression != 0 or width <= 0 or height == 0:
        return None
    rows = abs(height)
    row_size = ((bpp * width + 31) // 32) * 4  # rows pad to 4 bytes
    if len(payload) < pix_off + rows * row_size:
        return None
    total = 0
    for r in range(rows):
        start = pix_off + r * row_size
        row = payload[start:start + width * 3]  # strip the padding
        total += sum(row)
    mean = total / (rows * width * 3)
    return width, rows, mean / 255.0


def _decode_pnm(payload: bytes):
    """Pure-Python decode of binary PNM — P5 (grayscale) / P6 (RGB),
    maxval <= 255, ``#`` comments allowed in the header. Returns
    (width, height, mean-of-sample-bytes / maxval) or None."""
    if payload[:2] not in (b"P5", b"P6"):
        return None
    channels = 1 if payload[:2] == b"P5" else 3
    pos, tokens = 2, []
    while len(tokens) < 3 and pos < len(payload):
        c = payload[pos:pos + 1]
        if c == b"#":  # comment runs to end of line
            while pos < len(payload) and payload[pos:pos + 1] != b"\n":
                pos += 1
        elif c.isspace():
            pos += 1
        else:
            start = pos
            while pos < len(payload) and not payload[pos:pos + 1].isspace():
                pos += 1
            tokens.append(payload[start:pos])
    try:
        width, height, maxval = (int(t) for t in tokens)
    except ValueError:
        return None
    if width <= 0 or height <= 0 or not 0 < maxval <= 255:
        return None
    # exactly one whitespace after maxval, then raster — but tolerate
    # out-of-spec CRLF writers ('\r\n' as one delimiter; a bare '\r'
    # followed by a raster starting 0x0A is vanishingly rarer than a
    # Windows-written file, which would otherwise silently shift every
    # sample by one byte)
    if pos >= len(payload) or not payload[pos:pos + 1].isspace():
        return None
    if payload[pos:pos + 2] == b"\r\n":
        pos += 2
    else:
        pos += 1
    n = width * height * channels
    raster = payload[pos:pos + n]
    if len(raster) < n:
        return None
    return width, height, (sum(raster) / n) / maxval


def _real_decode(payload: bytes):
    """Real image decode. Pillow first when installed — one brightness
    definition (ITU-R luma via ``convert("L")``) across every format.
    Without Pillow, uncompressed formats (24-bit BMP, binary P5/P6 PNM)
    still decode in pure Python — actual pixel parsing, zero
    dependencies, exercised by the test suite in this container — with
    brightness = mean of raw samples (documented divergence from luma,
    applies only where no codec exists at all); compressed formats then
    raise the clearly marked NotImplementedError."""
    try:
        import io

        from PIL import Image  # noqa: F401
    except ImportError:
        for dec in (_decode_bmp, _decode_pnm):
            out = dec(payload)
            if out is not None:
                return out
        raise NotImplementedError(
            "compressed-format decode requires Pillow; BMP/PNM decode "
            "natively and the deterministic fake covers the rest"
        ) from None
    img = Image.open(io.BytesIO(payload))  # pragma: no cover
    # brightness = mean grayscale / 255, same [0,1] range as the fake
    gray = img.convert("L")  # pragma: no cover
    hist = gray.histogram()  # pragma: no cover
    total = sum(hist) or 1  # pragma: no cover
    mean = sum(i * c for i, c in enumerate(hist)) / total  # pragma: no cover
    return img.width, img.height, mean / 255.0  # pragma: no cover


def extract_features(media: DataFrame, use_real_decoder: bool = False) -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    ``mapInPandas`` keeps the binary payload executor-side — nothing is
    collected to the driver; each Arrow batch holds whole payloads so
    per-item decode parallelism = partition count.
    """
    from ..shipping import ensure_package_on_workers

    ensure_package_on_workers(media.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = _real_decode if use_real_decoder else _fake_decode
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                w, h, br = decode(data)
                rows.append((int(media_id), w, h, len(data), round(br, 6)))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "n_bytes", "brightness"]
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.LongType(), True),
        T.StructField("height", T.LongType(), True),
        T.StructField("out_width", T.LongType(), True),
        T.StructField("out_height", T.LongType(), True),
        T.StructField("out_bytes", T.LongType(), True),
    ]
)


def resize_media(
    media: DataFrame, target_w: int = 224, target_h: int = 224,
    use_real_decoder: bool = False,
) -> DataFrame:
    """Aspect-preserving fit-in-box resize plan, Arrow-batched.

    Never upscales (scale capped at 1.0); output byte estimate shrinks
    with the area ratio. The decode is the same documented
    deterministic fake as extract_features (no media libs here), so the
    geometry arithmetic — the part that IS the operator — sits under an
    SQL oracle; a real decoder slots into the same batch loop.
    """
    from ..shipping import ensure_package_on_workers

    ensure_package_on_workers(media.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = _real_decode if use_real_decoder else _fake_decode
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                w, h, _ = decode(data)
                scale = min(target_w / w, target_h / h, 1.0)
                ow, oh = max(1, int(w * scale)), max(1, int(h * scale))
                rows.append(
                    (int(media_id), w, h, ow, oh, int(len(data) * scale * scale))
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height", "out_width", "out_height", "out_bytes"],
            )

    return media.mapInPandas(run, RESIZE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n_bytes: int = 1000) -> DataFrame:
    """'Frame sampling' plan for chunked media: one row per sampled
    offset — pure built-in sequence/explode (the real video path would
    decode at these offsets)."""
    n = F.col("meta.n_bytes")
    offsets = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(every_n_bytes))
    return media.select(
        "media_id",
        F.explode(offsets).alias("frame_offset"),
    )
