"""Multimodal column plumbing (SURVEY.md par.2.11 / north star).

Images/audio/video are opaque ``binary`` columns riding in the same
DataFrame as typed metadata -- Spark's ``binaryFile`` source at ingest,
Parquet BYTE_ARRAY at rest.  The Spark-side plumbing here (schemas,
partition-preserving transforms, Arrow-batched ``mapInPandas``
signatures and batch shapes) is real and tested; the actual
image/audio codecs are NOT in this container, so the decode step is a
clearly-marked stub (``decode_image``) plus a deterministic fake
featurizer that exercises the exact same plumbing.

Fixture role-play: the binary payload is the document text utf-8
encoded; at 100 TB the payloads are real media and the constraint that
matters is embedded below: binaries never pass through Python row-by-
row, only as Arrow record batches, and metadata extraction stays in
JVM expressions wherever the format allows.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.loaders import load_table


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Attach the opaque payload + typed metadata struct -- the
    canonical multimodal row layout: (id, binary, struct<meta>)."""
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length(payload).alias("byte_len"),
            F.col("source").alias("origin"),
        ).alias("media_meta"),
    )


# -- JVM-side metadata extraction over the binary column: checksums,
#    sizes, and derived decode parameters without touching Python.
@query(
    "multimodal_binary_metadata",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS byte_len,
           sha256(text) AS payload_sha256,
           CAST(octet_length(encode(text)) % 640 + 16 AS INT)
               AS fake_width,
           CAST((octet_length(encode(text)) * 7) % 480 + 16 AS INT)
               AS fake_height
    FROM documents
    """,
)
def multimodal_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    binary = with_binary_payload(docs)
    blen = F.col("media_meta.byte_len")
    return binary.select(
        "doc_id",
        blen.cast("long").alias("byte_len"),
        F.sha2(F.col("payload"), 256).alias("payload_sha256"),
        (blen % 640 + 16).cast("int").alias("fake_width"),
        ((blen * 7) % 480 + 16).cast("int").alias("fake_height"),
    )


def _ppm_tokens(payload: bytes, n: int) -> tuple[list[bytes], int]:
    """First ``n`` whitespace-separated header tokens of a PNM file
    (``#`` comments skipped), plus the offset of the byte after the
    single whitespace that terminates the last token."""
    tokens: list[bytes] = []
    i = 0
    while len(tokens) < n:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if i < len(payload) and payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i] != 0x0A:
                i += 1
            continue
        start = i
        while i < len(payload) and not payload[i : i + 1].isspace():
            i += 1
        if start == i:
            raise ValueError("truncated PNM header")
        tokens.append(payload[start:i])
    return tokens, i + 1  # skip the single whitespace after maxval


#: PNG file signature (public spec: PNG (Portable Network Graphics)
#: Specification, W3C/ISO 15948, section 5.2)
_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_defilter(
    raw: bytes, width: int, height: int, bpp: int
) -> bytes:
    """Reverse PNG scanline filtering (spec section 9, filter types
    0=None 1=Sub 2=Up 3=Average 4=Paeth) over the decompressed IDAT
    stream: each scanline is one filter-type byte + ``width*bpp``
    filtered bytes."""
    stride = width * bpp
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG IDAT length does not match geometry")
    out = bytearray(stride * height)
    prev = bytearray(stride)
    for r in range(height):
        base = r * (stride + 1)
        ft = raw[base]
        line = bytearray(raw[base + 1 : base + 1 + stride])
        if ft == 0:
            pass
        elif ft == 1:  # Sub: predictor = byte bpp to the left
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ft == 2:  # Up: predictor = same byte previous row
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average of left and up
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth predictor
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = (
                    a
                    if pa <= pb and pa <= pc
                    else (b if pb <= pc else c)
                )
                line[i] = (line[i] + pred) & 0xFF
        else:
            raise ValueError(f"invalid PNG filter type {ft}")
        out[r * stride : (r + 1) * stride] = line
        prev = line
    return bytes(out)


def _png_decode(payload: bytes) -> dict:
    """Pure-Python PNG decode via stdlib ``zlib``: 8-bit-depth
    truecolor (RGB, color type 2) and truecolor+alpha (RGBA, color
    type 6), non-interlaced, all five scanline filters, chunk CRCs
    verified.  Palette/gray/16-bit/interlaced variants raise -- they
    are format-breadth, not plumbing."""
    import struct
    import zlib

    pos = 8
    ihdr = None
    idat = bytearray()
    while pos + 12 <= len(payload):
        length, ctype = struct.unpack_from(">I4s", payload, pos)
        body = payload[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated PNG chunk")
        crc = struct.unpack_from(">I", payload, pos + 8 + length)[0]
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG {ctype!r} chunk CRC mismatch")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT chunk")
    width, height, depth, color, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError("invalid PNG compression/filter method")
    if depth != 8 or color not in (2, 6) or interlace != 0:
        raise NotImplementedError(
            "only 8-bit non-interlaced RGB/RGBA PNG is supported here "
            "(palette/gray/16-bit/Adam7 need PIL in production)"
        )
    bpp = 3 if color == 2 else 4
    pixels = _png_defilter(
        zlib.decompress(bytes(idat)), width, height, bpp
    )
    return {
        "width": width,
        "height": height,
        "mode": "RGB" if color == 2 else "RGBA",
        "pixels": pixels,
    }


def encode_png(
    pixels: bytes,
    width: int,
    height: int,
    mode: str = "RGB",
    row_filters: list[int] | None = None,
) -> bytes:
    """Minimal valid PNG encoder (stdlib ``zlib``) for fixtures and the
    decode round-trip query: 8-bit RGB/RGBA, per-row filter types
    chosen by ``row_filters`` (default all 0) so tests can exercise
    every defilter branch with known-good input."""
    import struct
    import zlib

    bpp = 3 if mode == "RGB" else 4
    stride = width * bpp
    if len(pixels) != stride * height:
        raise ValueError("pixel buffer does not match geometry")
    filters = row_filters or [0] * height
    raw = bytearray()
    prev = bytes(stride)
    for r in range(height):
        line = pixels[r * stride : (r + 1) * stride]
        ft = filters[r]
        raw.append(ft)
        if ft == 0:
            raw += line
        elif ft == 1:
            raw += bytes(
                (line[i] - (line[i - bpp] if i >= bpp else 0)) & 0xFF
                for i in range(stride)
            )
        elif ft == 2:
            raw += bytes(
                (line[i] - prev[i]) & 0xFF for i in range(stride)
            )
        elif ft == 3:
            raw += bytes(
                (
                    line[i]
                    - (
                        ((line[i - bpp] if i >= bpp else 0) + prev[i])
                        >> 1
                    )
                )
                & 0xFF
                for i in range(stride)
            )
        elif ft == 4:
            out_row = bytearray()
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = (
                    a
                    if pa <= pb and pa <= pc
                    else (b if pb <= pc else c)
                )
                out_row.append((line[i] - pred) & 0xFF)
            raw += out_row
        else:
            raise ValueError(f"invalid PNG filter type {ft}")
        prev = line

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(
        ">IIBBBBB", width, height, 8, 2 if mode == "RGB" else 6, 0, 0, 0
    )
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def decode_image(payload: bytes) -> dict:
    """Pure-Python decode of the common public image formats with no
    external codec: binary PPM (``P6``), 24-bit uncompressed BMP,
    8-bit RGB/RGBA non-interlaced PNG (stdlib ``zlib``), and baseline
    sequential JPEG (``operators/jpeg.py``: Huffman + DCT from the
    public T.81 spec) -- to ``{"width", "height", "mode", "pixels"}``
    with ``pixels`` packed row-major (top-down, no padding).
    Production may still swap this for PIL/opencv (SIMD speed,
    progressive JPEG); the surrounding mapInPandas plumbing is
    unchanged either way."""
    import struct

    if payload[:8] == _PNG_SIG:
        return _png_decode(payload)
    if payload[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg

        return decode_jpeg(payload)
    if payload[:2] == b"P6":
        (_, w_tok, h_tok, max_tok), off = _ppm_tokens(payload, 4)
        width, height, maxval = int(w_tok), int(h_tok), int(max_tok)
        if maxval > 255:
            raise ValueError("16-bit PPM not supported")
        need = width * height * 3
        pixels = payload[off : off + need]
        if len(pixels) != need:
            raise ValueError("truncated PPM pixel data")
        return {
            "width": width,
            "height": height,
            "mode": "RGB",
            "pixels": pixels,
        }
    if payload[:2] == b"BM":
        if len(payload) < 54:
            raise ValueError("truncated BMP header")
        data_off = struct.unpack_from("<I", payload, 10)[0]
        width, height = struct.unpack_from("<ii", payload, 18)
        planes, bpp = struct.unpack_from("<HH", payload, 26)
        compression = struct.unpack_from("<I", payload, 30)[0]
        if bpp != 24 or compression != 0:
            raise NotImplementedError(
                "only uncompressed 24-bit BMP is supported here"
            )
        top_down = height < 0
        height = abs(height)
        row_bytes = width * 3
        stride = (row_bytes + 3) & ~3  # rows pad to 4-byte boundary
        rows = []
        order = range(height) if top_down else range(height - 1, -1, -1)
        for r in order:
            start = data_off + r * stride
            row = payload[start : start + row_bytes]
            if len(row) != row_bytes:
                raise ValueError("truncated BMP pixel data")
            # BMP stores BGR; flip each pixel to RGB
            flipped = bytearray(row)
            flipped[0::3], flipped[2::3] = row[2::3], row[0::3]
            rows.append(bytes(flipped))
        return {
            "width": width,
            "height": height,
            "mode": "RGB",
            "pixels": b"".join(rows),
        }
    raise NotImplementedError(
        "unsupported image format (PPM P6, 24-bit BMP, 8-bit RGB/RGBA "
        "PNG, and baseline JPEG decode here; progressive JPEG / other "
        "containers need PIL/opencv in production)"
    )


def decode_audio(payload: bytes) -> dict:
    """Pure-Python decode of uncompressed 16-bit PCM WAV (RIFF) to
    ``{"sample_rate", "n_channels", "samples"}`` with ``samples`` a
    list of int frames (channel-interleaved).  Compressed audio
    (MP3/AAC/OGG) needs an external codec; production swaps this for
    ffmpeg/soundfile with the mapInPandas plumbing unchanged."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError(
            "unsupported audio container (PCM WAV decodes here; "
            "compressed codecs need ffmpeg in production)"
        )
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid, csize = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + csize]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + csize + (csize & 1)  # chunks pad to even offsets
    if fmt is None or data is None:
        raise ValueError("truncated WAV: missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _br, _ba, bits = fmt
    if audio_format != 1 or bits != 16:
        raise NotImplementedError(
            "only uncompressed 16-bit PCM WAV is supported here"
        )
    n = len(data) // 2
    samples = list(struct.unpack(f"<{n}h", data[: n * 2]))
    return {
        "sample_rate": sample_rate,
        "n_channels": n_channels,
        "samples": samples,
    }


#: fixture decode geometry: every document payload is wrapped into an
#: 8x4 P6 image (96 pixel bytes) JVM-side, so the decode path runs on
#: real, well-formed images without shipping binary fixtures.
DECODE_W, DECODE_H = 8, 4

_DECODE_SCHEMA = (
    "doc_id long, width int, height int, n_pixels long, "
    "mean_byte double"
)


def _decode_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    import numpy as np

    for pdf in batches:
        out = {
            "doc_id": pdf["doc_id"],
            "width": [],
            "height": [],
            "n_pixels": [],
            "mean_byte": [],
        }
        for raw in pdf["payload"]:
            img = decode_image(bytes(raw))
            px = np.frombuffer(img["pixels"], dtype=np.uint8)
            out["width"].append(img["width"])
            out["height"].append(img["height"])
            out["n_pixels"].append(img["width"] * img["height"])
            out["mean_byte"].append(float(px.mean()) if px.size else 0.0)
        yield pd.DataFrame(out)


#: WAV fixture geometry: 128 payload bytes = 64 mono 16-bit samples
AUDIO_BYTES = 128
AUDIO_RATE = 8000

_AUDIO_SCHEMA = (
    "doc_id long, sample_rate int, n_channels int, n_samples long, "
    "mean_abs_amplitude double"
)


def _decode_audio_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    import numpy as np

    for pdf in batches:
        out = {
            "doc_id": pdf["doc_id"],
            "sample_rate": [],
            "n_channels": [],
            "n_samples": [],
            "mean_abs_amplitude": [],
        }
        for raw in pdf["payload"]:
            wav = decode_audio(bytes(raw))
            s = np.asarray(wav["samples"], dtype=np.int64)
            out["sample_rate"].append(wav["sample_rate"])
            out["n_channels"].append(wav["n_channels"])
            out["n_samples"].append(len(s))
            out["mean_abs_amplitude"].append(
                float(np.abs(s).mean()) if s.size else 0.0
            )
        yield pd.DataFrame(out)


@query(
    "multimodal_decode_audio",
    # r10 oracle conversion: the WAV container is a fixed RIFF header
    # + the first 128 payload bytes (zero-padded) as 64 mono 16-bit
    # LE samples, so the decoded stats are integer arithmetic DuckDB
    # replays from hex(encode(text)) via the '0x' cast (hi byte = 2nd
    # hex pair of each sample).  SUM/64 is a power-of-two division --
    # exact in both engines.
    oracle="""
    WITH pay AS (
        SELECT doc_id,
               substr(hex(encode(text)) || repeat('00', 128), 1, 256)
                   AS hx
        FROM documents
    ),
    samp AS (
        SELECT doc_id,
               CAST(concat('0x', substr(hx, 4*i + 3, 2),
                           substr(hx, 4*i + 1, 2)) AS INT) AS u
        FROM pay, LATERAL unnest(generate_series(0, 63)) AS t(i)
    )
    SELECT doc_id, 8000 AS sample_rate, 1 AS n_channels,
           CAST(64 AS BIGINT) AS n_samples,
           CAST(SUM(ABS(CASE WHEN u >= 32768
                             THEN u - 65536 ELSE u END))
                AS DOUBLE) / 64 AS mean_abs_amplitude
    FROM samp GROUP BY doc_id
    """,
)
def multimodal_decode_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real audio decode over ``mapInPandas``: each document payload is
    wrapped JVM-side into a well-formed 16-bit PCM WAV (RIFF/fmt/data
    chunks + 128 sample bytes, padded), then decoded back to rate/
    channels/sample stats by the pure-Python ``decode_audio``."""
    import struct

    docs = load_table(spark, sf_dir, "documents")
    binary = with_binary_payload(docs).select("doc_id", "payload")
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + AUDIO_BYTES)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, AUDIO_RATE, AUDIO_RATE * 2, 2, 16)
        + b"data"
        + struct.pack("<I", AUDIO_BYTES)
    )
    pad = (b"\x00" * AUDIO_BYTES).hex()
    wav = F.expr(
        f"concat(x'{hdr.hex()}', substring(concat(payload, x'{pad}'),"
        f" 1, {AUDIO_BYTES}))"
    )
    framed = binary.select("doc_id", wav.alias("payload"))
    return framed.mapInPandas(_decode_audio_batches, schema=_AUDIO_SCHEMA)


@query(
    "multimodal_decode_image",
    # r10 oracle conversion: the PPM container is headers + the raw
    # payload bytes (padded with 'x' = 0x78), so the decoded pixel
    # stats are byte arithmetic DuckDB replays from hex(encode(text)).
    oracle="""
    WITH pay AS (
        SELECT doc_id,
               substr(hex(encode(text)) || repeat('78', 96), 1, 192)
                   AS hx
        FROM documents
    ),
    b AS (
        SELECT doc_id,
               CAST(concat('0x', substr(hx, 2*i - 1, 2)) AS INT) AS v
        FROM pay, LATERAL unnest(generate_series(1, 96)) AS t(i)
    )
    SELECT doc_id, 8 AS width, 4 AS height,
           CAST(32 AS BIGINT) AS n_pixels,
           CAST(SUM(v) AS DOUBLE) / 96 AS mean_byte
    FROM b GROUP BY doc_id
    """,
)
def multimodal_decode_image(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real image decode over ``mapInPandas``: each document payload is
    wrapped JVM-side into a well-formed binary PPM (header + 96 pixel
    bytes, padded), then decoded back to width/height/pixel stats by
    the pure-Python ``decode_image``.  The Spark shape is the
    production one -- binary column in, Arrow batches through a
    decoder, fixed-width stats out; only the codec breadth differs."""
    docs = load_table(spark, sf_dir, "documents")
    binary = with_binary_payload(docs).select("doc_id", "payload")
    need = DECODE_W * DECODE_H * 3
    pad = ("x" * need).encode().hex()
    header = f"P6\n{DECODE_W} {DECODE_H}\n255\n".encode().hex()
    ppm = F.expr(
        f"concat(x'{header}', substring(concat(payload, x'{pad}'),"
        f" 1, {need}))"
    )
    framed = binary.select("doc_id", ppm.alias("payload"))
    return framed.mapInPandas(_decode_batches, schema=_DECODE_SCHEMA)


def _decode_png_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """PNG round-trip inside one Arrow batch loop: frame each payload's
    first 96 bytes as an 8x4 RGB PNG (per-row filter type r%5, so every
    defilter branch runs on real data), then decode through the same
    ``decode_image`` entry point the PPM/BMP paths use."""
    import numpy as np

    need = DECODE_W * DECODE_H * 3
    filters = [r % 5 for r in range(DECODE_H)]
    for pdf in batches:
        out = {
            "doc_id": pdf["doc_id"],
            "width": [],
            "height": [],
            "n_pixels": [],
            "mean_byte": [],
        }
        for raw in pdf["payload"]:
            buf = (bytes(raw) + b"x" * need)[:need]
            png = encode_png(
                buf, DECODE_W, DECODE_H, "RGB", row_filters=filters
            )
            img = decode_image(png)
            px = np.frombuffer(img["pixels"], dtype=np.uint8)
            out["width"].append(img["width"])
            out["height"].append(img["height"])
            out["n_pixels"].append(img["width"] * img["height"])
            out["mean_byte"].append(float(px.mean()) if px.size else 0.0)
        yield pd.DataFrame(out)


def _decode_jpeg_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Lossy-codec round-trip inside one Arrow batch loop: frame each
    payload's first 192 bytes as an 8x8 RGB image, encode to a real
    baseline JPEG (Annex K tables, Huffman + DCT), decode through the
    same ``decode_image`` entry point as PPM/BMP/PNG.  The mean byte
    reflects the decoded (quantized) pixels -- lossy by design, but
    deterministic: the same payload always yields identical output."""
    import numpy as np

    from .jpeg import encode_jpeg

    w = h = 8
    need = w * h * 3
    for pdf in batches:
        out = {
            "doc_id": pdf["doc_id"],
            "width": [],
            "height": [],
            "n_pixels": [],
            "mean_byte": [],
        }
        for raw in pdf["payload"]:
            buf = (bytes(raw) + b"x" * need)[:need]
            jpg = encode_jpeg(buf, w, h)
            img = decode_image(jpg)
            px = np.frombuffer(img["pixels"], dtype=np.uint8)
            out["width"].append(img["width"])
            out["height"].append(img["height"])
            out["n_pixels"].append(img["width"] * img["height"])
            out["mean_byte"].append(float(px.mean()) if px.size else 0.0)
        yield pd.DataFrame(out)


def _jpeg_oracle_sql() -> str:
    """Relational replay of the FIXED-POINT JPEG encode->decode
    pipeline (r11 oracle conversion, VERDICT r10 item 5).

    The codec's math core is integer-exact (operators/jpeg.py: 2^14
    integer DCT basis, 2^16 integer color coefficients, half-away
    integer shifts -- the libjpeg/hardware formulation), so the
    decoded pixels are a pure integer function of the quantized
    coefficients, and the quantized coefficients a pure integer
    function of the payload bytes.  The oracle replays payload ->
    YCbCr -> forward DCT -> quantize -> dequantize -> IDCT -> RGB ->
    mean entirely in SQL from the SAME constants the codec uses
    (every literal below is generated from operators/jpeg.py at
    import).  The Huffman layer is a lossless inverse pair that
    cancels between encode and decode -- but ONLY if both sides are
    correct: any bug in the bit writer/reader, canonical code
    builder, DC prediction, run-length coding, zigzag, dequantize, or
    either DCT flips the decoded bytes and fails the hash.  What this
    oracle does NOT independently witness is a symmetric Huffman bug
    (encode and decode wrong in exactly inverse ways) -- that class
    is covered by the hand-built bitstream pins in tests/test_jpeg.py.
    """
    from . import jpeg as J

    cs_list = ", ".join(
        str(int(v)) for row in J.CS_FP.tolist() for v in row
    )
    qlum = ", ".join(str(int(v)) for v in J.QUANT_LUM.tolist())
    qchr = ", ".join(str(int(v)) for v in J.QUANT_CHROM.tolist())
    s44 = 1 << (J.FP_CCOEF_SHIFT + 2 * J.FP_DCT_SHIFT)
    s45 = s44 * 2
    h16 = 1 << (2 * J.FP_DCT_SHIFT - J.FP_PLANE_SHIFT - 1)
    d16 = 1 << (2 * J.FP_DCT_SHIFT - J.FP_PLANE_SHIFT)
    h28 = 1 << (J.FP_PLANE_SHIFT + J.FP_CCOEF_SHIFT - 1)
    d28 = 1 << (J.FP_PLANE_SHIFT + J.FP_CCOEF_SHIFT)
    half12 = 128 << J.FP_PLANE_SHIFT
    c16 = 1 << J.FP_CCOEF_SHIFT

    def rdiv(e: str, h: int, d: int) -> str:
        # round-half-away division by d = 2h (jpeg._rdiv's SQL twin)
        return (
            f"(CASE WHEN ({e}) >= 0 THEN (({e}) + {h}) // {d} "
            f"ELSE -((-({e}) + {h}) // {d}) END)"
        )

    def clamp(e: str) -> str:
        return f"LEAST(GREATEST({e}, 0), 255)"

    return f"""
    WITH pay AS (
        SELECT doc_id,
               substr(hex(encode(text)) || repeat('78', 192), 1, 384)
                   AS hx
        FROM documents
    ),
    px AS (
        SELECT doc_id,
               CAST((i-1) // 8 AS INT) AS py,
               CAST((i-1) % 8 AS INT) AS pxx,
               CAST(concat('0x', substr(hx, 6*i-5, 2)) AS BIGINT) AS r,
               CAST(concat('0x', substr(hx, 6*i-3, 2)) AS BIGINT) AS g,
               CAST(concat('0x', substr(hx, 6*i-1, 2)) AS BIGINT) AS b
        FROM pay, LATERAL unnest(generate_series(1, 64)) AS t(i)
    ),
    chan AS (
        SELECT doc_id, 0 AS ch, py, pxx,
               {J.FP_Y[0]}*r + {J.FP_Y[1]}*g + {J.FP_Y[2]}*b
                   - {128 * c16} AS s
        FROM px
        UNION ALL
        SELECT doc_id, 1, py, pxx,
               ({J.FP_CB[0]})*r + ({J.FP_CB[1]})*g + {J.FP_CB[2]}*b
        FROM px
        UNION ALL
        SELECT doc_id, 2, py, pxx,
               {J.FP_CR[0]}*r + ({J.FP_CR[1]})*g + ({J.FP_CR[2]})*b
        FROM px
    ),
    basis AS (
        SELECT CAST((i-1) // 8 AS INT) AS k,
               CAST((i-1) % 8 AS INT) AS n,
               CAST(([{cs_list}])[i] AS BIGINT) AS cv
        FROM unnest(generate_series(1, 64)) AS t(i)
    ),
    quant AS (
        SELECT 0 AS tbl, CAST((i-1) // 8 AS INT) AS u,
               CAST((i-1) % 8 AS INT) AS vv,
               CAST(([{qlum}])[i] AS BIGINT) AS qv
        FROM unnest(generate_series(1, 64)) AS t(i)
        UNION ALL
        SELECT 1, CAST((i-1) // 8 AS INT), CAST((i-1) % 8 AS INT),
               CAST(([{qchr}])[i] AS BIGINT)
        FROM unnest(generate_series(1, 64)) AS t(i)
    ),
    fdct AS (
        SELECT c.doc_id, c.ch, bu.k AS u, bv.k AS vv,
               SUM(bu.cv * bv.cv * c.s) AS t
        FROM chan c
        JOIN basis bu ON bu.n = c.py
        JOIN basis bv ON bv.n = c.pxx
        GROUP BY 1, 2, 3, 4
    ),
    deq AS (
        SELECT f.doc_id, f.ch, f.u, f.vv,
               (CASE WHEN f.t >= 0
                     THEN (2*f.t + q.qv*{s44}) // (q.qv*{s45})
                     ELSE -((-2*f.t + q.qv*{s44}) // (q.qv*{s45}))
                END) * q.qv AS d
        FROM fdct f
        JOIN quant q ON q.tbl = CASE WHEN f.ch = 0 THEN 0 ELSE 1 END
                    AND q.u = f.u AND q.vv = f.vv
    ),
    p12 AS (
        SELECT doc_id, ch, py, pxx, {rdiv('s28', h16, d16)} AS s12
        FROM (
            SELECT d.doc_id, d.ch, byy.n AS py, bxx.n AS pxx,
                   SUM(byy.cv * bxx.cv * d.d) AS s28
            FROM deq d
            JOIN basis byy ON byy.k = d.u
            JOIN basis bxx ON bxx.k = d.vv
            GROUP BY 1, 2, 3, 4
        )
    ),
    ycc AS (
        SELECT doc_id, py, pxx,
               (MAX(CASE WHEN ch=0 THEN s12 END) + {half12}) * {c16}
                   AS ys,
               MAX(CASE WHEN ch=1 THEN s12 END) AS cb,
               MAX(CASE WHEN ch=2 THEN s12 END) AS cr
        FROM p12 GROUP BY 1, 2, 3
    ),
    rgbout AS (
        SELECT doc_id,
               {clamp(rdiv(f'ys + {J.FP_R_CR}*cr', h28, d28))} AS pr,
               {clamp(rdiv(
                   f'ys + ({J.FP_G_CB})*cb + ({J.FP_G_CR})*cr',
                   h28, d28))} AS pg,
               {clamp(rdiv(f'ys + {J.FP_B_CB}*cb', h28, d28))} AS pb
        FROM ycc
    )
    SELECT doc_id, 8 AS width, 8 AS height,
           CAST(64 AS BIGINT) AS n_pixels,
           CAST(SUM(pr + pg + pb) AS DOUBLE) / 192 AS mean_byte
    FROM rgbout GROUP BY doc_id
    """


@query("multimodal_decode_jpeg", oracle=_jpeg_oracle_sql())
def multimodal_decode_jpeg(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Baseline-JPEG decode over ``mapInPandas``: document payloads
    framed as real entropy-coded JPEGs and decoded by the pure-Python
    T.81 baseline codec (`operators/jpeg.py`) -- the last image
    format that previously needed an external library.  Value-level
    since r11: the fixed-point codec rewrite makes the decoded stats
    replayable relationally (see _jpeg_oracle_sql)."""
    docs = load_table(spark, sf_dir, "documents")
    binary = with_binary_payload(docs).select("doc_id", "payload")
    return binary.mapInPandas(
        _decode_jpeg_batches, schema=_DECODE_SCHEMA
    )


@query(
    "multimodal_decode_png",
    # r10 oracle conversion: the PNG round-trip is LOSSLESS, so the
    # decoded pixels must equal the pre-encode payload bytes (padded
    # with 'x' = 0x78) -- the oracle restates the input stats, and
    # any encoder/filter/defilter/inflate bug breaks the equality.
    oracle="""
    WITH pay AS (
        SELECT doc_id,
               substr(hex(encode(text)) || repeat('78', 96), 1, 192)
                   AS hx
        FROM documents
    ),
    b AS (
        SELECT doc_id,
               CAST(concat('0x', substr(hx, 2*i - 1, 2)) AS INT) AS v
        FROM pay, LATERAL unnest(generate_series(1, 96)) AS t(i)
    )
    SELECT doc_id, 8 AS width, 4 AS height,
           CAST(32 AS BIGINT) AS n_pixels,
           CAST(SUM(v) AS DOUBLE) / 96 AS mean_byte
    FROM b GROUP BY doc_id
    """,
)
def multimodal_decode_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressed-codec decode over ``mapInPandas``: document payloads
    framed as real zlib-compressed PNGs (all five scanline filters)
    and decoded by the pure-Python ``decode_image`` -- closing the
    "compressed formats need external libs" caveat for the most common
    image format using only the standard library.  Per-doc stats are
    pinned equal to the PPM-framed twin by pytest (same pixel bytes,
    different container)."""
    docs = load_table(spark, sf_dir, "documents")
    binary = with_binary_payload(docs).select("doc_id", "payload")
    return binary.mapInPandas(_decode_png_batches, schema=_DECODE_SCHEMA)


FEATURE_BINS = 16

# feature is a comma-joined fixed-scale string, not array<double>:
# list cells crash the gate's canonicalizer (pandas factorize on an
# unhashable cell) -- same encoding rule as array_functions_showcase.
_FEATURE_SCHEMA = "doc_id long, byte_len long, feature string"


def _featurize_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Deterministic fake featurizer: normalized 16-bin byte histogram
    per payload.  Stands in for decode+embed; identical Arrow batch
    shape to a real one (binary in -> fixed-size float vector out)."""
    for pdf in batches:
        feats = []
        for raw in pdf["payload"]:
            buf = bytes(raw)
            hist = [0] * FEATURE_BINS
            for byte in buf:
                hist[byte % FEATURE_BINS] += 1
            total = max(len(buf), 1)
            feats.append(
                ",".join(f"{h / total:.6f}" for h in hist)
            )
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "byte_len": [len(bytes(b)) for b in pdf["payload"]],
                "feature": feats,
            }
        )


@query(
    "multimodal_feature_extract",
    # r10 oracle conversion: the fake featurizer is a byte-level
    # deterministic function of the payload (16-bin low-nibble
    # histogram, %.6f formatting), and a byte's low nibble IS the
    # second hex digit of its hex encoding -- so DuckDB replays the
    # whole Arrow path from hex(encode(text)) without any decoder.
    # printf('%.6f') and Python's f'{x:.6f}' both correctly round
    # the identical double, so the strings match bit-for-bit.
    oracle="""
    WITH pay AS (
        SELECT doc_id, hex(encode(text)) AS hx,
               octet_length(encode(text)) AS blen
        FROM documents
    ),
    nib AS (
        SELECT p.doc_id,
               strpos('0123456789ABCDEF',
                      substr(p.hx, 2 * i, 1)) - 1 AS bin
        FROM pay p,
             LATERAL unnest(generate_series(1, p.blen)) AS t(i)
    ),
    counts AS (
        SELECT doc_id, bin, COUNT(*) AS c FROM nib GROUP BY 1, 2
    ),
    grid AS (
        SELECT p.doc_id, p.blen, b.bin, COALESCE(c.c, 0) AS c
        FROM pay p
        CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS bin) b
        LEFT JOIN counts c ON c.doc_id = p.doc_id AND c.bin = b.bin
    )
    SELECT doc_id, blen AS byte_len,
           string_agg(printf('%.6f', c / GREATEST(blen, 1)),
                      ',' ORDER BY bin) AS feature
    FROM grid
    GROUP BY doc_id, blen
    """,
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary -> fixed-size feature vector via ``mapInPandas``: the
    one sanctioned Python hot path (Arrow-batched, partition-parallel,
    never row-at-a-time).  Swap ``_featurize_batches`` for a real
    decode+model pass in production; schema and batch shape hold."""
    docs = load_table(spark, sf_dir, "documents")
    binary = with_binary_payload(docs).select("doc_id", "payload")
    return binary.mapInPandas(_featurize_batches, schema=_FEATURE_SCHEMA)


@query(
    "multimodal_frame_sample",
    # r10 oracle conversion: frame slicing is pure byte arithmetic
    # on the payload, so DuckDB replays it on hex(encode(text)) --
    # frame f covers hex chars [f*2*FS+1, 2*FS].  Frames are emitted
    # HEX-ENCODED (VARCHAR) because raw binary cells canonicalize
    # differently per engine (bytearray vs bytes str()).
    oracle="""
    WITH pay AS (
        SELECT doc_id, hex(encode(text)) AS hx,
               octet_length(encode(text)) // 32 AS n_frames
        FROM documents
    )
    SELECT doc_id, CAST(f AS INT) AS frame_no,
           substr(hx, f * 64 + 1, 64) AS frame_hex
    FROM pay,
         LATERAL unnest(generate_series(0, n_frames - 1)) AS t(f)
    WHERE n_frames > 0 AND f % 4 = 0
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling plumbing: segment the payload into
    fixed-size "frames" (JVM-side), keep every 4th -- the partition-
    and-schema shape of real frame extraction, with byte slices
    standing in for decoded frames (hex-encoded so the differential
    gate can compare them across engines)."""
    docs = load_table(spark, sf_dir, "documents")
    binary = with_binary_payload(docs)
    frame_size = 32
    n_frames = F.floor(F.col("media_meta.byte_len") / frame_size).cast("int")
    idx = F.when(
        n_frames > 0, F.sequence(F.lit(0), n_frames - 1)
    ).otherwise(F.array().cast("array<int>"))
    return (
        binary.select(
            "doc_id",
            F.posexplode(idx).alias("pos", "frame_no"),
            F.col("payload"),
        )
        .filter(F.col("frame_no") % 4 == 0)
        .select(
            "doc_id",
            "frame_no",
            F.hex(
                F.expr(
                    f"substring(payload, frame_no * {frame_size} + 1,"
                    f" {frame_size})"
                )
            ).alias("frame_hex"),
        )
    )


THUMB_BYTES = 64

_RESIZE_SCHEMA = "doc_id long, orig_len long, thumb binary"


def _resize_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Deterministic fake resize: strided byte sampling down to a
    fixed THUMB_BYTES "thumbnail".  A real implementation decodes,
    rescales, and re-encodes inside the same Arrow batch loop --
    batch shape and output schema are identical."""
    for pdf in batches:
        thumbs, lens = [], []
        for raw in pdf["payload"]:
            buf = bytes(raw)
            lens.append(len(buf))
            if not buf:
                thumbs.append(b"\x00" * THUMB_BYTES)
                continue
            stride = max(len(buf) // THUMB_BYTES, 1)
            sampled = buf[::stride][:THUMB_BYTES]
            thumbs.append(sampled.ljust(THUMB_BYTES, b"\x00"))
        yield pd.DataFrame(
            {"doc_id": pdf["doc_id"], "orig_len": lens, "thumb": thumbs}
        )


@query(
    "multimodal_resize",
    # r10 oracle conversion: the fake resize (strided byte sampling
    # + zero padding) is byte arithmetic, replayed in DuckDB over
    # hex(encode(text)): sampled byte i sits at hex chars
    # [i*stride*2+1, 2]; positions past the payload pad with '00'
    # exactly like ljust.  Thumb emitted hex-encoded (same binary-
    # cell canonicalization rule as multimodal_frame_sample).
    oracle=f"""
    WITH pay AS (
        SELECT doc_id, hex(encode(text)) AS hx,
               octet_length(encode(text)) AS blen,
               GREATEST(octet_length(encode(text)) // {THUMB_BYTES},
                        1) AS stride
        FROM documents
    )
    SELECT doc_id, blen AS orig_len,
           list_aggregate(
               list_transform(
                   generate_series(0, {THUMB_BYTES - 1}),
                   i -> CASE WHEN blen > 0 AND i * stride < blen
                             THEN substr(hx, i * stride * 2 + 1, 2)
                             ELSE '00' END),
               'string_agg', '') AS thumb_hex
    FROM pay
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media resize plumbing via ``mapInPandas``: every payload mapped
    to a fixed-size thumbnail, Arrow-batched and partition-parallel.
    At 100 TB this is the dominant media transform; the contract that
    scales is fixed output size per row and zero driver involvement."""
    docs = load_table(spark, sf_dir, "documents")
    binary = with_binary_payload(docs).select("doc_id", "payload")
    return binary.mapInPandas(
        _resize_batches, schema=_RESIZE_SCHEMA
    ).select(
        "doc_id", "orig_len", F.hex(F.col("thumb")).alias("thumb_hex")
    )


# ---------------------------------------------------------------------------
# Perceptual hash (pHash) image near-dup
# ---------------------------------------------------------------------------
_PHASH_SCHEMA = "doc_id long, phash string, band0 int, band1 int, band2 int, band3 int"


#: 8x8 fixed-point DCT-II basis at 2^14 scale, row-major -- the
#: standard fixed-point DCT practice (JPEG hardware quantizes its
#: basis exactly like this).  Computed ONCE here and embedded as
#: INTEGER literals in the SQL oracle, so libm cos() variance between
#: engines is irrelevant AND every downstream value is an exact
#: integer: luma at x1000 (299r + 587g + 114b), block-SUM pooling
#: (scales sign-vs-median comparisons uniformly), integer DCT, exact
#: integer median.  Bounds: |B| <= 2^14, luma < 2^18, 64 terms ->
#: |coef| < 2^52, comfortably exact in BIGINT.
import math as _math  # noqa: E402

PHASH_DCT_SCALE = 1 << 14
PHASH_BASIS: tuple[int, ...] = tuple(
    int(
        _math.copysign(
            _math.floor(
                abs(_math.cos(_math.pi * (2 * j + 1) * i / 16.0))
                * PHASH_DCT_SCALE
                + 0.5
            ),
            _math.cos(_math.pi * (2 * j + 1) * i / 16.0),
        )
    )
    for i in range(8)
    for j in range(8)
)


def phash64(pixels: bytes, w: int, h: int) -> int:
    """64-bit fixed-point-DCT perceptual hash of an RGB image:
    integer luma -> 8x8 block-sum pool -> integer 2D DCT-II
    (PHASH_BASIS) -> sign of the 64 lowest-frequency coefficients
    against their exact integer median (DC excluded, standard pHash).

    r10: every operation is exact integer arithmetic, so the whole
    hash replays bit-for-bit in the DuckDB oracle with plain
    (order-independent) SUMs -- the float/numpy formulation it
    replaces was engine-specific by summation order.  Identical input
    bytes always give identical hashes."""
    luma = [
        299 * pixels[3 * t] + 587 * pixels[3 * t + 1]
        + 114 * pixels[3 * t + 2]
        for t in range(w * h)
    ]
    bh, bw = max(1, h // 8), max(1, w // 8)
    pooled = [
        sum(
            luma[(r * bh + dr) * w + c * bw + dc]
            for dr in range(bh)
            for dc in range(bw)
        )
        for r in range(8)
        for c in range(8)
    ]
    B = PHASH_BASIS
    flat = [
        sum(
            B[i * 8 + k] * pooled[k * 8 + l] * B[j * 8 + l]
            for k in range(8)
            for l in range(8)  # noqa: E741
        )
        for i in range(8)
        for j in range(8)
    ]
    med = sorted(flat[1:])[31]  # exact middle of 63 integers
    bits = 0
    for i, v in enumerate(flat):
        if v > med:
            bits |= 1 << i
    return bits


def _phash_batches(batches):
    import pandas as pd

    w = h = 8
    need = w * h * 3
    for pdf in batches:
        out = {"doc_id": pdf["doc_id"], "phash": [],
               "band0": [], "band1": [], "band2": [], "band3": []}
        for raw in pdf["payload"]:
            buf = (bytes(raw) + b"x" * need)[:need]
            hv = phash64(buf, w, h)
            out["phash"].append(f"{hv:016x}")
            for b in range(4):
                out[f"band{b}"].append((hv >> (16 * b)) & 0xFFFF)
        yield pd.DataFrame(out)



def _phash_oracle() -> str:
    """DuckDB replay of the full fixed-point pHash pipeline: bytes ->
    integer luma -> integer DCT (PHASH_BASIS literals; plain SUM is
    safe because every term is an exact integer) -> median-sign
    bands -> banded candidate join -> exact Hamming (r10)."""
    bas = ", ".join(
        f"({i // 8}, {i % 8}, {v})" for i, v in enumerate(PHASH_BASIS)
    )
    return f"""
    WITH basis(i, k, v) AS (VALUES {bas}),
    pay AS (
        SELECT doc_id,
               substr(hex(encode(text)) || repeat('78', 192), 1, 384)
                   AS hx
        FROM documents
    ),
    luma AS (
        SELECT doc_id, t // 8 AS k, t % 8 AS l,
               299 * CAST(concat('0x',
                         substr(hx, 6*t + 1, 2)) AS BIGINT)
               + 587 * CAST(concat('0x',
                           substr(hx, 6*t + 3, 2)) AS BIGINT)
               + 114 * CAST(concat('0x',
                           substr(hx, 6*t + 5, 2)) AS BIGINT) AS p
        FROM pay, LATERAL unnest(generate_series(0, 63)) AS tt(t)
    ),
    coef AS (
        SELECT l.doc_id, bi.i * 8 + bj.i AS ij,
               SUM(bi.v * l.p * bj.v) AS f
        FROM luma l
        JOIN basis bi ON bi.k = l.k
        JOIN basis bj ON bj.k = l.l
        GROUP BY l.doc_id, bi.i, bj.i
    ),
    medv AS (
        SELECT doc_id, f AS med FROM (
            SELECT doc_id, f,
                   ROW_NUMBER() OVER (
                       PARTITION BY doc_id ORDER BY f) AS rn
            FROM coef WHERE ij <> 0
        ) WHERE rn = 32
    ),
    bands AS (
        SELECT c.doc_id, c.ij // 16 AS band,
               SUM(CASE WHEN c.f > m.med
                        THEN CAST(1 AS BIGINT) << (c.ij % 16)
                        ELSE 0 END) AS bval
        FROM coef c JOIN medv m ON m.doc_id = c.doc_id
        GROUP BY 1, 2
    ),
    cand AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a
        JOIN bands b ON a.band = b.band AND a.bval = b.bval
                    AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    ham AS (
        SELECT c.doc_a, c.doc_b,
               CAST(SUM(bit_count(xor(x.bval, y.bval))) AS INT)
                   AS hamming
        FROM cand c
        JOIN bands x ON x.doc_id = c.doc_a
        JOIN bands y ON y.doc_id = c.doc_b AND y.band = x.band
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, hamming FROM ham WHERE hamming <= 10
    """


@query("multimodal_phash_neardup", oracle=_phash_oracle())
def multimodal_phash_neardup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Image near-duplicate pairs by perceptual hash: payloads framed
    as 8x8 RGB images, pHash-ed in Arrow batches, then BANDED like
    MinHash LSH -- candidate pairs must share at least one of four
    16-bit hash bands (so the pair join is an equi-join on band
    values, never all-pairs), and candidates verify with exact
    Hamming distance <= 10.  This is the image-side analogue of
    dedup_minhash_lsh, closing the near-dup family across text,
    embeddings, and images."""
    docs = load_table(spark, sf_dir, "documents")
    binary = with_binary_payload(docs).select("doc_id", "payload")
    hashed = binary.mapInPandas(
        _phash_batches, schema=_PHASH_SCHEMA
    ).cache()
    bands = None
    for b in range(4):
        side = hashed.select(
            "doc_id",
            "phash",
            F.lit(b).alias("band"),
            F.col(f"band{b}").alias("bval"),
        )
        bands = side if bands is None else bands.unionByName(side)
    a = bands.select(
        F.col("doc_id").alias("doc_a"),
        F.col("phash").alias("ha"),
        "band",
        "bval",
    )
    bb = bands.select(
        F.col("doc_id").alias("doc_b"),
        F.col("phash").alias("hb"),
        "band",
        "bval",
    )
    cand = (
        a.join(bb, ["band", "bval"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "ha", "hb")
        .distinct()
    )
    # hash values occupy the full 64-bit range, so conv() of the
    # whole hex string can exceed signed BIGINT -- XOR 16-bit hex
    # chunks instead (each fits an int with room to spare)
    def chunk(col, i):
        return F.conv(
            F.substring(F.col(col), 4 * i + 1, 4), 16, 10
        ).cast("long")

    hamming = sum(
        F.bit_count(chunk("ha", i).bitwiseXOR(chunk("hb", i)))
        for i in range(4)
    )
    return cand.select(
        "doc_a", "doc_b", hamming.cast("int").alias("hamming")
    ).filter(F.col("hamming") <= 10)


# ---------------------------------------------------------------------------
# Windowed audio features (RMS + zero-crossing rate per frame)
# ---------------------------------------------------------------------------
# The feature-extraction step after multimodal_decode_audio: frame
# each decoded PCM stream into fixed windows (AUDIO_FRAME samples,
# hop AUDIO_HOP) and emit per-frame RMS energy and zero-crossing
# rate -- the two classic low-level descriptors every audio pipeline
# (VAD, silence trimming, onset detection) starts from.  Same Arrow
# batch shape as the decoders: binary column in, one output row per
# (doc, frame).  Deterministic: integer PCM in, fixed framing, both
# stats exact over int64 before the final float division.
AUDIO_FRAME = 16
AUDIO_HOP = 8

_AUDIO_FEAT_SCHEMA = (
    "doc_id long, frame int, start_sample int, rms double,"
    " zero_crossings int, zcr double"
)


def _audio_feature_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    import math as _math

    import numpy as np

    for pdf in batches:
        rows = {
            "doc_id": [],
            "frame": [],
            "start_sample": [],
            "rms": [],
            "zero_crossings": [],
            "zcr": [],
        }
        for doc_id, raw in zip(pdf["doc_id"], pdf["payload"]):
            wav = decode_audio(bytes(raw))
            s = np.asarray(wav["samples"], dtype=np.int64)
            i = 0
            frame = 0
            while i + AUDIO_FRAME <= len(s):
                w = s[i: i + AUDIO_FRAME]
                # exact integer sum-of-squares, then one sqrt
                rms = _math.sqrt(int((w * w).sum()) / AUDIO_FRAME)
                sgn = np.sign(w)
                nz = sgn[sgn != 0]
                zc = int((nz[1:] != nz[:-1]).sum()) if nz.size else 0
                rows["doc_id"].append(doc_id)
                rows["frame"].append(frame)
                rows["start_sample"].append(i)
                rows["rms"].append(rms)
                rows["zero_crossings"].append(zc)
                rows["zcr"].append(zc / (AUDIO_FRAME - 1))
                i += AUDIO_HOP
                frame += 1
        yield pd.DataFrame(rows)


@query(
    "multimodal_audio_features",
    # r10 oracle conversion: frames/RMS/ZCR over the fixed WAV
    # geometry are integer arithmetic on the first 128 payload bytes
    # (64 int16-LE samples), replayed from hex(encode(text)).  The
    # only float ops -- SUM(v*v)/16.0 (power-of-two division, exact)
    # then one SQRT, and zc/15.0 -- act on identical doubles in both
    # engines.  Zero-crossings count sign flips over the NONZERO
    # samples of each frame, exactly as the operator does.
    oracle="""
    WITH pay AS (
        SELECT doc_id,
               substr(hex(encode(text)) || repeat('00', 128), 1, 256)
                   AS hx
        FROM documents
    ),
    s AS (
        SELECT doc_id, i,
               CASE WHEN u >= 32768 THEN u - 65536 ELSE u END AS v
        FROM (
            SELECT doc_id, i,
                   CAST(concat('0x', substr(hx, 4*i + 3, 2),
                               substr(hx, 4*i + 1, 2)) AS INT) AS u
            FROM pay, LATERAL unnest(generate_series(0, 63)) AS t(i)
        )
    ),
    fr AS (
        SELECT doc_id, f, i, v
        FROM s, LATERAL unnest(
                 generate_series(0, (64 - 16) // 8)) AS g(f)
        WHERE s.i >= f * 8 AND s.i < f * 8 + 16
    ),
    rms AS (
        SELECT doc_id, f, SQRT(SUM(v * v) / 16.0) AS rms
        FROM fr GROUP BY 1, 2
    ),
    zc AS (
        SELECT doc_id, f,
               COUNT(*) FILTER (prev IS NOT NULL AND sgn <> prev)
                   AS zc
        FROM (
            SELECT doc_id, f, SIGN(v) AS sgn,
                   LAG(SIGN(v)) OVER (
                       PARTITION BY doc_id, f ORDER BY i) AS prev
            FROM fr WHERE v <> 0
        ) GROUP BY 1, 2
    )
    SELECT rms.doc_id, CAST(rms.f AS INT) AS frame,
           CAST(rms.f * 8 AS INT) AS start_sample,
           rms.rms,
           CAST(COALESCE(zc.zc, 0) AS INT) AS zero_crossings,
           COALESCE(zc.zc, 0) / 15.0 AS zcr
    FROM rms LEFT JOIN zc
      ON zc.doc_id = rms.doc_id AND zc.f = rms.f
    """,
)
def multimodal_audio_features(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Frame-level RMS/ZCR features over the same JVM-framed WAV
    payloads as multimodal_decode_audio (see its docstring for the
    RIFF framing)."""
    import struct

    docs = load_table(spark, sf_dir, "documents")
    binary = with_binary_payload(docs).select("doc_id", "payload")
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + AUDIO_BYTES)
        + b"WAVE"
        + b"fmt "
        + struct.pack(
            "<IHHIIHH", 16, 1, 1, AUDIO_RATE, AUDIO_RATE * 2, 2, 16
        )
        + b"data"
        + struct.pack("<I", AUDIO_BYTES)
    )
    pad = (b"\x00" * AUDIO_BYTES).hex()
    wav = F.expr(
        f"concat(x'{hdr.hex()}', substring(concat(payload, x'{pad}'),"
        f" 1, {AUDIO_BYTES}))"
    )
    framed = binary.select("doc_id", wav.alias("payload"))
    return framed.mapInPandas(
        _audio_feature_batches, schema=_AUDIO_FEAT_SCHEMA
    )
