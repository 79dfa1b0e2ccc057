"""Baseline JPEG codec tests: encode->decode round trips within
quantization error, subsampling, grayscale behavior via the decoder's
component path, determinism, and the registered Spark query."""

from __future__ import annotations

import numpy as np
import pytest

from hq_master_data_warehouse_spark.operators.jpeg import (
    decode_jpeg,
    encode_jpeg,
)
from hq_master_data_warehouse_spark.operators.multimodal import (
    decode_image,
)


def _rt(img: np.ndarray, **kw) -> np.ndarray:
    h, w, _ = img.shape
    enc = encode_jpeg(img.tobytes(), w, h, **kw)
    dec = decode_jpeg(enc)
    assert (dec["width"], dec["height"], dec["mode"]) == (w, h, "RGB")
    return np.frombuffer(dec["pixels"], dtype=np.uint8).reshape(
        h, w, 3
    )


def test_flat_color_roundtrip_near_exact():
    img = np.full((16, 16, 3), [200, 80, 40], dtype=np.uint8)
    out = _rt(img)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1


def test_gradient_roundtrip_within_quant_error():
    xx, yy = np.meshgrid(np.arange(24), np.arange(17))
    img = np.stack(
        [(xx * 10) % 256, (yy * 9) % 256, ((xx + yy) * 5) % 256],
        axis=-1,
    ).astype(np.uint8)
    out = _rt(img)
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.max() <= 24  # Annex-K-Q50 worst-case on smooth ramps
    assert err.mean() <= 4.0


def test_subsampled_420_roundtrip_and_odd_dims():
    xx, yy = np.meshgrid(np.arange(21), np.arange(13))
    img = np.stack(
        [(xx * 7) % 256, (yy * 11) % 256, (xx * yy) % 256], axis=-1
    ).astype(np.uint8)
    out = _rt(img, subsample=True)
    err = np.abs(out.astype(int) - img.astype(int))
    # chroma is 2x2-averaged: luma structure must survive
    assert err.mean() <= 16.0


def test_decode_is_deterministic():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (16, 24, 3), dtype=np.uint8)
    enc = encode_jpeg(img.tobytes(), 24, 16)
    assert decode_jpeg(enc)["pixels"] == decode_jpeg(enc)["pixels"]


def test_decode_image_dispatches_jpeg():
    img = np.full((8, 8, 3), 128, dtype=np.uint8)
    enc = encode_jpeg(img.tobytes(), 8, 8)
    out = decode_image(enc)
    assert out["mode"] == "RGB" and out["width"] == 8


def test_progressive_and_garbage_rejected():
    img = np.full((8, 8, 3), 10, dtype=np.uint8)
    enc = bytearray(encode_jpeg(img.tobytes(), 8, 8))
    # flip SOF0 (0xC0) to SOF2 (progressive)
    i = enc.find(b"\xff\xc0")
    enc[i + 1] = 0xC2
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(enc))
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01not a jpeg")


def test_hand_built_bitstream_decodes_to_known_pixels():
    """Decoder pin INDEPENDENT of the encoder (the oracle replay
    cancels the Huffman layer between encode and decode, so a
    symmetric encoder+decoder bug is invisible to it -- this test is
    the complement): a grayscale 8x8 JPEG whose scan bits are written
    BY HAND (Annex K canonical codes: DC category 3 = '100', magnitude
    5 = '101', AC EOB = '1010', 1-padded to 0x96 0xBF) must decode to
    the exact flat plane the fixed-point IDCT of a lone DC coefficient
    predicts."""
    import struct

    from hq_master_data_warehouse_spark.operators.jpeg import (
        AC_LUM_SPEC,
        CS_FP,
        DC_LUM_SPEC,
        FP_CCOEF_SHIFT,
        FP_DCT_SHIFT,
        FP_PLANE_SHIFT,
        QUANT_LUM,
        ZIGZAG,
    )

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(
            ">H", len(body) + 2
        ) + body

    def dht(tc, th, spec):
        bits, vals = spec
        return seg(
            0xC4, bytes([tc << 4 | th]) + bytes(bits) + bytes(vals)
        )

    jpg = b"\xff\xd8"
    jpg += seg(0xDB, bytes([0]) + bytes(QUANT_LUM[ZIGZAG].tolist()))
    jpg += seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    jpg += dht(0, 0, DC_LUM_SPEC) + dht(1, 0, AC_LUM_SPEC)
    jpg += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    jpg += bytes([0b10010110, 0b10111111])  # hand-written scan bits
    jpg += b"\xff\xd9"

    out = decode_jpeg(jpg)
    assert (out["width"], out["height"], out["mode"]) == (8, 8, "L")

    # expected: DC level 5, dequant 5*16=80, IDCT of a lone DC is the
    # flat plane CS_FP[0,0]^2 * 80 at scale 2^28
    deq = 5 * int(QUANT_LUM[0])
    s28 = int(CS_FP[0, 0]) ** 2 * deq
    sh = 2 * FP_DCT_SHIFT - FP_PLANE_SHIFT
    s12 = (abs(s28) + (1 << (sh - 1))) >> sh
    pix = min(
        max(
            (s12 + (128 << FP_PLANE_SHIFT) + (1 << (FP_PLANE_SHIFT - 1)))
            >> FP_PLANE_SHIFT,
            0,
        ),
        255,
    )
    assert FP_CCOEF_SHIFT == 16  # constants the arithmetic above assumes
    got = np.frombuffer(out["pixels"], dtype=np.uint8)
    assert got.shape == (64,)
    assert set(got.tolist()) == {pix}


def test_spark_decode_jpeg_query(spark):
    from hq_master_data_warehouse_spark.registry import (
        QUERIES,
        load_catalog,
    )

    load_catalog()
    out = QUERIES["multimodal_decode_jpeg"](
        spark, "/root/testdata/sf0.001"
    )
    rows = out.collect()
    assert rows and all(
        r["width"] == 8 and r["height"] == 8 and r["n_pixels"] == 64
        for r in rows
    )
    assert all(0.0 <= r["mean_byte"] <= 255.0 for r in rows)
