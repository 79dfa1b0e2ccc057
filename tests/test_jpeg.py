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
