"""Production codec backend gating (PIL / soundfile behind the pure
decoders).  This sandbox ships neither library, so:

* the auto dispatcher must behave EXACTLY like the pure path on
  supported formats, and its refusals must carry both the pure
  reason and the production install hint;
* the pure==PIL parity pins run whenever PIL is importable and SKIP
  (never silently pass) when not -- they are the contract a
  production environment re-checks for free.
"""

from __future__ import annotations

import struct

import pytest

from hq_master_data_warehouse_spark.operators.multimodal import (
    decode_audio,
    decode_image,
    encode_png,
)
from hq_master_data_warehouse_spark.operators.multimodal_backends import (
    decode_audio_any,
    decode_image_any,
    pil_available,
    soundfile_available,
)


def _rgb_png() -> bytes:
    w, h = 5, 3
    pixels = bytes((x * 37 + y * 11 + c * 3) % 256
                   for y in range(h) for x in range(w) for c in range(3))
    return encode_png(pixels, w, h, "RGB", row_filters=[0, 1, 2])


def _pcm_wav() -> bytes:
    samples = [0, 1000, -1000, 32767, -32768, 42]
    data = struct.pack(f"<{len(samples)}h", *samples)
    return (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 2, 44100, 176400, 4, 16)
        + b"data" + struct.pack("<I", len(data)) + data
    )


def test_auto_equals_pure_on_supported_formats():
    png = _rgb_png()
    assert decode_image_any(png, "auto") == decode_image(png)
    assert decode_image_any(png, "pure") == decode_image(png)
    wav = _pcm_wav()
    assert decode_audio_any(wav, "auto") == decode_audio(wav)


def test_unknown_backend_rejected():
    with pytest.raises(ValueError, match="backend"):
        decode_image_any(_rgb_png(), "opencv")
    with pytest.raises(ValueError, match="backend"):
        decode_audio_any(_pcm_wav(), "ffmpeg-cli")


@pytest.mark.skipif(
    pil_available(), reason="PIL present: gating path not reachable"
)
def test_without_pil_refusal_carries_pure_reason_and_install_hint():
    mp3ish = b"ID3\x04not-an-image"
    with pytest.raises(NotImplementedError) as ei:
        decode_image_any(mp3ish, "auto")
    msg = str(ei.value)
    assert "unsupported image format" in msg  # the pure reason
    assert "pip install Pillow" in msg  # the production hint
    with pytest.raises(NotImplementedError, match="pip install Pillow"):
        decode_image_any(mp3ish, "pil")


@pytest.mark.skipif(
    soundfile_available(),
    reason="soundfile present: gating path not reachable",
)
def test_without_soundfile_refusal_carries_both_messages():
    with pytest.raises(NotImplementedError) as ei:
        decode_audio_any(b"OggS\x00fake", "auto")
    msg = str(ei.value)
    assert "compressed codecs" in msg
    assert "pip install soundfile" in msg


@pytest.mark.skipif(not pil_available(), reason="PIL not installed")
def test_pure_and_pil_agree_on_overlap_formats():  # pragma: no cover
    png = _rgb_png()
    pure = decode_image(png)
    pil = decode_image_any(png, "pil")
    assert (pil["width"], pil["height"], pil["mode"]) == (
        pure["width"],
        pure["height"],
        pure["mode"],
    )
    assert pil["pixels"] == pure["pixels"]


@pytest.mark.skipif(
    not soundfile_available(), reason="soundfile not installed"
)
def test_pure_and_soundfile_agree_on_pcm_wav():  # pragma: no cover
    wav = _pcm_wav()
    assert decode_audio_any(wav, "soundfile") == decode_audio(wav)
