"""Production codec backends behind the pure decoders (VERDICT r5
item 8 tier-2).

``operators/multimodal.py`` and ``operators/jpeg.py`` decode the
public baseline formats (PPM/BMP/non-interlaced-PNG/baseline-JPEG/
PCM-WAV) in pure Python so the engine is testable with zero native
dependencies.  Production corpora also contain progressive JPEG,
palette/16-bit PNG, and compressed audio -- formats those decoders
deliberately refuse with actionable NotImplementedError messages.

This module wires the PRODUCTION backends (PIL for images,
soundfile/ffmpeg for audio) behind those pure paths:

* ``decode_image_any(payload, backend="auto")`` -- "auto" tries the
  pure decoder first and falls back to PIL ONLY for the formats the
  pure path refuses, so in an environment without PIL behavior is
  byte-identical to today and every pure-path test keeps meaning;
  ``backend="pil"`` forces PIL (raises the actionable install hint
  when absent); ``backend="pure"`` is the unchanged pure path.
* ``decode_audio_any`` -- same shape with soundfile.
* The output CONTRACT is shared: PIL results are normalized to the
  pure decoders' ``{"width","height","mode","pixels"}`` /
  ``{"sample_rate","n_channels","samples"}`` dicts with identical
  pixel packing (row-major, top-down, no padding), and
  tests/test_multimodal_backends.py pins pure==PIL equality on the
  overlap formats whenever PIL is importable (skipped, not silently
  passed, when it is not -- this sandbox ships neither PIL nor
  ffmpeg).

The mapInPandas plumbing in multimodal.py is backend-agnostic: its
batch functions call the decode callable, and Arrow batch shapes are
identical either way -- swapping backends in production is a config,
not a rewrite.
"""

from __future__ import annotations

import io

from .multimodal import decode_audio, decode_image

_PIL_HINT = (
    "Pillow is not installed: pip install Pillow to enable the "
    "production image backend (progressive JPEG, palette/16-bit PNG, "
    "interlaced PNG); the pure decoders cover PPM/BMP/8-bit-PNG/"
    "baseline-JPEG without it"
)
_SF_HINT = (
    "soundfile/ffmpeg is not installed: pip install soundfile (libsndfile) "
    "to enable the production audio backend (FLAC/OGG/float WAV); the "
    "pure decoder covers 16-bit PCM WAV without it"
)


def pil_available() -> bool:
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def soundfile_available() -> bool:
    try:
        import soundfile  # noqa: F401

        return True
    except ImportError:
        return False


def _decode_image_pil(payload: bytes) -> dict:
    """PIL decode normalized to the pure decoders' output contract."""
    try:
        from PIL import Image
    except ImportError as e:
        raise NotImplementedError(_PIL_HINT) from e
    with Image.open(io.BytesIO(payload)) as img:
        mode = "RGBA" if img.mode in ("RGBA", "LA", "PA") else "RGB"
        converted = img.convert(mode)
        return {
            "width": converted.width,
            "height": converted.height,
            "mode": mode,
            # PIL tobytes() is row-major top-down with no padding --
            # the same packing the pure decoders emit
            "pixels": converted.tobytes(),
        }


def _decode_audio_soundfile(payload: bytes) -> dict:
    """soundfile decode normalized to the pure decoder's contract
    (16-bit interleaved int frames)."""
    try:
        import soundfile as sf
    except ImportError as e:
        raise NotImplementedError(_SF_HINT) from e
    data, sample_rate = sf.read(
        io.BytesIO(payload), dtype="int16", always_2d=True
    )
    return {
        "sample_rate": int(sample_rate),
        "n_channels": int(data.shape[1]),
        "samples": [int(v) for v in data.reshape(-1)],
    }


def decode_image_any(payload: bytes, backend: str = "auto") -> dict:
    """Image decode with selectable backend.

    auto: pure first; PIL only for what the pure path refuses (so
    environments without PIL behave exactly like the pure decoder).
    pure: the zero-dependency decoders (multimodal.decode_image).
    pil:  force the production backend."""
    if backend == "pure":
        return decode_image(payload)
    if backend == "pil":
        return _decode_image_pil(payload)
    if backend != "auto":
        raise ValueError(f"unknown image backend {backend!r}")
    try:
        return decode_image(payload)
    except NotImplementedError as pure_err:
        if not pil_available():
            raise NotImplementedError(
                f"{pure_err} [{_PIL_HINT}]"
            ) from pure_err
        return _decode_image_pil(payload)


def decode_audio_any(payload: bytes, backend: str = "auto") -> dict:
    """Audio decode with selectable backend (same contract as
    decode_image_any)."""
    if backend == "pure":
        return decode_audio(payload)
    if backend == "soundfile":
        return _decode_audio_soundfile(payload)
    if backend != "auto":
        raise ValueError(f"unknown audio backend {backend!r}")
    try:
        return decode_audio(payload)
    except NotImplementedError as pure_err:
        if not soundfile_available():
            raise NotImplementedError(
                f"{pure_err} [{_SF_HINT}]"
            ) from pure_err
        return _decode_audio_soundfile(payload)
