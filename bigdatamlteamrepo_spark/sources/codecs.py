"""Pure-numpy media codecs for uncompressed formats.

The container ships no media libraries (PIL/torchaudio/ffmpeg), so the
multimodal tier's decode was a declared stub.  For formats that are
just a header plus raw samples, no library is needed: this module
implements REAL encode/decode/resize for

  * PPM (P6) — 8-bit RGB images: ASCII header + H·W·3 raw bytes;
  * WAV (RIFF/PCM16 mono) — struct-parsed 44-byte canonical header +
    int16 little-endian samples.

Compressed formats (PNG/JPEG/MP4) stay gated behind the documented
stub in sources/multimodal.py — their plumbing (schema, batching,
column pruning) is identical, only the per-payload function differs.

Everything here is executor-side code invoked from Arrow-batched
``mapInPandas`` — plain bytes→numpy→bytes functions with no Spark
dependency, which is exactly what makes the decode swap a one-function
change at any scale.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# PPM (P6)
# ---------------------------------------------------------------------------


def encode_ppm(rgb: np.ndarray) -> bytes:
    """HxWx3 uint8 array → binary PPM (P6)."""
    if rgb.ndim != 3 or rgb.shape[2] != 3 or rgb.dtype != np.uint8:
        raise ValueError(f"expected HxWx3 uint8, got {rgb.shape} {rgb.dtype}")
    h, w = rgb.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + rgb.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) → HxWx3 uint8 array.  Parses the standard header
    (magic, whitespace-separated width/height/maxval, single whitespace
    before raster); comments are not emitted by our encoder and are
    rejected rather than mis-parsed."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    fields: list[int] = []
    i = 2
    while len(fields) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            raise ValueError("PPM comments unsupported")
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        fields.append(int(payload[i:j]))
        i = j
    i += 1  # single whitespace separating header from raster
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"only maxval 255 supported, got {maxval}")
    raster = np.frombuffer(payload, dtype=np.uint8, count=h * w * 3, offset=i)
    return raster.reshape(h, w, 3)


def resize_rgb(rgb: np.ndarray, max_side: int) -> np.ndarray:
    """Downscale so max(H, W) ≤ max_side via integer-factor box
    averaging (exact, deterministic); never upscales.  The factor is
    the smallest integer achieving the bound, so aspect ratio is kept
    and output dims are ceil(dim / k)."""
    h, w = rgb.shape[:2]
    side = max(h, w)
    if side <= max_side:
        return rgb
    k = -(-side // max_side)  # ceil division → shrink factor
    ph, pw = -(-h // k) * k, -(-w // k) * k  # pad to multiples via edge clamp
    padded = np.pad(rgb, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")
    boxes = padded.reshape(ph // k, k, pw // k, k, 3).astype(np.uint32)
    return (boxes.mean(axis=(1, 3)) + 0.5).astype(np.uint8)


# ---------------------------------------------------------------------------
# WAV (RIFF / PCM16 mono)
# ---------------------------------------------------------------------------

_WAV_HDR = struct.Struct("<4sI4s4sIHHIIHH4sI")


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 mono samples → canonical 44-byte-header WAV."""
    if samples.dtype != np.int16 or samples.ndim != 1:
        raise ValueError(f"expected 1-D int16, got {samples.shape} {samples.dtype}")
    data = samples.tobytes()
    hdr = _WAV_HDR.pack(
        b"RIFF", 36 + len(data), b"WAVE", b"fmt ", 16,
        1, 1, sample_rate, sample_rate * 2, 2, 16,
        b"data", len(data),
    )
    return hdr + data


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Canonical PCM16 mono WAV → (samples int16, sample_rate)."""
    (riff, _, wave, fmt, fmt_len, codec, n_ch, rate, _, _, bits, data_tag,
     data_len) = _WAV_HDR.unpack_from(payload, 0)
    if (riff, wave, fmt, data_tag) != (b"RIFF", b"WAVE", b"fmt ", b"data"):
        raise ValueError("not a canonical RIFF/WAVE payload")
    if (fmt_len, codec, n_ch, bits) != (16, 1, 1, 16):
        raise ValueError("only PCM16 mono with 16-byte fmt chunk supported")
    samples = np.frombuffer(payload, dtype="<i2", count=data_len // 2, offset=44)
    return samples, rate


# ---------------------------------------------------------------------------
# Deterministic synthesis (fixture generation, executor-side)
# ---------------------------------------------------------------------------


def synth_image(media_id: int, w: int, h: int) -> np.ndarray:
    """Deterministic RGB test pattern: per-channel affine gradients whose
    coefficients derive from media_id — exact uint8 arithmetic, so any
    decoder sees bit-identical pixels for a given id."""
    ys, xs = np.mgrid[0:h, 0:w].astype(np.uint32)
    chans = [
        ((xs * ((media_id + 2 * c + 1) % 7 + 1) + ys * ((media_id + 3 * c + 2) % 5 + 1)
          + media_id * (c + 1)) % 256).astype(np.uint8)
        for c in range(3)
    ]
    return np.stack(chans, axis=-1)


def synth_audio(media_id: int, n_samples: int) -> np.ndarray:
    """Deterministic int16 waveform: sum of two integer-sampled square
    waves (no float trig → bit-identical across platforms)."""
    t = np.arange(n_samples, dtype=np.int64)
    p1, p2 = (media_id % 37) + 20, (media_id % 53) + 40
    sq1 = np.where((t // p1) % 2 == 0, 8000, -8000)
    sq2 = np.where((t // p2) % 2 == 0, 4000, -4000)
    return (sq1 + sq2).astype(np.int16)
