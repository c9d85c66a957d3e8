"""Pure-stdlib audio codec: PCM WAV decode + encode.

Companion to ``imagecodec.py`` (reference role: ``SolrContentHandler``'s
media-to-fields extraction): the ``wave`` stdlib module covers
uncompressed PCM WAV (8/16/32-bit int), which is enough to make the
multimodal AUDIO path real — actual samples from actual bytes. Compressed
containers (mp3/ogg/flac) still need codec libraries this container
doesn't ship and raise ``AudioDecodeError``.
"""

from __future__ import annotations

import io
import wave

import numpy as np


class AudioDecodeError(ValueError):
    pass


_WIDTH_DTYPE = {1: np.uint8, 2: np.int16, 4: np.int32}


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV bytes -> ((n_frames, channels) int array, sample_rate)."""
    if not payload or payload[:4] != b"RIFF":
        raise AudioDecodeError("not a RIFF/WAV payload")
    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            nch = w.getnchannels()
            width = w.getsampwidth()
            rate = w.getframerate()
            n = w.getnframes()
            raw = w.readframes(n)
    except wave.Error as e:
        raise AudioDecodeError(str(e)) from None
    dt = _WIDTH_DTYPE.get(width)
    if dt is None:
        raise AudioDecodeError(f"unsupported sample width {width}")
    arr = np.frombuffer(raw, dtype=dt)
    if nch > 1:
        arr = arr.reshape(-1, nch)
    else:
        arr = arr.reshape(-1, 1)
    return arr, rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """(n, channels) int16 -> PCM WAV bytes."""
    samples = np.asarray(samples, dtype=np.int16)
    if samples.ndim == 1:
        samples = samples[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(samples.shape[1])
        w.setsampwidth(2)
        w.setframerate(int(rate))
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def wav_features(payload: bytes) -> dict:
    """The decode -> feature contract the actor stage emits: duration,
    channel count, sample rate, RMS and peak amplitude (float64 math over
    the decoded samples; deterministic, oracle-checkable)."""
    arr, rate = decode_wav(payload)
    x = arr.astype(np.float64)
    rms = float(np.sqrt(np.mean(x**2))) if arr.size else 0.0
    return {
        "n_frames": int(arr.shape[0]),
        "channels": int(arr.shape[1]),
        "rate": int(rate),
        "duration_sec": float(np.floor(arr.shape[0] / rate * 10000 + 0.5) / 10000),
        "rms": float(np.floor(rms * 10000 + 0.5) / 10000),
        "peak": int(np.max(np.abs(x))) if arr.size else 0,
    }
