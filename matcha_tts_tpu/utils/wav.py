"""Minimal WAV write (the reference uses soundfile, main.py:201; not
available here — PCM16 WAV writing is 40 lines of stdlib)."""

from __future__ import annotations

import wave

import numpy as np


def write_wav(path, audio: np.ndarray, sample_rate: int = 22050) -> None:
    """Write mono float32 [-1, 1] audio as 16-bit PCM WAV."""
    audio = np.asarray(audio, dtype=np.float32).reshape(-1)
    pcm = np.clip(audio, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype(np.int16)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())


def wav_bytes(audio: np.ndarray, sample_rate: int = 22050) -> bytes:
    """Encode mono float32 [-1, 1] audio as an in-memory 16-bit PCM WAV
    (serving responses; same encoding as `write_wav`)."""
    import io

    buf = io.BytesIO()
    audio = np.asarray(audio, dtype=np.float32).reshape(-1)
    pcm = (np.clip(audio, -1.0, 1.0) * 32767.0).astype(np.int16)
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def read_wav(path):
    """Read a mono 16-bit PCM WAV to float32 (tests/round trips)."""
    with wave.open(str(path), "rb") as w:
        n = w.getnframes()
        sr = w.getframerate()
        raw = w.readframes(n)
        data = np.frombuffer(raw, dtype=np.int16).astype(np.float32) / 32767.0
        if w.getnchannels() > 1:
            data = data.reshape(-1, w.getnchannels()).mean(axis=1)
    return data, sr
