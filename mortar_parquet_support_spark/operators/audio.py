"""Pure-stdlib WAV (RIFF/PCM) decode + audio features.

Companion to operators/imaging.py's PNG codec: the container images lack
torchaudio/ffmpeg, but WAV is decodable with ``wave`` + ``array`` from the
standard library, so the audio leg of the multimodal 'real' decode tier is
REAL for PCM WAV — duration, channel count, sample rate, RMS level, peak,
and zero-crossing rate from actual samples. Compressed formats (mp3/flac)
still need native codecs and raise.
"""

from __future__ import annotations

import array
import io
import wave


def wav_features(content: bytes, n_features: int = 16) -> list[float]:
    """Decode a PCM WAV byte string and return
    ``[duration_s, sample_rate, n_channels, sample_width_bytes, rms, peak,
    zero_crossing_rate, mean]`` (normalized to [-1, 1] full scale), padded
    with zeros to ``n_features``. Raises ValueError on malformed input."""
    try:
        with wave.open(io.BytesIO(bytes(content)), "rb") as w:
            n_channels = w.getnchannels()
            width = w.getsampwidth()
            rate = w.getframerate()
            n_frames = w.getnframes()
            raw = w.readframes(n_frames)
    except (wave.Error, EOFError) as exc:
        raise ValueError(f"not a decodable PCM WAV: {exc}") from exc

    if width == 1:  # unsigned 8-bit
        samples = [(b - 128) / 128.0 for b in raw]
    elif width == 2:
        a = array.array("h")
        a.frombytes(raw[: len(raw) - (len(raw) % 2)])
        samples = [s / 32768.0 for s in a]
    elif width == 4:
        a = array.array("i")
        a.frombytes(raw[: len(raw) - (len(raw) % 4)])
        samples = [s / 2147483648.0 for s in a]
    else:
        raise ValueError(f"unsupported WAV sample width: {width}")

    n = len(samples)
    duration = n_frames / rate if rate else 0.0
    if n:
        rms = (sum(s * s for s in samples) / n) ** 0.5
        peak = max(abs(s) for s in samples)
        mean = sum(samples) / n
        crossings = sum(
            1 for i in range(1, n) if (samples[i - 1] < 0) != (samples[i] < 0)
        )
        zcr = crossings / (n - 1) if n > 1 else 0.0
    else:
        rms = peak = mean = zcr = 0.0

    feats = [
        float(duration),
        float(rate),
        float(n_channels),
        float(width),
        float(rms),
        float(peak),
        float(zcr),
        float(mean),
    ][:n_features]
    return feats + [0.0] * (n_features - len(feats))


def make_wav(
    samples: list[float],
    *,
    rate: int = 8000,
    n_channels: int = 1,
) -> bytes:
    """Encode [-1, 1] float samples as 16-bit PCM WAV bytes (test fixture
    helper; also proves the decoder against a known signal)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        ints = array.array(
            "h", (max(-32768, min(32767, round(s * 32767))) for s in samples)
        )
        w.writeframes(ints.tobytes())
    return buf.getvalue()
