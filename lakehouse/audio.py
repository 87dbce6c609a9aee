"""Vectorized audio decode / validate / fingerprint (Arrow batch UDFs).

``BASELINE.json#input_hint`` mandates: all decode/validation of audio
bytes through vectorized pandas/Arrow UDFs, no per-row Python at the
Spark boundary. There is no ``soundfile`` in the environment, so WAV
parsing is pure numpy (``frombuffer`` over the RIFF data chunk), which
is both dependency-free and fast (no resampling/codec work — the table
stores raw PCM containers; the ``codec`` column gates the decode path).

The per-row invariant used by every maintenance-parity test lives here:
``pcm_sha1`` — a SHA-1 over the decoded PCM byte stream. Maintenance ops
never touch payload bytes, so the fingerprint must survive
append→compact→cluster→expire→merge unchanged; the full SNR/allclose
check (synth reference vs decoded) runs in pytest on samples.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator, Optional, Tuple

import numpy as np
import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql import types as T


def decode_wav(raw: bytes) -> Tuple[int, np.ndarray]:
    """Parse a RIFF/WAVE container → (sample_rate, float32 samples).

    Walks chunks properly (tolerates extra chunks before ``data``).
    Supports PCM16 / PCM8 / IEEE float32 mono — the codecs synth.py emits.
    """
    if raw is None or len(raw) < 44 or raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    pos = 12
    fmt_code = bits = sr = None
    data: Optional[bytes] = None
    while pos + 8 <= len(raw):
        cid = raw[pos : pos + 4]
        (size,) = struct.unpack_from("<I", raw, pos + 4)
        body = raw[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt_code, _ch, sr, _br, _ba, bits = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt_code is None or data is None or sr is None:
        raise ValueError("missing fmt/data chunk")
    if fmt_code == 1 and bits == 16:
        samples = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32767.0
    elif fmt_code == 1 and bits == 8:
        samples = (np.frombuffer(data, dtype="u1").astype(np.float32) - 128.0) / 127.0
    elif fmt_code == 3 and bits == 32:
        samples = np.frombuffer(data, dtype="<f4").astype(np.float32)
    else:
        raise ValueError(f"unsupported wav encoding fmt={fmt_code} bits={bits}")
    return int(sr), samples


def snr_db(reference: np.ndarray, test: np.ndarray) -> float:
    """Signal-to-noise ratio of ``test`` against ``reference`` in dB."""
    n = min(len(reference), len(test))
    if n == 0:
        return float("-inf")
    ref = reference[:n].astype(np.float64)
    noise = ref - test[:n].astype(np.float64)
    p_sig = float(np.mean(ref**2))
    p_noise = float(np.mean(noise**2))
    if p_noise == 0.0:
        return float("inf")
    return 10.0 * np.log10(p_sig / p_noise) if p_sig > 0 else float("-inf")


# --- Spark-facing vectorized UDFs --------------------------------------------

AUDIO_INFO_TYPE = T.StructType(
    [
        T.StructField("ok", T.BooleanType()),
        T.StructField("sr_hz", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("error", T.StringType()),
    ]
)


@F.pandas_udf(AUDIO_INFO_TYPE)
def audio_info(raw: pd.Series) -> pd.DataFrame:
    """Batch decode+validate: header sanity, sample count, RMS level."""
    out = {"ok": [], "sr_hz": [], "n_samples": [], "rms": [], "error": []}
    for b in raw:
        try:
            sr, samples = decode_wav(b)
            out["ok"].append(True)
            out["sr_hz"].append(sr)
            out["n_samples"].append(len(samples))
            out["rms"].append(float(np.sqrt(np.mean(samples**2))) if len(samples) else 0.0)
            out["error"].append(None)
        except (ValueError, struct.error) as e:
            out["ok"].append(False)
            out["sr_hz"].append(None)
            out["n_samples"].append(None)
            out["rms"].append(None)
            out["error"].append(str(e))
    return pd.DataFrame(out)


@F.pandas_udf(T.StringType())
def pcm_sha1(raw: pd.Series) -> pd.Series:
    """SHA-1 of the decoded PCM byte stream — the rewrite-parity
    fingerprint (invariant across every maintenance operation)."""

    def one(b):
        if b is None:
            return None
        try:
            _sr, samples = decode_wav(b)
        except (ValueError, struct.error):
            return "DECODE_ERROR"
        return hashlib.sha1(samples.tobytes()).hexdigest()

    return raw.map(one)


@F.pandas_udf(T.DoubleType())
def synth_snr_db(raw: pd.Series, idx: pd.Series, seed: pd.Series) -> pd.Series:
    """SNR of the stored clip against its regenerated synth reference —
    distributed form of the per-row allclose invariant (SNR ≥ 30 dB)."""
    from .synth import synth_pcm

    out = []
    for b, i, s in zip(raw, idx, seed):
        try:
            sr, decoded = decode_wav(b)
        except (ValueError, struct.error):
            out.append(float("-inf"))
            continue
        ref = synth_pcm(int(s), int(i), sr, len(decoded))
        out.append(snr_db(ref, decoded))
    return pd.Series(out, dtype="float64")


def with_audio_features(df, bytes_col: str = "bytes"):
    """Attach decoded features as a struct column (one Arrow exchange)."""
    return df.withColumn("audio", audio_info(F.col(bytes_col)))


def resample_stub(df, target_sr: int):
    """Placeholder for DSP transforms that need real audio libs.

    The container has no resampler (no scipy.signal guarantees, no
    soundfile); the Spark-side plumbing (schema, batch shape) is real but
    the kernel is intentionally not implemented.
    """
    raise NotImplementedError(
        "resample requires an audio DSP library not present in this "
        "environment; decode/validate/fingerprint paths are implemented"
    )
