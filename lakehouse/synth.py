"""Deterministic synthetic clips table (audio + transcript).

FIXTURES.md §1: valid RIFF/WAV containers wrapping PCM synthesized by
numpy from ``(seed, clip_id)`` — decodable with numpy alone (no
``soundfile`` in the environment), with a designated hot clip_id prefix
owning ~30 % of rows (the skew fixture for MERGE/AQE tests; the
reference has a real-world version of this bug in its Kinesis partition
key, /root/reference/etl/handlers/click_handler.py:165).

Generation is fully deterministic per ``(seed, index)`` — regenerating a
clip gives byte-identical WAV bytes, which is what makes the per-row
decoded-PCM / transcript invariants checkable after any rewrite.

Scales: ``synth_clips_df`` builds rows inside ``mapInPandas`` over
``spark.range`` — no driver-side materialization, any row count.
"""

from __future__ import annotations

import struct
from typing import Iterator, Optional

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from .schema import CLIPS_SCHEMA

_WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
    "kilo lima mike november oscar papa quebec romeo sierra tango "
    "uniform victor whiskey xray yankee zulu"
).split()

SAMPLE_RATES = (8000, 16000, 44100)
HOT_PREFIX = "hot-"
HOT_FRACTION_MOD = 10  # idx % 10 < 3  → ~30% of rows in the hot range
EPOCH_DAY0 = np.datetime64("2024-01-01")


def _rng(seed: int, idx: int) -> np.random.Generator:
    return np.random.default_rng(np.uint64(seed * 1_000_003 + idx))


def clip_id_for(idx: int) -> str:
    if idx % HOT_FRACTION_MOD < 3:
        return f"{HOT_PREFIX}{idx:012d}"
    return f"clip-{idx:012d}"


def transcript_for(seed: int, idx: int) -> str:
    rng = _rng(seed, idx)
    n = int(rng.integers(3, 9))
    return " ".join(_WORDS[int(w)] for w in rng.integers(0, len(_WORDS), n))


def synth_pcm(seed: int, idx: int, sr: int, n_samples: int) -> np.ndarray:
    """Float32 signal in [-1, 1): 2–3 sinusoids + low-amplitude noise."""
    rng = _rng(seed, idx)
    t = np.arange(n_samples, dtype=np.float64) / sr
    signal = np.zeros(n_samples, dtype=np.float64)
    for _ in range(int(rng.integers(2, 4))):
        freq = float(rng.uniform(80.0, min(4000.0, sr / 2 - 100)))
        amp = float(rng.uniform(0.1, 0.3))
        phase = float(rng.uniform(0, 2 * np.pi))
        signal += amp * np.sin(2 * np.pi * freq * t + phase)
    signal += rng.normal(0.0, 0.005, n_samples)
    return np.clip(signal, -0.999, 0.999).astype(np.float32)


def wrap_wav(samples: np.ndarray, sr: int, codec: str = "pcm16") -> bytes:
    """Minimal valid RIFF/WAVE container around mono samples."""
    if codec == "pcm16":
        data = (samples * 32767.0).astype("<i2").tobytes()
        fmt, bits = 1, 16
    elif codec == "pcm8":
        data = ((samples * 127.0) + 128.0).astype("u1").tobytes()
        fmt, bits = 1, 8
    elif codec == "f32":
        data = samples.astype("<f4").tobytes()
        fmt, bits = 3, 32
    elif codec == "mulaw":
        from .g711 import mulaw_encode

        data = mulaw_encode(samples).tobytes()
        fmt, bits = 7, 8
    elif codec == "alaw":
        from .g711 import alaw_encode

        data = alaw_encode(samples).tobytes()
        fmt, bits = 6, 8
    elif codec == "adpcm":
        # IMA ADPCM: extended fmt chunk + fact chunk (true sample count
        # — blocks are padded), lakehouse/adpcm.py
        from .adpcm import adpcm_encode, fmt_chunk_body

        data = adpcm_encode(samples)
        fmt_body = fmt_chunk_body(sr)
        fact = struct.pack("<I", len(samples))
        return b"".join(
            [
                b"RIFF",
                struct.pack(
                    "<I", 4 + 8 + len(fmt_body) + 8 + len(fact) + 8 + len(data)
                ),
                b"WAVE",
                b"fmt ",
                struct.pack("<I", len(fmt_body)),
                fmt_body,
                b"fact",
                struct.pack("<I", len(fact)),
                fact,
                b"data",
                struct.pack("<I", len(data)),
                data,
            ]
        )
    else:
        raise ValueError(f"unsupported codec: {codec!r}")
    block_align = bits // 8
    byte_rate = sr * block_align
    return b"".join(
        [
            b"RIFF",
            struct.pack("<I", 36 + len(data)),
            b"WAVE",
            b"fmt ",
            struct.pack("<IHHIIHH", 16, fmt, 1, sr, byte_rate, block_align, bits),
            b"data",
            struct.pack("<I", len(data)),
            data,
        ]
    )


def make_clip_row(
    idx: int, seed: int = 42, n_days: int = 8, codec: str = "pcm16"
) -> dict:
    rng = _rng(seed, idx)
    sr = int(SAMPLE_RATES[int(rng.integers(0, len(SAMPLE_RATES)))])
    dur_ms = int(rng.integers(200, 3001))
    n_samples = sr * dur_ms // 1000
    samples = synth_pcm(seed, idx, sr, n_samples)
    day = int(rng.integers(0, n_days))
    event_date = (EPOCH_DAY0 + day).astype("datetime64[D]")
    ingest_ts = (
        EPOCH_DAY0.astype("datetime64[s]")
        + day * 86400
        + int(rng.integers(0, 86400))
    )
    return {
        "clip_id": clip_id_for(idx),
        "bytes": wrap_wav(samples, sr, codec),
        "sr_hz": sr,
        "dur_ms": dur_ms,
        "codec": codec,
        "transcript": transcript_for(seed, idx),
        "ingest_ts": pd.Timestamp(ingest_ts),
        "event_date": pd.Timestamp(event_date).date(),
    }


def synth_clips_pdf(
    indices, seed: int = 42, n_days: int = 8, codec: str = "pcm16"
) -> pd.DataFrame:
    rows = [make_clip_row(int(i), seed, n_days, codec) for i in indices]
    return pd.DataFrame(
        rows, columns=[f.name for f in CLIPS_SCHEMA.fields]
    )


def synth_clips_df(
    spark: SparkSession,
    n: int,
    *,
    start: int = 0,
    seed: int = 42,
    n_days: int = 8,
    num_partitions: Optional[int] = None,
    codec: str = "pcm16",
) -> DataFrame:
    """Distributed generator: executors synthesize their own slice of
    clip indices [start, start+n)."""
    parts = num_partitions or spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield synth_clips_pdf(pdf["id"].to_numpy(), seed, n_days, codec)

    return (
        spark.range(start, start + n, numPartitions=parts)
        .mapInPandas(gen, CLIPS_SCHEMA)
    )
