"""IMA/DVI ADPCM (WAV format tag 17, 4 bits/sample), block-vectorized
numpy — the third codec family next to PCM and G.711 (lakehouse/g711.py).

Why it matters at corpus scale: ADPCM stores 4 bits/sample vs PCM16's
16, so a 100 TB PCM16 speech corpus lands at ~25 TB with ~31 dB SNR —
the cheapest lossy tier the engine's transcode ladder offers below
G.711 (8 bits, ~38 dB).

The recurrence (predictor + step index per sample) is inherently
sequential WITHIN a block, but IMA blocks are independently decodable
(each block header carries the initial predictor and step index).  We
exploit that: samples are reshaped to ``(n_blocks, samples_per_block)``
and the per-sample loop runs over the BLOCK LENGTH (<= 505 steps for
the standard 256-byte block) with whole-array numpy ops across all
blocks at each step — O(block_len) Python iterations per clip
regardless of duration, never O(n_samples).

Container layout follows the IMA ADPCM WAV conventions (multimedia
registration of format 0x0011): extended fmt chunk with
``samples_per_block``, a ``fact`` chunk carrying the true sample count
(blocks are padded), block = 4-byte header (int16 predictor, uint8
step index, uint8 reserved) + packed nibbles low-nibble-first.

Reference scope: the reference pipeline treats payloads as opaque
bytes end-to-end (etl/glue_stream.py handles JSON events only); codec
work is engine-added value for the audio lakehouse surface.
"""

from __future__ import annotations

import struct

import numpy as np

# ITU/IMA step-size table (89 entries) and index-adjustment table.
STEP_TABLE = np.array(
    [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
        37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
        157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
        544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
        1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
        4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
        12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
        29794, 32767,
    ],
    dtype=np.int32,
)

INDEX_TABLE = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)

DEFAULT_BLOCK_ALIGN = 256


def samples_per_block(block_align: int = DEFAULT_BLOCK_ALIGN) -> int:
    """Mono IMA WAV: 4-byte header holds sample 0; the remaining
    ``block_align - 4`` bytes hold two 4-bit samples each."""
    return (block_align - 4) * 2 + 1


def _nibble_step(code: np.ndarray, step: np.ndarray):
    """Reconstructed magnitude for a 3-bit code at ``step`` — the
    shared decode arithmetic: step/8 + step/4*b2 + step/2*b1 + step*b0."""
    diff = step >> 3
    diff = diff + np.where(code & 4, step, 0)
    diff = diff + np.where(code & 2, step >> 1, 0)
    diff = diff + np.where(code & 1, step >> 2, 0)
    return diff


def adpcm_encode(x: np.ndarray, block_align: int = DEFAULT_BLOCK_ALIGN) -> bytes:
    """float [-1, 1] mono -> IMA ADPCM block stream (no WAV framing).

    Blocks are state-independent: predictor resets to the block's true
    first sample (stored losslessly in the header) and the initial step
    index is fit per block from the mean |delta| — so every block
    decodes identically with or without its neighbours, which is what
    lets both sides run block-parallel.
    """
    spb = samples_per_block(block_align)
    s = np.clip(
        (np.asarray(x, np.float64) * 32767.0).round(), -32768, 32767
    ).astype(np.int32)
    if len(s) == 0:
        return b""
    n_blocks = (len(s) + spb - 1) // spb
    padded = np.empty(n_blocks * spb, dtype=np.int32)
    padded[: len(s)] = s
    padded[len(s):] = s[-1]  # pad = hold last sample (near-zero deltas)
    blk = padded.reshape(n_blocks, spb)

    pred = blk[:, 0].copy()
    # per-block initial step index: nearest step to the mean |delta|
    mean_d = np.abs(np.diff(blk, axis=1)).mean(axis=1)
    idx = np.searchsorted(STEP_TABLE, mean_d).clip(0, 88).astype(np.int32)
    header = np.zeros((n_blocks, 4), dtype=np.uint8)
    header[:, 0] = pred & 0xFF
    header[:, 1] = (pred >> 8) & 0xFF
    header[:, 2] = idx

    nibbles = np.empty((n_blocks, spb - 1), dtype=np.uint8)
    for t in range(1, spb):  # loop over block position, vector over blocks
        step = STEP_TABLE[idx]
        delta = blk[:, t] - pred
        sign = delta < 0
        mag = np.abs(delta)
        code = np.zeros(n_blocks, dtype=np.int32)
        ge = mag >= step
        code |= np.where(ge, 4, 0)
        mag = mag - np.where(ge, step, 0)
        half = step >> 1
        ge = mag >= half
        code |= np.where(ge, 2, 0)
        mag = mag - np.where(ge, half, 0)
        ge = mag >= (step >> 2)
        code |= np.where(ge, 1, 0)
        diff = _nibble_step(code, step)
        pred = np.clip(pred + np.where(sign, -diff, diff), -32768, 32767)
        idx = np.clip(idx + INDEX_TABLE[code], 0, 88)
        nibbles[:, t - 1] = (code | np.where(sign, 8, 0)).astype(np.uint8)

    lo = nibbles[:, 0::2]
    hi = nibbles[:, 1::2]
    packed = (lo | (hi << 4)).astype(np.uint8)  # low nibble = earlier sample
    out = np.concatenate([header, packed], axis=1)
    assert out.shape[1] == block_align
    return out.tobytes()


def adpcm_decode(
    data: bytes,
    block_align: int = DEFAULT_BLOCK_ALIGN,
    n_samples: int | None = None,
) -> np.ndarray:
    """IMA ADPCM block stream -> float32 [-1, 1]; trims block padding
    to ``n_samples`` (the WAV ``fact`` chunk count) when given."""
    spb = samples_per_block(block_align)
    buf = np.frombuffer(data, dtype=np.uint8)
    n_blocks = len(buf) // block_align
    if n_blocks == 0:
        return np.zeros(0, dtype=np.float32)
    blk = buf[: n_blocks * block_align].reshape(n_blocks, block_align)
    pred = (
        blk[:, 0].astype(np.int32) | (blk[:, 1].astype(np.int32) << 8)
    ).astype(np.int16).astype(np.int32)
    idx = np.clip(blk[:, 2].astype(np.int32), 0, 88)
    packed = blk[:, 4:]
    nib = np.empty((n_blocks, (block_align - 4) * 2), dtype=np.int32)
    nib[:, 0::2] = packed & 0x0F
    nib[:, 1::2] = packed >> 4

    out = np.empty((n_blocks, spb), dtype=np.int32)
    out[:, 0] = pred
    for t in range(spb - 1):  # loop over block position, vector over blocks
        code = nib[:, t]
        step = STEP_TABLE[idx]
        diff = _nibble_step(code & 7, step)
        pred = np.clip(pred + np.where(code & 8, -diff, diff), -32768, 32767)
        idx = np.clip(idx + INDEX_TABLE[code & 7], 0, 88)
        out[:, t + 1] = pred

    flat = out.reshape(-1)
    if n_samples is not None:
        flat = flat[: int(n_samples)]
    return (flat / 32767.0).astype(np.float32)


def fmt_chunk_body(sr: int, block_align: int = DEFAULT_BLOCK_ALIGN) -> bytes:
    """Extended fmt chunk body for format 0x0011 (20 bytes: the base
    WAVEFORMAT + cbSize=2 + wSamplesPerBlock)."""
    spb = samples_per_block(block_align)
    byte_rate = (sr * block_align + spb - 1) // spb
    return struct.pack(
        "<HHIIHHHH", 17, 1, sr, byte_rate, block_align, 4, 2, spb
    )
