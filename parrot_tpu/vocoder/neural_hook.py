"""SampleRNN-style neural-vocoder conditioning hook.

Char2Wav's second half is an external neural vocoder (SampleRNN) driven
by the attention RNN's vocoder frames (SURVEY.md §2.3 N3,
BASELINE.json:11). The reference exposes the hook as "generated frames
are the conditioning features"; this module provides that interface
natively:

  * `conditioning_from_frames` — upsample per-frame conditioning vectors
    to the audio sample grid (repeat or linear), numpy, for host-side
    vocoder training pipelines.
  * `conditioning_from_frames_jax` — the same, jittable, so an on-TPU
    neural vocoder can consume the sampler's output without leaving the
    device.
  * `ConditioningStream` — iterator over (utterance_id, features (T, D),
    upsampled (T*hop, D)) for generated batches; what an external
    SampleRNN training/serving job consumes.
"""

from __future__ import annotations

from functools import partial
from typing import Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from parrot_tpu.vocoder import world as _w


def conditioning_from_frames(frames: np.ndarray, fs: int = 16000,
                             frame_period_ms: float = _w.FRAME_PERIOD_MS,
                             mode: str = "repeat") -> np.ndarray:
    """frames (T, D) -> (T*hop, D) sample-aligned conditioning."""
    hop = _w.hop_samples(fs, frame_period_ms)
    T, D = frames.shape
    if mode == "repeat":
        return np.repeat(frames, hop, axis=0)
    if mode == "linear":
        t_out = np.arange(T * hop) / hop  # in frame units
        idx = np.clip(t_out, 0, T - 1)
        lo = np.floor(idx).astype(int)
        hi = np.minimum(lo + 1, T - 1)
        a = (idx - lo)[:, None]
        return (1 - a) * frames[lo] + a * frames[hi]
    raise ValueError(f"unknown mode: {mode}")


@partial(jax.jit, static_argnames=("hop", "mode"))
def conditioning_from_frames_jax(frames, hop: int, mode: str = "repeat"):
    """Jittable variant; frames (T, D) -> (T*hop, D)."""
    if mode == "repeat":
        return jnp.repeat(frames, hop, axis=0)
    if mode != "linear":
        raise ValueError(f"unknown mode: {mode}")
    T = frames.shape[0]
    t_out = jnp.arange(T * hop) / hop
    idx = jnp.clip(t_out, 0, T - 1)
    lo = jnp.floor(idx).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, T - 1)
    a = (idx - lo)[:, None]
    return (1 - a) * frames[lo] + a * frames[hi]


class ConditioningStream:
    """Adapter from sampler output to a neural-vocoder consumer."""

    def __init__(self, fs: int = 16000,
                 frame_period_ms: float = _w.FRAME_PERIOD_MS,
                 mode: str = "repeat"):
        self.fs = fs
        self.frame_period_ms = frame_period_ms
        self.mode = mode

    def __call__(self, frames_batch, lengths
                 ) -> Iterator[Tuple[int, np.ndarray, np.ndarray]]:
        """frames_batch (B, T, D) raw frames; lengths (B,). Yields
        (index, frames (T_i, D), conditioning (T_i*hop, D))."""
        frames_batch = np.asarray(frames_batch)
        lengths = np.asarray(lengths)
        for i in range(frames_batch.shape[0]):
            f = frames_batch[i, :int(lengths[i])]
            yield i, f, conditioning_from_frames(
                f, self.fs, self.frame_period_ms, self.mode)
