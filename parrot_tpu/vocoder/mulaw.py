"""mu-law companding for the SampleRNN-style neural vocoder.

Char2Wav's neural-vocoder half (SampleRNN) models 8-bit mu-law audio
with a 256-way softmax (SURVEY.md §2.3 N3; the reference consumes an
external SampleRNN repo — mount empty). Standard mu-law (mu = Q - 1):

  enc(x) = sign(x) * log(1 + mu * |x|) / log(1 + mu)      x in [-1, 1]
  id     = round((enc(x) + 1) / 2 * (Q - 1))              in [0, Q-1]

NumPy and jittable JAX variants share the formulas; tests pin them to
each other and to round-trip error bounds.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def mulaw_encode(x: np.ndarray, quantization: int = 256) -> np.ndarray:
    """float waveform in [-1, 1] -> int mu-law ids in [0, Q-1]."""
    mu = quantization - 1
    x = np.clip(np.asarray(x, np.float64), -1.0, 1.0)
    y = np.sign(x) * np.log1p(mu * np.abs(x)) / np.log1p(mu)
    return np.clip(np.round((y + 1.0) / 2.0 * mu), 0, mu).astype(np.int32)


def mulaw_decode(ids: np.ndarray, quantization: int = 256) -> np.ndarray:
    """int mu-law ids -> float waveform in [-1, 1] (float32)."""
    mu = quantization - 1
    y = np.asarray(ids, np.float64) / mu * 2.0 - 1.0
    x = np.sign(y) * (np.expm1(np.abs(y) * np.log1p(mu))) / mu
    return x.astype(np.float32)


def mulaw_encode_jax(x, quantization: int = 256):
    mu = quantization - 1
    x = jnp.clip(x, -1.0, 1.0)
    y = jnp.sign(x) * jnp.log1p(mu * jnp.abs(x)) / jnp.log1p(float(mu))
    return jnp.clip(jnp.round((y + 1.0) / 2.0 * mu), 0, mu).astype(jnp.int32)


def mulaw_decode_jax(ids, quantization: int = 256):
    mu = quantization - 1
    y = ids.astype(jnp.float32) / mu * 2.0 - 1.0
    return (jnp.sign(y) * jnp.expm1(jnp.abs(y) * jnp.log1p(float(mu))) / mu)


# mu-law id of silence at the corpus quantization (Q=256 throughout the
# HDF5 schema): mulaw_encode(0.0) == Q // 2. Data pipelines pad audio
# with this id so padding decodes to exact silence.
MULAW_ZERO = 128
