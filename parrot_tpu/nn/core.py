"""Core layers: initializers, Linear, Embedding, LayerNorm.

Replaces the Blocks bricks `Linear` / `LookupTable` the reference uses
(SURVEY.md §2.2). Functional style: `Layer.init(key, ...) -> params`,
`Layer.apply(params, x) -> y`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def glorot(key, shape, dtype=jnp.float32):
    """Glorot/Xavier uniform init for (fan_in, fan_out) matrices."""
    fan_in, fan_out = shape[0], shape[-1]
    limit = np.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def orthogonal(key, shape, dtype=jnp.float32, scale=1.0):
    """Orthogonal init (used for recurrent weight matrices)."""
    n_rows, n_cols = shape[0], int(np.prod(shape[1:]))
    mat_shape = (max(n_rows, n_cols), min(n_rows, n_cols))
    a = jax.random.normal(key, mat_shape, jnp.float32)
    q, r = jnp.linalg.qr(a)
    q = q * jnp.sign(jnp.diagonal(r))  # deterministic sign
    if n_rows < n_cols:
        q = q.T
    return (scale * q.reshape(shape)).astype(dtype)


def _cast(x, dtype_str):
    if dtype_str == "bfloat16":
        return x.astype(jnp.bfloat16)
    return x


class Linear:
    """y = x @ W + b."""

    @staticmethod
    def init(key, in_dim, out_dim, use_bias=True, w_init=glorot):
        kw, _ = jax.random.split(key)
        p = {"w": w_init(kw, (in_dim, out_dim))}
        if use_bias:
            p["b"] = jnp.zeros((out_dim,), jnp.float32)
        return p

    @staticmethod
    def apply(p, x, compute_dtype="float32"):
        w = _cast(p["w"], compute_dtype)
        y = jnp.dot(_cast(x, compute_dtype), w,
                    preferred_element_type=jnp.float32)
        if "b" in p:
            y = y + p["b"]
        return y


class Embedding:
    """LookupTable: int ids -> vectors."""

    @staticmethod
    def init(key, vocab_size, dim, scale=0.01):
        return {"table": scale * jax.random.normal(key, (vocab_size, dim))}

    @staticmethod
    def apply(p, ids):
        # take() lowers to a gather; fine on TPU for small vocab tables.
        return jnp.take(p["table"], ids, axis=0)


class LayerNorm:
    """Layer normalization over the last axis."""

    @staticmethod
    def init(dim):
        return {"g": jnp.ones((dim,), jnp.float32),
                "b": jnp.zeros((dim,), jnp.float32)}

    @staticmethod
    def apply(p, x, eps=1e-5):
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        return p["g"] * (x - mean) * jax.lax.rsqrt(var + eps) + p["b"]
