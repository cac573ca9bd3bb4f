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


@jax.custom_vjp
def bf16_matmul(x, w):
    """(N, I) @ (I, O) with BOTH the forward and the two backward GEMMs
    forced to bf16 operands (f32 accumulation via preferred_element_type).

    Plain autodiff of `dot(x.astype(bf16), w.astype(bf16))` runs the
    forward at bf16 but PROMOTES the transpose GEMMs back to f32: the
    cotangent arrives f32, and the grad rule's mixed bf16xf32 dot
    upcasts — so dW = x^T @ dy and dx = dy @ w^T pay full f32 MXU rate
    (~4x the bf16 rate on v5e). This wrapper casts the cotangent to
    bf16 once, making all three GEMMs bf16-in/f32-out. Rounding: one
    bf16 quantization of x/w/dy per GEMM (~1e-2 relative), same
    envelope as scan_weight_dtype=bfloat16 (docs/PERFORMANCE.md).
    """
    return jnp.dot(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)


def _bf16_matmul_fwd(x, w):
    xb = x.astype(jnp.bfloat16)
    wb = w.astype(jnp.bfloat16)
    y = jnp.dot(xb, wb, preferred_element_type=jnp.float32)
    return y, (xb, wb)


def _bf16_matmul_bwd(res, dy):
    xb, wb = res
    dyb = dy.astype(jnp.bfloat16)
    dx = jnp.dot(dyb, wb.T, preferred_element_type=jnp.float32)
    dw = jnp.dot(xb.reshape(-1, xb.shape[-1]).T,
                 dyb.reshape(-1, dyb.shape[-1]),
                 preferred_element_type=jnp.float32)
    return dx, dw


bf16_matmul.defvjp(_bf16_matmul_fwd, _bf16_matmul_bwd)


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
