"""Recurrent cells and scans: LSTM, masked scan, bidirectional encoder.

Replaces the Blocks `LSTM` / `Bidirectional` bricks (SURVEY.md §2.2).

TPU-first design notes:
- All four gates are one fused (in, 4H) matmul so the MXU sees one big GEMM
  per step instead of four small ones.
- For teacher-forced training the input projection `x @ Wx` over the whole
  segment is hoisted OUT of the scan (one [T*B, in] x [in, 4H] GEMM); the
  scan body then only does the recurrent [B, H] x [H, 4H] GEMM. Pass the
  precomputed projection via `lstm_scan(..., x_proj=...)`.
- Masked steps pass state through unchanged, which makes padded batches and
  TBPTT segment boundaries exact.

Gate order is (i, f, g, o) = (input, forget, candidate, output) — the
Blocks LSTM convention the reference inherits (reference: Blocks
`bricks.recurrent.LSTM`; mount empty, per SURVEY.md §0).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from parrot_tpu.nn.core import glorot, orthogonal, _cast, LayerNorm


class LSTMCell:
    """Fused-gate LSTM cell.

    params:
      wx: (in_dim, 4H)   input->gates
      wh: (H, 4H)        hidden->gates
      b:  (4H,)          bias (forget-gate slice init to forget_bias)
      optional ln_*: layer-norm params when layer_norm=True
    """

    @staticmethod
    def init(key, in_dim, hidden_dim, forget_bias=1.0, layer_norm=False):
        kx, kh = jax.random.split(key)
        b = jnp.zeros((4 * hidden_dim,), jnp.float32)
        b = b.at[hidden_dim:2 * hidden_dim].set(forget_bias)
        p = {
            "wx": glorot(kx, (in_dim, 4 * hidden_dim)),
            "wh": orthogonal(kh, (hidden_dim, 4 * hidden_dim)),
            "b": b,
        }
        if layer_norm:
            p["ln_g"] = LayerNorm.init(4 * hidden_dim)
            p["ln_c"] = LayerNorm.init(hidden_dim)
        return p

    @staticmethod
    def input_proj(p, x, compute_dtype="float32"):
        """x @ wx for one step or a whole [T, B, in] segment (hoistable)."""
        return jnp.dot(_cast(x, compute_dtype), _cast(p["wx"], compute_dtype),
                       preferred_element_type=jnp.float32)

    @staticmethod
    def step(p, state, x=None, x_proj=None, compute_dtype="float32"):
        """One step. Provide either raw input `x` or precomputed `x_proj`.

        state: (h, c) each (B, H). Returns new (h, c).
        """
        h, c = state
        if x_proj is None:
            x_proj = LSTMCell.input_proj(p, x, compute_dtype)
        gates = x_proj + jnp.dot(
            _cast(h, compute_dtype), _cast(p["wh"], compute_dtype),
            preferred_element_type=jnp.float32) + p["b"]
        if "ln_g" in p:
            gates = LayerNorm.apply(p["ln_g"], gates)
        hd = h.shape[-1]
        i = jax.nn.sigmoid(gates[..., :hd])
        f = jax.nn.sigmoid(gates[..., hd:2 * hd])
        g = jnp.tanh(gates[..., 2 * hd:3 * hd])
        o = jax.nn.sigmoid(gates[..., 3 * hd:])
        c_new = f * c + i * g
        c_out = LayerNorm.apply(p["ln_c"], c_new) if "ln_c" in p else c_new
        h_new = o * jnp.tanh(c_out)
        return h_new, c_new

    @staticmethod
    def zero_state(batch, hidden_dim, dtype=jnp.float32):
        z = jnp.zeros((batch, hidden_dim), dtype)
        return z, z


def lstm_scan(p, xs, init_state, mask=None, reverse=False,
              compute_dtype="float32"):
    """Run an LSTM over time with optional mask (state passthrough on pad).

    xs: (T, B, in). mask: (T, B) 1.0 for valid. Returns (hs: (T, B, H),
    final_state). The input projection for ALL steps is computed as one
    GEMM before the scan (MXU-friendly).
    """
    x_proj = LSTMCell.input_proj(p, xs, compute_dtype)  # (T, B, 4H)

    def body(state, inp):
        xp, m = inp
        h_new, c_new = LSTMCell.step(p, state, x_proj=xp,
                                     compute_dtype=compute_dtype)
        if m is not None:
            m = m[:, None]
            h_new = m * h_new + (1.0 - m) * state[0]
            c_new = m * c_new + (1.0 - m) * state[1]
        return (h_new, c_new), h_new

    ms = mask if mask is not None else None
    final, hs = jax.lax.scan(body, init_state, (x_proj, ms), reverse=reverse)
    return hs, final


def bidirectional_lstm(p_fwd, p_bwd, xs, mask, compute_dtype="float32"):
    """Bidirectional LSTM encoder: concat of forward and backward passes.

    xs: (T, B, in), mask: (T, B). Padding is assumed at the END of each
    sequence; the reverse scan walks from the padded tail and the mask
    passthrough keeps zero state until real tokens begin, which matches
    running the backward LSTM on the reversed unpadded sequence.
    Returns (T, B, 2H).
    """
    B = xs.shape[1]
    H = p_fwd["wh"].shape[0]
    z = LSTMCell.zero_state(B, H)
    hs_f, _ = lstm_scan(p_fwd, xs, z, mask, reverse=False,
                        compute_dtype=compute_dtype)
    hs_b, _ = lstm_scan(p_bwd, xs, z, mask, reverse=True,
                        compute_dtype=compute_dtype)
    return jnp.concatenate([hs_f, hs_b], axis=-1)
