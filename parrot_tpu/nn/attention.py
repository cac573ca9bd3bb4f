"""Graves GMM window attention (Char2Wav "reader").

Implements the location-based soft window of Graves 2013 §5 (arXiv
1308.0850), the attention the reference's model.py uses between the
frame-level decoder and the character encoder (SURVEY.md §3.3; reference
model.py — mount empty, reconstructed):

    (a_hat, b_hat, k_hat) = Linear(h_dec)            # (B, 3K)
    alpha = exp(a_hat); beta = exp(b_hat)
    kappa_t = kappa_{t-1} + align * exp(k_hat)       # monotonic
    phi_t(u) = sum_k alpha_k * exp(-beta_k * (kappa_k - u)^2)
    w_t = sum_u phi_t(u) * enc_u

The whole step is a couple of small GEMMs plus a (B, U, K) broadcast —
O(B*U*K) on the VPU, then one (B,U)x(B,U,E) contraction on the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from parrot_tpu.nn.core import Linear


class GravesWindow:
    @staticmethod
    def init(key, h_dim, num_mixtures):
        # Bias k_hat slightly negative so initial window speed is < 1
        # char/frame, a standard stabilization for monotonic alignment.
        p = {"proj": Linear.init(key, h_dim, 3 * num_mixtures)}
        b = p["proj"]["b"]
        K = num_mixtures
        p["proj"]["b"] = b.at[2 * K:].set(-2.0)
        return p

    @staticmethod
    def step(p, h, kappa_prev, enc, enc_mask, alignment=1.0,
             compute_dtype="float32"):
        """One attention step.

        h: (B, H) decoder hidden; kappa_prev: (B, K); enc: (B, U, E);
        enc_mask: (B, U). Returns (w: (B, E), kappa: (B, K), phi: (B, U)).
        """
        K = kappa_prev.shape[-1]
        raw = Linear.apply(p["proj"], h, compute_dtype)      # (B, 3K)
        alpha = jnp.exp(raw[:, :K])                          # (B, K)
        beta = jnp.exp(raw[:, K:2 * K])                      # (B, K)
        kappa = kappa_prev + alignment * jnp.exp(raw[:, 2 * K:])  # (B, K)

        U = enc.shape[1]
        u = jnp.arange(U, dtype=jnp.float32)[None, :, None]  # (1, U, 1)
        diff = kappa[:, None, :] - u                         # (B, U, K)
        phi = jnp.sum(alpha[:, None, :] * jnp.exp(-beta[:, None, :] * diff * diff),
                      axis=-1)                               # (B, U)
        phi = phi * enc_mask
        w = jnp.einsum("bu,bue->be", phi, enc,
                       preferred_element_type=jnp.float32)
        return w, kappa, phi

    @staticmethod
    def stop_mass(kappa, text_lengths):
        """Fraction-of-window-past-end proxy used for the sampler's stop
        criterion: mean over mixtures of 1[kappa_k > U_i]. The reference
        stops generation when the window passes the last character
        (SURVEY.md §3.2/§3.3, conf: med)."""
        past = (kappa > text_lengths[:, None].astype(jnp.float32))
        return jnp.mean(past.astype(jnp.float32), axis=-1)
