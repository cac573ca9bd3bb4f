"""Mixture-density (diagonal GMM) output head: NLL cost + biased sampling.

The reference's GMM emitter (reference model.py, `which_cost='GMM'` —
mount empty, per SURVEY.md §2.1/§3.3): an M-component diagonal Gaussian
mixture over the D-dim WORLD frame. Sampling supports the
"biased/temperature" transform of BASELINE.json:9:

    sigma -> sigma * exp(-bias)
    pi logits -> logits * (1 + bias)

so bias > 0 sharpens both the component choice and each Gaussian.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_HALF_LOG_2PI = 0.9189385332046727  # 0.5 * log(2*pi)


def split_gmm_params(raw, frame_size, num_mixtures, min_log_sigma=-7.0):
    """Split a flat head output into (mu, log_sigma, logit_pi).

    raw: (..., 2*M*D + M). Returns mu (..., M, D), log_sigma (..., M, D)
    clamped at min_log_sigma, logit_pi (..., M).
    """
    M, D = num_mixtures, frame_size
    lead = raw.shape[:-1]
    mu = raw[..., : M * D].reshape(*lead, M, D)
    log_sigma = raw[..., M * D: 2 * M * D].reshape(*lead, M, D)
    log_sigma = jnp.maximum(log_sigma, min_log_sigma)
    logit_pi = raw[..., 2 * M * D:]
    return mu, log_sigma, logit_pi


def gmm_nll(x, mu, log_sigma, logit_pi):
    """Negative log-likelihood per example.

    x: (..., D); mu/log_sigma: (..., M, D); logit_pi: (..., M).
    Returns (...,) NLL = -log sum_m pi_m prod_d N(x_d; mu, sigma).
    """
    x = x[..., None, :]                                    # (..., 1, D)
    inv_sigma = jnp.exp(-log_sigma)
    z = (x - mu) * inv_sigma
    comp_ll = jnp.sum(-0.5 * z * z - log_sigma - _HALF_LOG_2PI, axis=-1)
    log_pi = jax.nn.log_softmax(logit_pi, axis=-1)
    return -jax.nn.logsumexp(log_pi + comp_ll, axis=-1)


def gmm_sample(key, mu, log_sigma, logit_pi, bias=0.0):
    """Draw one frame per example with the biased-sampling transform.

    mu/log_sigma: (B, M, D); logit_pi: (B, M). Returns (B, D).
    """
    k_pi, k_eps = jax.random.split(key)
    logits = logit_pi * (1.0 + bias)
    comp = jax.random.categorical(k_pi, logits, axis=-1)   # (B,)
    mu_c = jnp.take_along_axis(mu, comp[:, None, None], axis=1)[:, 0]
    ls_c = jnp.take_along_axis(log_sigma, comp[:, None, None], axis=1)[:, 0]
    sigma = jnp.exp(ls_c) * jnp.exp(-bias)
    eps = jax.random.normal(k_eps, mu_c.shape, mu_c.dtype)
    return mu_c + sigma * eps


def mse_cost(x, mu):
    """Deterministic head: per-example sum-of-squares over frame dims
    (the reference's 'MSE' cost sums feature dims, averages over valid
    frames — conf: med, SURVEY.md §2.1)."""
    d = x - mu
    return jnp.sum(d * d, axis=-1)
