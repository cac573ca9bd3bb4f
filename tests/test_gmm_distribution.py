"""Distribution parity of the IN-KERNEL GMM sampler (interpret mode).

The fused kernel samples the MDN head with its own plumbing (Gumbel-max
categorical + selection matmuls + Box-Muller normal + biased
transform). The round-1 tests only proved determinism/finiteness — a
sign or scale error in that plumbing would have passed. Here the head
weights are zeroed and the head BIAS is set to fixed GMM parameters, so
every kernel step draws an i.i.d. sample from a KNOWN mixture;
component frequencies and per-component moments are then asserted
against the analytic values, and nn/mdn.gmm_sample is held to the same
bounds (so the two samplers agree with the distribution and with each
other). Covers bias=0 and bias=1 (sigma -> sigma*e^-b, logits ->
logits*(1+b), BASELINE.json:9).

The TPU interpreter stubs prng_random_bits to zeros on CPU, so these
tests inject host uniforms through the kernel's test hook — everything
downstream of the raw bits runs as the kernel code. The hardware PRNG
itself (plus this same statistical check) runs on-chip in
scripts/tpu_checks.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parrot_tpu.config import ModelConfig
from parrot_tpu.models import Parrot
from parrot_tpu.nn.mdn import gmm_sample
from parrot_tpu.ops.fused_decode import (fused_decode, flatten_state,
                                         prepare_params)

M = 3
CENTERS = np.array([-20.0, 0.0, 20.0], np.float32)   # component means
LOG_SIGMA = np.float32(np.log(0.5))                  # sigma = 0.5
LOGITS = np.array([0.0, 0.8, -0.4], np.float32)


def fixed_head_model():
    cfg = ModelConfig(frame_size=7, vocab_size=9, embed_dim=8,
                      encoder_dim=8, rnn_h_dim=16, decoder_layers=2,
                      readouts_dim=16, attention_mixtures=2,
                      num_mixtures=M, which_cost="GMM")
    model = Parrot(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    D = cfg.frame_size
    raw0 = np.zeros((model.head_dim,), np.float32)
    raw0[:M * D] = np.repeat(CENTERS, D)              # mu
    raw0[M * D:2 * M * D] = LOG_SIGMA                 # log sigma
    raw0[2 * M * D:] = LOGITS                         # pi logits
    params["head"]["w"] = jnp.zeros_like(params["head"]["w"])
    params["head"]["b"] = jnp.asarray(raw0)
    return cfg, model, params


def draw_kernel_samples(bias, T=256, B=16, seed=7):
    cfg, model, params = fixed_head_model()
    rng = np.random.default_rng(0)
    U = 6
    text = jnp.asarray(rng.integers(1, 9, (B, U)), jnp.int32)
    mask = jnp.ones((B, U))
    enc = model.encode(params, text, mask)
    init = flatten_state(model.init_state(B, U))
    kp = prepare_params(model, params, jnp.zeros((B,), jnp.int32), B,
                        weight_dtype=jnp.float32)
    D = model.D
    uniforms = np.random.default_rng(seed).uniform(
        1e-7, 1.0 - 1e-7, size=(T, B, M + 2 * D)).astype(np.float32)
    frames, _ = fused_decode(
        kp, enc, mask, init, np.array([seed], np.int32),
        jnp.asarray(uniforms),
        T=T, D=D, E=model.E, H=model.H, K=model.K, M=M, L=model.L,
        bias=bias, is_gmm=True, interpret=True, chunk_steps=64)
    return np.asarray(frames).reshape(-1, D)          # (T*B, D) iid


def assert_mixture_stats(samples, bias, tag):
    """samples: (N, D) drawn from the fixed mixture under `bias`."""
    n = samples.shape[0]
    probs = np.exp(LOGITS * (1.0 + bias))
    probs /= probs.sum()
    sigma_eff = np.exp(LOG_SIGMA) * np.exp(-bias)
    # classify by nearest center (separation 40*sigma: exact w.h.p.)
    comp = np.abs(samples.mean(-1, keepdims=True) - CENTERS).argmin(-1)
    for m in range(M):
        sel = samples[comp == m]
        n_m = sel.shape[0]
        # frequency within 4-sigma binomial bounds
        se = np.sqrt(probs[m] * (1 - probs[m]) / n)
        assert abs(n_m / n - probs[m]) < 4 * se + 1e-9, \
            f"{tag}: comp {m} freq {n_m / n:.4f} vs {probs[m]:.4f}"
        # moments pooled over dims (values are iid per dim)
        vals = sel.ravel()
        mean_se = sigma_eff / np.sqrt(vals.size)
        assert abs(vals.mean() - CENTERS[m]) < 4 * mean_se, \
            f"{tag}: comp {m} mean {vals.mean():.4f} vs {CENTERS[m]}"
        std_rel_se = 1.0 / np.sqrt(2 * vals.size)
        assert abs(vals.std() / sigma_eff - 1.0) < 4 * std_rel_se + 0.02, \
            f"{tag}: comp {m} std {vals.std():.4f} vs {sigma_eff:.4f}"


@pytest.mark.parametrize("bias", [0.0, 1.0])
def test_kernel_gmm_sampling_distribution(bias):
    samples = draw_kernel_samples(bias)
    assert_mixture_stats(samples, bias, f"kernel(bias={bias})")


@pytest.mark.parametrize("bias", [0.0, 1.0])
def test_mdn_gmm_sample_distribution(bias):
    """The plain-path sampler must satisfy the same analytic bounds, so
    the kernel and nn/mdn.gmm_sample agree with each other too."""
    D = 7
    N = 4096
    mu = jnp.asarray(np.repeat(CENTERS, D).reshape(1, M, D)
                     ).repeat(N, axis=0)
    ls = jnp.full((N, M, D), LOG_SIGMA)
    logits = jnp.asarray(LOGITS)[None].repeat(N, axis=0)
    x = gmm_sample(jax.random.PRNGKey(11), mu, ls, logits, bias=bias)
    assert_mixture_stats(np.asarray(x), bias, f"mdn(bias={bias})")
